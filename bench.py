#!/usr/bin/env python
"""Framework benchmark — prints ONE JSON line for the driver.

Headline metric: Groth16 (BN254) prove wall-clock for a 2^K-constraint R1CS
on the available accelerator (K = $BENCH_LOG2, default 16).

`vs_baseline` is measured_speedup vs an *estimated* single-host wall-clock of
the reference Rust prover (arkworks + rayon): ~15 s at 2^20 constraints on a
typical 16-core host, scaled linearly in N (the reference publishes no prover
numbers — BASELINE.md). Reported as baseline_seconds / our_seconds.

Robustness (the round-1 driver run timed out before printing anything,
BENCH_r01.json rc=124): the measurement runs in a CHILD process that
checkpoints partial results to a file after every stage; the parent process
enforces the budget ($BENCH_BUDGET_S, default 480 s) and always prints the
last checkpoint. A SIGALRM watchdog cannot do this — the alarm is deferred
while the interpreter sits inside a single long XLA compile call.

Compile-time note: through the TPU tunnel, XLA compiles dominate cold-run
wall-clock (measured at 2^13: ~1100 s of compiles vs < 2 s of execution).
`import ckb_zkp_tpu` configures the persistent compilation cache
(~/.cache/ckb_zkp_tpu_xla_<platform>); it is warmed during development so
driver runs only pay session init + execution.
"""

import json
import os
import signal
import subprocess
import sys
import tempfile
import time

START = time.time()
BUDGET = float(os.environ.get("BENCH_BUDGET_S", "480"))

STATE: dict = {"metric": "groth16_prove_bn254", "value": None, "unit": "ms",
               "vs_baseline": None, "extra": {"stage": "init"}}

_STATE_FILE = os.environ.get("BENCH_STATE_FILE", "")


def checkpoint() -> None:
    """Atomically persist STATE so the parent can emit partial results."""
    if not _STATE_FILE:
        return
    tmp = _STATE_FILE + ".tmp"
    with open(tmp, "w") as f:
        json.dump(STATE, f)
    os.replace(tmp, _STATE_FILE)


def set_stage(name: str) -> None:
    STATE["extra"]["stage"] = name
    checkpoint()


def sync(out) -> None:
    """Force execution to finish. `jax.block_until_ready` is a no-op on the
    axon TPU-tunnel platform (async remote execution acks dispatch, not
    completion) — fetching one element is the only reliable barrier."""
    import jax
    import numpy as np

    for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "ravel"):
            np.asarray(jax.device_get(leaf.ravel()[:1]))


def remaining() -> float:
    return BUDGET - (time.time() - START)


# --------------------------- parent ---------------------------

def parent() -> None:
    fd, state_file = tempfile.mkstemp(prefix="bench_state_", suffix=".json")
    os.close(fd)
    env = dict(os.environ)
    env["BENCH_CHILD"] = "1"
    env["BENCH_STATE_FILE"] = state_file
    child = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__)],
        env=env,
        stdout=subprocess.DEVNULL,
        stderr=sys.stderr,
        start_new_session=True,
    )
    deadline = START + BUDGET
    rc = None
    while time.time() < deadline:
        rc = child.poll()
        if rc is not None:
            break
        time.sleep(1.0)
    timed_out = rc is None
    if timed_out:
        try:
            os.killpg(child.pid, signal.SIGKILL)
        except (ProcessLookupError, PermissionError):
            child.kill()
        child.wait()
    state = dict(STATE)
    try:
        with open(state_file) as f:
            state = json.load(f)
    except (OSError, ValueError):
        state["extra"]["no_checkpoint"] = True
    finally:
        try:
            os.unlink(state_file)
        except OSError:
            pass
    if timed_out:
        state.setdefault("extra", {})
        state["extra"]["timed_out_at_stage"] = state["extra"].get("stage")
    if state.get("value") is None:
        state["value"] = round((time.time() - START) * 1000.0, 1)
        state["extra"]["incomplete"] = True
    state["extra"]["total_s"] = round(time.time() - START, 1)
    print(json.dumps(state))
    sys.stdout.flush()


# --------------------------- child ---------------------------

def _bench_at(k: int, record: bool):
    """Setup + prove + verify a 2^k-constraint circuit; update STATE.

    Returns (curve, shape, params, qap) for optional follow-on stages."""
    from ckb_zkp_tpu.bench_circuits import product_circuit_shape
    from ckb_zkp_tpu.host.pairing import get_curve
    from ckb_zkp_tpu.schemes import groth16
    from ckb_zkp_tpu.schemes.groth16.prover import create_proof_from_shape
    from ckb_zkp_tpu.schemes.groth16.qap import QapMatrices

    n = 1 << k
    curve = get_curve("bn254")
    p = curve.fr.modulus
    tag = f"2^{k}"
    baseline_s = 15.0 * n / (1 << 20)  # estimated rust reference (docstring)

    shape = product_circuit_shape(n, p)
    set_stage(f"setup_{tag}")
    t0 = time.time()
    params = groth16.generate_parameters_from_shape(
        shape, curve, alpha=5, beta=7, gamma=11, delta=13, t=0xABCDEF0123456789
    )
    sync(params.a_query)
    STATE["extra"][f"setup_{tag}_s"] = round(time.time() - t0, 3)

    qap = QapMatrices(shape, curve.fr)
    set_stage(f"prove_warmup_{tag}")
    t0 = time.time()
    proof = create_proof_from_shape(params, shape, 0, 0, qap=qap)
    STATE["extra"][f"prove_warm_{tag}_s"] = round(time.time() - t0, 3)
    set_stage(f"prove_{tag}")
    t0 = time.time()
    proof = create_proof_from_shape(params, shape, 0, 0, qap=qap)
    prove_s = time.time() - t0

    STATE["extra"][f"prove_{tag}_ms"] = round(prove_s * 1000.0, 3)
    if record:
        STATE["metric"] = f"groth16_prove_bn254_{tag}"
        STATE["extra"]["constraints"] = n
        STATE["extra"]["baseline_estimate_s"] = baseline_s
        STATE["value"] = round(prove_s * 1000.0, 3)
        STATE["vs_baseline"] = round(baseline_s / prove_s, 3)
    checkpoint()

    set_stage(f"verify_{tag}")
    pvk = groth16.prepare_verifying_key(curve, params.vk)
    t0 = time.time()
    ok = groth16.verify_proof(curve, pvk, proof, shape.input_assignment[1:])
    STATE["extra"][f"verify_{tag}_s"] = round(time.time() - t0, 3)
    STATE["extra"][f"verify_{tag}_ok"] = bool(ok)
    if not ok and record:
        STATE["vs_baseline"] = 0.0  # a wrong proof scores nothing
    checkpoint()
    return curve, shape, params, qap


def child_main() -> None:
    k = int(os.environ.get("BENCH_LOG2", "16"))
    STATE["metric"] = f"groth16_prove_bn254_2^{k}"

    set_stage("import_jax")
    import jax

    STATE["extra"]["backend"] = jax.default_backend()
    checkpoint()

    # Stage 0 — guaranteed number: a small circuit on the compile-free
    # host-int path (engaged automatically on the TPU tunnel for domains
    # <= HOST_QAP_MAX). If the cold-cache device run below never finishes
    # inside the budget, the parent still emits this real, verified
    # measurement instead of nothing. CPU backends skip it (they take the
    # compiled device path at every size; the compiles are redundant).
    if (
        os.environ.get("BENCH_SKIP_SMALL", "") in ("", "0")
        and jax.default_backend() != "cpu"
    ):
        _bench_at(int(os.environ.get("BENCH_SMALL_LOG2", "8")), record=True)

    # Headline run at 2^k (device path; fast when the compile cache is warm)
    curve, shape, params, qap = _bench_at(k, record=True)

    if remaining() > 60:
        set_stage("msm_sub")
        from ckb_zkp_tpu.ops.field import device_field
        from ckb_zkp_tpu.ops.msm import device_group

        fr = device_field(curve.fr)
        dg1 = device_group(curve, "g1")
        z = shape.full_assignment()
        npad = params.a_query[2].shape[0] if params.padded_queries else len(z)
        z = z + [0] * (npad - len(z))
        z_can = fr.from_mont(fr.encode(z))
        sync(dg1.msm(params.a_query, z_can))
        t0 = time.time()
        sync(dg1.msm(params.a_query, z_can))
        msm_s = time.time() - t0
        npoints = z_can.shape[0]
        STATE["extra"]["msm_points_per_s"] = round(npoints / msm_s, 1)
        STATE["extra"]["msm_n"] = npoints
        checkpoint()

        if remaining() > 30:
            set_stage("ntt_sub")
            from ckb_zkp_tpu.ops.ntt import get_domain

            m = qap.m
            dom = get_domain(curve.fr, m)
            x = fr.encode([3] * m)
            sync(dom.ntt(x))
            t0 = time.time()
            sync(dom.ntt(x))
            STATE["extra"][f"ntt_2^{m.bit_length()-1}_ms"] = round(
                (time.time() - t0) * 1000.0, 3
            )
            checkpoint()

    set_stage("done")
    checkpoint()


if __name__ == "__main__":
    if os.environ.get("BENCH_CHILD") == "1":
        try:
            child_main()
        except BaseException as e:  # noqa: BLE001 — checkpoint must record it
            STATE["extra"]["error"] = f"{type(e).__name__}: {e}"[:500]
            STATE["extra"]["failed_at_stage"] = STATE["extra"].get("stage")
            checkpoint()
            raise
    else:
        parent()
