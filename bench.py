#!/usr/bin/env python
"""Framework benchmark — prints ONE JSON line for the driver.

Headline metric: Groth16 (BN254) prove wall-clock for a 2^K-constraint R1CS
on the available accelerator (K = $BENCH_LOG2, default 16 this round).

`vs_baseline` is measured_speedup vs an *estimated* single-host wall-clock of
the reference Rust prover (arkworks + rayon): ~15 s at 2^20 constraints on a
typical 16-core host, scaled linearly in N (the reference publishes no prover
numbers — BASELINE.md). Reported as baseline_seconds / our_seconds.

Sub-metrics (MSM points/sec, NTT time) are included under "extra".
"""

import json
import os
import sys
import time


def sync(out) -> None:
    """Force execution to finish. `jax.block_until_ready` is a no-op on the
    axon TPU-tunnel platform (async remote execution acks dispatch, not
    completion) — fetching one element is the only reliable barrier."""
    import jax
    import numpy as np

    for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "ravel"):
            np.asarray(jax.device_get(leaf.ravel()[:1]))


def main() -> None:
    k = int(os.environ.get("BENCH_LOG2", "16"))
    n = 1 << k

    import jax

    from ckb_zkp_tpu.bench_circuits import product_circuit_shape
    from ckb_zkp_tpu.host.pairing import get_curve
    from ckb_zkp_tpu.ops.field import device_field
    from ckb_zkp_tpu.ops.msm import device_group
    from ckb_zkp_tpu.schemes import groth16
    from ckb_zkp_tpu.schemes.groth16.prover import create_proof_from_shape
    from ckb_zkp_tpu.schemes.groth16.qap import QapMatrices

    curve = get_curve("bn254")
    p = curve.fr.modulus
    fr = device_field(curve.fr)
    backend = jax.default_backend()

    shape = product_circuit_shape(n, p)
    t0 = time.time()
    params = groth16.generate_parameters_from_shape(
        shape, curve, alpha=5, beta=7, gamma=11, delta=13, t=0xABCDEF0123456789
    )
    sync(params.a_query)
    setup_s = time.time() - t0

    qap = QapMatrices(shape, curve.fr)
    # warmup (compiles)
    t0 = time.time()
    proof = create_proof_from_shape(params, shape, 0, 0, qap=qap)
    warm_s = time.time() - t0
    # timed run
    t0 = time.time()
    proof = create_proof_from_shape(params, shape, 0, 0, qap=qap)
    prove_s = time.time() - t0

    pvk = groth16.prepare_verifying_key(curve, params.vk)
    t0 = time.time()
    ok = groth16.verify_proof(curve, pvk, proof, shape.input_assignment[1:])
    verify_s = time.time() - t0

    # MSM sub-benchmark: G1 MSM over the a_query points
    dg1 = device_group(curve, "g1")
    z_can = fr.from_mont(fr.encode(shape.full_assignment()))
    sync(dg1.msm(params.a_query, z_can))
    t0 = time.time()
    sync(dg1.msm(params.a_query, z_can))
    msm_s = time.time() - t0
    npoints = z_can.shape[0]

    # NTT sub-benchmark
    from ckb_zkp_tpu.ops.ntt import get_domain

    dom = get_domain(curve.fr, qap.m)
    x = fr.encode([3] * qap.m)
    sync(dom.ntt(x))
    t0 = time.time()
    sync(dom.ntt(x))
    ntt_s = time.time() - t0

    baseline_s = 15.0 * n / (1 << 20)  # estimated rust reference (see docstring)
    result = {
        "metric": f"groth16_prove_bn254_2^{k}",
        "value": round(prove_s * 1000.0, 3),
        "unit": "ms",
        "vs_baseline": round(baseline_s / prove_s, 3),
        "extra": {
            "backend": backend,
            "verify_ok": bool(ok),
            "constraints": n,
            "setup_s": round(setup_s, 3),
            "prove_warm_s": round(warm_s, 3),
            "verify_s": round(verify_s, 3),
            "msm_points_per_s": round(npoints / msm_s, 1),
            "msm_n": npoints,
            f"ntt_2^{qap.m.bit_length()-1}_ms": round(ntt_s * 1000.0, 3),
            "baseline_estimate_s": baseline_s,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
