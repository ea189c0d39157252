"""Scaling harness: sharded MSM / NTT / Groth16 prover step vs mesh size.

The reference has no distributed backend (rayon only, SURVEY.md §2.3); the
TPU framework scales over a `jax.sharding.Mesh`. Real multi-chip hardware is
not reachable from this box, so this harness runs the SAME sharded code
(parallel/msm.py, parallel/ntt.py) on a virtual CPU mesh and reports
wall-clock at 1/2/4/8 devices. On a real pod slice the identical code runs
with ICI collectives — the harness takes the device list jax exposes.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/scaling_bench.py [--log2 N] [--devices 1,2,4,8]

Prints one JSON line per (kernel, n_devices).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "--tpu" not in sys.argv:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.setdefault(
        "XLA_FLAGS",
        (os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8").strip(),
    )

import jax  # noqa: E402

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def sync(out):
    for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "ravel"):
            np.asarray(jax.device_get(leaf.ravel()[:1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log2", type=int, default=14)
    ap.add_argument("--devices", type=str, default="1,2,4,8")
    ap.add_argument("--tpu", action="store_true", help="use default backend")
    args = ap.parse_args()

    from ckb_zkp_tpu.host.pairing import get_curve
    from ckb_zkp_tpu.ops.field import device_field
    from ckb_zkp_tpu.ops.msm import device_group
    from ckb_zkp_tpu.parallel import ShardedDomain, make_mesh, msm_sharded

    curve = get_curve("bn254")
    fr = device_field(curve.fr)
    dg = device_group(curve, "g1")
    n = 1 << args.log2

    rng = np.random.default_rng(5)
    # synthetic points: replicate a few real points (cheap to build; the
    # kernel cost is data-independent)
    base = dg.encode_points(
        [curve.g1.mul(curve.g1_gen, i + 2) for i in range(64)]
    )
    reps = n // 64
    P = jax.tree.map(lambda c: np.tile(np.asarray(c), (reps,) + (1,) * (c.ndim - 1)), base)
    scalars = np.asarray(
        dg.encode_scalars([int(x) for x in rng.integers(1, 1 << 62, size=n)])
    )

    coeffs = fr.encode([int(x) for x in rng.integers(0, 1 << 62, size=n)])

    results = []
    for d in [int(x) for x in args.devices.split(",")]:
        if d > len(jax.devices()):
            continue
        mesh = make_mesh(d)

        # ---- sharded MSM ----
        out = msm_sharded(dg, P, scalars, mesh)
        sync(out)  # compile + first run
        t0 = time.time()
        sync(msm_sharded(dg, P, scalars, mesh))
        dt = time.time() - t0
        results.append(
            {"kernel": f"msm_2^{args.log2}", "n_devices": d,
             "wall_s": round(dt, 4), "points_per_s": round(n / dt, 1)}
        )
        print(json.dumps(results[-1]), flush=True)

        # ---- sharded four-step NTT (forward + inverse round trip) ----
        sd = ShardedDomain(curve.fr, n, mesh)
        out = sd.ifft_from_t(sd.fft_t(coeffs))
        sync(out)
        t0 = time.time()
        sync(sd.ifft_from_t(sd.fft_t(coeffs)))
        dt = time.time() - t0
        results.append(
            {"kernel": f"ntt_roundtrip_2^{args.log2}", "n_devices": d,
             "wall_s": round(dt, 4)}
        )
        print(json.dumps(results[-1]), flush=True)

    # scaling efficiency summary
    by_kernel = {}
    for r in results:
        by_kernel.setdefault(r["kernel"], []).append(r)
    for kernel, rows in by_kernel.items():
        rows.sort(key=lambda r: r["n_devices"])
        base_t = rows[0]["wall_s"] * rows[0]["n_devices"]
        for r in rows:
            r_eff = base_t / (r["wall_s"] * r["n_devices"])
            print(json.dumps({"kernel": kernel, "n_devices": r["n_devices"],
                              "scaling_efficiency": round(r_eff, 3)}), flush=True)


if __name__ == "__main__":
    main()
