"""MSM v2 (RCB projective) on the real TPU: correctness vs host oracle,
then timings at the bench shapes (2^17 and 2^21 points, G1/G2, fixed-base).

Compiles fresh shapes through the tunnel (minutes each, cached after).
Stages are ordered so a timeout still leaves the correctness verdict.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def log(m):
    print(m, file=sys.stderr, flush=True)


def sync(x):
    for leaf in jax.tree.leaves(x):
        if hasattr(leaf, "ravel"):
            np.asarray(jax.device_get(leaf.ravel()[:1]))


def main():
    from ckb_zkp_tpu.host.pairing import get_curve
    from ckb_zkp_tpu.ops.msm import device_group

    curve = get_curve("bn254")
    rng = np.random.default_rng(11)
    r = curve.fr.modulus

    t0 = time.time()
    sync(jnp.add(jnp.ones((8, 128), jnp.uint32), 1))
    log(f"session init: {time.time()-t0:.1f}s")

    # ---- correctness: device MSM vs host oracle ----
    for group, ncheck in (("g1", 1 << 13), ("g2", 1 << 10)):
        dg = device_group(curve, group)
        dg.small_host_threshold = 0
        host = dg.host_group
        gen = curve.g1_gen if group == "g1" else curve.g2_gen
        base_scalars = [int(x) for x in rng.integers(1, 1 << 62, ncheck)]
        pts = host.fixed_base_mul_many(gen, base_scalars)
        pts[7] = host.infinity
        scalars = [int(x) % r for x in rng.integers(0, 1 << 63, ncheck)]
        scalars[3] = 0
        P = dg.encode_points(pts)
        s_can = dg.encode_scalars(scalars)
        t0 = time.time()
        got = dg.decode_point(dg.msm(P, s_can))
        log(f"{group} msm 2^{ncheck.bit_length()-1} (compile+exec): {time.time()-t0:.1f}s")
        want = host.msm(pts, scalars)
        ok = got == want
        log(f"{group} CORRECT: {ok}")
        if not ok:
            log(f"  got  {got}")
            log(f"  want {want}")
            return

    # ---- timing at bench shapes ----
    for group, ks in (("g1", (17, 21)), ("g2", (17, 21))):
        dg = device_group(curve, group)
        fqL = dg.fq.L
        for k in ks:
            n = 1 << k
            if group == "g1":
                X = jnp.asarray(rng.integers(0, 1 << 16, (n, fqL), dtype=np.uint32))
                Y = jnp.asarray(rng.integers(0, 1 << 16, (n, fqL), dtype=np.uint32))
                Z = dg.fq.ones((n,))
            else:
                X = jnp.asarray(rng.integers(0, 1 << 16, (n, 2, fqL), dtype=np.uint32))
                Y = jnp.asarray(rng.integers(0, 1 << 16, (n, 2, fqL), dtype=np.uint32))
                Z = dg.cf.ones((n,))
            scal = jnp.asarray(rng.integers(0, 1 << 16, (n, dg.fr.L), dtype=np.uint32))
            t0 = time.time()
            sync(dg._msm_jit((X, Y, Z), scal))
            log(f"{group} msm 2^{k} (compile+exec): {time.time()-t0:.1f}s")
            t0 = time.time()
            sync(dg._msm_jit((X, Y, Z), scal))
            dt = time.time() - t0
            log(f"{group} msm 2^{k} warm: {dt*1e3:.0f} ms  ({n/dt/1e6:.2f} M pts/s)")

    # ---- fixed-base at bench shapes ----
    dg1 = device_group(curve, "g1")
    t0 = time.time()
    tb = dg1.fixed_base(curve.g1_gen)
    _ = tb.table
    log(f"g1 table: {time.time()-t0:.1f}s")
    for k in (17, 21):
        n = 1 << k
        scal = np.asarray(
            rng.integers(0, 1 << 16, (n, dg1.fr.L), dtype=np.uint32)
        )
        t0 = time.time()
        sync(dg1.fixed_base_msm(tb, scal, pad_output=True))
        log(f"g1 fixed-base 2^{k} (compile+exec): {time.time()-t0:.1f}s")
        t0 = time.time()
        sync(dg1.fixed_base_msm(tb, scal, pad_output=True))
        dt = time.time() - t0
        log(f"g1 fixed-base 2^{k} warm: {dt*1e3:.0f} ms ({n/dt/1e6:.2f} M/s)")

    dg2 = device_group(curve, "g2")
    t0 = time.time()
    tb2 = dg2.fixed_base(curve.g2_gen)
    _ = tb2.table
    log(f"g2 table: {time.time()-t0:.1f}s")
    for k in (17,):
        n = 1 << k
        scal = np.asarray(
            rng.integers(0, 1 << 16, (n, dg2.fr.L), dtype=np.uint32)
        )
        t0 = time.time()
        sync(dg2.fixed_base_msm(tb2, scal, pad_output=True))
        log(f"g2 fixed-base 2^{k} (compile+exec): {time.time()-t0:.1f}s")
        t0 = time.time()
        sync(dg2.fixed_base_msm(tb2, scal, pad_output=True))
        dt = time.time() - t0
        log(f"g2 fixed-base 2^{k} warm: {dt*1e3:.0f} ms ({n/dt/1e6:.2f} M/s)")

    log("done")


main()
