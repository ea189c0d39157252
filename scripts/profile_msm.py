#!/usr/bin/env python
"""Break down MSM wall-clock at 2^K: digits, sort, gather, scan kernels.

Usage: python scripts/profile_msm.py [K]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def sync(out):
    for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "ravel"):
            np.asarray(jax.device_get(leaf.ravel()[:1]))


def timeit(fn, *args, reps=3):
    fn(*args)  # compile
    sync(fn(*args))
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.time() - t0) / reps


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n = 1 << k

    from ckb_zkp_tpu.host.pairing import get_curve
    from ckb_zkp_tpu.ops.msm import device_group
    from ckb_zkp_tpu.ops.pallas_ec import ec_block_totals_madd

    curve = get_curve("bn254")
    dg = device_group(curve, "g1")
    fq = dg.fq

    key = jax.random.PRNGKey(0)
    # synthetic (valid-shaped, not on-curve — fine for timing)
    X = jax.random.randint(key, (n, fq.L), 0, 1 << 16, dtype=jnp.uint32)
    Y = jax.random.randint(key, (n, fq.L), 0, 1 << 16, dtype=jnp.uint32)
    infm = jnp.zeros((n,), dtype=bool)
    scalars = jax.random.randint(key, (n, dg.fr.L), 0, 1 << 16, dtype=jnp.uint32)

    # full MSM
    Z = fq.ones((n,))
    t_full = timeit(dg._msm_jit, (X, Y, Z), scalars, reps=1)
    print(f"full msm 2^{k}: {t_full*1e3:.1f} ms")

    # digits for one window
    dig = jax.jit(lambda s: dg._digits(s, 3))
    t = timeit(dig, scalars)
    print(f"digits (x32 windows): {t*1e3:.2f} ms -> {32*t*1e3:.1f} ms")

    digits = dig(scalars)

    # argsort
    srt = jax.jit(lambda d: jnp.argsort(d))
    t = timeit(srt, digits)
    print(f"argsort (x32): {t*1e3:.2f} ms -> {32*t*1e3:.1f} ms")

    order = srt(digits)

    # gather X and Y
    gat = jax.jit(lambda X, o: (X[o], Y[o]))
    t = timeit(gat, X, order)
    print(f"gather X+Y (x32): {t*1e3:.2f} ms -> {32*t*1e3:.1f} ms")

    # searchsorted
    ss = jax.jit(
        lambda d: jnp.searchsorted(
            d.astype(jnp.int32)[order], jnp.arange(dg.nb, dtype=jnp.int32), side="right"
        )
    )
    t = timeit(ss, digits)
    print(f"searchsorted (x32): {t*1e3:.2f} ms -> {32*t*1e3:.1f} ms")

    # block totals madd (the O(N) EC work)
    bt = jax.jit(lambda X, Y, m: ec_block_totals_madd(fq, (X, Y, m), 32))
    t = timeit(bt, X, Y, infm)
    print(f"block_totals_madd B=32 (x32): {t*1e3:.2f} ms -> {32*t*1e3:.1f} ms")

    # one whole window_sum
    ws = jax.jit(lambda P, d: dg._window_sum(P, d))
    t = timeit(ws, (X, Y, infm), digits)
    print(f"window_sum (x32): {t*1e3:.2f} ms -> {32*t*1e3:.1f} ms")


if __name__ == "__main__":
    main()
