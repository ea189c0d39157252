"""Scan-kernel variant timings at 2^21 (round 4): where do the ~150ms go?

Key round-4 diagnosis experiments, kernel-only (pre-tiled device data):
  a) current prefix_madd_packed B=32 sb=8 (fori_loop, W+T outputs)
  b) totals-only (no W writes), fori_loop vs python-unrolled
  c) unrolled prefix (static block indices for loads AND stores)
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(m):
    print(m, file=sys.stderr, flush=True)


def sync(x):
    for leaf in jax.tree.leaves(x):
        np.asarray(jax.device_get(leaf.ravel()[:1]))


def main():
    from ckb_zkp_tpu.host.pairing import get_curve
    from ckb_zkp_tpu.ops.msm import device_group
    from ckb_zkp_tpu.ops.rcb import rcb_group
    from ckb_zkp_tpu.ops.pallas_rcb import (
        LANES,
        _b3_key,
        _bspec,
        _fspec,
        _limbs_of,
        _rows,
        _scan_fn,
        _spec,
        _unpack_limb_rows,
        _F_for,
        _rcb_madd_core,
    )

    N = 1 << int(sys.argv[1] if len(sys.argv) > 1 else 21)
    curve = get_curve("bn254")
    dg = device_group(curve, "g1")
    rg = rcb_group(dg)
    limbs = _limbs_of(rg.cf)
    b3 = _b3_key(rg)
    rng = np.random.default_rng(0)
    R = 16
    Rp = 8

    sync(jnp.add(jnp.ones((8, 128), jnp.uint32), 1))
    log(f"session up, N=2^{N.bit_length()-1}")

    def bench(name, fn, args, iters=4):
        t0 = time.time()
        sync(fn(*args))
        log(f"  {name} compile+first: {time.time()-t0:.2f}s")
        t0 = time.time()
        sync(fn(*args))
        rtt = time.time() - t0
        outs = []
        t0 = time.time()
        for _ in range(iters):
            outs.append(fn(*args))
        sync(outs)
        dt = (time.time() - t0 - rtt) / iters
        log(f"  {name}: {dt*1e3:.2f} ms")
        return dt

    def make_tiles(B):
        G = N // B
        xb = jnp.asarray(
            rng.integers(0, 1 << 16, (B, Rp, G // LANES, LANES), dtype=np.uint32)
        )
        yb = jnp.asarray(
            rng.integers(0, 1 << 16, (B, Rp, G // LANES, LANES), dtype=np.uint32)
        )
        fb = jnp.zeros((B, G // LANES, LANES), jnp.uint32)
        return xb, yb, fb

    # a) current packed prefix kernel (baseline)
    xb32, yb32, fb32 = make_tiles(32)
    fn = _scan_fn("prefix_madd_packed", 1, 32, 8, *limbs, *b3)
    bench("prefix_madd_packed B=32 sb=8 (cur)", fn, (xb32, yb32, fb32))

    # b) totals-only kernels
    def _totals_kernel(F, B, unroll, xr, yr, fr_, tx, ty, tz):
        def body(b, acc):
            x_rows = _unpack_limb_rows(_rows(xr[b], Rp))
            y_rows = _unpack_limb_rows(_rows(yr[b], Rp))
            return _rcb_madd_core(F, acc, (x_rows, y_rows), fr_[b] != 0)

        tile = fr_[0]
        acc = F.identity_rows(tile)
        if unroll:
            for b in range(B):
                acc = body(b, acc)
        else:
            acc = jax.lax.fori_loop(0, B, body, acc)
        X, Y, Z = acc
        tx[:] = jnp.stack(X, axis=0)
        ty[:] = jnp.stack(Y, axis=0)
        tz[:] = jnp.stack(Z, axis=0)

    def totals_fn(B, sb, unroll):
        F = _F_for(1, *limbs, *b3)
        kern = functools.partial(_totals_kernel, F, B, unroll)

        @jax.jit
        def run(xb, yb, fb):
            g128 = xb.shape[2]
            tshp = jax.ShapeDtypeStruct((R, g128, LANES), jnp.uint32)
            params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
            return pl.pallas_call(
                kern,
                out_shape=(tshp,) * 3,
                grid=(g128 // sb,),
                in_specs=[_bspec(32, Rp, sb)] * 2 + [_fspec(32, sb)],
                out_specs=(_spec(R, sb),) * 3,
                compiler_params=params,
            )(xb, yb, fb)

        return run

    bench("totals B=32 sb=8 fori", totals_fn(32, 8, False), (xb32, yb32, fb32))
    bench("totals B=32 sb=32 fori", totals_fn(32, 32, False), (xb32, yb32, fb32))
    bench("totals B=32 sb=8 unroll", totals_fn(32, 8, True), (xb32, yb32, fb32))

    # c) unrolled prefix kernel (static loads AND stores)
    def _prefix_unroll_kernel(F, B, xr, yr, fr_, wx, wy, wz, tx, ty, tz):
        tile = fr_[0]
        acc = F.identity_rows(tile)
        for b in range(B):
            x_rows = _unpack_limb_rows(_rows(xr[b], Rp))
            y_rows = _unpack_limb_rows(_rows(yr[b], Rp))
            acc = _rcb_madd_core(F, acc, (x_rows, y_rows), fr_[b] != 0)
            wx[b] = jnp.stack(acc[0], axis=0)
            wy[b] = jnp.stack(acc[1], axis=0)
            wz[b] = jnp.stack(acc[2], axis=0)
        X, Y, Z = acc
        tx[:] = jnp.stack(X, axis=0)
        ty[:] = jnp.stack(Y, axis=0)
        tz[:] = jnp.stack(Z, axis=0)

    def prefix_unroll_fn(B, sb):
        F = _F_for(1, *limbs, *b3)
        kern = functools.partial(_prefix_unroll_kernel, F, B)

        @jax.jit
        def run(xb, yb, fb):
            g128 = xb.shape[2]
            tshp = jax.ShapeDtypeStruct((R, g128, LANES), jnp.uint32)
            wshp = jax.ShapeDtypeStruct((B, R, g128, LANES), jnp.uint32)
            params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
            return pl.pallas_call(
                kern,
                out_shape=(wshp,) * 3 + (tshp,) * 3,
                grid=(g128 // sb,),
                in_specs=[_bspec(B, Rp, sb)] * 2 + [_fspec(B, sb)],
                out_specs=(_bspec(B, R, sb),) * 3 + (_spec(R, sb),) * 3,
                compiler_params=params,
            )(xb, yb, fb)

        return run

    bench("prefix B=32 sb=8 unroll", prefix_unroll_fn(32, 8), (xb32, yb32, fb32))

    log("done")


main()
