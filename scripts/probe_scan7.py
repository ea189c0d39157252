"""TRUE (chained, RTT-subtracted) timings of the scan-kernel variants.

Chaining: the prefix kernel's packed W output has the input's shape, so W
feeds back as the next input. Totals chain via a 1-element XLA dependency.
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
    from ckb_zkp_tpu.ops.pallas_field import LANES, mxu_band_consts
    from ckb_zkp_tpu.ops.pallas_rcb import (
        _b3_key,
        _limbs_of,
        _scan_fn,
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
    R = 16
    Rp = 8
    B = 32
    G = N // B

    sync(jnp.add(jnp.ones((8, 128), jnp.uint32), 1))
    log(f"session up, N=2^{N.bit_length()-1}")

    mk = jax.jit(
        lambda k, s: jax.random.bits(k, s, jnp.uint32) & jnp.uint32(0xFFFF),
        static_argnums=1,
    )
    xb = mk(jax.random.PRNGKey(0), (B, Rp, G // LANES, LANES))
    yb = mk(jax.random.PRNGKey(1), (B, Rp, G // LANES, LANES))
    fb = jax.jit(lambda: jnp.zeros((B, G // LANES, LANES), jnp.uint32))()
    sync(xb), sync(yb), sync(fb)

    def chain_bench(name, step, x0, iters=10):
        """step: x -> x-like (data-dependent)."""
        t0 = time.time()
        sync(step(x0))
        log(f"  {name} compile+first: {time.time()-t0:.2f}s")
        t0 = time.time()
        sync(step(x0))
        rtt = time.time() - t0
        v = x0
        t0 = time.time()
        for _ in range(iters):
            v = step(v)
        sync(v)
        dt = (time.time() - t0 - rtt) / iters
        log(f"  {name}: {dt*1e3:.2f} ms")
        return dt

    # 1. current production prefix kernel (chained via W)
    fn_cur = _scan_fn("prefix_madd_packed", 1, B, 8, *limbs, *b3)

    @jax.jit
    def step_cur(x):
        wx, wy, wz, tx, ty, tz = fn_cur(x, yb, fb)
        return wx

    chain_bench("prefix_madd_packed cur sb=8", step_cur, xb)

    # 2. totals-only (fori) via tiny XLA dependency
    def _totals_kernel(F, xr, yr, fr_, tx, ty, tz):
        def body(b, acc):
            x_rows = _unpack_limb_rows([xr[b, i] for i in range(Rp)])
            y_rows = _unpack_limb_rows([yr[b, i] for i in range(Rp)])
            return _rcb_madd_core(F, acc, (x_rows, y_rows), fr_[b] != 0)

        tile = fr_[0]
        X, Y, Z = jax.lax.fori_loop(0, B, body, F.identity_rows(tile))
        tx[:] = jnp.stack(X, axis=0)
        ty[:] = jnp.stack(Y, axis=0)
        tz[:] = jnp.stack(Z, axis=0)

    def totals_fn(sb):
        F = _F_for(1, *limbs, *b3)
        kern = functools.partial(_totals_kernel, F)

        @jax.jit
        def run(xb_):
            g128 = xb_.shape[2]
            tshp = jax.ShapeDtypeStruct((R, g128, LANES), jnp.uint32)
            xspec = pl.BlockSpec(
                (B, Rp, sb, LANES), lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM
            )
            fspec = pl.BlockSpec(
                (B, sb, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            )
            tspec = pl.BlockSpec(
                (R, sb, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            )
            params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
            tx, ty, tz = pl.pallas_call(
                kern, out_shape=(tshp,) * 3, grid=(g128 // sb,),
                in_specs=[xspec, xspec, fspec], out_specs=(tspec,) * 3,
                compiler_params=params,
            )(xb_, yb, fb)
            return xb_ ^ tx[0, 0, 0]  # tiny dependency, keeps shape

        return run

    chain_bench("totals fori sb=8", totals_fn(8), xb)
    chain_bench("totals fori sb=32", totals_fn(32), xb)

    # 3. MXU totals
    class _FMxu(type(_F_for(1, *limbs, *b3))):
        def __init__(self, base, m1, m2, rs1, rs2):
            super().__init__(
                base.ext, base.p, base.np, base.b3_small,
                base.b3_limbs if base.b3_small is None else None,
            )
            self.m1, self.m2, self.rs1, self.rs2 = m1, m2, rs1, rs2

        def mul(self, a, b):
            from ckb_zkp_tpu.ops.pallas_field import _mont_mul_rows_mxu

            return _mont_mul_rows_mxu(
                a, b, self.p, self.np, self.m1, self.m2, self.rs1, self.rs2
            )

    def totals_mxu_fn(sb):
        Fbase = _F_for(1, *limbs, *b3)
        m1np, m2np, rs1, rs2 = mxu_band_consts(limbs[0], limbs[1], sb)
        m1a, m2a = jnp.asarray(m1np), jnp.asarray(m2np)

        def kern(m1r, m2r, xr, yr, fr_, tx, ty, tz):
            F = _FMxu(Fbase, m1r[:], m2r[:], rs1, rs2)
            _totals_kernel(F, xr, yr, fr_, tx, ty, tz)

        @jax.jit
        def run(xb_):
            g128 = xb_.shape[2]
            tshp = jax.ShapeDtypeStruct((R, g128, LANES), jnp.uint32)
            xspec = pl.BlockSpec(
                (B, Rp, sb, LANES), lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM
            )
            fspec = pl.BlockSpec(
                (B, sb, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            )
            tspec = pl.BlockSpec(
                (R, sb, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            )
            m1spec = pl.BlockSpec(m1np.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            m2spec = pl.BlockSpec(m2np.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
            tx, ty, tz = pl.pallas_call(
                kern, out_shape=(tshp,) * 3, grid=(g128 // sb,),
                in_specs=[m1spec, m2spec, xspec, xspec, fspec],
                out_specs=(tspec,) * 3,
                compiler_params=params,
            )(m1a, m2a, xb_, yb, fb)
            return xb_ ^ tx[0, 0, 0]

        return run

    chain_bench("totals MXU sb=8", totals_mxu_fn(8), xb)
    chain_bench("totals MXU sb=32", totals_mxu_fn(32), xb)

    log("done")


main()
