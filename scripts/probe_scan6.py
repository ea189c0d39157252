"""MXU-reduction madd inside the g-major grid-carried scan kernels."""
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


def main():
    from ckb_zkp_tpu.host.pairing import get_curve
    from ckb_zkp_tpu.ops.msm import device_group
    from ckb_zkp_tpu.ops.rcb import rcb_group
    from ckb_zkp_tpu.ops.pallas_field import LANES, mxu_band_consts
    from ckb_zkp_tpu.ops.pallas_rcb import (
        _b3_key,
        _limbs_of,
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
    B = 32

    sync(jnp.add(jnp.ones((8, 128), jnp.uint32), 1))
    log(f"session up, N=2^{N.bit_length()-1}")

    class _FMxu(type(_F_for(1, *limbs, *b3))):
        """_FRcb with the MXU Montgomery reduce for mul (ext=1 only here)."""

        def __init__(self, base, m1, m2, rs1, rs2):
            super().__init__(base.ext, base.p, base.np, base.b3_small,
                             base.b3_limbs if base.b3_small is None else None)
            self.m1 = m1
            self.m2 = m2
            self.rs1 = rs1
            self.rs2 = rs2

        def mul(self, a, b):
            from ckb_zkp_tpu.ops.pallas_field import _mont_mul_rows_mxu

            return _mont_mul_rows_mxu(
                a, b, self.p, self.np, self.m1, self.m2, self.rs1, self.rs2
            )

    def make_gmajor(sb):
        G = N // B
        nsteps = G // (sb * LANES)
        xg = jnp.asarray(
            rng.integers(0, 1 << 16, (nsteps, B, Rp, sb, LANES), dtype=np.uint32)
        )
        yg = jnp.asarray(
            rng.integers(0, 1 << 16, (nsteps, B, Rp, sb, LANES), dtype=np.uint32)
        )
        fg = jnp.zeros((nsteps, B, sb, LANES), jnp.uint32)
        return xg, yg, fg, nsteps

    def _tot_kernel(Fbase, sb, use_mxu, rs1, rs2, m1r, m2r, xr, yr, fr_, tx, ty, tz, acc):
        b = pl.program_id(1)
        B_ = pl.num_programs(1)
        if use_mxu:
            F = _FMxu(Fbase, m1r[:], m2r[:], rs1, rs2)
        else:
            F = Fbase

        @pl.when(b == 0)
        def _():
            tile = fr_[0, 0]
            X, Y, Z = Fbase.identity_rows(tile)
            acc[0] = jnp.stack(X, axis=0)
            acc[1] = jnp.stack(Y, axis=0)
            acc[2] = jnp.stack(Z, axis=0)

        x_rows = _unpack_limb_rows([xr[0, 0, i] for i in range(Rp)])
        y_rows = _unpack_limb_rows([yr[0, 0, i] for i in range(Rp)])
        cur = ([acc[0, i] for i in range(R)], [acc[1, i] for i in range(R)],
               [acc[2, i] for i in range(R)])
        X, Y, Z = _rcb_madd_core(F, cur, (x_rows, y_rows), fr_[0, 0] != 0)
        acc[0] = jnp.stack(X, axis=0)
        acc[1] = jnp.stack(Y, axis=0)
        acc[2] = jnp.stack(Z, axis=0)

        @pl.when(b == B_ - 1)
        def _():
            tx[:] = acc[0]
            ty[:] = acc[1]
            tz[:] = acc[2]

    def tot_fn(sb, use_mxu):
        Fbase = _F_for(1, *limbs, *b3)
        m1np, m2np, rs1, rs2 = mxu_band_consts(limbs[0], limbs[1], sb)
        m1 = jnp.asarray(m1np)
        m2 = jnp.asarray(m2np)
        kern = functools.partial(_tot_kernel, Fbase, sb, use_mxu, rs1, rs2)

        @jax.jit
        def run(xg, yg, fg):
            nsteps = xg.shape[0]
            g128 = nsteps * sb
            tshp = jax.ShapeDtypeStruct((R, g128, LANES), jnp.uint32)
            xspec = pl.BlockSpec(
                (1, 1, Rp, sb, LANES), lambda g, b: (g, b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
            fspec = pl.BlockSpec(
                (1, 1, sb, LANES), lambda g, b: (g, b, 0, 0),
                memory_space=pltpu.VMEM,
            )
            tspec = pl.BlockSpec(
                (R, sb, LANES), lambda g, b: (0, g, 0), memory_space=pltpu.VMEM
            )
            m1spec = pl.BlockSpec(
                m1np.shape, lambda g, b: (0, 0), memory_space=pltpu.VMEM
            )
            m2spec = pl.BlockSpec(
                m2np.shape, lambda g, b: (0, 0), memory_space=pltpu.VMEM
            )
            params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
            return pl.pallas_call(
                kern, out_shape=(tshp,) * 3, grid=(nsteps, B),
                in_specs=[m1spec, m2spec, xspec, xspec, fspec],
                out_specs=(tspec,) * 3,
                scratch_shapes=[pltpu.VMEM((3, R, sb, LANES), jnp.uint32)],
                compiler_params=params,
            )(m1, m2, xg, yg, fg)

        return run

    for sb in (8, 32):
        xg, yg, fg, _ = make_gmajor(sb)
        bench(f"gmajor totals MXU sb={sb}", tot_fn(sb, True), (xg, yg, fg))

    log("done")


main()
