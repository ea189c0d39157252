"""Grid-carried scan: B-loop in the Pallas GRID (small kernel bodies,
accumulator in persistent VMEM scratch) instead of an in-kernel fori_loop.

Variants at 2^21:
  - grid totals madd sb=8/32
  - grid prefix madd sb=8/32 with packed W output
  - grid chainmul (pure mul) for the structural floor
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
    from ckb_zkp_tpu.ops.pallas_field import _mont_mul_rows, LANES
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
    G = N // B

    sync(jnp.add(jnp.ones((8, 128), jnp.uint32), 1))
    log(f"session up, N=2^{N.bit_length()-1}")

    xb = jnp.asarray(
        rng.integers(0, 1 << 16, (B, Rp, G // LANES, LANES), dtype=np.uint32)
    )
    yb = jnp.asarray(
        rng.integers(0, 1 << 16, (B, Rp, G // LANES, LANES), dtype=np.uint32)
    )
    fb = jnp.zeros((B, G // LANES, LANES), jnp.uint32)

    F = _F_for(1, *limbs, *b3)

    # ---- grid-carried totals madd ----
    def _gtot_kernel(sb, xr, yr, fr_, tx, ty, tz, acc):
        b = pl.program_id(1)
        B_ = pl.num_programs(1)

        @pl.when(b == 0)
        def _():
            tile = fr_[0]
            X, Y, Z = F.identity_rows(tile)
            acc[0] = jnp.stack(X, axis=0)
            acc[1] = jnp.stack(Y, axis=0)
            acc[2] = jnp.stack(Z, axis=0)

        x_rows = _unpack_limb_rows([xr[0, i] for i in range(Rp)])
        y_rows = _unpack_limb_rows([yr[0, i] for i in range(Rp)])
        cur = ([acc[0, i] for i in range(R)], [acc[1, i] for i in range(R)],
               [acc[2, i] for i in range(R)])
        X, Y, Z = _rcb_madd_core(F, cur, (x_rows, y_rows), fr_[0] != 0)
        acc[0] = jnp.stack(X, axis=0)
        acc[1] = jnp.stack(Y, axis=0)
        acc[2] = jnp.stack(Z, axis=0)

        @pl.when(b == B_ - 1)
        def _():
            tx[:] = acc[0]
            ty[:] = acc[1]
            tz[:] = acc[2]

    def gtot_fn(sb):
        kern = functools.partial(_gtot_kernel, sb)

        @jax.jit
        def run(xb, yb, fb):
            g128 = xb.shape[2]
            tshp = jax.ShapeDtypeStruct((R, g128, LANES), jnp.uint32)
            xspec = pl.BlockSpec(
                (1, Rp, sb, LANES), lambda g, b: (b, 0, g, 0),
                memory_space=pltpu.VMEM,
            )
            fspec = pl.BlockSpec(
                (1, sb, LANES), lambda g, b: (b, g, 0), memory_space=pltpu.VMEM
            )
            tspec = pl.BlockSpec(
                (R, sb, LANES), lambda g, b: (0, g, 0), memory_space=pltpu.VMEM
            )
            return pl.pallas_call(
                kern,
                out_shape=(tshp,) * 3,
                grid=(g128 // sb, B),
                in_specs=[xspec, xspec, fspec],
                out_specs=(tspec,) * 3,
                scratch_shapes=[pltpu.VMEM((3, R, sb, LANES), jnp.uint32)],
            )(xb, yb, fb)

        return run

    for sb in (8, 32):
        bench(f"grid totals sb={sb}", gtot_fn(sb), (xb, yb, fb))

    # ---- grid-carried prefix madd with packed W ----
    def _gpref_kernel(sb, xr, yr, fr_, wx, wy, wz, tx, ty, tz, acc):
        b = pl.program_id(1)
        B_ = pl.num_programs(1)

        @pl.when(b == 0)
        def _():
            tile = fr_[0]
            X, Y, Z = F.identity_rows(tile)
            acc[0] = jnp.stack(X, axis=0)
            acc[1] = jnp.stack(Y, axis=0)
            acc[2] = jnp.stack(Z, axis=0)

        x_rows = _unpack_limb_rows([xr[0, i] for i in range(Rp)])
        y_rows = _unpack_limb_rows([yr[0, i] for i in range(Rp)])
        cur = ([acc[0, i] for i in range(R)], [acc[1, i] for i in range(R)],
               [acc[2, i] for i in range(R)])
        X, Y, Z = _rcb_madd_core(F, cur, (x_rows, y_rows), fr_[0] != 0)
        acc[0] = jnp.stack(X, axis=0)
        acc[1] = jnp.stack(Y, axis=0)
        acc[2] = jnp.stack(Z, axis=0)

        def pack(rows):
            return [rows[2 * i] | (rows[2 * i + 1] << 16) for i in range(Rp)]

        wx[0] = jnp.stack(pack(X), axis=0)
        wy[0] = jnp.stack(pack(Y), axis=0)
        wz[0] = jnp.stack(pack(Z), axis=0)

        @pl.when(b == B_ - 1)
        def _():
            tx[:] = acc[0]
            ty[:] = acc[1]
            tz[:] = acc[2]

    def gpref_fn(sb):
        kern = functools.partial(_gpref_kernel, sb)

        @jax.jit
        def run(xb, yb, fb):
            g128 = xb.shape[2]
            tshp = jax.ShapeDtypeStruct((R, g128, LANES), jnp.uint32)
            wshp = jax.ShapeDtypeStruct((B, Rp, g128, LANES), jnp.uint32)
            xspec = pl.BlockSpec(
                (1, Rp, sb, LANES), lambda g, b: (b, 0, g, 0),
                memory_space=pltpu.VMEM,
            )
            fspec = pl.BlockSpec(
                (1, sb, LANES), lambda g, b: (b, g, 0), memory_space=pltpu.VMEM
            )
            tspec = pl.BlockSpec(
                (R, sb, LANES), lambda g, b: (0, g, 0), memory_space=pltpu.VMEM
            )
            return pl.pallas_call(
                kern,
                out_shape=(wshp,) * 3 + (tshp,) * 3,
                grid=(g128 // sb, B),
                in_specs=[xspec, xspec, fspec],
                out_specs=(xspec,) * 3 + (tspec,) * 3,
                scratch_shapes=[pltpu.VMEM((3, R, sb, LANES), jnp.uint32)],
            )(xb, yb, fb)

        return run

    for sb in (8, 32):
        bench(f"grid prefix packedW sb={sb}", gpref_fn(sb), (xb, yb, fb))

    log("done")


main()
