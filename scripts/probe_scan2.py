"""Round-4 scan ILP experiments: does interleaving k independent chains
recover the mul-kernel's ~8 vreg-ops/cycle?

  - chainmul k=1/2/4: B serial mont-muls per chain, k chains interleaved
  - totals madd k=1/2/4: the real madd accumulation, k chains interleaved
  - prefix madd k=4 with PACKED W output (the production candidate)
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
        _bspec,
        _fspec,
        _limbs_of,
        _rows,
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
    B = 32

    sync(jnp.add(jnp.ones((8, 128), jnp.uint32), 1))
    log(f"session up, N=2^{N.bit_length()-1}")

    G = N // B

    def make_tiles():
        xb = jnp.asarray(
            rng.integers(0, 1 << 16, (B, Rp, G // LANES, LANES), dtype=np.uint32)
        )
        yb = jnp.asarray(
            rng.integers(0, 1 << 16, (B, Rp, G // LANES, LANES), dtype=np.uint32)
        )
        fb = jnp.zeros((B, G // LANES, LANES), jnp.uint32)
        return xb, yb, fb

    xb, yb, fb = make_tiles()

    # ---- chained pure mont muls, k chains interleaved ----
    def _chainmul_kernel(k, p_limbs, np_limbs, xr, tx):
        # xr: (B, R, k*8, 128); treat sublane slices as independent chains
        accs = [[xr[0][i][j * 8 : (j + 1) * 8] for i in range(R)] for j in range(k)]

        def body(b, accs):
            out = []
            for j in range(k):
                leaf = [xr[b][i][j * 8 : (j + 1) * 8] for i in range(R)]
                out.append(_mont_mul_rows(accs[j], leaf, p_limbs, np_limbs))
            return out

        accs = jax.lax.fori_loop(0, B, body, accs)
        for j in range(k):
            tx[:, j * 8 : (j + 1) * 8] = jnp.stack(accs[j], axis=0)

    def chainmul_fn(k):
        kern = functools.partial(_chainmul_kernel, k, *limbs)

        @jax.jit
        def run(x):  # (B, R, G/128, 128) unpacked
            g128 = x.shape[2]
            sb = k * 8
            tshp = jax.ShapeDtypeStruct((R, g128, LANES), jnp.uint32)
            params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
            return pl.pallas_call(
                kern, out_shape=tshp, grid=(g128 // sb,),
                in_specs=[_bspec(B, R, sb)], out_specs=_spec(R, sb),
                compiler_params=params,
            )(x)

        return run

    xfull = jnp.asarray(
        rng.integers(0, 1 << 16, (B, R, G // LANES, LANES), dtype=np.uint32)
    )
    for k in (1, 2, 4):
        dt = bench(f"chainmul k={k}", chainmul_fn(k), (xfull,))
        log(f"    -> {N/dt/1e9:.2f} G serial-chained mul/s")

    # ---- totals madd with k interleaved chains ----
    def _totals_k_kernel(F, k, xr, yr, fr_, tx, ty, tz):
        def sl(t, j):
            return t[j * 8 : (j + 1) * 8]

        def body(b, accs):
            out = []
            xrb, yrb, frb = xr[b], yr[b], fr_[b]
            for j in range(k):
                x_rows = _unpack_limb_rows([sl(xrb[i], j) for i in range(Rp)])
                y_rows = _unpack_limb_rows([sl(yrb[i], j) for i in range(Rp)])
                out.append(
                    _rcb_madd_core(F, accs[j], (x_rows, y_rows), sl(frb, j) != 0)
                )
            return out

        tile = fr_[0][0:8]
        accs = jax.lax.fori_loop(
            0, B, body, [F.identity_rows(tile) for _ in range(k)]
        )
        for j in range(k):
            tx[:, j * 8 : (j + 1) * 8] = jnp.stack(accs[j][0], axis=0)
            ty[:, j * 8 : (j + 1) * 8] = jnp.stack(accs[j][1], axis=0)
            tz[:, j * 8 : (j + 1) * 8] = jnp.stack(accs[j][2], axis=0)

    def totals_k_fn(k):
        F = _F_for(1, *limbs, *b3)
        kern = functools.partial(_totals_k_kernel, F, k)
        sb = k * 8

        @jax.jit
        def run(xb, yb, fb):
            g128 = xb.shape[2]
            tshp = jax.ShapeDtypeStruct((R, g128, LANES), jnp.uint32)
            params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
            return pl.pallas_call(
                kern, out_shape=(tshp,) * 3, grid=(g128 // sb,),
                in_specs=[_bspec(B, Rp, sb)] * 2 + [_fspec(B, sb)],
                out_specs=(_spec(R, sb),) * 3,
                compiler_params=params,
            )(xb, yb, fb)

        return run

    for k in (2, 4):
        bench(f"totals madd k={k}", totals_k_fn(k), (xb, yb, fb))

    # ---- prefix madd, k chains, PACKED W output ----
    def _prefix_k_packed_kernel(F, k, xr, yr, fr_, wx, wy, wz, tx, ty, tz):
        def sl(t, j):
            return t[j * 8 : (j + 1) * 8]

        def pack(rows):
            return [rows[2 * i] | (rows[2 * i + 1] << 16) for i in range(Rp)]

        def body(b, accs):
            out = []
            xrb, yrb, frb = xr[b], yr[b], fr_[b]
            for j in range(k):
                x_rows = _unpack_limb_rows([sl(xrb[i], j) for i in range(Rp)])
                y_rows = _unpack_limb_rows([sl(yrb[i], j) for i in range(Rp)])
                nxt = _rcb_madd_core(F, accs[j], (x_rows, y_rows), sl(frb, j) != 0)
                out.append(nxt)
                wx[b, :, j * 8 : (j + 1) * 8] = jnp.stack(pack(nxt[0]), axis=0)
                wy[b, :, j * 8 : (j + 1) * 8] = jnp.stack(pack(nxt[1]), axis=0)
                wz[b, :, j * 8 : (j + 1) * 8] = jnp.stack(pack(nxt[2]), axis=0)
            return out

        tile = fr_[0][0:8]
        accs = jax.lax.fori_loop(
            0, B, body, [F.identity_rows(tile) for _ in range(k)]
        )
        for j in range(k):
            tx[:, j * 8 : (j + 1) * 8] = jnp.stack(accs[j][0], axis=0)
            ty[:, j * 8 : (j + 1) * 8] = jnp.stack(accs[j][1], axis=0)
            tz[:, j * 8 : (j + 1) * 8] = jnp.stack(accs[j][2], axis=0)

    def prefix_k_fn(k):
        F = _F_for(1, *limbs, *b3)
        kern = functools.partial(_prefix_k_packed_kernel, F, k)
        sb = k * 8

        @jax.jit
        def run(xb, yb, fb):
            g128 = xb.shape[2]
            tshp = jax.ShapeDtypeStruct((R, g128, LANES), jnp.uint32)
            wshp = jax.ShapeDtypeStruct((B, Rp, g128, LANES), jnp.uint32)
            params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
            return pl.pallas_call(
                kern, out_shape=(wshp,) * 3 + (tshp,) * 3, grid=(g128 // sb,),
                in_specs=[_bspec(B, Rp, sb)] * 2 + [_fspec(B, sb)],
                out_specs=(_bspec(B, Rp, sb),) * 3 + (_spec(R, sb),) * 3,
                compiler_params=params,
            )(xb, yb, fb)

        return run

    for k in (4,):
        bench(f"prefix madd k={k} packedW", prefix_k_fn(k), (xb, yb, fb))

    log("done")


main()
