"""A/B the MXU Montgomery reduction against the VPU-only mul kernel.

- flat: one mul per element (may be HBM-bound) — current vs MXU
- chain4: 4 serial muls per element (compute-bound) — current vs MXU
- bit-exactness vs DeviceField.mul
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


def bench(name, fn, args, iters=6):
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
    log(f"  {name}: {dt*1e3:.3f} ms")
    return dt


def main():
    from ckb_zkp_tpu.host.pairing import get_curve
    from ckb_zkp_tpu.ops.field import device_field
    from ckb_zkp_tpu.ops.pallas_field import (
        LANES,
        _mont_mul_rows,
        _mont_mul_rows_mxu,
        mxu_band_consts,
    )

    curve = get_curve("bn254")
    df = device_field(curve.fq)
    L = df.L
    p_limbs = tuple(int(x) for x in df.p_limbs)
    np_limbs = tuple(int(x) for x in df.nprime_limbs)
    rng = np.random.default_rng(0)
    N = 1 << 20
    SB = 32

    sync(jnp.add(jnp.ones((8, 128), jnp.uint32), 1))
    log("session up")

    def make_kern(nmul, mxu):
        m1np, m2np, rs1, rs2 = mxu_band_consts(p_limbs, np_limbs, SB)

        def kern_vpu(a_ref, b_ref, o_ref):
            a = [a_ref[i] for i in range(L)]
            b = [b_ref[i] for i in range(L)]
            for _ in range(nmul):
                a = _mont_mul_rows(a, b, p_limbs, np_limbs)
            o_ref[:] = jnp.stack(a, axis=0)

        def kern_mxu(m1_ref, m2_ref, a_ref, b_ref, o_ref):
            m1 = m1_ref[:]
            m2 = m2_ref[:]
            a = [a_ref[i] for i in range(L)]
            b = [b_ref[i] for i in range(L)]
            for _ in range(nmul):
                a = _mont_mul_rows_mxu(a, b, p_limbs, np_limbs, m1, m2, rs1, rs2)
            o_ref[:] = jnp.stack(a, axis=0)

        spec = pl.BlockSpec((L, SB, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
        params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

        if not mxu:

            @jax.jit
            def run(a, b):
                return pl.pallas_call(
                    kern_vpu, out_shape=jax.ShapeDtypeStruct(a.shape, jnp.uint32),
                    grid=(a.shape[1] // SB,), in_specs=[spec, spec], out_specs=spec,
                    compiler_params=params,
                )(a, b)

            return run

        m1 = jnp.asarray(m1np)
        m2 = jnp.asarray(m2np)
        mspec1 = pl.BlockSpec(m1np.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        mspec2 = pl.BlockSpec(m2np.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

        @jax.jit
        def run(a, b):
            return pl.pallas_call(
                kern_mxu, out_shape=jax.ShapeDtypeStruct(a.shape, jnp.uint32),
                grid=(a.shape[1] // SB,),
                in_specs=[mspec1, mspec2, spec, spec], out_specs=spec,
                compiler_params=params,
            )(m1, m2, a, b)

        return run

    nck = SB * LANES
    xs = [int.from_bytes(rng.bytes(40), "little") % df.spec.modulus for _ in range(nck)]
    ys = [int.from_bytes(rng.bytes(40), "little") % df.spec.modulus for _ in range(nck)]
    A_small = df.encode(xs)
    B_small = df.encode(ys)
    At = jnp.asarray(np.asarray(A_small).T.reshape(L, -1, LANES))
    Bt = jnp.asarray(np.asarray(B_small).T.reshape(L, -1, LANES))

    # correctness: 1-mul MXU kernel vs DeviceField.mul (XLA path)
    f_mxu1 = make_kern(1, True)
    got = np.asarray(jax.device_get(f_mxu1(At, Bt))).reshape(L, -1).T
    want = np.asarray(jax.device_get(df.mul(A_small, B_small)))
    assert np.array_equal(got, want), "MXU reduce mismatch!"
    log("  MXU bit-exactness: OK")

    a = jnp.asarray(rng.integers(0, 1 << 16, (L, N // LANES, LANES), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 1 << 16, (L, N // LANES, LANES), dtype=np.uint32))

    for nmul, label in ((1, "flat"), (4, "chain4")):
        for mxu in (False, True):
            dt = bench(
                f"{label} {'mxu' if mxu else 'vpu'}",
                make_kern(nmul, mxu), (a, b),
            )
            log(f"    -> {N*nmul/dt/1e9:.2f} G mul/s")

    log("done")


main()
