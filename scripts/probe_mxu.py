"""Microbenchmarks for the MXU-Montgomery-reduction design (round 4).

1. VPU op costs in a Pallas kernel: u32 mul vs add chains.
2. mont_mul_tiles current throughput.
3. int8 MXU matmul (the reduction band-matmul shape) in-kernel.
"""
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


def timed_chain(name, jfn, x, iters=8):
    t0 = time.time()
    sync(jfn(x))
    log(f"  {name} compile+first: {time.time()-t0:.2f}s")
    t0 = time.time()
    sync(jfn(x))
    rtt = time.time() - t0
    v = x
    t0 = time.time()
    for _ in range(iters):
        v = jfn(v)
    sync(v)
    dt = (time.time() - t0 - rtt) / iters
    log(f"  {name}: {dt*1e3:.3f} ms")
    return dt


SB = 8
LANES = 128
GRID = 256  # tiles per launch
K_OPS = 512  # ops per element per launch


def vpu_kernel(op, x_ref, o_ref):
    a = x_ref[0]
    b = x_ref[1]
    for i in range(K_OPS):
        if op == "mul":
            a = a * b + jnp.uint32(i)
        elif op == "add":
            a = a + b + jnp.uint32(i)
        elif op == "shift":
            a = (a >> 16) + b + jnp.uint32(i)
        elif op == "mulmask":
            p = a * b
            a = (p & jnp.uint32(0xFFFF)) + (p >> 16) + jnp.uint32(i)
    o_ref[0] = a
    o_ref[1] = b


def make_vpu(op):
    import functools

    kern = functools.partial(vpu_kernel, op)

    @jax.jit
    def run(x):  # (2, GRID*SB, 128)
        spec = pl.BlockSpec((2, SB, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint32),
            grid=(x.shape[1] // SB,), in_specs=[spec], out_specs=spec,
        )(x)

    return run


def mxu_kernel(n_mm, m_ref, x_ref, o_ref):
    # x: (32, SB, 128) u32 byte-planes; do n_mm band matmuls like the reduction
    M2d = m_ref[:]
    t = x_ref[:].astype(jnp.int32)
    acc = None
    for i in range(n_mm):
        tb = (t & 0xFF) - 128
        t8 = tb.astype(jnp.int8).reshape(32 * SB, LANES)
        out = jax.lax.dot_general(
            M2d, t8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )  # (256, 128)
        o3 = out.reshape(32, SB, LANES)
        corr = jnp.sum(t & 0xFF, axis=(0, 1), keepdims=True)  # (1,1,128)
        o3 = o3 + corr + jnp.int32(i)
        acc = o3 if acc is None else acc + o3
        t = jnp.abs(acc) & 0xFFFF
    o_ref[:] = t.astype(jnp.uint32)


def make_mxu(n_mm):
    import functools

    rng = np.random.default_rng(1)
    M2d = jnp.asarray(
        rng.integers(-128, 128, (32 * SB, 32 * SB), dtype=np.int8)
    )
    kern = functools.partial(mxu_kernel, n_mm)

    @jax.jit
    def run(x):  # (32, GRID*SB, 128)
        spec = pl.BlockSpec(
            (32, SB, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )
        mspec = pl.BlockSpec(
            (32 * SB, 32 * SB), lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct(x.shape, jnp.uint32),
            grid=(x.shape[1] // SB,), in_specs=[mspec, spec], out_specs=spec,
        )(M2d, x)

    return run


def main():
    rng = np.random.default_rng(0)
    n_el = GRID * SB * LANES
    log(f"elements per launch: {n_el} ({n_el/1e6:.2f}M), {K_OPS} ops each")
    x = jnp.asarray(rng.integers(0, 1 << 16, (2, GRID * SB, LANES), dtype=np.uint32))
    sync(jnp.add(jnp.ones((8, 128), jnp.uint32), 1))
    log("session up")
    for op in ("add", "mul", "mulmask", "shift"):
        dt = timed_chain(f"vpu {op} x{K_OPS}", make_vpu(op), x)
        ops_s = n_el * K_OPS / dt
        log(f"    -> {ops_s/1e12:.2f} T{op}/s")

    # mont_mul current
    from ckb_zkp_tpu.host.pairing import get_curve
    from ckb_zkp_tpu.ops.field import device_field
    from ckb_zkp_tpu.ops.pallas_field import mont_mul_tiles

    curve = get_curve("bn254")
    df = device_field(curve.fq)
    N = 1 << 20
    a = jnp.asarray(rng.integers(0, 1 << 16, (16, N // 128, 128), dtype=np.uint32))

    jmm = jax.jit(lambda v: mont_mul_tiles(df, v, v))
    dt = timed_chain("mont_mul_tiles 2^20", jmm, a)
    log(f"    -> {N/dt/1e9:.2f} G mul/s")

    # mxu reduction-shaped matmuls
    x32 = jnp.asarray(
        rng.integers(0, 256, (32, GRID * SB, LANES), dtype=np.uint32)
    )
    for n_mm in (8, 32):
        dt = timed_chain(f"mxu band matmul x{n_mm}", make_mxu(n_mm), x32)
        per = dt / (GRID * n_mm)
        log(f"    -> {per*1e6:.2f} us per (256,256)x(256,128) incl prep")


main()
