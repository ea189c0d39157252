"""DMA-pattern isolation: same bytes, different block shapes/grids.

All kernels: read 2 arrays, write 1, ~134MB in + 67MB out at 2^21 elements
(packed Rp=8 rows). Only the blocking differs.
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
    log(f"  {name}: {dt*1e3:.2f} ms")
    return dt


LANES = 128
Rp = 8
N = 1 << 21
M = N // LANES  # 16384 sublane rows


def kern2(a_ref, b_ref, o_ref):
    o_ref[:] = a_ref[:] ^ b_ref[:]


def flat_fn(sb):
    @jax.jit
    def run(a, b):  # (Rp, M, 128)
        spec = pl.BlockSpec((Rp, sb, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern2, out_shape=jax.ShapeDtypeStruct(a.shape, jnp.uint32),
            grid=(M // sb,), in_specs=[spec, spec], out_specs=spec,
        )(a, b)

    return run


def lead1_fn(sb, B):
    @jax.jit
    def run(a, b):  # (B, Rp, M//B, 128)
        spec = pl.BlockSpec(
            (1, Rp, sb, LANES), lambda g, j: (j, 0, g, 0), memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            kern2, out_shape=jax.ShapeDtypeStruct(a.shape, jnp.uint32),
            grid=((M // B) // sb, B), in_specs=[spec, spec], out_specs=spec,
        )(a, b)

    return run


def grid2d_fn(sb, B):
    @jax.jit
    def run(a, b):  # (Rp, M, 128), 2D grid walking the same blocks
        spec = pl.BlockSpec(
            (Rp, sb, LANES), lambda g, j: (0, g * B + j, 0), memory_space=pltpu.VMEM
        )
        return pl.pallas_call(
            kern2, out_shape=jax.ShapeDtypeStruct(a.shape, jnp.uint32),
            grid=(M // sb // B, B), in_specs=[spec, spec], out_specs=spec,
        )(a, b)

    return run


def main():
    sync(jnp.add(jnp.ones((8, 128), jnp.uint32), 1))
    log("session up")
    mk = jax.jit(
        lambda k, shape: jax.random.bits(k, shape, jnp.uint32)
    , static_argnums=1)
    a3 = mk(jax.random.PRNGKey(0), (Rp, M, LANES))
    b3 = mk(jax.random.PRNGKey(1), (Rp, M, LANES))
    sync(a3); sync(b3)
    bench("flat sb=32 (16KB chunks, 1D grid)", flat_fn(32), (a3, b3))
    bench("flat sb=8 (4KB chunks, 1D grid)", flat_fn(8), (a3, b3))
    bench("flat sb=8 2Dgrid", grid2d_fn(8, 32), (a3, b3))

    B = 32
    a4 = mk(jax.random.PRNGKey(2), (B, Rp, M // B, LANES))
    b4 = mk(jax.random.PRNGKey(3), (B, Rp, M // B, LANES))
    sync(a4); sync(b4)
    bench("lead1 sb=8 B=32 (scan-style)", lead1_fn(8, B), (a4, b4))

    log("done")


main()
