"""Gather strategy shootout at 2^21 rows (chained, RTT-subtracted).

The MSM window's dominant cost is permuting point rows into sorted order.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def log(m):
    print(m, file=sys.stderr, flush=True)


def sync(x):
    for leaf in jax.tree.leaves(x):
        np.asarray(jax.device_get(leaf.ravel()[:1]))


def chain_bench(name, step, x0, iters=8):
    jstep = jax.jit(step)
    t0 = time.time()
    sync(jstep(x0))
    log(f"  {name} compile+first: {time.time()-t0:.2f}s")
    t0 = time.time()
    sync(jstep(x0))
    rtt = time.time() - t0
    v = x0
    t0 = time.time()
    for _ in range(iters):
        v = jstep(v)
    sync(v)
    dt = (time.time() - t0 - rtt) / iters
    log(f"  {name}: {dt*1e3:.2f} ms")
    return dt


def main():
    N = 1 << int(sys.argv[1] if len(sys.argv) > 1 else 21)
    mk = jax.jit(
        lambda k, s, d: jax.random.bits(k, s, jnp.uint32).astype(d),
        static_argnums=(1, 2),
    )
    X8 = mk(jax.random.PRNGKey(0), (N, 8), jnp.uint32)
    Y8 = mk(jax.random.PRNGKey(1), (N, 8), jnp.uint32)
    XY16 = jax.jit(lambda a, b: jnp.concatenate([a, b], axis=1))(X8, Y8)
    X16h = jax.jit(lambda a: jnp.tile(a, (1, 2)).astype(jnp.uint16))(X8)
    XY32h = jax.jit(lambda a: jnp.tile(a, (1, 4)).astype(jnp.uint16))(X8)
    order0 = jax.jit(
        lambda k: jax.random.permutation(k, jnp.arange(N, dtype=jnp.int32))
    )(jax.random.PRNGKey(2))
    digits0 = jax.jit(
        lambda k: jax.random.bits(k, (N,), jnp.uint32) & jnp.uint32(0xFFFF)
    )(jax.random.PRNGKey(3))
    sync(X8), sync(Y8), sync(XY16), sync(X16h), sync(XY32h)
    sync(order0), sync(digits0)
    log(f"session up, N=2^{N.bit_length()-1}")

    def perm_of(g):
        return (g.astype(jnp.int32) * 1103515245 + 12345) % N  # not a perm, ok for timing

    def two_u32_gathers(order):
        a = X8[order]
        b = Y8[order]
        return perm_of(order + a[:, 0].astype(jnp.int32) + b[:, 0].astype(jnp.int32))

    def one_u32_gather16(order):
        a = XY16[order]
        return perm_of(order + a[:, 0].astype(jnp.int32))

    def one_u16_gather16(order):
        a = X16h[order]
        return perm_of(order + a[:, 0].astype(jnp.int32))

    def one_u16_gather32(order):
        a = XY32h[order]
        return perm_of(order + a[:, 0].astype(jnp.int32))

    def sort_payload(digits):
        cols = [XY16[:, i] for i in range(16)]
        out = jax.lax.sort([digits] + cols, num_keys=1)
        return (digits + out[1]) & jnp.uint32(0xFFFF)

    def sort_argsort_only(digits):
        order = jnp.argsort(digits)
        return (digits + order.astype(jnp.uint32)) & jnp.uint32(0xFFFF)

    chain_bench("2x (N,8) u32 gathers [cur]", two_u32_gathers, order0)
    chain_bench("1x (N,16) u32 gather", one_u32_gather16, order0)
    chain_bench("1x (N,16) u16 gather", one_u16_gather16, order0)
    chain_bench("1x (N,32) u16 gather", one_u16_gather32, order0)
    chain_bench("argsort only", sort_argsort_only, digits0)
    chain_bench("sort carrying 16 u32 cols", sort_payload, digits0)

    log("done")


main()
