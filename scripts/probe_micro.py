"""TPU-tunnel microbenchmarks: session-init cost, per-launch overhead,
sort/gather costs at MSM scale. One session, budget-aware."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

import ckb_zkp_tpu  # noqa: F401  (configures the XLA cache)


def log(m):
    print(m, file=sys.stderr, flush=True)


def sync(x):
    for leaf in jax.tree.leaves(x):
        if hasattr(leaf, "ravel"):
            np.asarray(jax.device_get(leaf.ravel()[:1]))


def timed(name, fn, *a):
    t0 = time.time()
    out = fn(*a)
    sync(out)
    dt = time.time() - t0
    log(f"  {name}: {dt:.3f}s")
    return out, dt


def main():
    from ckb_zkp_tpu.host.pairing import get_curve
    from ckb_zkp_tpu.ops.field import device_field

    curve = get_curve("bn254")
    fr = device_field(curve.fr)

    # 1. session init with a PURE-XLA op (no pallas): is the ~213 s
    # first-dispatch penalty pallas-specific?
    a8 = jnp.arange(8 * 128, dtype=jnp.uint32).reshape(8, 128)
    t0 = time.time()
    sync(jnp.add(a8, a8))
    log(f"first dispatch (pure XLA tiny add): {time.time()-t0:.1f}s")
    t0 = time.time()
    sync(jnp.add(a8, a8) + 1)
    log(f"second tiny XLA op: {time.time()-t0:.3f}s")

    # 2. tiny pallas mul (cached program): load + exec
    x = fr.encode([3] * 1024)
    y = fr.encode([5] * 1024)
    _, dt = timed("pallas mul 1024 (load+exec)", fr.mul, x, y)
    _, dt = timed("pallas mul 1024 (warm)", fr.mul, jnp.asarray(x), y)

    # 3. per-launch overhead: chain K dependent pallas muls in ONE jit
    K = 64

    @jax.jit
    def chain(x, y):
        def body(_, v):
            return fr.mul(v, y)

        return jax.lax.fori_loop(0, K, body, x)

    _, dt1 = timed(f"chain {K} muls @1024 (compile+load+exec)", chain, x, y)
    _, dt2 = timed(f"chain {K} muls @1024 (warm)", chain, jnp.asarray(x), y)
    log(f"  -> per-launch overhead ~{dt2/K*1e3:.2f} ms")

    n = 1 << 17
    xb = fr.encode(list(range(2, n + 2)))
    yb = fr.encode(list(range(3, n + 3)))

    @jax.jit
    def chain_big(x, y):
        def body(_, v):
            return fr.mul(v, y)

        return jax.lax.fori_loop(0, K, body, x)

    _, dt1 = timed(f"chain {K} muls @2^17 (compile+exec)", chain_big, xb, yb)
    _, dt2 = timed(f"chain {K} muls @2^17 (warm)", chain_big, jnp.asarray(xb), yb)
    log(f"  -> {K * n / dt2 / 1e9:.2f}e9 mul/s")

    # 4. argsort + gather at 2^20 (MSM per-window costs)
    N = 1 << 20
    rng = np.random.default_rng(0)
    digits = jnp.asarray(rng.integers(0, 1 << 16, N, dtype=np.uint32))
    rows = jnp.asarray(rng.integers(0, 1 << 16, (N, 16), dtype=np.uint32))

    srt = jax.jit(jnp.argsort)
    _, dt = timed("argsort 2^20 u32 (compile+exec)", srt, digits)
    order, dt = timed("argsort 2^20 u32 (warm)", srt, jnp.asarray(digits))

    gat = jax.jit(lambda r, o: r[o])
    _, dt = timed("gather (2^20,16) (compile+exec)", gat, rows, order)
    _, dt = timed("gather (2^20,16) (warm)", gat, rows, jnp.asarray(order))

    # 5. searchsorted 2^16 boundaries in sorted 2^20
    ss = jax.jit(
        lambda d: jnp.searchsorted(
            d, jnp.arange(1 << 16, dtype=jnp.uint32), side="right"
        )
    )
    ds = jnp.sort(digits)
    _, dt = timed("searchsorted 2^16-in-2^20 (compile+exec)", ss, ds)
    _, dt = timed("searchsorted (warm)", ss, jnp.asarray(ds))

    log("done")


main()
