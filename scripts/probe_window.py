"""Per-component timing of one MSM v2 window at 2^21 (chained dispatches,
single sync — see verify SKILL.md timing methodology)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp


def log(m):
    print(m, file=sys.stderr, flush=True)


def sync(x):
    for leaf in jax.tree.leaves(x):
        if hasattr(leaf, "ravel"):
            np.asarray(jax.device_get(leaf.ravel()[:1]))


def timed_chain(name, fn, x, iters=4):
    """fn must map x -> x-like (data-dependent chain)."""
    jfn = jax.jit(fn)
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
    log(f"  {name}: {dt*1e3:.1f} ms")
    return dt


def main():
    from ckb_zkp_tpu.host.pairing import get_curve
    from ckb_zkp_tpu.ops.msm import (
        _RCB_B,
        _full_prefix,
        _reduce_pts,
        _scan_prefix_madd,
        _wide_add,
        device_group,
    )
    from ckb_zkp_tpu.ops.rcb import rcb_group

    N = 1 << int(sys.argv[1] if len(sys.argv) > 1 else 21)
    curve = get_curve("bn254")
    dg = device_group(curve, "g1")
    rg = rcb_group(dg)
    fq = dg.fq
    rng = np.random.default_rng(0)
    c = dg._msm_window_bits(N)
    nb = 1 << c
    log(f"N=2^{N.bit_length()-1} c={c}")

    X = jnp.asarray(rng.integers(0, 1 << 16, (N, 16), dtype=np.uint32))
    Y = jnp.asarray(rng.integers(0, 1 << 16, (N, 16), dtype=np.uint32))
    inf = jnp.zeros((N,), bool)
    digits = jnp.asarray(rng.integers(0, nb, N, dtype=np.uint32))

    sync(jnp.add(jnp.ones((8, 128), jnp.uint32), 1))
    log("session up")

    # 1. argsort chained (order feeds next digits)
    timed_chain("argsort", lambda d: jnp.argsort(d).astype(jnp.uint32) & jnp.uint32(nb - 1), digits)

    order = jnp.argsort(digits)
    d_sorted = digits[order]

    # 2. row gather: X[order] -> feed back first column as new order base
    def gath(o):
        g = X[o]
        return (o + g[:, 0]) % jnp.uint32(N)

    timed_chain("gather (N,16)", gath, order.astype(jnp.uint32))

    # 3. searchsorted
    def ss(d):
        cnt = jnp.searchsorted(d, jnp.arange(nb, dtype=d.dtype), side="right")
        return (d + cnt[d & jnp.uint32(nb - 1)].astype(d.dtype)) % jnp.uint32(nb)

    timed_chain("searchsorted", ss, d_sorted)

    # 4. level-1 scan kernel
    def scan1(x):
        w_get, T = _scan_prefix_madd(rg, (x, Y, inf), _RCB_B)
        return T[0]  # X-coord of totals; feed back below

    jscan = jax.jit(lambda x: _scan_prefix_madd(rg, (x, Y, inf), _RCB_B)[1])
    t0 = time.time()
    T = jscan(X)
    sync(T)
    log(f"  scan_prefix_madd compile+first: {time.time()-t0:.2f}s")
    t0 = time.time()
    sync(jscan(X))
    log(f"  scan_prefix_madd: {(time.time()-t0)*1e3:.1f} ms (single call, incl RTT)")

    # 5. full_prefix over T
    jfp = jax.jit(lambda t: _full_prefix(rg, t, _RCB_B))
    t0 = time.time()
    P = jfp(tuple(T))
    sync(P)
    log(f"  full_prefix compile+first: {time.time()-t0:.2f}s")
    t0 = time.time()
    sync(jfp(tuple(T)))
    log(f"  full_prefix: {(time.time()-t0)*1e3:.1f} ms (single call)")

    # 6. reduce over nb-wide E-like array
    E = tuple(c_[:nb] for c_ in P) if P[0].shape[0] >= nb else tuple(
        jnp.concatenate([c_] * (nb // c_.shape[0]), 0) for c_ in P
    )
    jrd = jax.jit(lambda e: _reduce_pts(rg, e, _RCB_B))
    t0 = time.time()
    sync(jrd(E))
    log(f"  reduce(nb) compile+first: {time.time()-t0:.2f}s")
    t0 = time.time()
    sync(jrd(E))
    log(f"  reduce(nb): {(time.time()-t0)*1e3:.1f} ms (single call)")

    # 7. w_get-style gather from W tiles + E assembly add
    from ckb_zkp_tpu.ops.msm import _scan_prefix_madd as spm

    w_get, T2 = spm(rg, (X, Y, inf), _RCB_B)
    q = jnp.asarray(rng.integers(0, N, nb, dtype=np.int32))
    jw = jax.jit(lambda qq: w_get(qq)[0])
    t0 = time.time()
    sync(jw(q))
    log(f"  w_get compile+first: {time.time()-t0:.2f}s")
    t0 = time.time()
    sync(jw(q))
    log(f"  w_get(nb): {(time.time()-t0)*1e3:.1f} ms (single call)")

    log("done")


main()


def transpose_variants():
    """Standalone costs of the scan-tile layout transform candidates."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    N = 1 << 21
    R = 16
    B = 32
    G = N // B
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.integers(0, 1 << 16, (N, R), dtype=np.uint32))

    def v_current(x):
        t = x.reshape(G, B, R).transpose(1, 2, 0).reshape(B, R, G // 128, 128)
        return t.reshape(B, R, G)[:, :, 0] + x[0, 0]  # tiny dependency

    def v_2d_first(x):
        t = x.T.reshape(R, G, B).transpose(2, 0, 1)
        return t[:, :, 0] + x[0, 0]

    def v_pure2d(x):
        t = x.T  # (R, N)
        return t[:, :1] + x[0, 0]

    for name, fn in (("tiles cur", v_current), ("tiles 2d-first", v_2d_first),
                     ("T 2d only", v_pure2d)):
        jfn = jax.jit(fn)
        sync(jfn(X))
        t0 = time.time()
        sync(jfn(X))
        log(f"  {name}: {(time.time()-t0)*1e3:.1f} ms (single call incl RTT)")


if len(sys.argv) > 2 and sys.argv[2] == "transpose":
    transpose_variants()
