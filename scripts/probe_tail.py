"""Breakdown of the MSM window TAIL at 2^21 (chained, true timings):
full_prefix over T, w_get, E assembly, reduce."""
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
        if hasattr(leaf, "ravel"):
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
    from ckb_zkp_tpu.host.pairing import get_curve
    from ckb_zkp_tpu.ops.msm import (
        _RCB_B,
        _bucket_counts,
        _full_prefix,
        _reduce_pts,
        _wide_add,
        device_group,
    )
    from ckb_zkp_tpu.ops.ec import point_select
    from ckb_zkp_tpu.ops.rcb import rcb_group
    from ckb_zkp_tpu.ops.pallas_rcb import (
        pack_limbs_flag,
        rcb_scan_prefix_madd_cols,
    )

    N = 1 << int(sys.argv[1] if len(sys.argv) > 1 else 21)
    curve = get_curve("bn254")
    dg = device_group(curve, "g1")
    rg = rcb_group(dg)
    cf = dg.cf
    nb = 1 << 16
    B = _RCB_B
    G = N // B

    sync(jnp.add(jnp.ones((8, 128), jnp.uint32), 1))
    log(f"session up, N=2^{N.bit_length()-1}")

    mk = jax.jit(
        lambda k, s: jax.random.bits(k, s, jnp.uint32) & jnp.uint32(0x3FFF),
        static_argnums=1,
    )
    # T: (G,) block totals stand-in (random 14-bit limbs are fine for timing)
    T = tuple(mk(jax.random.PRNGKey(i), (G, 16)) for i in range(3))
    digits = jax.jit(
        lambda k: jax.random.bits(k, (N,), jnp.uint32) & jnp.uint32(nb - 1)
    )(jax.random.PRNGKey(9))
    E = tuple(mk(jax.random.PRNGKey(10 + i), (nb, 16)) for i in range(3))
    sync(T), sync(digits), sync(E)
    ident_q = rg.identity((nb,))

    # W tiles via one real scan (for w_get)
    xc = [mk(jax.random.PRNGKey(20 + i), (N,)).reshape(-1) for i in range(8)]
    yc = [mk(jax.random.PRNGKey(30 + i), (N,)).reshape(-1) for i in range(8)]

    @jax.jit
    def scanit(x0):
        w_get, T2 = rcb_scan_prefix_madd_cols(rg, [x0] + xc[1:], yc, B)
        return T2

    # 1. bucket counts
    def s_cnt(d):
        cnt = _bucket_counts(d, nb)
        return (d + cnt[d]) & jnp.uint32(nb - 1)

    chain_bench("bucket_counts", s_cnt, digits)

    # 2. full_prefix over T
    def s_fp(t0):
        pfull = _full_prefix(rg, (t0, T[1], T[2]), B)
        return t0 ^ pfull[0][0, 0]

    chain_bench("full_prefix(G=2^16)", s_fp, T[0])

    # 3. w_get at nb queries (needs live W -> rebuild scan inside, subtract)
    def s_scan_only(x0):
        w_get, T2 = rcb_scan_prefix_madd_cols(rg, [x0] + xc[1:], yc, B)
        return x0 ^ T2[0][0, 0]

    def s_scan_wget(x0):
        w_get, T2 = rcb_scan_prefix_madd_cols(rg, [x0] + xc[1:], yc, B)
        q = (digits[:nb] % jnp.uint32(N)).astype(jnp.int32)
        e = w_get(q)
        return x0 ^ e[0][0, 0] ^ T2[0][0, 0]

    d_scan = chain_bench("scan only", s_scan_only, xc[0])
    d_wget = chain_bench("scan + w_get(nb)", s_scan_wget, xc[0])
    log(f"    -> w_get alone ~{(d_wget-d_scan)*1e3:.2f} ms")

    # 4. E assembly: gather pfull rows + selects + wide add at nb
    def s_easm(e0):
        g = (digits[:nb] % jnp.uint32(G)).astype(jnp.int32)
        before = jax.tree.map(lambda c_: c_[jnp.maximum(g - 1, 0)], T)
        before = point_select(cf, g > 0, before, ident_q)
        E2 = _wide_add(rg, before, (e0, E[1], E[2]))
        E2 = point_select(cf, g >= 0, E2, ident_q)
        return e0 ^ E2[0][0, 0]

    chain_bench("E assembly (gather+sel+wide_add nb)", s_easm, E[0])

    # 5. reduce over nb
    def s_red(e0):
        out = _reduce_pts(rg, (e0, E[1], E[2]), B)
        return e0 ^ out[0][0]

    chain_bench("reduce_pts(nb)", s_red, E[0])

    log("done")


main()
