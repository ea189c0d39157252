"""TRUE per-stage breakdown of one real MSM v2 window at 2^21.

Chained (data-dependent) timing of cumulative stage prefixes of the actual
window body from ops/msm._msm_rcb:
  A: argsort
  B: + packed coord gathers + flag gather
  C: + scan_prefix_madd_packed (incl tile transpose)
  D: + bucket counts + full_prefix + w_get + E assembly
  E: + reduce tail (sum_e, (2^c-1)*E_last, window sum)  == full window
"""
import functools
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


def main():
    from ckb_zkp_tpu.host.pairing import get_curve
    from ckb_zkp_tpu.ops.msm import (
        _RCB_B,
        _bucket_counts,
        _full_prefix,
        _reduce_pts,
        _scale_pow2_minus1,
        _wide_add,
        device_group,
    )
    from ckb_zkp_tpu.ops.ec import point_select
    from ckb_zkp_tpu.ops.rcb import rcb_group
    from ckb_zkp_tpu.ops.pallas_rcb import (
        pack_limbs,
        rcb_scan_prefix_madd_packed,
    )

    N = 1 << int(sys.argv[1] if len(sys.argv) > 1 else 21)
    curve = get_curve("bn254")
    dg = device_group(curve, "g1")
    rg = rcb_group(dg)
    cf = dg.cf
    c = 16
    nb = 1 << c

    sync(jnp.add(jnp.ones((8, 128), jnp.uint32), 1))
    log(f"session up, N=2^{N.bit_length()-1}")

    mk = jax.jit(
        lambda k, s: jax.random.bits(k, s, jnp.uint32) & jnp.uint32(0xFFFF),
        static_argnums=1,
    )
    Xp = mk(jax.random.PRNGKey(0), (N, 8))
    Yp = mk(jax.random.PRNGKey(1), (N, 8))
    inf = jax.jit(lambda: jnp.zeros((N,), bool))()
    digits0 = jax.jit(
        lambda k: jax.random.bits(k, (N,), jnp.uint32) & jnp.uint32(nb - 1)
    )(jax.random.PRNGKey(2))
    sync(Xp), sync(Yp), sync(inf), sync(digits0)

    ident_q = rg.identity((nb,))

    def stageA(digits):
        order = jnp.argsort(digits)
        return order.astype(jnp.uint32) & jnp.uint32(nb - 1)

    def stageB(digits):
        order = jnp.argsort(digits)
        xg = Xp[order]
        yg = Yp[order]
        fg = inf[order]
        return (xg[:, 0] ^ yg[:, 0] ^ fg.astype(jnp.uint32)) & jnp.uint32(nb - 1)

    def stageC(digits):
        order = jnp.argsort(digits)
        w_get, T = rcb_scan_prefix_madd_packed(
            rg, (Xp[order], Yp[order], inf[order]), _RCB_B
        )
        return T[0][:, 0].astype(jnp.uint32)[: N] ^ digits  # (G,) -> pad? G<N
    # T[0] is (G, L); G = N/32 -> broadcastable xor trick instead:

    def stageC2(digits):
        order = jnp.argsort(digits)
        w_get, T = rcb_scan_prefix_madd_packed(
            rg, (Xp[order], Yp[order], inf[order]), _RCB_B
        )
        return digits ^ T[0][0, 0]

    def stageD(digits):
        order = jnp.argsort(digits)
        w_get, T = rcb_scan_prefix_madd_packed(
            rg, (Xp[order], Yp[order], inf[order]), _RCB_B
        )
        pfull = _full_prefix(rg, T, _RCB_B)
        cnt = _bucket_counts(digits, nb)
        q = cnt.astype(jnp.int32) - 1
        qc = jnp.maximum(q, 0)
        e_wb = w_get(qc)
        g = qc // _RCB_B
        before = jax.tree.map(lambda c_: c_[jnp.maximum(g - 1, 0)], pfull)
        before = point_select(cf, g > 0, before, ident_q)
        E = _wide_add(rg, before, e_wb)
        E = point_select(cf, q >= 0, E, ident_q)
        return digits ^ E[0][0, 0]

    def stageE(digits):
        order = jnp.argsort(digits)
        w_get, T = rcb_scan_prefix_madd_packed(
            rg, (Xp[order], Yp[order], inf[order]), _RCB_B
        )
        pfull = _full_prefix(rg, T, _RCB_B)
        cnt = _bucket_counts(digits, nb)
        q = cnt.astype(jnp.int32) - 1
        qc = jnp.maximum(q, 0)
        e_wb = w_get(qc)
        g = qc // _RCB_B
        before = jax.tree.map(lambda c_: c_[jnp.maximum(g - 1, 0)], pfull)
        before = point_select(cf, g > 0, before, ident_q)
        E = _wide_add(rg, before, e_wb)
        E = point_select(cf, q >= 0, E, ident_q)
        e_last = jax.tree.map(lambda c_: c_[nb - 1], E)
        head = jax.tree.map(lambda c_: c_[: nb - 1], E)
        sum_e = _reduce_pts(rg, head, _RCB_B)
        t = _scale_pow2_minus1(rg, e_last, c)
        out = rg.add(t, rg.neg(sum_e))
        return digits ^ out[0][0]

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

    chain_bench("A argsort", stageA, digits0)
    chain_bench("B +gathers", stageB, digits0)
    chain_bench("C +scan(incl transpose)", stageC2, digits0)
    chain_bench("D +prefix/w_get/E", stageD, digits0)
    chain_bench("E full window", stageE, digits0)

    log("done")


main()
