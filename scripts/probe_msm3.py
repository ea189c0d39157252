"""Validate + time the sort-carried MSM v3 window path on the real chip.

Correctness oracle (cheap): P_i = reps[i mod K] with reps[k] = (k+1)*G,
so MSM = (sum_i s_i * (i mod K + 1) mod r) * G — one host scalar-mul.
Timing: chained full-MSM at 2^21 (scalars derived from previous output).
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
        if hasattr(leaf, "ravel"):
            np.asarray(jax.device_get(leaf.ravel()[:1]))


def main():
    from ckb_zkp_tpu.host.pairing import get_curve
    from ckb_zkp_tpu.ops.msm import device_group

    logn = int(sys.argv[1] if len(sys.argv) > 1 else 18)
    group = sys.argv[2] if len(sys.argv) > 2 else "g1"
    N = 1 << logn
    curve = get_curve("bn254")
    dg = device_group(curve, group)
    host = dg.host_group
    gen = curve.g1_gen if group == "g1" else curve.g2_gen
    r = curve.fr.modulus
    rng = np.random.default_rng(0)

    sync(jnp.add(jnp.ones((8, 128), jnp.uint32), 1))
    log(f"session up, N=2^{logn} {group}")

    K = 63
    reps = [host.mul(gen, k + 1) for k in range(K)] + [host.infinity]
    idx = (np.arange(N) % (K + 1)).astype(np.int64)
    Prep = dg.encode_points(reps)
    P = jax.tree.map(lambda c: jnp.asarray(np.asarray(c))[jnp.asarray(idx)], Prep)
    scalars_int = [int(x) for x in rng.integers(0, 1 << 63, N)]
    s = dg.encode_scalars(scalars_int)

    t0 = time.time()
    out = dg._msm_jit(P, jnp.asarray(s))
    sync(out)
    log(f"msm compile+first: {time.time()-t0:.1f}s")
    got = dg.decode_point(out)

    c = 0
    for i, si in enumerate(scalars_int):
        k = i % (K + 1)
        if k < K:
            c = (c + si * (k + 1)) % r
    want = host.mul(gen, c)
    ok = (got.x == want.x and got.y == want.y and got.infinity == want.infinity)
    log(f"correct: {ok}")
    if not ok:
        log(f"  got {got.infinity} want {want.infinity}")
        sys.exit(1)

    # timing, chained (P enters as an argument — closure capture embeds it
    # as a program literal and trips the tunnel's 413 body limit)
    @jax.jit
    def step(Parg, scl):
        out = dg._msm_impl(Parg, scl)
        return (scl + out[0].reshape(-1)[:1].astype(jnp.uint32)) & jnp.uint32(0xFFFF)

    s0 = jnp.asarray(s)
    t0 = time.time()
    sync(step(P, s0))
    log(f"timing compile+first: {time.time()-t0:.1f}s")
    t0 = time.time()
    sync(step(P, s0))
    rtt = time.time() - t0
    v = s0
    iters = 6
    t0 = time.time()
    for _ in range(iters):
        v = step(P, v)
    sync(v)
    dt = (time.time() - t0 - rtt) / iters
    log(f"msm 2^{logn} {group}: {dt*1e3:.1f} ms  ({N/dt/1e6:.2f} M pts/s)")


main()
