"""A/B the interleaved-ladder Domain vs the four-step limb-major NTT at
2^21/2^22 (chained, RTT-subtracted) — decides LARGE_NTT_MIN routing."""
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


def chain_bench(name, step, x0, iters=6):
    # NO outer jit: Domain.fft jits internally with tables as ARGUMENTS; an
    # outer jit would capture the n-sized tables as literals (HTTP 413)
    jstep = step
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
    from ckb_zkp_tpu.ops.field import device_field
    from ckb_zkp_tpu.ops.ntt import get_domain
    from ckb_zkp_tpu.ops.ntt_large import get_fourstep_domain

    curve = get_curve("bn254")
    df = device_field(curve.fr)
    sync(jnp.add(jnp.ones((8, 128), jnp.uint32), 1))
    log("session up")

    for logn in (21, 22):
        n = 1 << logn
        x0 = jax.jit(
            lambda k: jax.random.bits(k, (n, df.L), jnp.uint32)
            & jnp.uint32(0x3FFF)
        )(jax.random.PRNGKey(logn))
        sync(x0)
        dom = get_domain(curve.fr, n)
        fs = get_fourstep_domain(df.spec, n)

        # value check once (coset_ntt . intt chain used by witness map)
        a = dom.coset_ntt(dom.intt(x0))
        b = fs.coset_ntt(fs.intt(x0))
        same = bool(
            jax.jit(lambda u, v: jnp.array_equal(u, v))(a, b)
        )
        log(f"  n=2^{logn} coset_ntt(intt) equal: {same}")

        chain_bench(f"old ladder intt+coset_ntt 2^{logn}",
                    lambda v: dom.coset_ntt(dom.intt(v)), x0)
        chain_bench(f"four-step intt+coset_ntt 2^{logn}",
                    lambda v: fs.coset_ntt(fs.intt(v)), x0)

    log("done")


main()
