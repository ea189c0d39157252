"""NTT timings at bench shapes (warm via the bench-run cache)."""
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


def main():
    from ckb_zkp_tpu.host.pairing import get_curve
    from ckb_zkp_tpu.ops.field import device_field
    from ckb_zkp_tpu.ops.ntt import get_domain

    curve = get_curve("bn254")
    fr = device_field(curve.fr)
    sync(jnp.add(jnp.ones((8, 128), jnp.uint32), 1))
    log("session up")
    for k in (17, 21, 24):
        n = 1 << k
        dom = get_domain(curve.fr, n)
        x = fr.from_mont(fr.ones((n,)))
        t0 = time.time()
        sync(dom.ntt(x))
        log(f"ntt 2^{k} compile+first: {time.time()-t0:.1f}s")
        t0 = time.time()
        sync(dom.ntt(x))
        log(f"ntt 2^{k} warm: {(time.time()-t0)*1e3:.0f} ms")
        t0 = time.time()
        sync(dom.coset_intt(x))
        log(f"coset_intt 2^{k} compile+first: {time.time()-t0:.1f}s")
        t0 = time.time()
        sync(dom.coset_intt(x))
        log(f"coset_intt 2^{k} warm: {(time.time()-t0)*1e3:.0f} ms")
    log("done")


main()
