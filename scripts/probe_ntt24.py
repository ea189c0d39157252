"""Probe the four-step large-domain NTT at 2^24 on the real chip.

Checks: domain creation (no eager n-sized tables), grid build, fft compile
(the old path OOM'd HBM at compile), warm timing, and two value spot-checks
against host integer math (NTT of a constant, NTT of e_1).
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
    from ckb_zkp_tpu.ops.field import device_field
    from ckb_zkp_tpu.ops.ntt import get_domain

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    n = 1 << k
    curve = get_curve("bn254")
    fr = device_field(curve.fr)
    p = curve.fr.modulus
    sync(jnp.add(jnp.ones((8, 128), jnp.uint32), 1))
    log("session up")

    t0 = time.time()
    dom = get_domain(curve.fr, n)
    log(f"domain 2^{k} created in {time.time()-t0:.1f}s (is_large={dom.is_large})")

    x = fr.from_mont(fr.ones((n,)))
    t0 = time.time()
    out = dom.ntt(x)
    sync(out)
    log(f"ntt 2^{k} compile+first: {time.time()-t0:.1f}s")
    t0 = time.time()
    sync(dom.ntt(x))
    log(f"ntt 2^{k} warm: {(time.time()-t0)*1e3:.0f} ms")

    # value check 1: input is constant value R^-1 -> out[0] = n*R^-1, rest 0
    v0 = fr.decode_scalar(out[0])
    want0 = n * pow(fr.R, -1, p) % p
    zrows = np.asarray(jax.device_get(out[1:5]))
    ok1 = v0 == want0 and not zrows.any()
    log(f"const check: {'OK' if ok1 else 'FAIL'} (out0={hex(v0)[:18]}..)")

    # value check 2: e_1 -> out[j] = omega^j
    x2 = np.zeros((n, fr.L), np.uint32)
    x2[1] = fr.r_limbs
    out2 = dom.ntt(jnp.asarray(x2))
    ok2 = True
    for j in (0, 1, 12345, n - 1):
        got = fr.decode_scalar(out2[j])
        if got != pow(dom.omega, j, p):
            ok2 = False
            log(f"e1 check FAIL at {j}")
    log(f"e1 check: {'OK' if ok2 else 'FAIL'}")

    # coset_intt (the witness-map-shaped variant) compile + warm
    del out, out2, x2  # free ~3 GB HBM before the inverse working set
    t0 = time.time()
    sync(dom.coset_intt(x))
    log(f"coset_intt 2^{k} compile+first: {time.time()-t0:.1f}s")
    t0 = time.time()
    sync(dom.coset_intt(x))
    log(f"coset_intt 2^{k} warm: {(time.time()-t0)*1e3:.0f} ms")
    log("done" if (ok1 and ok2) else "VALUE CHECKS FAILED")


main()
