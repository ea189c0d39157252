"""Minimal tunnel-latency probe: per-compile and per-dispatch costs."""
import os
import sys
import time

def log(msg):
    print(msg, file=sys.stderr, flush=True)

t0 = time.time()
import jax
import jax.numpy as jnp
import numpy as np
log(f"import jax: {time.time()-t0:.2f}s")

t0 = time.time()
d = jax.devices()
log(f"devices: {d} {time.time()-t0:.2f}s")

def sync(x):
    for leaf in jax.tree.leaves(x):
        np.asarray(jax.device_get(leaf.ravel()[:1]))

# trivial compile
f = jax.jit(lambda x: x + 1)
x = jnp.arange(1024, dtype=jnp.uint32)
t0 = time.time(); sync(f(x)); log(f"trivial jit compile+run: {time.time()-t0:.2f}s")
t0 = time.time(); sync(f(x)); log(f"trivial warm: {time.time()-t0:.3f}s")
# second trivial compile (different graph)
g = jax.jit(lambda x: x * 3 + 7)
t0 = time.time(); sync(g(x)); log(f"trivial jit #2 compile+run: {time.time()-t0:.2f}s")

# medium graph: field mul
sys.path.insert(0, "/root/repo")
from ckb_zkp_tpu.host.pairing import get_curve
from ckb_zkp_tpu.ops.field import device_field
curve = get_curve("bn254")
fr = device_field(curve.fr)
xs = fr.encode([3] * 4096)
t0 = time.time(); sync(fr.mul(xs, xs)); log(f"field mul 4096 compile+run: {time.time()-t0:.2f}s")
t0 = time.time(); sync(fr.mul(xs, xs)); log(f"field mul warm: {time.time()-t0:.3f}s")

# NTT 2^13 domain
from ckb_zkp_tpu.ops.ntt import get_domain
dom = get_domain(curve.fr, 1 << 13)
ys = fr.encode([5] * (1 << 13))
t0 = time.time(); sync(dom.ntt(ys)); log(f"ntt 2^13 compile+run: {time.time()-t0:.2f}s")
t0 = time.time(); sync(dom.ntt(ys)); log(f"ntt warm: {time.time()-t0:.3f}s")
log("done")
