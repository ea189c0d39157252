"""Compile/warm the bench G2 MSM programs on the real TPU.

The G2 (Fq2) RCB scan program is the slowest-compiling executable in the
framework (tens of minutes through the tunnel's remote compiler, round-5
measurements); this script compiles ONLY the G2 variable-base MSM at the
bench query widths so the persistent cache carries them before bench.py
runs. Widths: aligned_cols(2^20 + 2) = 1081344 (headline leg) and
aligned_cols(2^16 + 2) = 98304.

Run solo (never concurrently with another TPU process):
  timeout 7000 python -u scripts/warm_g2.py [width ...]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

t0 = time.time()


def mark(s):
    print(f"[{time.time()-t0:8.1f}s] {s}", flush=True)


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ckb_zkp_tpu.host.pairing import get_curve  # noqa: E402
from ckb_zkp_tpu.ops.msm import device_group  # noqa: E402


def sync(out):
    for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "ravel"):
            np.asarray(jax.device_get(leaf.ravel()[:1]))


mark(f"backend={jax.default_backend()}")
curve = get_curve("bn254")
dg2 = device_group(curve, "g2")
g = dg2.encode_points([curve.g2.mul(curve.g2_gen, 7)])

widths = [int(w) for w in sys.argv[1:]] or [1081344, 98304]
for n in widths:
    P = jax.tree.map(
        lambda c: jnp.broadcast_to(jnp.asarray(c), (n, *c.shape[1:])), g
    )
    scalars = np.zeros((n, dg2.fr.L), dtype=np.uint32)
    scalars[:, 0] = (np.arange(n) % 65535 + 1).astype(np.uint32)
    t1 = time.time()
    out = dg2.msm(tuple(P), jnp.asarray(scalars))
    sync(out)
    mark(f"g2 msm width {n}: warm in {time.time()-t1:.1f}s")
    t1 = time.time()
    sync(dg2.msm(tuple(P), jnp.asarray(scalars)))
    mark(f"g2 msm width {n}: steady {time.time()-t1:.3f}s")
mark("done")
