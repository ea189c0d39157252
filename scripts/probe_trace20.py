"""One CKB_ZKP_TPU_TRACE=1 Groth16 prove at 2^20 on the TPU (NEXT item 6 /
VERDICT r4 item 2): locate the ~3-4 s of prove glue the sub-metrics miss.

Run:  timeout 2400 python -u scripts/probe_trace20.py 2>&1
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ["CKB_ZKP_TPU_TRACE"] = "1"

t0 = time.time()


def mark(s):
    print(f"[{time.time()-t0:8.1f}s] {s}", file=sys.stderr, flush=True)


import jax  # noqa: E402
import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def sync(out):
    for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "ravel"):
            np.asarray(jax.device_get(leaf.ravel()[:1]))


mark(f"backend={jax.default_backend()}")
x = jnp.arange(8 * 128, dtype=jnp.uint32).reshape(8, 128)
sync(x + x)
mark("session up")

from ckb_zkp_tpu.bench_circuits import square_chain_shape  # noqa: E402
from ckb_zkp_tpu.host.pairing import get_curve  # noqa: E402
from ckb_zkp_tpu.schemes import groth16  # noqa: E402
from ckb_zkp_tpu.schemes.groth16.prover import create_proof_from_shape  # noqa: E402
from ckb_zkp_tpu.schemes.groth16.qap import QapMatrices  # noqa: E402

k = int(sys.argv[1]) if len(sys.argv) > 1 else 20
n = 1 << k
curve = get_curve("bn254")
shape = square_chain_shape(n, curve.fr.modulus)
qap = QapMatrices(shape, curve.fr)
mark("shape+qap built")

params = groth16.generate_parameters_from_shape(
    shape, curve, alpha=5, beta=7, gamma=11, delta=13, t=0xABCDEF0123456789
)
sync(params.a_query)
sync(params.b_g2_query)
mark("setup done")

proof = create_proof_from_shape(params, shape, 0, 0, qap=qap)
mark("warm prove done (stages above include compiles/loads)")

print("==== steady-state traced prove ====", file=sys.stderr, flush=True)
t1 = time.time()
proof = create_proof_from_shape(params, shape, 0, 0, qap=qap)
mark(f"TRACED PROVE TOTAL: {time.time()-t1:.3f}s")

t1 = time.time()
proof = create_proof_from_shape(params, shape, 0, 0, qap=qap)
mark(f"second traced prove: {time.time()-t1:.3f}s")
