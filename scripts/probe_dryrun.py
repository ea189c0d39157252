"""Profile dryrun_multichip stages on the virtual CPU mesh (VERDICT r4 item 1)."""
import os, sys, time

sys.path.insert(0, "/root/repo")

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

t0 = time.time()


def mark(s):
    print(f"[{time.time()-t0:8.1f}s] {s}", flush=True)


import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_compilation_cache", False)
mark(f"jax imported, {len(jax.devices())} devices")

from ckb_zkp_tpu.bench_circuits import square_chain_shape  # noqa: E402
from ckb_zkp_tpu.host.pairing import get_curve  # noqa: E402
from ckb_zkp_tpu.ops.field import device_field  # noqa: E402
from ckb_zkp_tpu.parallel import ShardedDomain, make_mesh  # noqa: E402
from ckb_zkp_tpu.schemes import groth16  # noqa: E402
from ckb_zkp_tpu.schemes.groth16.prover import create_proof_from_shape  # noqa: E402
from ckb_zkp_tpu.schemes.groth16.qap import QapMatrices  # noqa: E402

mark("imports done")
n_devices = 8
curve = get_curve("bn254")
fr = device_field(curve.fr)
mesh = make_mesh(n_devices)

n = 1 << 14
sd = ShardedDomain(curve.fr, n, mesh)
x = fr.encode(list(range(1, 1024 + 1)) + [0] * (n - 1024))
ev = sd.coset_eval(x)
h = sd.coset_interp(fr.mul(ev, ev))
jax.block_until_ready(h)
mark("sharded NTT roundtrip done")

shape = square_chain_shape(max(1 << 12, 8 * n_devices - 2), curve.fr.modulus)
mark("shape built")
params = groth16.generate_parameters_from_shape(
    shape, curve, alpha=5, beta=7, gamma=11, delta=13, t=0xABCDEF0123456789
)
mark("setup done")
qap = QapMatrices(shape, curve.fr)
mark("qap built")
proof = create_proof_from_shape(params, shape, 3, 7, qap=qap, mesh=mesh)
mark("sharded proof done")
single = create_proof_from_shape(params, shape, 3, 7, qap=qap)
mark("single proof done")
assert proof.a == single.a and proof.b == single.b and proof.c == single.c
pvk = groth16.prepare_verifying_key(curve, params.vk)
assert groth16.verify_proof(curve, pvk, proof, shape.input_assignment[1:])
mark("verified")
