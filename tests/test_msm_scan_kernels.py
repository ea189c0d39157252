"""In-kernel MSM block-scan kernels vs the XLA path (CPU, interpret mode).

Runs the Pallas block-total kernels and the boundary-prefix machinery in a
subprocess with CKB_ZKP_TPU_PALLAS_INTERPRET=1 (interpret mode must be set
before the pallas modules import), comparing bit-for-bit against the plain
XLA EC ops.
"""

import os
import subprocess
import sys

import pytest

_SCRIPT = r"""
import os
os.environ["CKB_ZKP_TPU_PALLAS_INTERPRET"] = "1"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

from ckb_zkp_tpu.host.pairing import get_curve
from ckb_zkp_tpu.ops import ec
from ckb_zkp_tpu.ops.msm import device_group
from ckb_zkp_tpu.ops.pallas_ec import ec_block_totals_add, ec_block_totals_madd

curve = get_curve("bn254")
dg = device_group(curve, "g1")
fq = dg.fq
host = curve.g1
rng = np.random.default_rng(3)

B = 32
n = 32 * 8 * 128  # minimum kernel batch: B * SCAN_SUBS * LANES
reps = [host.mul(curve.g1_gen, k + 1) for k in range(61)] + [host.infinity]
idx = rng.integers(0, len(reps), size=n)
pts = [reps[i] for i in idx]
P = dg.encode_points(pts)
X, Y, Z = P
inf = fq.is_zero(Z)

# reference block totals via the XLA scan path
G = n // B

@jax.jit
def reference(P):
    resh = jax.tree.map(lambda c: c.reshape(G, B, c.shape[-1]), P)
    moved = jax.tree.map(lambda c: jnp.moveaxis(c, 1, 0), resh)

    def step(acc, x):
        return ec.ec_add(fq, acc, x), None

    acc, _ = jax.lax.scan(step, dg.p_identity((G,)), moved)
    return acc

want = [np.asarray(jax.device_get(c)) for c in reference((X, Y, Z))]

got = jax.jit(lambda lv: ec_block_totals_madd(fq, lv, B))((X, Y, inf))
got = [np.asarray(jax.device_get(c)) for c in got]
assert all(np.array_equal(a, b) for a, b in zip(want, got)), "madd totals"

got2 = jax.jit(lambda P: ec_block_totals_add(fq, P, B))((X, Y, Z))
got2 = [np.asarray(jax.device_get(c)) for c in got2]
assert all(np.array_equal(a, b) for a, b in zip(want, got2)), "jac totals"

# boundary prefixes vs a host-side running sum
q = np.array([-1, 0, 5, 31, 32, 1000, n // 2, n - 1], dtype=np.int32)
E = jax.jit(dg._prefix_boundary_leaf)((X, Y, inf), jnp.asarray(q))
epts = dg.decode_points_host(E)
run = host.infinity
prefixes = []
for p_ in pts:
    run = host.add(run, p_)
    prefixes.append(run)
for qi, e in zip(q, epts):
    want_pt = host.infinity if qi < 0 else prefixes[qi]
    assert e == want_pt, f"prefix at {qi}"
print("OK")
"""


@pytest.mark.slow
@pytest.mark.skipif(
    os.environ.get("CKB_ZKP_TPU_RUN_INTERPRET_TESTS", "") in ("", "0"),
    reason="interpret-mode Pallas on CPU takes ~30+ min; the TPU-gated "
    "oracle test (test_msm_kernel_path_oracle) is the primary check",
)
def test_block_scan_kernels_interpret_mode():
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(__file__)), env.get("PYTHONPATH", "")]
    )
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        env=env,
        timeout=1800,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "OK" in out.stdout


def test_msm_kernel_path_oracle():
    """Full MSM through the in-kernel scan path vs the host oracle.

    Only meaningful on a TPU backend (the kernel path is gated on it);
    skipped on CPU where the fallback path is already covered elsewhere.
    """
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("kernel path only engages on TPU")
    import numpy as np
    from ckb_zkp_tpu.host.pairing import get_curve
    from ckb_zkp_tpu.ops.msm import device_group

    curve = get_curve("bn254")
    dg = device_group(curve, "g1")
    host = curve.g1
    rng = np.random.default_rng(9)
    n = 1 << 15  # minimum size for the block-scan kernels
    reps = [host.mul(curve.g1_gen, k + 1) for k in range(127)] + [host.infinity]
    idx = rng.integers(0, len(reps), size=n)
    pts = [reps[i] for i in idx]
    ss = [int(x) for x in rng.integers(0, 2**63, size=n)]
    ss[5] = 0
    got = dg.decode_point(dg.msm(dg.encode_points(pts), dg.encode_scalars(ss)))
    agg = {}
    for i, k in enumerate(idx):
        agg[k] = agg.get(k, 0) + ss[i]
    want = host.msm([reps[k] for k in agg], list(agg.values()))
    assert got == want
