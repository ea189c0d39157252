"""RCB Pallas kernels vs the XLA fallbacks (CPU, interpret mode).

Bit-exactness: the kernels implement the identical RCB formula chains as
ops/rcb.py over the identical Montgomery limb ops, so outputs must match
the XLA path bit-for-bit, including identity handling and inf-flagged
leaves.
"""

import os
import subprocess
import sys

_SCRIPT = r"""
import os
os.environ["CKB_ZKP_TPU_PALLAS_INTERPRET"] = "1"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

from ckb_zkp_tpu.host.pairing import get_curve
from ckb_zkp_tpu.ops.msm import _scan_prefix_madd, device_group
from ckb_zkp_tpu.ops.rcb import rcb_group
from ckb_zkp_tpu.ops import pallas_rcb

GROUP = os.environ["RCB_TEST_GROUP"]
curve = get_curve("bn254")
dg = device_group(curve, GROUP)
rg = rcb_group(dg)
cf = dg.cf
host = dg.host_group
gen = curve.g1_gen if GROUP == "g1" else curve.g2_gen
rng = np.random.default_rng(5)

B = 4  # production uses B = 32; the kernels are B-generic and interpret
n = B * 8 * 128  # mode at the production block size is too slow for CI
reps = [host.mul(gen, k + 1) for k in range(23)] + [host.infinity]
idx = rng.integers(0, len(reps), size=n)
P = dg.encode_points([reps[i] for i in idx])
X, Y, Z = P
inf = cf.is_zero(Z)


def get(t):
    return [np.asarray(jax.device_get(c)) for c in jax.tree.leaves(t)]


def expect_eq(name, a, b):
    for x, y in zip(get(a), get(b)):
        assert x.shape == y.shape and (x == y).all(), name
    print("ok", name)


q = jnp.asarray(rng.integers(0, n, size=97).astype(np.int32))

# fallback reference (kernel-incapable: use_pallas is False on CPU)
wf_get, T_ref = _scan_prefix_madd(rg, (X, Y, inf), B)
w_get, T = pallas_rcb.rcb_scan_prefix_madd(rg, (X, Y, inf), B)
expect_eq("prefix_madd.T", T, T_ref)
expect_eq("prefix_madd.W[q]", jax.jit(w_get)(q), jax.jit(wf_get)(q))

# projective-projective scan over the totals' own leaves
pts = jax.jit(lambda p: rg.from_affine_enc(p))((X, Y, Z))
W2, T2 = jax.jit(lambda p: pallas_rcb.rcb_scan_prefix_add(rg, p, B))(pts)


def ref_scan(p):
    G = n // B
    moved = jax.tree.map(
        lambda c: jnp.moveaxis(c.reshape(G, B, *c.shape[1:]), 1, 0), p
    )

    def step(acc, x):
        nxt = rg.add(acc, x)
        return nxt, nxt

    T, Wb = jax.lax.scan(step, rg.identity((G,)), moved)
    W = jax.tree.map(
        lambda c: jnp.moveaxis(c, 0, 1).reshape(n, *c.shape[2:]), Wb
    )
    return W, T


W2_ref, T2_ref = jax.jit(ref_scan)(pts)
expect_eq("prefix_add.W", W2, W2_ref)
expect_eq("prefix_add.T", T2, T2_ref)

T3 = jax.jit(lambda p: pallas_rcb.rcb_scan_total_add(rg, p, B))(pts)
expect_eq("total_add.T", T3, T2_ref)

# elementwise kernels
Q = jax.tree.map(lambda c: jnp.flip(c, axis=0), pts)
expect_eq(
    "add_elementwise",
    jax.jit(lambda a, b: pallas_rcb.rcb_add_pallas(rg, a, b))(pts, Q),
    jax.jit(lambda a, b: rg.add(a, b))(pts, Q),
)
expect_eq(
    "madd_elementwise",
    jax.jit(lambda a, lv: pallas_rcb.rcb_madd_pallas(rg, a, lv))(
        pts, (X, Y, inf)
    ),
    jax.jit(lambda a, lv: rg.madd(a, lv))(pts, (X, Y, inf)),
)
print("ALL OK", GROUP)
"""


import pytest

_INTERPRET_GATE = pytest.mark.skipif(
    os.environ.get("CKB_ZKP_TPU_RUN_INTERPRET_TESTS", "") in ("", "0"),
    reason="interpret-mode Pallas on CPU takes 30+ min to compile; the "
    "TPU-gated oracle test (test_msm_scan_kernels.py) and the CPU "
    "fallback-path equality tests are the primary checks",
)


def _run(group):
    env = dict(os.environ)
    env["RCB_TEST_GROUP"] = group
    env.setdefault("PYTHONPATH", "")
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep
        + env["PYTHONPATH"]
    )
    res = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert f"ALL OK {group}" in res.stdout


@_INTERPRET_GATE
def test_rcb_kernels_g1():
    _run("g1")


@_INTERPRET_GATE
def test_rcb_kernels_g2():
    _run("g2")
