"""Pallas mont-mul kernel math vs the XLA DeviceField path (CPU-checkable).

The pallas_call plumbing itself only runs on TPU; here the limb-row helpers
(_conv_lazy/_ripple/_cond_sub_p/_mont_mul_rows) are exercised as plain jnp
code against DeviceField.mul, which the TPU kernel must match bit-for-bit.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ckb_zkp_tpu.host.pairing import get_curve
from ckb_zkp_tpu.ops.field import device_field
from ckb_zkp_tpu.ops.pallas_field import _mont_mul_rows


@pytest.mark.parametrize(
    "cname,fieldsel",
    [("bn254", "fr"), ("bn254", "fq"), ("bls12_381", "fq")],
)
def test_mont_mul_rows_matches_device_field(cname, fieldsel):
    curve = get_curve(cname)
    spec = getattr(curve, fieldsel)
    df = device_field(spec)
    rng = np.random.default_rng(hash((cname, fieldsel)) % 2**32)
    n = 64
    xs = [int(x) % spec.modulus for x in rng.integers(0, 2**63, size=n) ** 2]
    ys = [int(x) % spec.modulus for x in rng.integers(1, 2**63, size=n) ** 2]
    xs[0] = 0
    ys[1] = spec.modulus - 1
    A = df.encode(xs)
    B = df.encode(ys)
    want = np.asarray(jax.device_get(df.mul(A, B)))

    a_rows = [A.T[i] for i in range(df.L)]
    b_rows = [B.T[i] for i in range(df.L)]
    out = _mont_mul_rows(
        a_rows,
        b_rows,
        tuple(int(v) for v in df.p_limbs),
        tuple(int(v) for v in df.nprime_limbs),
    )
    got = np.asarray(jax.device_get(jnp.stack(out, axis=0).T))
    assert np.array_equal(want, got)
