"""KZG10: poly ops oracle checks + commit/open/check round trip.

Mirrors /root/reference/marlin/src/pc/kzg10.rs:229-270 (random-degree loop).
"""

import random

import pytest

from ckb_zkp_tpu.host.pairing import get_curve
from ckb_zkp_tpu.ops.field import device_field
from ckb_zkp_tpu.ops import poly
from ckb_zkp_tpu.schemes import kzg10

RNG = random.Random(2024)


@pytest.fixture(scope="module")
def curve():
    return get_curve("bls12_381")


def test_poly_ops(curve):
    p = curve.fr.modulus
    df = device_field(curve.fr)
    a = [RNG.randrange(p) for _ in range(7)]
    b = [RNG.randrange(p) for _ in range(5)]
    prod = df.decode(poly.poly_mul(df, df.encode(a), df.encode(b)))
    expect = [0] * 11
    for i, ai in enumerate(a):
        for j, bj in enumerate(b):
            expect[i + j] = (expect[i + j] + ai * bj) % p
    assert prod == expect
    x = RNG.randrange(p)
    ev = df.decode_scalar(poly.poly_eval(df, df.encode(a), x))
    assert ev == sum(c * pow(x, i, p) for i, c in enumerate(a)) % p
    q, r = poly.poly_divide_linear(df, df.encode(a), x)
    qh = df.decode(q)
    rh = df.decode_scalar(r)
    assert rh == ev  # remainder = p(x)
    # reconstruct: q*(X-x) + r == a
    recon = [0] * 7
    for i, qc in enumerate(qh):
        recon[i + 1] = (recon[i + 1] + qc) % p
        recon[i] = (recon[i] - qc * x) % p
    recon[0] = (recon[0] + rh) % p
    assert recon == a


@pytest.mark.parametrize("hiding", [None, 2])
def test_kzg10_end_to_end(curve, hiding):
    p = curve.fr.modulus
    df = device_field(curve.fr)
    rng = random.Random(11)
    pp = kzg10.setup(curve, 12, rng)
    ck, vk = kzg10.trim(pp, 8)
    coeffs = [RNG.randrange(p) for _ in range(7)]
    cdev = df.encode(coeffs)
    comm, rand = kzg10.commit(ck, cdev, hiding_bound=hiding, rng=rng)
    point = RNG.randrange(p)
    value = sum(c * pow(point, i, p) for i, c in enumerate(coeffs)) % p
    proof = kzg10.open_at(ck, cdev, point, rand)
    assert kzg10.check(vk, comm, point, value, proof)
    assert not kzg10.check(vk, comm, point, (value + 1) % p, proof)
