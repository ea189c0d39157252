"""ark-0.2 wire format: round-trips and structural sizes."""

import random

import pytest

from ckb_zkp_tpu.host.pairing import get_curve
from ckb_zkp_tpu.serialize import G1Codec, G2Codec
from ckb_zkp_tpu.serialize.ark import FLAG_INFINITY
import io

RNG = random.Random(5)


@pytest.fixture(scope="module", params=["bn254", "bls12_381"])
def curve(request):
    return get_curve(request.param)


def test_g1_roundtrip(curve):
    codec = G1Codec(curve)
    nb = curve.fq.nbytes
    for k in [1, 2, 12345, RNG.randrange(curve.fr.modulus)]:
        p = curve.g1.mul(curve.g1_gen, k)
        data = codec.to_bytes(p)
        assert len(data) == nb
        assert codec.read(io.BytesIO(data)) == p
        un = codec.to_bytes_uncompressed(p)
        assert len(un) == 2 * nb
        assert codec.read_uncompressed(io.BytesIO(un)) == p


def test_g2_roundtrip(curve):
    codec = G2Codec(curve)
    nb = curve.fq.nbytes
    for k in [1, 7, RNG.randrange(curve.fr.modulus)]:
        p = curve.g2.mul(curve.g2_gen, k)
        data = codec.to_bytes(p)
        assert len(data) == 2 * nb
        assert codec.read(io.BytesIO(data)) == p


def test_infinity(curve):
    for codec in (G1Codec(curve), G2Codec(curve)):
        data = codec.to_bytes(codec.group.infinity)
        assert data[-1] & FLAG_INFINITY
        assert codec.read(io.BytesIO(data)).infinity


def test_y_sign_flags(curve):
    codec = G1Codec(curve)
    p = curve.g1.mul(curve.g1_gen, 3)
    q = curve.g1.neg(p)
    dp, dq = codec.to_bytes(p), codec.to_bytes(q)
    assert dp[:-1] == dq[:-1] and dp[-1] != dq[-1]
    assert codec.read(io.BytesIO(dp)) == p
    assert codec.read(io.BytesIO(dq)) == q


def test_bad_point_rejected(curve):
    codec = G1Codec(curve)
    nb = curve.fq.nbytes
    # x=3 is (very likely) not on curve for either curve; otherwise value error
    data = bytearray((5).to_bytes(nb, "little"))
    with pytest.raises(ValueError):
        codec.read(io.BytesIO(bytes(data)))
        codec.read(io.BytesIO(bytes([0xFF] * nb)))  # non-canonical
