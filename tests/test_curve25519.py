"""Ristretto255 backend (parity: zkp-curve25519 crate + its tests).

RFC 9496 vectors for the encoding; group laws; and the DL-schemes
(spartan nizk, bulletproofs) running on the non-pairing backend, mirroring
the reference's curve25519 configurations.
"""

import random

import pytest

from ckb_zkp_tpu.circuits import Mini
from ckb_zkp_tpu.curve import Curve
from ckb_zkp_tpu.host.ristretto import (
    BASEPOINT,
    IDENTITY,
    L,
    SQRT_M1,
    Curve25519,
    RistrettoGroup,
    RistrettoPoint,
)

RNG = random.Random(2024)

# RFC 9496 §A.1 — small multiples of the basepoint
RFC_MULTIPLES = [
    "0000000000000000000000000000000000000000000000000000000000000000",
    "e2f2ae0a6abc4e71a884a961c500515f58e30b6aa582dd8db6a65945e08d2d76",
    "6a493210f7499cd17fecb510ae0cea23a110e8d5b901f8acadd3095c73a3b919",
    "94741f5d5d52755ece4f23f044ee27d5d1ea1e2bd196b462166b16152a9d0259",
    "da80862773358b466ffadfe0b3293ab3d9fd53c5ea6c955358f568322daf6a57",
]


@pytest.fixture(scope="module")
def g():
    return RistrettoGroup()


def test_rfc_small_multiples(g):
    for k, expect in enumerate(RFC_MULTIPLES):
        assert g.mul(BASEPOINT, k).encode().hex() == expect


def test_group_laws(g):
    a = g.mul(BASEPOINT, RNG.randrange(L))
    b = g.mul(BASEPOINT, RNG.randrange(L))
    assert g.add(a, b) == g.add(b, a)
    assert g.add(a, g.neg(a)) == IDENTITY
    assert g.double(a) == g.add(a, a)
    assert g.mul(BASEPOINT, L) == IDENTITY
    assert g.is_on_curve(a)


def test_encode_decode_roundtrip_and_torsion(g):
    t4 = RistrettoPoint(SQRT_M1, 0, 1, 0)
    for _ in range(5):
        pt = g.mul(BASEPOINT, RNG.randrange(L))
        enc = pt.encode()
        dec = RistrettoPoint.decode(enc)
        assert dec is not None and dec == pt
        # ristretto quotient: adding 4-torsion leaves the encoding unchanged
        assert g.add(pt, t4).encode() == enc
    # invalid encodings rejected: non-canonical / negative
    assert RistrettoPoint.decode(b"\x01" + bytes(31)) is None
    assert RistrettoPoint.decode(bytes(31) + b"\xff") is None


def test_msm_matches_naive(g):
    pts = [g.mul(BASEPOINT, RNG.randrange(L)) for _ in range(15)]
    ss = [RNG.randrange(L) for _ in range(15)]
    acc = IDENTITY
    for p_, s_ in zip(pts, ss):
        acc = g.add(acc, g.mul(p_, s_))
    assert g.msm(pts, ss) == acc


def test_registry_exposes_curve25519():
    c = Curve("curve25519")
    assert c.fr.two_adicity == 2  # fr.rs:16 — no NTT on this curve
    got = c.vartime_multiscalar_mul([3, 5], [BASEPOINT, c.g1.double(BASEPOINT)])
    assert got == c.g1.mul(BASEPOINT, 13)
    with pytest.raises(NotImplementedError):
        c.pairing(BASEPOINT, BASEPOINT)


def test_spartan_nizk_on_curve25519():
    """spartan/tests on the dalek backend (reference default config)."""
    from ckb_zkp_tpu.schemes.spartan import nizk

    curve = Curve25519()
    rng = random.Random(55)
    r1cs = nizk.generate_r1cs(curve, Mini.power_off())
    params = nizk.generate_setup_parameters(curve, rng, r1cs.num_aux, r1cs.num_inputs)
    h1 = r1cs.r1cs_to_hash()
    h2 = nizk.params_to_hash(curve, params)
    proof = nizk.create_nizk_proof(
        curve, params, r1cs, Mini.power_on(2, 3, 10), h1, h2, rng
    )
    assert nizk.verify_nizk_proof(curve, params, r1cs, [10], proof, h1, h2)
    assert not nizk.verify_nizk_proof(curve, params, r1cs, [11], proof, h1, h2)


def test_bulletproofs_on_curve25519():
    from ckb_zkp_tpu.schemes.bulletproofs import arithmetic_circuit as bp

    curve = Curve25519()
    rng = random.Random(7)
    gens, r1cs, proof = bp.create_random_proof(curve, Mini.power_on(2, 3, 10), rng)
    assert bp.verify_proof(curve, gens, proof, r1cs, [10])
    assert not bp.verify_proof(curve, gens, proof, r1cs, [11])
