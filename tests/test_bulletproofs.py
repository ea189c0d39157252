"""Bulletproofs end-to-end (mirrors /root/reference/bulletproofs/tests/mini.rs
and the inline circuit tests in arithmetic_circuit.rs:862-1141)."""

import random

import pytest

from ckb_zkp_tpu.circuits import Mini
from ckb_zkp_tpu.host.pairing import get_curve
from ckb_zkp_tpu.r1cs import ConstraintSystem
from ckb_zkp_tpu.schemes import bulletproofs
from ckb_zkp_tpu.schemes.bulletproofs import inner_product_proof
from ckb_zkp_tpu.schemes.bulletproofs.common import inner_product
from ckb_zkp_tpu.transcript import Transcript


@pytest.fixture(scope="module")
def curve():
    return get_curve("bn254")


@pytest.mark.parametrize("n", [1, 4, 16])
def test_ipp_roundtrip(curve, n):
    rng = random.Random(n)
    p = curve.fr.modulus
    g1 = curve.g1
    gpt = lambda: g1.mul(curve.g1_gen, rng.randrange(1, p))
    g_vec = [gpt() for _ in range(n)]
    h_vec = [gpt() for _ in range(n)]
    u = gpt()
    a = [rng.randrange(p) for _ in range(n)]
    b = [rng.randrange(p) for _ in range(n)]
    c = inner_product(a, b, p)
    P = g1.add(g1.add(g1.msm(g_vec, a), g1.msm(h_vec, b)), g1.mul(u, c))
    t1 = Transcript(b"test")
    proof = inner_product_proof.prove(curve, t1, list(g_vec), list(h_vec), u, P, a, b)
    t2 = Transcript(b"test")
    assert inner_product_proof.verify(curve, t2, list(g_vec), list(h_vec), u, P, proof)
    # tampered proof fails
    t3 = Transcript(b"test")
    bad = inner_product_proof.Proof(proof.L_vec, proof.R_vec, proof.a, (proof.b + 1) % p)
    assert not inner_product_proof.verify(curve, t3, list(g_vec), list(h_vec), u, P, bad)


def test_bulletproofs_mini(curve):
    rng = random.Random(77)
    gens, r1cs, proof = bulletproofs.create_random_proof(
        curve, Mini.power_on(2, 3, 10), rng
    )
    assert bulletproofs.verify_proof(curve, gens, proof, r1cs, [10])
    assert not bulletproofs.verify_proof(curve, gens, proof, r1cs, [11])
