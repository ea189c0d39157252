"""PLONK end-to-end (mirrors /root/reference/plonk/src/lib.rs:293-377)."""

import random

import pytest

from ckb_zkp_tpu.host.pairing import get_curve
from ckb_zkp_tpu.schemes.plonk import Composer, Plonk, default_ks


@pytest.fixture(scope="module")
def curve():
    return get_curve("bls12_381")


def reference_circuit(p):
    cs = Composer(p)
    v1 = cs.alloc_and_assign(1)
    v2 = cs.alloc_and_assign(2)
    v3 = cs.alloc_and_assign(3)
    v4 = cs.alloc_and_assign(4)
    v6 = cs.alloc_and_assign(6)
    cs.create_add_gate((v1, 1), (v2, 1), v3)
    cs.create_add_gate((v1, 1), (v3, 1), v4)
    cs.create_mul_gate(v2, v2, v4)
    cs.create_mul_gate(v1, v2, v6, q_m=2, q_c=2)
    cs.constrain_to_constant(v6, 6)
    return cs


def test_composer_identities(curve):
    """The algebraic identity check from composer/mod.rs tests."""
    p = curve.fr.modulus
    cs = reference_circuit(p)
    ks = default_ks(p)
    from ckb_zkp_tpu.ops.hdomain import HDomain

    dn = HDomain(curve.fr, cs.size())
    roots = dn.elements
    sel, sigmas = cs.compose(roots, ks)
    w = cs.synthesize(dn.size)
    pi = cs.public_inputs() + [0] * (dn.size - cs.size())
    for i in range(dn.size):
        assert (
            w["w_0"][i] * sel["q_0"][i]
            + w["w_1"][i] * sel["q_1"][i]
            + w["w_2"][i] * sel["q_2"][i]
            + w["w_3"][i] * sel["q_3"][i]
            + w["w_1"][i] * w["w_2"][i] * sel["q_m"][i]
            + sel["q_c"][i]
            + pi[i]
        ) % p == 0
    # permutation product identity
    rng = random.Random(9)
    beta, gamma = rng.randrange(p), rng.randrange(p)
    num = den = 1
    for i in range(dn.size):
        for wi, (k, sig) in enumerate(zip(ks, sigmas)):
            wv = w[f"w_{wi}"][i]
            num = num * ((wv + beta * roots[i] * k + gamma) % p) % p
            den = den * ((wv + beta * sig[i] + gamma) % p) % p
    assert num == den


def test_plonk_end_to_end(curve):
    p = curve.fr.modulus
    rng = random.Random(21)
    cs = reference_circuit(p)
    ks = default_ks(p)
    srs = Plonk.setup(curve, 64, rng)
    pk, vk = Plonk.keygen(curve, srs, cs, ks)
    proof = Plonk.prove(curve, pk, cs, rng)
    assert Plonk.verify(curve, vk, cs.public_inputs(), proof)
    assert not Plonk.verify(curve, vk, [1] + cs.public_inputs()[1:], proof)


def test_plonk_ark_roundtrip(curve):
    """ark-0.2 wire roundtrip for PLONK vk + proof (serialize.py layout)."""
    from ckb_zkp_tpu.schemes.plonk import serialize as pser

    p = curve.fr.modulus
    rng = random.Random(23)
    cs = reference_circuit(p)
    ks = default_ks(p)
    srs = Plonk.setup(curve, 64, rng)
    pk, vk = Plonk.keygen(curve, srs, cs, ks)
    proof = Plonk.prove(curve, pk, cs, rng)

    vk_bytes = pser.vk_to_bytes(curve, vk)
    vk2 = pser.vk_from_bytes(curve, vk_bytes)
    assert pser.vk_to_bytes(curve, vk2) == vk_bytes
    proof_bytes = pser.proof_to_bytes(curve, proof)
    proof2 = pser.proof_from_bytes(curve, proof_bytes)
    assert pser.proof_to_bytes(curve, proof2) == proof_bytes
    assert Plonk.verify(curve, vk2, cs.public_inputs(), proof2)
    # tampering is rejected at decode or verify
    bad = bytearray(proof_bytes)
    bad[5] ^= 1
    try:
        proof3 = pser.proof_from_bytes(curve, bytes(bad))
        ok = Plonk.verify(curve, vk2, cs.public_inputs(), proof3)
    except ValueError:
        ok = False
    assert not ok
