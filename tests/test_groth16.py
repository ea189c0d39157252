"""Groth16 end-to-end on the Mini circuit.

Mirrors the reference's golden-path integration test
(/root/reference/groth16/tests/mini.rs:46-97): setup -> prove -> verify, plus
rejection of wrong public inputs. (De)serialization round-trip parity is
covered in test_serialize once the serializer lands.
"""

import random

import pytest

from ckb_zkp_tpu.circuits import Mini
from ckb_zkp_tpu.host.pairing import get_curve
from ckb_zkp_tpu.r1cs import ConstraintSystem, SynthesisMode
from ckb_zkp_tpu.schemes import groth16


@pytest.fixture(scope="module", params=["bn254", "bls12_381"])
def curve(request):
    return get_curve(request.param)


@pytest.fixture(scope="module")
def params(curve):
    rng = random.Random(42)
    return groth16.generate_random_parameters(Mini.power_off(), curve, rng)


def test_mini_constraint_satisfaction(curve):
    cs = ConstraintSystem(SynthesisMode.PROVE)
    Mini.power_on(2, 3, 10).generate_constraints(cs)
    assert cs.is_satisfied(curve.fr.modulus)
    cs2 = ConstraintSystem(SynthesisMode.PROVE)
    Mini.power_on(2, 3, 11).generate_constraints(cs2)
    assert cs2.which_is_unsatisfied(curve.fr.modulus) == "x * (y + 2) = z"


@pytest.mark.parametrize("zk", [True, False])
def test_groth16_mini_end_to_end(curve, params, zk):
    if zk and curve.name != "bn254":
        pytest.skip("zk prove exercised on bn254; bls12_381 covers no_zk")
    rng = random.Random(7)
    circuit = Mini.power_on(2, 3, 10)
    if zk:
        proof = groth16.create_random_proof(params, circuit, rng)
    else:
        proof = groth16.create_proof_no_zk(params, circuit)
    assert curve.g1.is_on_curve(proof.a)
    assert curve.g2.is_on_curve(proof.b)
    assert curve.g1.is_on_curve(proof.c)
    pvk = groth16.prepare_verifying_key(curve, params.vk)
    assert groth16.verify_proof(curve, pvk, proof, [10])
    assert not groth16.verify_proof(curve, pvk, proof, [11])
    assert not groth16.verify_proof(curve, pvk, proof, [10, 1])
