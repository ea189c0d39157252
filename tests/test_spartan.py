"""Spartan NIZK end-to-end (mirrors /root/reference/spartan/tests/mini.rs)."""

import random

import pytest

from ckb_zkp_tpu.circuits import Mini
from ckb_zkp_tpu.host.pairing import get_curve
from ckb_zkp_tpu.schemes.spartan import nizk
from ckb_zkp_tpu.schemes.spartan.polynomial import eval_eq, evaluate_mle


@pytest.fixture(scope="module")
def curve():
    return get_curve("bn254")


def test_eval_eq_sums_to_one(curve):
    p = curve.fr.modulus
    rng = random.Random(3)
    r = [rng.randrange(p) for _ in range(4)]
    table = eval_eq(r, p)
    assert sum(table) % p == 1


def test_spartan_nizk_mini(curve):
    rng = random.Random(55)
    r1cs = nizk.generate_r1cs(curve, Mini.power_off())
    params = nizk.generate_setup_parameters(
        curve, rng, r1cs.num_aux, r1cs.num_inputs
    )
    r1cs_hash = r1cs.r1cs_to_hash()
    params_hash = nizk.params_to_hash(curve, params)
    proof = nizk.create_nizk_proof(
        curve, params, r1cs, Mini.power_on(2, 3, 10), r1cs_hash, params_hash, rng
    )
    assert nizk.verify_nizk_proof(
        curve, params, r1cs, [10], proof, r1cs_hash, params_hash
    )
    assert not nizk.verify_nizk_proof(
        curve, params, r1cs, [11], proof, r1cs_hash, params_hash
    )
