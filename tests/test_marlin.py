"""Marlin end-to-end (mirrors /root/reference/marlin/tests/mini.rs)."""

import random

import pytest

from ckb_zkp_tpu.circuits import Mini
from ckb_zkp_tpu.host.pairing import get_curve
from ckb_zkp_tpu.schemes import marlin


@pytest.fixture(scope="module")
def curve():
    return get_curve("bn254")


def test_marlin_mini(curve):
    rng = random.Random(123)
    srs = marlin.universal_setup(curve, 128, rng)
    ipk, ivk = marlin.index(srs, Mini.power_off())
    proof = marlin.create_random_proof(ipk, Mini.power_on(2, 3, 10), rng)
    assert marlin.verify_proof(ivk, proof, [10])
    assert not marlin.verify_proof(ivk, proof, [11])
