"""Hyrax data-parallel zk-GKR (mirrors /root/reference/hyrax/tests/test.rs)."""

import random

import pytest

from ckb_zkp_tpu.host.pairing import get_curve
from ckb_zkp_tpu.schemes.hyrax import Circuit, HyraxProof, Parameters


@pytest.fixture(scope="module")
def curve():
    return get_curve("bls12_381")


def test_hyrax_zk_parallel_gkr(curve):
    p = curve.fr.modulus
    rng = random.Random(42)
    n = 4
    witnesses = [[rng.randrange(p) for _ in range(8)] for _ in range(n)]
    inputs = [[rng.randrange(p) for _ in range(8)] for _ in range(n)]
    layers = [
        [(1, 0, 1), (0, 2, 3), (0, 4, 5), (1, 6, 7),
         (1, 15, 8), (1, 9, 10), (0, 11, 12), (0, 13, 14)],
        [(1, 0, 1), (0, 2, 3), (0, 4, 5), (1, 6, 7)],
        [(0, 0, 1), (0, 1, 2), (1, 2, 3), (1, 1, 3)],
    ]
    circuit = Circuit(8, 8, layers)
    params = Parameters.new(curve, rng, 8)
    chash = circuit.circuit_to_hash(curve)
    phash = params.param_to_hash()
    proof, outputs = HyraxProof.prover(
        params, witnesses, inputs, circuit, chash, phash, n, rng
    )
    assert proof.verify(params, outputs, inputs, circuit, chash, phash)
    # tampered outputs fail
    bad = [list(o) for o in outputs]
    bad[0][0] = (bad[0][0] + 1) % p
    assert not proof.verify(params, bad, inputs, circuit, chash, phash)
