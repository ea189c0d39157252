"""aSVC end-to-end (mirrors /root/reference/asvc/tests/test.rs:16-160)."""

import random

import pytest

from ckb_zkp_tpu.host.pairing import get_curve
from ckb_zkp_tpu.schemes import asvc


@pytest.fixture(scope="module")
def setup():
    curve = get_curve("bls12_381")
    rng = random.Random(17)
    params = asvc.key_gen(curve, 8, rng)
    p = curve.fr.modulus
    values = [rng.randrange(p) for _ in range(8)]
    c = asvc.commit(params, values)
    return curve, params, values, c, rng


def test_prove_verify_positions(setup):
    curve, params, values, c, rng = setup
    points = [0, 1, 5]
    proof = asvc.prove_pos(params, values, points)
    assert asvc.verify_pos(params, c, [values[i] for i in points], points, proof)
    assert not asvc.verify_pos(params, c, [values[1], values[0], values[5]], points, proof)


def test_verify_upk(setup):
    curve, params, values, c, rng = setup
    assert asvc.verify_upk(params, 2, params.proving_key.update_keys[2])
    assert not asvc.verify_upk(params, 3, params.proving_key.update_keys[2])


def test_update_same_position(setup):
    curve, params, values, c, rng = setup
    p = curve.fr.modulus
    index, delta = 3, rng.randrange(p)
    uk = params.proving_key.update_keys[index]
    uc = asvc.update_commit(params, c, delta, index, uk)
    proof = asvc.prove_pos(params, values, [index])
    proof = asvc.update_proof(params, proof, delta, index, index, uk, uk)
    assert asvc.verify_pos(params, uc, [(values[index] + delta) % p], [index], proof)


def test_update_other_position(setup):
    curve, params, values, c, rng = setup
    p = curve.fr.modulus
    i, j, delta = 4, 6, rng.randrange(p)
    uk_i = params.proving_key.update_keys[i]
    uk_j = params.proving_key.update_keys[j]
    uc = asvc.update_commit(params, c, delta, j, uk_j)
    proof = asvc.prove_pos(params, values, [i])
    proof = asvc.update_proof(params, proof, delta, i, j, uk_i, uk_j)
    assert asvc.verify_pos(params, uc, [values[i]], [i], proof)


def test_aggregate(setup):
    curve, params, values, c, rng = setup
    points = [2, 7]
    proofs = [asvc.prove_pos(params, values, [pt]) for pt in points]
    agg = asvc.aggregate_proofs(params, points, proofs)
    assert asvc.verify_pos(params, c, [values[i] for i in points], points, agg)
