"""Libra plain linear GKR (mirrors /root/reference/libra/tests/test.rs)."""

import pytest

import random

from ckb_zkp_tpu.host.pairing import get_curve
from ckb_zkp_tpu.schemes.libra import Circuit, LinearGKRProof, Parameters, ZKLinearGKRProof


@pytest.fixture(scope="module")
def curve():
    return get_curve("bls12_381")


def reference_circuit():
    """The layered test circuit from libra/tests/test.rs:21-58."""
    inputs = list(range(1, 9))
    witnesses = list(range(9, 17))
    layers = [
        [(1, 0, 1), (0, 2, 3), (0, 4, 5), (1, 6, 7),
         (1, 15, 8), (1, 9, 10), (0, 11, 12), (0, 13, 14)],
        [(1, 0, 1), (0, 2, 3), (0, 4, 5), (1, 6, 7)],
        [(0, 0, 1), (0, 1, 2), (1, 2, 3), (1, 1, 3)],
    ]
    return inputs, witnesses, layers


def test_circuit_evaluate(curve):
    p = curve.fr.modulus
    inputs, witnesses, layers = reference_circuit()
    circuit = Circuit(len(inputs), len(witnesses), layers)
    evals = circuit.evaluate(p, inputs, witnesses)
    assert len(evals) == circuit.depth
    assert len(evals[-1]) == 4


def test_libra_linear_gkr(curve):
    inputs, witnesses, layers = reference_circuit()
    circuit = Circuit(len(inputs), len(witnesses), layers)
    chash = circuit.circuit_to_hash(curve)
    proof, output = LinearGKRProof.prover(curve, circuit, inputs, witnesses, chash)
    inputs2 = witnesses + inputs
    assert proof.verify(curve, circuit, output, inputs2, chash)
    # tampered output fails
    bad = list(output)
    bad[0] = (bad[0] + 1) % curve.fr.modulus
    assert not proof.verify(curve, circuit, bad, inputs2, chash)


def test_libra_zk_linear_gkr(curve):
    rng = random.Random(88)
    inputs, witnesses, layers = reference_circuit()
    circuit = Circuit(len(inputs), len(witnesses), layers)
    params = Parameters.new(curve, rng, 8)
    chash = circuit.circuit_to_hash(curve)
    phash = params.param_to_hash()
    proof, output = ZKLinearGKRProof.prover(
        params, circuit, inputs, witnesses, chash, phash, rng
    )
    assert proof.verify(params, circuit, output, inputs, chash, phash)
    bad = list(output)
    bad[0] = (bad[0] + 1) % curve.fr.modulus
    assert not proof.verify(params, circuit, bad, inputs, chash, phash)


def test_libra_device_sumcheck_matches_host(curve, monkeypatch):
    """Device-resident GKR layer (eval_eq/eval_hg tables + sumcheck rounds
    on device, round scalars only to host) produces byte-identical proofs
    to the host-int path (VERDICT r2 item 4; reference tables:
    libra_linear_gkr.rs:201-244)."""
    import random as _random

    from ckb_zkp_tpu.schemes.libra import linear_gkr

    p = curve.fr.modulus
    rng = _random.Random(17)
    width = 128  # layer bit_size 7 per level
    inputs = [rng.randrange(p) for _ in range(width)]
    witnesses = [rng.randrange(p) for _ in range(width)]
    nprev = 2 * width
    layers = []
    for _ in range(2):
        layers.append(
            [
                (rng.randrange(2), rng.randrange(nprev), rng.randrange(nprev))
                for _ in range(width)
            ]
        )
        nprev = width
    circuit = Circuit(len(inputs), len(witnesses), layers)
    chash = circuit.circuit_to_hash(curve)

    monkeypatch.setattr(linear_gkr, "_use_device", lambda bits: False)
    want, out_w = LinearGKRProof.prover(curve, circuit, inputs, witnesses, chash)
    monkeypatch.setattr(linear_gkr, "_use_device", lambda bits: True)
    got, out_g = LinearGKRProof.prover(curve, circuit, inputs, witnesses, chash)
    assert out_w == out_g
    assert got == want
    assert got.verify(curve, circuit, out_g, witnesses + inputs, chash)


def test_libra_zk_device_sumcheck_matches_host(curve, monkeypatch):
    """zk variant: device round engines produce byte-identical proofs
    (same transcript, same rng stream) to the host path."""
    import random as _random

    from ckb_zkp_tpu.schemes.libra import linear_gkr, zk_linear_gkr

    p = curve.fr.modulus
    rng = _random.Random(23)
    width = 64
    inputs = [rng.randrange(p) for _ in range(width)]
    witnesses = [rng.randrange(p) for _ in range(width)]
    nprev = 2 * width
    layers = []
    for _ in range(2):
        layers.append(
            [
                (rng.randrange(2), rng.randrange(nprev), rng.randrange(nprev))
                for _ in range(width)
            ]
        )
        nprev = width
    circuit = Circuit(len(inputs), len(witnesses), layers)
    # size argument is log2 of the committed witness vector
    params = Parameters.new(curve, _random.Random(9), 6)
    chash = circuit.circuit_to_hash(curve)
    phash = params.param_to_hash()

    # zk_linear_gkr binds _use_device by value at import
    monkeypatch.setattr(zk_linear_gkr, "_use_device", lambda bits: False)
    want, out_w = ZKLinearGKRProof.prover(
        params, circuit, inputs, witnesses, chash, phash, _random.Random(4)
    )
    monkeypatch.setattr(zk_linear_gkr, "_use_device", lambda bits: True)
    got, out_g = ZKLinearGKRProof.prover(
        params, circuit, inputs, witnesses, chash, phash, _random.Random(4)
    )
    assert out_w == out_g
    assert got == want
    assert got.verify(
        params, circuit, out_g, inputs, chash, phash
    )
