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


def test_hyrax_device_tables_match_host(curve, monkeypatch):
    """Device-resident 3-phase sumcheck tables (VERDICT r2 item 4,
    zk_sumcheck_proof.rs:493-620) produce byte-identical proofs to the
    host-int path under the same rng stream."""
    from ckb_zkp_tpu.schemes.hyrax import zk_sumcheck

    p = curve.fr.modulus
    rng = random.Random(11)
    n = 16  # instances (the data-parallel axis)
    witnesses = [[rng.randrange(p) for _ in range(8)] for _ in range(n)]
    inputs = [[rng.randrange(p) for _ in range(8)] for _ in range(n)]
    layers = [
        [(1, 0, 1), (0, 2, 3), (0, 4, 5), (1, 6, 7),
         (1, 15, 8), (1, 9, 10), (0, 11, 12), (0, 13, 14)],
        [(1, 0, 1), (0, 2, 3), (0, 4, 5), (1, 6, 7)],
        [(0, 0, 1), (0, 1, 2), (1, 2, 3), (1, 1, 3)],
    ]
    circuit = Circuit(8, 8, layers)
    # size argument is log2 of the committed witness vector (8*n = 128)
    params = Parameters.new(curve, random.Random(2), 7)
    chash = circuit.circuit_to_hash(curve)
    phash = params.param_to_hash()

    monkeypatch.setattr(zk_sumcheck, "_use_device_tables", lambda n_, g_: False)
    want, out_w = HyraxProof.prover(
        params, witnesses, inputs, circuit, chash, phash, n, random.Random(6)
    )
    monkeypatch.setattr(zk_sumcheck, "_use_device_tables", lambda n_, g_: True)
    got, out_g = HyraxProof.prover(
        params, witnesses, inputs, circuit, chash, phash, n, random.Random(6)
    )
    assert out_w == out_g
    assert got == want
    assert got.verify(params, out_g, inputs, circuit, chash, phash)
