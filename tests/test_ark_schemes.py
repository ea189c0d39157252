"""ark-0.2 wire-format round-trips for the non-groth16 scheme proofs.

Each test proves a small instance, encodes the proof (and key structs where
the reference serializes them) in the ark CanonicalSerialize layout
(serialize/ark_schemes.py), decodes, checks structural equality, and
re-verifies the decoded proof — mirroring the reference's per-scheme
tests/mini.rs skeleton (setup -> prove -> serialize -> deserialize ->
re-verify), SURVEY.md §4.
"""

import random

import pytest

from ckb_zkp_tpu.circuits import Mini
from ckb_zkp_tpu.host.pairing import get_curve
from ckb_zkp_tpu.host.ristretto import Curve25519
from ckb_zkp_tpu.serialize.ark_schemes import ark_decode, ark_encode


@pytest.fixture(scope="module")
def curve():
    return get_curve("bn254")


def _roundtrip(curve, value, cls=None):
    data = ark_encode(curve, value)
    back = ark_decode(curve, data, cls or type(value))
    assert back == value
    assert ark_encode(curve, back) == data
    return back


def test_spartan_nizk_ark_roundtrip(curve):
    from ckb_zkp_tpu.schemes.spartan import nizk

    rng = random.Random(55)
    r1cs = nizk.generate_r1cs(curve, Mini.power_off())
    params = nizk.generate_setup_parameters(
        curve, rng, r1cs.num_aux, r1cs.num_inputs
    )
    h1, h2 = r1cs.r1cs_to_hash(), nizk.params_to_hash(curve, params)
    proof = nizk.create_nizk_proof(
        curve, params, r1cs, Mini.power_on(2, 3, 10), h1, h2, rng
    )
    back = _roundtrip(curve, proof)
    assert nizk.verify_nizk_proof(curve, params, r1cs, [10], back, h1, h2)


def test_spartan_nizk_ark_roundtrip_curve25519():
    from ckb_zkp_tpu.schemes.spartan import nizk

    curve = Curve25519()
    rng = random.Random(56)
    r1cs = nizk.generate_r1cs(curve, Mini.power_off())
    params = nizk.generate_setup_parameters(
        curve, rng, r1cs.num_aux, r1cs.num_inputs
    )
    h1, h2 = r1cs.r1cs_to_hash(), nizk.params_to_hash(curve, params)
    proof = nizk.create_nizk_proof(
        curve, params, r1cs, Mini.power_on(2, 3, 10), h1, h2, rng
    )
    back = _roundtrip(curve, proof)
    assert nizk.verify_nizk_proof(curve, params, r1cs, [10], back, h1, h2)


def test_spartan_snark_ark_roundtrip(curve):
    from ckb_zkp_tpu.schemes.spartan import snark

    rng = random.Random(99)
    setup = snark.generate_random_parameters(curve, Mini.power_off(), rng)
    h1 = setup.r1cs.r1cs_to_hash()
    h2 = snark.snark_params_to_hash(curve, setup.params)
    h3 = snark.encode_to_hash(curve, setup.encode_commit)
    proof = snark.create_snark_proof(
        curve, setup.params, setup.r1cs, Mini.power_on(2, 3, 10),
        setup.encode, setup.encode_commit, h1, h2, h3, rng,
    )
    back = _roundtrip(curve, proof)
    assert snark.verify_snark_proof(
        curve, setup.params, setup.r1cs, [10], back, setup.encode_commit,
        h1, h2, h3,
    )


def test_bulletproofs_ark_roundtrip(curve):
    from ckb_zkp_tpu.schemes import bulletproofs

    rng = random.Random(77)
    gens, r1cs, proof = bulletproofs.create_random_proof(
        curve, Mini.power_on(2, 3, 10), rng
    )
    back = _roundtrip(curve, proof)
    assert bulletproofs.verify_proof(curve, gens, back, r1cs, [10])


def test_marlin_ark_roundtrip(curve):
    from ckb_zkp_tpu.schemes import marlin

    rng = random.Random(123)
    srs = marlin.universal_setup(curve, 128, rng)
    ipk, ivk = marlin.index(srs, Mini.power_off())
    proof = marlin.create_random_proof(ipk, Mini.power_on(2, 3, 10), rng)
    back_vk = _roundtrip(curve, ivk)
    back = _roundtrip(curve, proof)
    assert marlin.verify_proof(back_vk, back, [10])


def test_libra_zk_ark_roundtrip(curve):
    from ckb_zkp_tpu.schemes.libra import Circuit, Parameters, ZKLinearGKRProof

    rng = random.Random(88)
    p = curve.fr.modulus
    inputs = [rng.randrange(p) for _ in range(4)]
    witnesses = [rng.randrange(p) for _ in range(4)]
    layers = [
        [(1, 0, 1), (0, 2, 3), (0, 4, 5), (1, 6, 7)],
        [(0, 0, 1), (1, 2, 3)],
    ]
    circuit = Circuit(len(inputs), len(witnesses), layers)
    params = Parameters.new(curve, rng, 8)
    chash = circuit.circuit_to_hash(curve)
    phash = params.param_to_hash()
    proof, output = ZKLinearGKRProof.prover(
        params, circuit, inputs, witnesses, chash, phash, rng
    )
    back = _roundtrip(curve, proof)
    assert back.verify(params, circuit, output, inputs, chash, phash)


def test_hyrax_ark_roundtrip():
    from ckb_zkp_tpu.schemes.hyrax import Circuit, HyraxProof, Parameters

    curve = get_curve("bls12_381")
    rng = random.Random(42)
    p = curve.fr.modulus
    n = 2
    witnesses = [[rng.randrange(p) for _ in range(4)] for _ in range(n)]
    inputs = [[rng.randrange(p) for _ in range(4)] for _ in range(n)]
    layers = [
        [(1, 0, 1), (0, 2, 3), (0, 4, 5), (1, 6, 7)],
        [(0, 0, 1), (1, 2, 3)],
    ]
    circuit = Circuit(4, 4, layers)
    params = Parameters.new(curve, rng, 8)
    chash = circuit.circuit_to_hash(curve)
    phash = params.param_to_hash()
    proof, outputs = HyraxProof.prover(
        params, witnesses, inputs, circuit, chash, phash, n, rng
    )
    back = _roundtrip(curve, proof)
    assert back.verify(params, outputs, inputs, circuit, chash, phash)


def test_ark_decode_rejects_garbage(curve):
    from ckb_zkp_tpu.schemes.spartan.nizk import EqProof

    data = ark_encode(curve, EqProof(alpha=curve.g1_gen, z=5))
    # trailing bytes rejected
    with pytest.raises(ValueError):
        ark_decode(curve, data + b"\x00", EqProof)
    # truncation rejected
    with pytest.raises(ValueError):
        ark_decode(curve, data[:-1], EqProof)
    # non-canonical field element rejected
    bad = data[:-32] + b"\xff" * 32
    with pytest.raises(ValueError):
        ark_decode(curve, bad, EqProof)
