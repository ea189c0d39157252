"""Cell-data verifier parity (mirrors ckb-contracts/bench-tests/proving_test).

Proves off-chain, serializes the artifacts to 'cells', and runs the portable
verifier entry — accept on valid data, reject on tampered cells.
"""

import random

import pytest

from ckb_zkp_tpu import contracts
from ckb_zkp_tpu.circuits import Mini
from ckb_zkp_tpu.host.pairing import get_curve
from ckb_zkp_tpu.schemes import groth16
from ckb_zkp_tpu.schemes.groth16 import serialize as g16ser
from ckb_zkp_tpu.serialize.tobytes import fr_bytes


def test_universal_groth16_verifier_cells():
    curve = get_curve("bn254")
    rng = random.Random(3)
    params = groth16.generate_random_parameters(Mini.power_off(), curve, rng)
    proof = groth16.create_proof_no_zk(params, Mini.power_on(2, 3, 10))
    vk_cell = g16ser.vk_to_bytes(curve, params.vk)
    proof_cell = g16ser.proof_to_bytes(curve, proof)
    publics_cell = fr_bytes(curve, 10)
    assert contracts.universal_groth16_verifier(
        "bn254", vk_cell, proof_cell, publics_cell
    ) == contracts.OK
    assert contracts.universal_groth16_verifier(
        "bn254", vk_cell, proof_cell, fr_bytes(curve, 11)
    ) == contracts.ERR_VERIFY
    assert contracts.universal_groth16_verifier(
        "bn254", vk_cell, proof_cell[:-5], publics_cell
    ) == contracts.ERR_ENCODING
    assert contracts.universal_groth16_verifier(
        "bn254", vk_cell, proof_cell, publics_cell[:-1]
    ) == contracts.ERR_ENCODING


# ---- the remaining contract verifiers (ark-0.2 cells) ----

from ckb_zkp_tpu.serialize.ark_schemes import FR, S, Tup, Vec, ark_encode


def _frs(curve, xs):
    return b"".join(fr_bytes(curve, x) for x in xs)


def test_universal_marlin_verifier_cells():
    from ckb_zkp_tpu.schemes.marlin import marlin

    curve = get_curve("bn254")
    rng = random.Random(123)
    srs = marlin.universal_setup(curve, 128, rng)
    ipk, ivk = marlin.index(srs, Mini.power_off())
    proof = marlin.create_random_proof(ipk, Mini.power_on(2, 3, 10), rng)
    vk_cell = ark_encode(curve, ivk)
    proof_cell = ark_encode(curve, proof)
    assert contracts.universal_marlin_verifier(
        "bn254", vk_cell, proof_cell, _frs(curve, [10])
    ) == contracts.OK
    assert contracts.universal_marlin_verifier(
        "bn254", vk_cell, proof_cell, _frs(curve, [11])
    ) == contracts.ERR_VERIFY
    assert contracts.universal_marlin_verifier(
        "bn254", vk_cell, proof_cell[:-3], _frs(curve, [10])
    ) == contracts.ERR_ENCODING


def test_universal_plonk_verifier_cells():
    from ckb_zkp_tpu.schemes.plonk import serialize as pser
    from ckb_zkp_tpu.schemes.plonk.plonk import Plonk
    from tests.test_plonk import default_ks, reference_circuit

    curve = get_curve("bn254")
    p = curve.fr.modulus
    rng = random.Random(21)
    cs = reference_circuit(p)
    srs = Plonk.setup(curve, 64, rng)
    pk, vk = Plonk.keygen(curve, srs, cs, default_ks(p))
    proof = Plonk.prove(curve, pk, cs, rng)
    vk_cell = pser.vk_to_bytes(curve, vk)
    proof_cell = pser.proof_to_bytes(curve, proof)
    publics = cs.public_inputs()
    assert contracts.universal_plonk_verifier(
        "bn254", vk_cell, proof_cell, ark_encode(curve, publics, Vec(FR))
    ) == contracts.OK
    bad = [1] + publics[1:]
    assert contracts.universal_plonk_verifier(
        "bn254", vk_cell, proof_cell, ark_encode(curve, bad, Vec(FR))
    ) == contracts.ERR_VERIFY


def test_universal_spartan_verifier_cells():
    from ckb_zkp_tpu.schemes.spartan import nizk, snark
    from ckb_zkp_tpu.schemes.spartan.common import NizkParameters

    curve = get_curve("bn254")
    rng = random.Random(55)
    # nizk
    r1cs = nizk.generate_r1cs(curve, Mini.power_off())
    params = nizk.generate_setup_parameters(curve, rng, r1cs.num_aux, r1cs.num_inputs)
    proof = nizk.create_nizk_proof(
        curve, params, r1cs, Mini.power_on(2, 3, 10),
        r1cs.r1cs_to_hash(), nizk.params_to_hash(curve, params), rng,
    )
    vk_cell = ark_encode(
        curve, (params, r1cs), Tup(S(NizkParameters), S(nizk.R1CSInstance))
    )
    assert contracts.universal_spartan_nizk_verifier(
        "bn254", vk_cell, ark_encode(curve, proof), _frs(curve, [10])
    ) == contracts.OK
    assert contracts.universal_spartan_nizk_verifier(
        "bn254", vk_cell, ark_encode(curve, proof), _frs(curve, [11])
    ) == contracts.ERR_VERIFY
    # snark
    setup = snark.generate_random_parameters(curve, Mini.power_off(), rng)
    sproof = snark.create_snark_proof(
        curve, setup.params, setup.r1cs, Mini.power_on(2, 3, 10),
        setup.encode, setup.encode_commit,
        setup.r1cs.r1cs_to_hash(),
        snark.snark_params_to_hash(curve, setup.params),
        snark.encode_to_hash(curve, setup.encode_commit), rng,
    )
    svk_cell = ark_encode(
        curve,
        (setup.params, setup.r1cs, setup.encode_commit),
        Tup(
            S(snark.SnarkParameters),
            S(nizk.R1CSInstance),
            S(snark.EncodeCommit),
        ),
    )
    assert contracts.universal_spartan_snark_verifier(
        "bn254", svk_cell, ark_encode(curve, sproof), _frs(curve, [10])
    ) == contracts.OK
    assert contracts.universal_spartan_snark_verifier(
        "bn254", svk_cell, ark_encode(curve, sproof), _frs(curve, [11])
    ) == contracts.ERR_VERIFY


def test_mini_bulletproofs_verifier_cells():
    from ckb_zkp_tpu.schemes.bulletproofs import arithmetic_circuit as bp

    curve = get_curve("bn254")
    rng = random.Random(7)
    gens, r1cs, proof = bp.create_random_proof(curve, Mini.power_on(2, 3, 10), rng)
    proof_cell = ark_encode(
        curve, (gens, r1cs, proof),
        Tup(S(bp.Generators), S(bp.R1csCircuit), S(bp.Proof)),
    )
    assert contracts.mini_bulletproofs_verifier(
        "bn254", b"", proof_cell, _frs(curve, [10])
    ) == contracts.OK
    assert contracts.mini_bulletproofs_verifier(
        "bn254", b"", proof_cell, _frs(curve, [11])
    ) == contracts.ERR_VERIFY
    assert contracts.mini_bulletproofs_verifier(
        "bn254", b"", proof_cell[:-4], _frs(curve, [10])
    ) == contracts.ERR_ENCODING


def test_mini_gkr_verifier_cells():
    from ckb_zkp_tpu.schemes.hyrax.circuit import Circuit as HyCircuit
    from ckb_zkp_tpu.schemes.hyrax.hyrax_proof import HyraxProof
    from ckb_zkp_tpu.schemes.hyrax.params import Parameters as HyParams
    from ckb_zkp_tpu.schemes.libra.circuit import Circuit as LiCircuit
    from ckb_zkp_tpu.schemes.libra.zk_linear_gkr import (
        Parameters as LiParams,
        ZKLinearGKRProof,
    )
    from tests.test_libra import reference_circuit

    curve = get_curve("bn254")
    p = curve.fr.modulus
    rng = random.Random(88)
    # libra (non-mini circuit: passed explicitly, cells stay pure ark bytes)
    inputs, witnesses, layers = reference_circuit()
    circuit = LiCircuit(len(inputs), len(witnesses), layers)
    params = LiParams.new(curve, rng, 8)
    chash = circuit.circuit_to_hash(curve)
    phash = params.param_to_hash()
    proof, output = ZKLinearGKRProof.prover(
        params, circuit, inputs, witnesses, chash, phash, rng
    )
    vk_cell = ark_encode(curve, params)
    pub_cell = ark_encode(curve, (inputs, output), Tup(Vec(FR), Vec(FR)))
    assert contracts.mini_libra_zk_linear_gkr_verifier(
        "bn254", vk_cell, ark_encode(curve, proof), pub_cell, circuit=circuit
    ) == contracts.OK
    bad = [(output[0] + 1) % p] + list(output[1:])
    bad_cell = ark_encode(curve, (inputs, bad), Tup(Vec(FR), Vec(FR)))
    assert contracts.mini_libra_zk_linear_gkr_verifier(
        "bn254", vk_cell, ark_encode(curve, proof), bad_cell, circuit=circuit
    ) == contracts.ERR_VERIFY
    # hyrax
    rng = random.Random(42)
    n = 4
    hw = [[rng.randrange(p) for _ in range(8)] for _ in range(n)]
    hi = [[rng.randrange(p) for _ in range(8)] for _ in range(n)]
    hlayers = [
        [(1, 0, 1), (0, 2, 3), (0, 4, 5), (1, 6, 7),
         (1, 15, 8), (1, 9, 10), (0, 11, 12), (0, 13, 14)],
        [(1, 0, 1), (0, 2, 3), (0, 4, 5), (1, 6, 7)],
        [(0, 0, 1), (0, 1, 2), (1, 2, 3), (1, 1, 3)],
    ]
    hcircuit = HyCircuit(8, 8, hlayers)
    hparams = HyParams.new(curve, rng, 8)
    hproof, houtputs = HyraxProof.prover(
        hparams, hw, hi, hcircuit,
        hcircuit.circuit_to_hash(curve), hparams.param_to_hash(), n, rng,
    )
    hvk_cell = ark_encode(curve, hparams)
    hpub = ark_encode(
        curve, (hi, houtputs), Tup(Vec(Vec(FR)), Vec(Vec(FR)))
    )
    assert contracts.mini_hyrax_zk_linear_gkr_verifier(
        "bn254", hvk_cell, ark_encode(curve, hproof), hpub, circuit=hcircuit
    ) == contracts.OK
    hbad = [[(houtputs[0][0] + 1) % p] + list(houtputs[0][1:])] + [
        list(o) for o in houtputs[1:]
    ]
    hbad_cell = ark_encode(
        curve, (hi, hbad), Tup(Vec(Vec(FR)), Vec(Vec(FR)))
    )
    assert contracts.mini_hyrax_zk_linear_gkr_verifier(
        "bn254", hvk_cell, ark_encode(curve, hproof), hbad_cell, circuit=hcircuit
    ) == contracts.ERR_VERIFY


def test_mini_gkr_verifier_builtin_circuit():
    """Default (no circuit=) path uses the reference's hardcoded mini layers
    (mini_libra_zk_linear_gkr_verifier/src/entry.rs:13-34)."""
    from ckb_zkp_tpu.schemes.libra.circuit import Circuit as LiCircuit
    from ckb_zkp_tpu.schemes.libra.zk_linear_gkr import (
        Parameters as LiParams,
        ZKLinearGKRProof,
    )

    curve = get_curve("bn254")
    rng = random.Random(5)
    circuit = LiCircuit(
        *contracts.MINI_GKR_SIZE, list(contracts.MINI_GKR_LAYERS)
    )
    params = LiParams.new(curve, rng, 8)
    # the reference bench-test's witness for 2 * (3 + 2) = 10
    # (bench-tests/src/tests.rs:509-510)
    p = curve.fr.modulus
    inputs = [2, p - 10, 1, 0]
    witnesses = [2, 3, 0, 0]
    proof, output = ZKLinearGKRProof.prover(
        params, circuit, inputs, witnesses,
        circuit.circuit_to_hash(curve), params.param_to_hash(), rng,
    )
    vk_cell = ark_encode(curve, params)
    pub_cell = ark_encode(curve, (inputs, output), Tup(Vec(FR), Vec(FR)))
    assert contracts.mini_libra_zk_linear_gkr_verifier(
        "bn254", vk_cell, ark_encode(curve, proof), pub_cell
    ) == contracts.OK


# ---- native C++ verifier (parity with the no_std RISC-V contract) ----


def test_native_groth16_verifier():
    from ckb_zkp_tpu import native

    if not native.available():
        pytest.skip("g++ unavailable")
    assert native.selftest() == 0
    curve = get_curve("bn254")
    rng = random.Random(3)
    params = groth16.generate_random_parameters(Mini.power_off(), curve, rng)
    proof = groth16.create_random_proof(params, Mini.power_on(2, 3, 10), rng)
    vk_cell = g16ser.vk_to_bytes(curve, params.vk)
    proof_cell = g16ser.proof_to_bytes(curve, proof)
    assert native.groth16_verify_bn254(vk_cell, proof_cell, fr_bytes(curve, 10)) == 0
    assert native.groth16_verify_bn254(vk_cell, proof_cell, fr_bytes(curve, 11)) == 2
    assert native.groth16_verify_bn254(vk_cell, proof_cell[:-4], fr_bytes(curve, 10)) == 1
    assert native.groth16_verify_bn254(vk_cell[:-9], proof_cell, fr_bytes(curve, 10)) == 1
    # publics length mismatch / out-of-range scalar
    assert native.groth16_verify_bn254(vk_cell, proof_cell, b"") == 1
    assert native.groth16_verify_bn254(vk_cell, proof_cell, b"\xff" * 32) == 1
    # agreement with the python portable verifier on the same cells
    assert contracts.universal_groth16_verifier(
        "bn254", vk_cell, proof_cell, fr_bytes(curve, 10)
    ) == native.groth16_verify_bn254(vk_cell, proof_cell, fr_bytes(curve, 10))


def test_native_marlin_verifier():
    """Native C++ Marlin verifier (native/marlin_bn254.cc) on the same
    cells as the portable contract (reference:
    universal_marlin_verifier/src/entry.rs)."""
    from ckb_zkp_tpu import native
    from ckb_zkp_tpu.schemes.marlin import marlin

    if not native.available():
        pytest.skip("g++ unavailable")
    assert native.marlin_selftest() == 0
    curve = get_curve("bn254")
    rng = random.Random(123)
    srs = marlin.universal_setup(curve, 128, rng)
    ipk, ivk = marlin.index(srs, Mini.power_off())
    proof = marlin.create_random_proof(ipk, Mini.power_on(2, 3, 10), rng)
    vk_cell = ark_encode(curve, ivk)
    proof_cell = ark_encode(curve, proof)
    good = _frs(curve, [10])
    assert native.marlin_verify_bn254(vk_cell, proof_cell, good) == 0
    assert native.marlin_verify_bn254(vk_cell, proof_cell, _frs(curve, [11])) == 2
    assert native.marlin_verify_bn254(vk_cell, proof_cell[:-3], good) == 1
    assert native.marlin_verify_bn254(vk_cell[:-9], proof_cell, good) == 1
    assert native.marlin_verify_bn254(vk_cell, proof_cell, b"\x07") == 1
    assert native.marlin_verify_bn254(vk_cell, proof_cell, b"\xff" * 32) == 1
    # tampered proof bytes: decodes to a wrong point or fails encoding
    bad = bytearray(proof_cell)
    bad[40] ^= 0x01
    assert native.marlin_verify_bn254(vk_cell, bytes(bad), good) in (1, 2)
    # agreement with the python portable verifier on the same cells
    assert contracts.universal_marlin_verifier(
        "bn254", vk_cell, proof_cell, good
    ) == native.marlin_verify_bn254(vk_cell, proof_cell, good)
