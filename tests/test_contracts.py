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
