"""Groth16 zkSNARK — TPU-native prover, host verifier.

Parity with the reference crate `zkp-groth16`
(/root/reference/groth16/src/lib.rs, generator.rs, prover.rs, verifier.rs):
same key/proof structure, same QAP construction with input-binding rows, same
proof equation; the heavy math (Lagrange evaluation, QAP witness map via
coset NTTs, the 4-5 MSMs) runs on the TPU mesh.
"""

from .types import Parameters, PreparedVerifyingKey, Proof, VerifyKey
from .generator import (
    generate_parameters,
    generate_parameters_from_shape,
    generate_random_parameters,
)
from .prover import (
    create_proof,
    create_proof_from_shape,
    create_random_proof,
    create_proof_no_zk,
)
from .verifier import prepare_verifying_key, verify_proof

__all__ = [
    "Parameters",
    "PreparedVerifyingKey",
    "Proof",
    "VerifyKey",
    "generate_parameters",
    "generate_parameters_from_shape",
    "generate_random_parameters",
    "create_proof",
    "create_proof_from_shape",
    "create_random_proof",
    "create_proof_no_zk",
    "prepare_verifying_key",
    "verify_proof",
]
