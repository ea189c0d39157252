"""Portable verifier entry points mirroring the on-chain contracts.

The reference ships 10 no_std RISC-V contracts that load vk / proof /
public-input bytes from transaction cell data and run the layer-3 verifier
inside CKB-VM (/root/reference/ckb-contracts/contracts/
universal_groth16_verifier/src/entry.rs:12-42). The TPU framework's
equivalent deliverable (SURVEY.md §7 hard-parts item 7) is this portable CPU
path: identical cell-data semantics — three byte strings in, accept/reject
out — over the same ark-0.2 wire formats, with no device dependency.
"""

from __future__ import annotations

from .host.pairing import get_curve
from .schemes import groth16
from .schemes.groth16 import serialize as g16ser

# error codes mirror the contracts' i8 Error enums (entry.rs / error.rs)
OK = 0
ERR_ENCODING = 1
ERR_VERIFY = 2


def universal_groth16_verifier(
    curve_name: str, vk_cell: bytes, proof_cell: bytes, publics_cell: bytes
) -> int:
    """entry::main for the groth16 contract: cells 0/1/2 = vk, proof, publics."""
    curve = get_curve(curve_name)
    try:
        vk = g16ser.vk_from_bytes(curve, vk_cell)
        proof = g16ser.proof_from_bytes(curve, proof_cell)
        nb = curve.fr.nbytes
        if len(publics_cell) % nb:
            return ERR_ENCODING
        publics = [
            int.from_bytes(publics_cell[i : i + nb], "little")
            for i in range(0, len(publics_cell), nb)
        ]
        if any(x >= curve.fr.modulus for x in publics):
            return ERR_ENCODING
    except (ValueError, EOFError, IndexError):
        return ERR_ENCODING
    pvk = groth16.prepare_verifying_key(curve, vk)
    return OK if groth16.verify_proof(curve, pvk, proof, publics) else ERR_VERIFY
