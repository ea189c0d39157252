"""Portable verifier entry points mirroring the on-chain contracts.

The reference ships 10 no_std RISC-V contracts that load vk / proof /
public-input bytes from transaction cell data and run the layer-3 verifier
inside CKB-VM (/root/reference/ckb-contracts/contracts/
universal_groth16_verifier/src/entry.rs:12-42). The TPU framework's
equivalent deliverable (SURVEY.md §7 hard-parts item 7) is this portable CPU
path: identical cell-data semantics — three byte strings in, accept/reject
out — over the same ark-0.2 wire formats, with no device dependency.

Cell formats: groth16 uses the bit-exact ark-0.2 encodings; the other
contracts consume the framework's safe tagged struct codec
(serialize/struct_codec.py) for their key/proof cells — same three-cell
semantics, accept/reject + error codes.
"""

from __future__ import annotations

from .host.pairing import get_curve
from .schemes import groth16
from .schemes.groth16 import serialize as g16ser
from .serialize import struct_codec

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


def _decode_cells(curve, *cells):
    # decode self-registers dataclasses by qualified name (package-restricted)
    return [struct_codec.decode(curve, c) for c in cells]


def universal_marlin_verifier(
    curve_name: str, vk_cell: bytes, proof_cell: bytes, publics_cell: bytes
) -> int:
    """universal_marlin_verifier/src/entry.rs: cells = ivk, proof, publics."""
    curve = get_curve(curve_name)
    from .schemes.marlin import marlin

    try:
        ivk, proof, publics = _decode_cells(curve, vk_cell, proof_cell, publics_cell)
        if not isinstance(ivk, marlin.IndexVerifierKey) or not isinstance(
            proof, marlin.Proof
        ):
            return ERR_ENCODING
    except struct_codec.DecodeError:
        return ERR_ENCODING
    try:
        ok = marlin.verify_proof(ivk, proof, list(publics))
    except (ValueError, AssertionError, ZeroDivisionError, IndexError):
        return ERR_VERIFY
    return OK if ok else ERR_VERIFY


def universal_plonk_verifier(
    curve_name: str, vk_cell: bytes, proof_cell: bytes, publics_cell: bytes
) -> int:
    """universal_plonk_verifier/src/entry.rs."""
    curve = get_curve(curve_name)
    from .schemes.plonk.plonk import Plonk, Proof, VerifierKey

    try:
        vk, proof, publics = _decode_cells(curve, vk_cell, proof_cell, publics_cell)
        if not isinstance(vk, VerifierKey) or not isinstance(proof, Proof):
            return ERR_ENCODING
    except struct_codec.DecodeError:
        return ERR_ENCODING
    try:
        ok = Plonk.verify(curve, vk, list(publics), proof)
    except (ValueError, AssertionError, ZeroDivisionError, IndexError):
        return ERR_VERIFY
    return OK if ok else ERR_VERIFY


def universal_spartan_nizk_verifier(
    curve_name: str, vk_cell: bytes, proof_cell: bytes, publics_cell: bytes
) -> int:
    """universal_spartan_nizk_verifier/src/entry.rs: vk cell = (params, r1cs)."""
    curve = get_curve(curve_name)
    from .schemes.spartan import nizk

    try:
        (params, r1cs), proof, publics = _decode_cells(
            curve, vk_cell, proof_cell, publics_cell
        )
        if not isinstance(proof, nizk.NIZKProof):
            return ERR_ENCODING
    except (struct_codec.DecodeError, ValueError, TypeError):
        return ERR_ENCODING
    try:
        ok = nizk.verify_nizk_proof(
            curve, params, r1cs, list(publics), proof,
            r1cs.r1cs_to_hash(), nizk.params_to_hash(curve, params),
        )
    except (ValueError, AssertionError, ZeroDivisionError, IndexError):
        return ERR_VERIFY
    return OK if ok else ERR_VERIFY


def universal_spartan_snark_verifier(
    curve_name: str, vk_cell: bytes, proof_cell: bytes, publics_cell: bytes
) -> int:
    """universal_spartan_snark_verifier: vk cell = (params, r1cs, encode_commit)."""
    curve = get_curve(curve_name)
    from .schemes.spartan import snark

    try:
        (params, r1cs, encode_commit), proof, publics = _decode_cells(
            curve, vk_cell, proof_cell, publics_cell
        )
        if not isinstance(proof, snark.SNARKProof):
            return ERR_ENCODING
    except (struct_codec.DecodeError, ValueError, TypeError):
        return ERR_ENCODING
    try:
        ok = snark.verify_snark_proof(
            curve, params, r1cs, list(publics), proof, encode_commit,
            r1cs.r1cs_to_hash(),
            snark.snark_params_to_hash(curve, params),
            snark.encode_to_hash(curve, encode_commit),
        )
    except (ValueError, AssertionError, ZeroDivisionError, IndexError):
        return ERR_VERIFY
    return OK if ok else ERR_VERIFY


def mini_bulletproofs_verifier(
    curve_name: str, vk_cell: bytes, proof_cell: bytes, publics_cell: bytes
) -> int:
    """mini_bulletproofs_verifier: vk cell = (gens, r1cs)."""
    curve = get_curve(curve_name)
    from .schemes.bulletproofs import arithmetic_circuit as bp

    try:
        (gens, r1cs), proof, publics = _decode_cells(
            curve, vk_cell, proof_cell, publics_cell
        )
        if not isinstance(proof, bp.Proof):
            return ERR_ENCODING
    except (struct_codec.DecodeError, ValueError, TypeError):
        return ERR_ENCODING
    try:
        ok = bp.verify_proof(curve, gens, proof, r1cs, list(publics))
    except (ValueError, AssertionError, ZeroDivisionError, IndexError):
        return ERR_VERIFY
    return OK if ok else ERR_VERIFY


def mini_libra_zk_linear_gkr_verifier(
    curve_name: str, vk_cell: bytes, proof_cell: bytes, publics_cell: bytes
) -> int:
    """mini_libra_zk_linear_gkr_verifier: vk cell = (params, circuit_spec);
    publics cell = (outputs, inputs)."""
    curve = get_curve(curve_name)
    from .schemes.libra.circuit import Circuit
    from .schemes.libra.zk_linear_gkr import ZKLinearGKRProof

    try:
        (params, spec), proof, (outputs, inputs) = _decode_cells(
            curve, vk_cell, proof_cell, publics_cell
        )
        ni, na, layers_raw = spec
        circuit = Circuit(ni, na, layers_raw)
        if not isinstance(proof, ZKLinearGKRProof):
            return ERR_ENCODING
    except (struct_codec.DecodeError, ValueError, TypeError, AssertionError):
        return ERR_ENCODING
    try:
        ok = proof.verify(
            params, circuit, list(outputs), list(inputs),
            circuit.circuit_to_hash(curve), params.param_to_hash(),
        )
    except (ValueError, AssertionError, ZeroDivisionError, IndexError):
        return ERR_VERIFY
    return OK if ok else ERR_VERIFY


def mini_hyrax_zk_linear_gkr_verifier(
    curve_name: str, vk_cell: bytes, proof_cell: bytes, publics_cell: bytes
) -> int:
    """mini_hyrax_zk_linear_gkr_verifier: vk cell = (params, circuit_spec);
    publics cell = (outputs, inputs) per instance."""
    curve = get_curve(curve_name)
    from .schemes.hyrax.circuit import Circuit
    from .schemes.hyrax.hyrax_proof import HyraxProof

    try:
        (params, spec), proof, (outputs, inputs) = _decode_cells(
            curve, vk_cell, proof_cell, publics_cell
        )
        ni, na, layers_raw = spec
        circuit = Circuit(ni, na, layers_raw)
        if not isinstance(proof, HyraxProof):
            return ERR_ENCODING
    except (struct_codec.DecodeError, ValueError, TypeError, AssertionError):
        return ERR_ENCODING
    try:
        ok = proof.verify(
            params, [list(o) for o in outputs], [list(i) for i in inputs],
            circuit, circuit.circuit_to_hash(curve), params.param_to_hash(),
        )
    except (ValueError, AssertionError, ZeroDivisionError, IndexError):
        return ERR_VERIFY
    return OK if ok else ERR_VERIFY
