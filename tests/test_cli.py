"""CLI golden path: setup -> prove -> verify via artifact files.

Mirrors the reference's file conventions (cli/src/setup.rs, zkp_prove.rs)
and doubles as the Groth16 key/proof serialization round-trip test.
"""

import json
import os

import pytest

from ckb_zkp_tpu.cli import prove_cmd, setup_cmd, verify_cmd


def _roundtrip(
    scheme: str,
    curve: str = "bn254",
    circuit: str = "mini",
    args: list[str] | None = None,
):
    if scheme != "bulletproofs":  # bulletproofs has no trusted setup
        setup_cmd(scheme, curve, circuit, seed=5)
    proof_file = prove_cmd(
        scheme, curve, circuit, args or ["2", "3", "10"], seed=6
    )
    assert verify_cmd(str(proof_file))
    # tampering with the public input must fail
    payload = json.loads(proof_file.read_text())
    raw = bytearray(bytes.fromhex(payload["params"]))
    raw[0] ^= 1
    payload["params"] = bytes(raw).hex()
    proof_file.write_text(json.dumps(payload))
    assert not verify_cmd(str(proof_file))


def test_cli_groth16_mini_roundtrip(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _roundtrip("groth16")


def test_cli_groth16_hash_roundtrip(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _roundtrip("groth16", circuit="hash", args=["iamsecret"])


def test_cli_marlin_mini_roundtrip(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _roundtrip("marlin")


def test_cli_plonk_mini_roundtrip(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _roundtrip("plonk")


def test_cli_bulletproofs_mini_roundtrip(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _roundtrip("bulletproofs")


def test_cli_spartan_snark_mini_roundtrip(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _roundtrip("spartan_snark")


def test_cli_spartan_nizk_mini_roundtrip(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _roundtrip("spartan_nizk")


def test_cli_spartan_nizk_curve25519_roundtrip(tmp_path, monkeypatch):
    """The zkp-curve25519 configuration through the file-artifact surface."""
    monkeypatch.chdir(tmp_path)
    _roundtrip("spartan_nizk", curve="curve25519")


def test_cli_bulletproofs_curve25519_roundtrip(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    _roundtrip("bulletproofs", curve="curve25519")


def test_cli_plonk_hash_roundtrip(tmp_path, monkeypatch):
    """PLONK beyond the mini circuit: the MiMC-preimage hash circuit built
    from composer gates (VERDICT r2 item 9)."""
    monkeypatch.chdir(tmp_path)
    _roundtrip("plonk", circuit="hash", args=["iamsecret"])
