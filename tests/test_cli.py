"""CLI golden path: setup -> prove -> verify via artifact files.

Mirrors the reference's file conventions (cli/src/setup.rs, zkp_prove.rs)
and doubles as the Groth16 key/proof serialization round-trip test.
"""

import json
import os

import pytest

from ckb_zkp_tpu.cli import prove_cmd, setup_cmd, verify_cmd


def test_cli_groth16_mini_roundtrip(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    setup_cmd("groth16", "bn254", "mini", seed=5)
    proof_file = prove_cmd("groth16", "bn254", "mini", ["2", "3", "10"], seed=6)
    assert verify_cmd(str(proof_file))
    # tampering with the public input must fail
    payload = json.loads(proof_file.read_text())
    raw = bytearray(bytes.fromhex(payload["params"]))
    raw[0] ^= 1
    payload["params"] = bytes(raw).hex()
    proof_file.write_text(json.dumps(payload))
    assert not verify_cmd(str(proof_file))
