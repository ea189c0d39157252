"""zkp CLI entry points (setup / prove / verify)."""

from __future__ import annotations

import argparse
import json
import random
import sys
from pathlib import Path

from ..circuits import Hash, Mini
from ..host.pairing import get_curve
from ..schemes import groth16
from ..schemes.groth16 import serialize as g16ser
from ..serialize.tobytes import fr_bytes

SETUP_DIR = Path("setup_files")
PROOF_DIR = Path("proof_files")


def _circuit(name: str, curve, args: list[str], power_on: bool):
    if name == "mini":
        if not power_on:
            return Mini.power_off(), []
        x, y, z = (int(a) for a in args[:3])
        c = Mini.power_on(x, y, z)
        return c, c.publics
    if name == "hash":
        if not power_on:
            return Hash.power_off(curve.fr), []
        c = Hash.power_on(curve.fr, args[0].encode())
        return c, c.publics
    raise SystemExit(f"unknown circuit {name!r} (expected mini|hash)")


def setup_cmd(scheme: str, curve_name: str, circuit_name: str, seed: int | None = None):
    """groth16 trusted setup -> setup_files/*.pk/.vk (cli/src/setup.rs)."""
    assert scheme == "groth16", "setup currently supports groth16"
    curve = get_curve(curve_name)
    rng = random.Random(seed)
    circuit, _ = _circuit(circuit_name, curve, [], power_on=False)
    params = groth16.generate_random_parameters(circuit, curve, rng)
    SETUP_DIR.mkdir(exist_ok=True)
    pk_path = SETUP_DIR / f"{scheme}-{curve.name}-{circuit_name}.pk"
    vk_path = SETUP_DIR / f"{scheme}-{curve.name}-{circuit_name}.vk"
    pk_path.write_bytes(g16ser.parameters_to_bytes(params))
    vk_path.write_bytes(g16ser.vk_to_bytes(curve, params.vk))
    print(f"wrote {pk_path} and {vk_path}")
    return pk_path, vk_path


def prove_cmd(scheme: str, curve_name: str, circuit_name: str, args: list[str], seed=None):
    """Prove and write proof_files/*.proof.json (cli/src/zkp_prove.rs)."""
    assert scheme == "groth16", "prove currently supports groth16"
    curve = get_curve(curve_name)
    circuit, publics = _circuit(circuit_name, curve, args, power_on=True)
    pk_path = SETUP_DIR / f"{scheme}-{curve.name}-{circuit_name}.pk"
    params = g16ser.parameters_from_bytes(curve, pk_path.read_bytes())
    rng = random.Random(seed)
    proof = groth16.create_random_proof(params, circuit, rng)
    PROOF_DIR.mkdir(exist_ok=True)
    out = PROOF_DIR / f"{scheme}-{curve.name}-{circuit_name}.proof.json"
    payload = {
        "circuit": circuit_name,
        "scheme": scheme,
        "curve": curve.name,
        "params": b"".join(fr_bytes(curve, x) for x in publics).hex(),
        "proof": g16ser.proof_to_bytes(curve, proof).hex(),
    }
    out.write_text(json.dumps(payload))
    print(f"wrote {out}")
    return out


def verify_cmd(proof_file: str) -> bool:
    """Verify a proof JSON (cli/src/zkp_verify.rs)."""
    payload = json.loads(Path(proof_file).read_text())
    scheme = payload["scheme"]
    assert scheme == "groth16", "verify currently supports groth16"
    curve = get_curve(payload["curve"])
    vk_path = SETUP_DIR / f"{scheme}-{curve.name}-{payload['circuit']}.vk"
    vk = g16ser.vk_from_bytes(curve, vk_path.read_bytes())
    proof = g16ser.proof_from_bytes(curve, bytes.fromhex(payload["proof"]))
    raw = bytes.fromhex(payload["params"])
    nb = curve.fr.nbytes
    publics = [
        int.from_bytes(raw[i : i + nb], "little") for i in range(0, len(raw), nb)
    ]
    pvk = groth16.prepare_verifying_key(curve, vk)
    ok = groth16.verify_proof(curve, pvk, proof, publics)
    print("verify:", ok)
    return ok


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="ckb-zkp-tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)
    s = sub.add_parser("setup")
    s.add_argument("scheme")
    s.add_argument("curve")
    s.add_argument("circuit")
    s.add_argument("--seed", type=int, default=None)
    pr = sub.add_parser("prove")
    pr.add_argument("scheme")
    pr.add_argument("curve")
    pr.add_argument("circuit")
    pr.add_argument("args", nargs="*")
    pr.add_argument("--seed", type=int, default=None)
    v = sub.add_parser("verify")
    v.add_argument("proof_file")
    ns = ap.parse_args(argv)
    if ns.cmd == "setup":
        setup_cmd(ns.scheme, ns.curve, ns.circuit, ns.seed)
    elif ns.cmd == "prove":
        prove_cmd(ns.scheme, ns.curve, ns.circuit, ns.args, ns.seed)
    elif ns.cmd == "verify":
        return 0 if verify_cmd(ns.proof_file) else 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
