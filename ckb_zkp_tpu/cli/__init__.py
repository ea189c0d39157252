"""CLI: trusted setup / prove / verify with file artifacts.

Parity: /root/reference/cli/src/{setup.rs, zkp_prove.rs, zkp_verify.rs} —
same artifact conventions: `setup_files/<scheme>-<curve>.pk|.vk` (canonical
ark bytes) and `proof_files/<scheme>-<curve>-<circuit>.proof.json` with hex
payloads keyed {circuit, scheme, curve, params, proof}. Groth16 is wired
end-to-end this round; bulletproofs/spartan byte-serializers are next.
"""

from .main import main, setup_cmd, prove_cmd, verify_cmd

__all__ = ["main", "setup_cmd", "prove_cmd", "verify_cmd"]
