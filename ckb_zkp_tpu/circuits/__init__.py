"""Built-in demo/benchmark circuits.

Parity: /root/reference/cli/src/circuits/ (`CliCircuit` trait, mini.rs,
hash.rs). `power_on`/`power_off` mirror the reference's construct-with/without
witness convention.
"""

from .hash import Hash
from .mini import Mini

__all__ = ["Hash", "Mini"]
