"""Libra: linear-time-prover GKR over layered arithmetic circuits.

Parity: /root/reference/libra/src/ — this round implements the layered
circuit model (circuit.rs) and the plain `LinearGKRProof`
(libra_linear_gkr.rs: two-phase sumcheck per layer with the eval_hg/eval_fgu
bookkeeping tables). The zk variant (committed sumcheck messages + sigma
openings, libra_zk_linear_gkr.rs) is tracked for the next round.
"""

from .circuit import Circuit, Gate, Layer
from .linear_gkr import LinearGKRProof

__all__ = ["Circuit", "Gate", "Layer", "LinearGKRProof"]
