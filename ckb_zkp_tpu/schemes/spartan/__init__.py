"""Spartan transparent zkSNARK (sumcheck + MLE + Pedersen/Hyrax commitments).

Parity: /root/reference/spartan/src/ — this round implements the **nizk**
variant end-to-end (r1cs_satisfied prover/verifier: witness packing
commitments, two zero-knowledge sumchecks with per-round sigma proofs,
knowledge/product/eq proofs, bullet IPA witness opening; matrix MLEs checked
directly by the verifier). The **snark** variant's SPARK sparse-MLE argument
(spark.rs memory-checking) is tracked for the next round.
"""

from . import nizk
from .polynomial import bound_poly_var_bot, eval_eq, eval_eq_x_y, evaluate_mle

__all__ = ["nizk", "eval_eq", "eval_eq_x_y", "evaluate_mle", "bound_poly_var_bot"]
