"""R1CS constraint-system front-end.

API parity with the reference's `zkp-r1cs` crate
(/root/reference/r1cs/src/constraint_system.rs:10-93): `alloc`, `alloc_input`,
`enforce`, namespaces, a `ConstraintSynthesizer`-style circuit protocol and a
`SynthesisError` enum — but re-designed for device consumption: synthesis
emits flat COO arrays (row/col/coeff) so witness evaluation is a device
sparse-matvec instead of a Vec-of-Vecs walk.
"""

from .lc import ONE, LinearCombination, Variable
from .system import (
    ConstraintSystem,
    ConstraintSynthesizer,
    R1csShape,
    SynthesisError,
    SynthesisMode,
    synthesize,
)

__all__ = [
    "ONE",
    "LinearCombination",
    "Variable",
    "ConstraintSystem",
    "ConstraintSynthesizer",
    "R1csShape",
    "SynthesisError",
    "SynthesisMode",
    "synthesize",
]
