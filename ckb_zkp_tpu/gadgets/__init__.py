"""Circuit gadget library over the R1CS front-end.

Parity target: /root/reference/gadgets/src (8.9k LoC). Implemented this
round: AbstractHash protocol, MiMC (native + gadget, LongsightF322p3),
boolean/AllocatedBit algebra, AllocatedFr, rangeproof, and the
TestConstraintSystem debugging backend. Tracked for next round: poseidon,
rescue, sha256, blake2s, uint32, lookup tables, multieq, CBMT merkle tree
gadgets.
"""

from . import mimc
from .abstract_hash import AbstractHash, AbstractHashOutput
from .boolean import AllocatedBit, Boolean
from .fr import AllocatedFr
from .rangeproof import enforce_greater_than
from .test_constraint_system import TestConstraintSystem

__all__ = [
    "mimc",
    "AbstractHash",
    "AbstractHashOutput",
    "AllocatedBit",
    "Boolean",
    "AllocatedFr",
    "enforce_greater_than",
    "TestConstraintSystem",
]
