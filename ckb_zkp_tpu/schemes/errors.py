"""Scheme-level errors (parity: per-scheme error enums, e.g.
/root/reference/marlin/src/errors.rs, plonk/src/error.rs)."""


class SchemeError(Exception):
    pass


class DegreeOutOfBound(SchemeError):
    pass


class HidingBoundError(SchemeError):
    pass


class VerificationError(SchemeError):
    pass
