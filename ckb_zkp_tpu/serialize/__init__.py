"""arkworks-v0.2-compatible canonical (de)serialization.

This is the bit-exactness layer: byte formats follow `ark-serialize` 0.2 as
used by every key/proof struct in the reference (SURVEY.md §1 cross-cutting;
e.g. /root/reference/groth16/src/lib.rs derives). Conventions:

- Fp: little-endian canonical integer, ceil(bits/64)*8 bytes.
- Fp2: c0 || c1.
- Short-Weierstrass affine, compressed: x with 2 flag bits in the top bits of
  the FINAL byte — PositiveY = 1<<7, Infinity = 1<<6, NegativeY = 0; the
  infinity point serializes x = 0 with the infinity flag. "Positive" means
  y > p - y as integers.
- Uncompressed: x plain || y with flags.
- Vec<T>: u64 little-endian length then elements.
"""

from .ark import (
    FieldCodec,
    G1Codec,
    G2Codec,
    read_u64,
    write_u64,
)

__all__ = ["FieldCodec", "G1Codec", "G2Codec", "read_u64", "write_u64"]
