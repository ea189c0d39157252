"""Limb-decomposed big-integer representation for TPU lanes.

Field elements live on device as ``uint32`` arrays of 16-bit limbs, shape
``(..., L)`` little-endian, with ``L = ceil(bits/64)*4`` so that the Montgomery
radix ``R = 2^(16 L)`` matches arkworks' 64-bit-limb radix (BigInteger256 →
R = 2^256, BigInteger384 → R = 2^384).

Why 16-bit limbs in uint32 lanes: TPU integer lanes are 32-bit. A 16x16-bit
product fits exactly in a uint32, and column sums of up to ~2^6 such products
stay below 2^32, so schoolbook multiplication + Montgomery reduction need no
wide accumulator. (Reference counterpart: arkworks `ark-ff` Montgomery
backend, used everywhere, e.g. /root/reference/groth16/src/prover.rs:152-161.)
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

BASE_BITS = 16
BASE = 1 << BASE_BITS
MASK = BASE - 1


def nlimbs_for(bits: int) -> int:
    """Limb count: matches arkworks' 64-bit limb count x4."""
    n64 = (bits + 63) // 64
    return n64 * 4


def int_to_limbs(x: int, nlimbs: int) -> np.ndarray:
    """Python int -> little-endian 16-bit limb array (numpy uint32)."""
    out = np.zeros(nlimbs, dtype=np.uint32)
    for i in range(nlimbs):
        out[i] = x & MASK
        x >>= BASE_BITS
    assert x == 0, "integer does not fit in limb count"
    return out


def ints_to_limbs(xs, nlimbs: int) -> np.ndarray:
    """Iterable of ints -> (N, L) uint32 array. Vectorized via Python bytes."""
    xs = list(xs)
    n = len(xs)
    nbytes = nlimbs * 2
    buf = b"".join(int(x).to_bytes(nbytes, "little") for x in xs)
    arr = np.frombuffer(buf, dtype="<u2").reshape(n, nlimbs)
    return arr.astype(np.uint32)


def limbs_to_int(limbs) -> int:
    limbs = np.asarray(limbs)
    x = 0
    for i in range(limbs.shape[-1] - 1, -1, -1):
        x = (x << BASE_BITS) | int(limbs[..., i])
    return x


def limbs_to_ints(arr) -> list[int]:
    """(N, L) uint32 array -> list of Python ints."""
    arr = np.asarray(arr)
    flat = arr.reshape(-1, arr.shape[-1]).astype("<u2")
    nbytes = arr.shape[-1] * 2
    raw = flat.tobytes()
    return [
        int.from_bytes(raw[i * nbytes : (i + 1) * nbytes], "little")
        for i in range(flat.shape[0])
    ]


def _shift_up(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Shift limbs toward higher indices by k (zeros in at the bottom)."""
    pad = jnp.zeros_like(x[..., :k])
    return jnp.concatenate([pad, x[..., :-k]], axis=-1)


def ks_resolve(t: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Resolve 1-bit carries across limbs in O(1) flat ops (bit-packed adder).

    t: (..., L) uint32 with every limb <= 2*MASK (limb 0 may be 2*MASK+1).
    Returns (canonical limbs, carry_out in {0,1}).

    The carry recurrence c_{i+1} = g_i OR (p_i AND c_i) (g = limb overflow
    bit, p = low-16-bits == MASK) is exactly the carry vector of the 32-bit
    integer addition G + (G|P) on the bit-packed masks G = sum g_i 2^i,
    P = sum p_i 2^i — recovered with the classic s ^ x ^ y trick. Packing the
    per-limb bits into one lane turns the former log-depth Kogge-Stone
    network (~65 traced ops) into ~15, which compounds through every field
    multiply that inlines it. Requires L <= 31 (L is 16 or 24 here).
    """
    nl = t.shape[-1]
    g = (t >> BASE_BITS).astype(jnp.uint32)  # 0/1 by precondition
    p = ((t & MASK) == MASK).astype(jnp.uint32)
    # pack into 31-bit words (nl can exceed 31: 2L = 48 for 384-bit fields);
    # words chain through a 1-bit carry, still O(words) flat ops.
    c_chunks = []
    cin = jnp.zeros(t.shape[:-1], jnp.uint32)
    for lo in range(0, nl, 31):
        hi = min(lo + 31, nl)
        width = hi - lo
        weights = jnp.asarray((1 << np.arange(width)).astype(np.uint32))
        G = jnp.sum(g[..., lo:hi] * weights, axis=-1, dtype=jnp.uint32)
        P = jnp.sum(p[..., lo:hi] * weights, axis=-1, dtype=jnp.uint32)
        GP = G | P
        S = G + GP + cin
        c_bits = S ^ G ^ GP  # bit i = carry INTO limb lo+i (bit 0 = cin)
        c_chunks.append(
            (c_bits[..., None] >> jnp.arange(width, dtype=jnp.uint32)) & 1
        )
        cin = (c_bits >> width) & 1
    c = jnp.concatenate(c_chunks, axis=-1)
    full = t + c
    out = full & MASK
    carry_out = cin
    return out, carry_out


def carry_propagate(x: jnp.ndarray) -> jnp.ndarray:
    """Resolve lazy limbs (< 2^32) to canonical 16-bit limbs.

    Drops anything carried beyond the top limb (callers guarantee the value
    fits). Two flat passes: fold high halves upward, then Kogge-Stone.
    """
    lo = x & MASK
    hi = x >> BASE_BITS
    t = lo + _shift_up(hi, 1)  # <= 2*MASK per limb
    out, _ = ks_resolve(t)
    return out


def geq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Lexicographic a >= b for canonical limb arrays. Returns bool (...)."""
    acc = jnp.ones(jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1]), bool)
    for i in range(a.shape[-1]):  # low to high; highest differing limb wins
        acc = jnp.where(a[..., i] > b[..., i], True,
                        jnp.where(a[..., i] < b[..., i], False, acc))
    return acc
