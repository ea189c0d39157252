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


def carry_propagate(x: jnp.ndarray, *, signed: bool = False) -> jnp.ndarray:
    """Resolve lazy limbs to canonical 16-bit limbs (drops final carry-out).

    x: (..., L) with limbs in uint32 (lazy, < 2^32) or int32 when ``signed``.
    Sequential over L limbs via lax.scan (vectorized across the batch).
    """
    xt = jnp.moveaxis(x, -1, 0)  # (L, ...)
    if signed:
        xt = xt.astype(jnp.int32)

        def step(c, v):
            t = v + c
            return t >> BASE_BITS, t & MASK  # arithmetic shift handles negatives

        _, out = jax.lax.scan(step, jnp.zeros_like(xt[0]), xt)
        out = out.astype(jnp.uint32)
    else:

        def step(c, v):
            t = v + c
            return t >> BASE_BITS, t & MASK

        _, out = jax.lax.scan(step, jnp.zeros_like(xt[0]), xt)
    return jnp.moveaxis(out, 0, -1)


def geq(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Lexicographic a >= b for canonical limb arrays. Returns bool (...)."""
    gt = a > b
    lt = a < b
    # highest differing limb decides; scan from low to high
    at = jnp.moveaxis(gt, -1, 0)
    lt_t = jnp.moveaxis(lt, -1, 0)

    def step(acc, gl):
        g, l = gl
        return jnp.where(g, True, jnp.where(l, False, acc)), None

    res, _ = jax.lax.scan(step, jnp.ones_like(at[0]), (at, lt_t))
    return res
