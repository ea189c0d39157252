"""Pallas TPU kernel for batched Montgomery field multiplication.

The single hottest op in the framework: every NTT butterfly, EC point add and
sumcheck table update is a chain of these (reference counterpart: arkworks'
`ark-ff` Montgomery backend, SURVEY.md §2.1). The pure-XLA formulation in
ops/field.py materializes (N, L, L) outer products and skew-reshape
temporaries in HBM — ~160 ms for 2^20 multiplies on one chip. This kernel
keeps the whole schoolbook product + SOS Montgomery reduction in
VMEM/registers and runs at ~0.6 ms for 2^20 (~1.7e9 mul/s, within ~3x of the
HBM read/write bound).

Layout is the whole game (measured):
- each limb must be a full 2-D (SB, 128) VPU tile. Limbs-as-rows of a
  transposed (L, BLK) block — 1-D values — waste the 8-sublane dimension and
  run ~40x slower; the in-kernel transpose of an interleaved (BLK, L) block
  costs ~12x. So device arrays are reshaped OUTSIDE the kernel (one XLA
  transpose each way, bandwidth-cost only) to limb-major tiles
  (L, n/128, 128), and the kernel indexes `ref[i]` to get limb i as a
  (SB, 128) tile.
- products split lo/hi 16-bit halves (column sums of <= L terms stay < 2^21,
  no wide accumulator needed — same invariant as ops/limbs.py);
- carries resolved with an in-register ripple (sequential per limb, but fully
  pipelined across the tile);
- conditional subtract via two's-complement add, exactly matching the XLA
  path bit-for-bit (both return canonical limbs < p).

Results are identical to DeviceField's XLA path; DeviceField.mul dispatches
here on TPU backends for batches >= PALLAS_MIN_BATCH.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# interpret mode: lets CPU tests execute the kernels (slowly)
_INTERPRET = os.environ.get("CKB_ZKP_TPU_PALLAS_INTERPRET", "0") not in ("", "0")

MASK = (1 << 16) - 1
LANES = 128
SUBS_SMALL = 8  # sublanes per block for small batches (1024 elements)
SUBS_BIG = 32  # for large batches (4096 elements/block)
PALLAS_MIN_BATCH = 256


def _conv_lazy(u, v, ncols):
    """Column sums of the schoolbook product of limb-tile lists u, v.

    Each u[i]*v[j] is an exact u32 (16x16-bit); lo/hi halves are accumulated
    separately so columns stay < 2^21. Returns `ncols` lazy columns.
    """
    lo = [None] * ncols
    hi = [None] * ncols
    for i in range(len(u)):
        for j in range(len(v)):
            k = i + j
            if k >= ncols:
                continue
            prod = u[i] * v[j]
            plo = prod & MASK
            phi = prod >> 16
            lo[k] = plo if lo[k] is None else lo[k] + plo
            hi[k] = phi if hi[k] is None else hi[k] + phi
    cols = []
    for k in range(ncols):
        c = lo[k]
        if c is None:
            c = jnp.zeros_like(u[0])
        if k >= 1 and hi[k - 1] is not None:
            c = c + hi[k - 1]
        cols.append(c)
    return cols


def _sqr_conv_lazy(u, ncols):
    """Column sums of the symmetric square: 2*u_i*u_j (i<j) + u_i^2.

    Exact-integer-identical to `_conv_lazy(u, u, ncols)` (same column
    values, accumulated with ~half the multiplies). Doubling happens after
    the lo/hi split so every intermediate stays in u32.
    """
    lo = [None] * ncols
    hi = [None] * ncols

    def acc(k, plo, phi):
        lo[k] = plo if lo[k] is None else lo[k] + plo
        hi[k] = phi if hi[k] is None else hi[k] + phi

    for i in range(len(u)):
        for j in range(i, len(u)):
            k = i + j
            if k >= ncols:
                continue
            prod = u[i] * u[j]
            plo = prod & MASK
            phi = prod >> 16
            if j > i:
                plo = plo + plo
                phi = phi + phi
            acc(k, plo, phi)
    cols = []
    for k in range(ncols):
        c = lo[k]
        if c is None:
            c = jnp.zeros_like(u[0])
        if k >= 1 and hi[k - 1] is not None:
            c = c + hi[k - 1]
        cols.append(c)
    return cols


def _ripple(cols):
    """Lazy columns -> canonical 16-bit limbs (+ carry out)."""
    out = []
    c = None
    for k in range(len(cols)):
        t = cols[k] if c is None else cols[k] + c
        out.append(t & MASK)
        c = t >> 16
    return out, c


def _cond_sub_p(u, p_limbs):
    """u (canonical limbs, < 2p) -> u mod p via two's-complement subtract."""
    L = len(u)
    carry = None
    d = []
    for k in range(L):
        t = u[k] + (MASK - int(p_limbs[k])) + (1 if k == 0 else 0)
        if carry is not None:
            t = t + carry
        d.append(t & MASK)
        carry = t >> 16
    ge = carry  # 1 iff u >= p
    return [jnp.where(ge > 0, d[k], u[k]) for k in range(L)]


def _add_rows(a, b, p_limbs):
    """Canonical limb-tiles a + b mod p (2p < R, so no carry-out)."""
    s, _ = _ripple([a[k] + b[k] for k in range(len(a))])
    return _cond_sub_p(s, p_limbs)


def _sub_rows(a, b, p_limbs):
    """a - b mod p via two's complement, mirroring DeviceField.sub."""
    L = len(a)
    d, no_borrow = _ripple(
        [a[k] + (MASK - b[k]) + (1 if k == 0 else 0) for k in range(L)]
    )
    d2, _ = _ripple([d[k] + int(p_limbs[k]) for k in range(L)])
    nb = no_borrow > 0
    return [jnp.where(nb, d[k], d2[k]) for k in range(L)]


def _is_zero_rows(a):
    z = a[0] == 0
    for r in a[1:]:
        z = z & (r == 0)
    return z


def _select_rows(mask, a, b):
    return [jnp.where(mask, x, y) for x, y in zip(a, b)]


def _mont_reduce_cols(t_can, p_limbs, np_limbs):
    """Canonical 2L product limbs -> Montgomery-reduced canonical L limbs."""
    L = len(p_limbs)
    npl = [jnp.full_like(t_can[0], int(v)) for v in np_limbs]
    m_can, _ = _ripple(_conv_lazy(t_can[:L], npl, L))
    pl_rows = [jnp.full_like(t_can[0], int(v)) for v in p_limbs]
    mp_cols = _conv_lazy(m_can, pl_rows, 2 * L)
    s_cols = [t_can[k] + mp_cols[k] for k in range(2 * L)]
    s_can, _ = _ripple(s_cols)
    return _cond_sub_p(s_can[L:], p_limbs)


# ---------------------------------------------------- MXU Montgomery reduce
# The two reduction convolutions have a SHARED (constant) operand — n' for
# m = (t mod R)*n' mod R and p for m*p — so they ride the MXU as int8
# byte-plane band-matrix matmuls while the VPU keeps only the a*b schoolbook
# product and the carry ripples. Exactness: byte products are < 2^16, column
# sums over K = 2L byte planes * SB sublanes stay far below 2^31 in the int32
# accumulator; the +-128 shifts (int8 range) are undone with closed-form
# correction terms. Bit-identical to _mont_reduce_cols by construction
# (same integer column sums, same ripples).


def mxu_band_consts(p_limbs, np_limbs, sb: int):
    """(M1, M2) int8 band matrices for _mont_reduce_cols_mxu at sublane
    block sb. M1: (2L*sb, 2L*sb) for t_bytes -> (t*n' mod R) byte columns;
    M2: (4L*sb, 2L*sb) for m_bytes -> m*p byte columns. Entries are the
    constant's bytes minus 128; kron with I_sb keeps per-sublane elements
    independent while the (limb, sublane) axes merge into one MXU dim."""
    import numpy as np

    L = len(p_limbs)

    def to_bytes(limbs):
        out = []
        for v in limbs:
            out.append(int(v) & 0xFF)
            out.append((int(v) >> 8) & 0xFF)
        return out

    nb = to_bytes(np_limbs)  # 2L bytes
    pb = to_bytes(p_limbs)
    K = 2 * L
    M1 = np.zeros((K, K), np.int32)
    for c in range(K):
        for i in range(K):
            if 0 <= c - i < K:
                M1[c, i] = nb[c - i]
    M2 = np.zeros((2 * K, K), np.int32)
    for c in range(2 * K):
        for i in range(K):
            if 0 <= c - i < K:
                M2[c, i] = pb[c - i]
    rs1 = tuple(int(x) for x in M1.sum(axis=1))
    rs2 = tuple(int(x) for x in M2.sum(axis=1))
    eye = np.eye(sb, dtype=np.int32)
    M1b = (np.kron(M1, eye) - 128).astype(np.int8)
    M2b = (np.kron(M2, eye) - 128).astype(np.int8)
    return M1b, M2b, rs1, rs2


def _band_matmul(mband, byte_rows, rs, out_cols: int):
    """byte_rows: list of K int32 tiles (sb, 128) with values in [0, 255] ->
    exact conv columns out[c] = sum_i byte_rows[i] * const_bytes[c - i],
    via one int8 MXU matmul plus the +-128 shift corrections."""
    K = len(byte_rows)
    sb = byte_rows[0].shape[0]
    lanes = byte_rows[0].shape[1]
    T = jnp.stack(byte_rows, axis=0)  # (K, sb, lanes) int32
    sum_t = jnp.sum(T, axis=(0, 1))  # (lanes,) per-lane byte total
    t8 = (T - 128).astype(jnp.int8).reshape(K * sb, lanes)
    prod = jax.lax.dot_general(
        mband, t8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    ).reshape(out_cols, sb, lanes)
    base = 128 * sum_t[None, :] - 128 * 128 * (K * sb)
    return [prod[c] + (base + 128 * rs[c]) for c in range(out_cols)]


def _mont_reduce_cols_mxu(t_can, p_limbs, np_limbs, m1, m2, rs1, rs2):
    """_mont_reduce_cols with the two constant-operand convolutions on the
    MXU. m1/m2 are the mxu_band_consts matrices (passed as kernel inputs —
    Pallas forbids captured array constants); rs1/rs2 are static row sums."""
    L = len(p_limbs)
    K = 2 * L
    # byte planes of t mod R
    tb = []
    for k in range(L):
        t32 = t_can[k].astype(jnp.int32)
        tb.append(t32 & 0xFF)
        tb.append(t32 >> 8)
    q = _band_matmul(m1, tb, rs1, K)  # byte cols of (t mod R) * n'
    # carry-propagate to the exact bytes of m = (t*n') mod R
    m_bytes = []
    carry = None
    for c in range(K):
        cur = q[c] if carry is None else q[c] + carry
        m_bytes.append(cur & 0xFF)
        carry = cur >> 8
    u = _band_matmul(m2, m_bytes, rs2, 2 * K)  # byte cols of m * p
    # regroup byte cols to 16-bit cols, add t, ripple, reduce
    s_cols = [
        t_can[k]
        + u[2 * k].astype(jnp.uint32)
        + (u[2 * k + 1].astype(jnp.uint32) << 8)
        for k in range(K)
    ]
    s_can, _ = _ripple(s_cols)
    return _cond_sub_p(s_can[L:], p_limbs)


def _mont_mul_rows_mxu(a, b, p_limbs, np_limbs, m1, m2, rs1, rs2):
    """_mont_mul_rows with the MXU reduction (bit-identical outputs)."""
    t_can, _ = _ripple(_conv_lazy(a, b, 2 * len(a)))
    return _mont_reduce_cols_mxu(t_can, p_limbs, np_limbs, m1, m2, rs1, rs2)


def _mont_sqr_rows_mxu(a, p_limbs, np_limbs, m1, m2, rs1, rs2):
    t_can, _ = _ripple(_sqr_conv_lazy(a, 2 * len(a)))
    return _mont_reduce_cols_mxu(t_can, p_limbs, np_limbs, m1, m2, rs1, rs2)


def _mont_mul_rows(a, b, p_limbs, np_limbs):
    """Limb-tile lists (length L) -> Montgomery product, canonical."""
    t_can, _ = _ripple(_conv_lazy(a, b, 2 * len(a)))
    return _mont_reduce_cols(t_can, p_limbs, np_limbs)


def _mont_sqr_rows(a, p_limbs, np_limbs):
    """Montgomery square — bit-identical to _mont_mul_rows(a, a) with ~half
    the limb multiplies (symmetric schoolbook)."""
    t_can, _ = _ripple(_sqr_conv_lazy(a, 2 * len(a)))
    return _mont_reduce_cols(t_can, p_limbs, np_limbs)


# ---------------------------------------------------------------- plumbing
def to_tiles(x: jnp.ndarray, L: int) -> jnp.ndarray:
    """(n, L) interleaved -> (L, n/128, 128) limb-major tiles (n % 128 == 0)."""
    return x.T.reshape(L, -1, LANES)


def from_tiles(t: jnp.ndarray, L: int) -> jnp.ndarray:
    """(L, n/128, 128) -> (n, L)."""
    return t.reshape(L, -1).T


def pad_batch(n: int) -> tuple[int, int]:
    """Padded element count and sublane block size for a batch of n."""
    sb = SUBS_SMALL if n <= 4 * SUBS_SMALL * LANES else SUBS_BIG
    blk = sb * LANES
    return -(-n // blk) * blk, sb


def _mul_kernel(L, p_limbs, np_limbs, a_ref, b_ref, o_ref):
    a = [a_ref[i] for i in range(L)]  # (SB, 128) tiles
    b = [b_ref[i] for i in range(L)]
    o_ref[:] = jnp.stack(_mont_mul_rows(a, b, p_limbs, np_limbs), axis=0)


@functools.lru_cache(maxsize=None)
def _mul_fn(L: int, sb: int, p_limbs: tuple, np_limbs: tuple):
    kern = functools.partial(_mul_kernel, L, p_limbs, np_limbs)

    @jax.jit
    def run(a, b):  # (L, n/128, 128) tiles
        spec = pl.BlockSpec((L, sb, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(a.shape, jnp.uint32),
            grid=(a.shape[1] // sb,),
            in_specs=[spec, spec],
            out_specs=spec,
            interpret=_INTERPRET,
        )(a, b)

    return run


def mont_mul_tiles(df, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product directly on limb-major tiles.

    a, b: (L, M, 128) canonical Montgomery limb tiles (equal shapes,
    M % 8 == 0). Skips the (n, L) <-> tile transposes of `mont_mul` — the
    entry point for callers that already keep data limb-major (the
    large-domain NTT, ops/ntt_large.py)."""
    L = df.L
    assert a.shape == b.shape and a.shape[0] == L and a.shape[2] == LANES
    m = a.shape[1]
    sb = SUBS_BIG if m % SUBS_BIG == 0 else SUBS_SMALL
    assert m % sb == 0, (m, sb)
    fn = _mul_fn(
        L, sb,
        tuple(int(x) for x in df.p_limbs),
        tuple(int(x) for x in df.nprime_limbs),
    )
    return fn(a, b)


def mont_mul(df, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched Montgomery product via the fused TPU kernel.

    a, b: (..., L) canonical Montgomery limbs (broadcastable); returns
    canonical limbs < p, bit-identical to DeviceField's XLA path.
    """
    L = df.L
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    a = jnp.broadcast_to(a, (*shape, L)).reshape(-1, L)
    b = jnp.broadcast_to(b, (*shape, L)).reshape(-1, L)
    n = a.shape[0]
    npad, sb = pad_batch(n)
    if npad != n:
        zpad = ((0, npad - n), (0, 0))
        a = jnp.pad(a, zpad)
        b = jnp.pad(b, zpad)
    fn = _mul_fn(
        L, sb,
        tuple(int(x) for x in df.p_limbs),
        tuple(int(x) for x in df.nprime_limbs),
    )
    out = from_tiles(fn(to_tiles(a, L), to_tiles(b, L)), L)
    return out[:n].reshape(*shape, L)
