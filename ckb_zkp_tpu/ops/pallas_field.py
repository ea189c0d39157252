"""Pallas TPU kernel for batched Montgomery field multiplication.

The single hottest op in the framework: every NTT butterfly, EC point add and
sumcheck table update is a chain of these (reference counterpart: arkwork's
`ark-ff` Montgomery backend, SURVEY.md §2.1). The pure-XLA formulation in
ops/field.py materializes (N, L, L) outer products and skew-reshape
temporaries in HBM — measured ~5.8M mont-mul/s on one chip, ~200x below the
VPU compute bound. This kernel keeps the whole schoolbook product +
SOS Montgomery reduction in VMEM/registers:

- layout: blocks of (BLK, L) canonical 16-bit limbs are transposed once in
  VMEM to limb-major rows (L, BLK), so every limb is a full-lane vector;
- products split lo/hi 16-bit halves (column sums of <= L terms stay < 2^21,
  no wide accumulator needed — same invariant as ops/limbs.py);
- carries resolved with an in-register ripple (sequential per limb, but fully
  pipelined across the BLK lanes);
- conditional subtract via two's-complement add, exactly matching the XLA
  path bit-for-bit (both return canonical limbs < p).

Results are identical to DeviceField's XLA path; DeviceField.mul dispatches
here on TPU backends for batches >= PALLAS_MIN_BATCH.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK = (1 << 16) - 1
BLK = 1024  # elements per grid step; (L, BLK) u32 tiles fill VPU lanes
PALLAS_MIN_BATCH = 256


def _conv_lazy(u, v, ncols):
    """Column sums of the schoolbook product of limb-row lists u, v.

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
    """Canonical limb-rows a + b mod p (2p < R, so no carry-out)."""
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


def _mont_mul_rows(a, b, p_limbs, np_limbs):
    """Limb-row lists (length L) -> Montgomery product rows, canonical."""
    L = len(a)
    t_cols = _conv_lazy(a, b, 2 * L)
    t_can, _ = _ripple(t_cols)
    npl = [jnp.full_like(a[0], int(v)) for v in np_limbs]
    m_can, _ = _ripple(_conv_lazy(t_can[:L], npl, L))
    pl_rows = [jnp.full_like(a[0], int(v)) for v in p_limbs]
    mp_cols = _conv_lazy(m_can, pl_rows, 2 * L)
    s_cols = [t_can[k] + mp_cols[k] for k in range(2 * L)]
    s_can, _ = _ripple(s_cols)
    return _cond_sub_p(s_can[L:], p_limbs)


def _mul_kernel(L, p_limbs, np_limbs, a_ref, b_ref, o_ref):
    at = a_ref[:].T  # (BLK, L) -> (L, BLK), one VMEM transpose
    bt = b_ref[:].T
    a = [at[i, :] for i in range(L)]
    b = [bt[i, :] for i in range(L)]
    out = _mont_mul_rows(a, b, p_limbs, np_limbs)
    o_ref[:] = jnp.stack(out, axis=0).T


@functools.lru_cache(maxsize=None)
def _mul_fn(L: int, p_limbs: tuple, np_limbs: tuple):
    kern = functools.partial(_mul_kernel, L, p_limbs, np_limbs)

    @jax.jit
    def run(a, b):
        n = a.shape[0]
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((n, L), jnp.uint32),
            grid=(n // BLK,),
            in_specs=[
                pl.BlockSpec((BLK, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BLK, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (BLK, L), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        )(a, b)

    return run


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
    npad = -(-n // BLK) * BLK
    if npad != n:
        zpad = ((0, npad - n), (0, 0))
        a = jnp.pad(a, zpad)
        b = jnp.pad(b, zpad)
    fn = _mul_fn(L, tuple(int(x) for x in df.p_limbs), tuple(int(x) for x in df.nprime_limbs))
    out = fn(a, b)
    return out[:n].reshape(*shape, L)
