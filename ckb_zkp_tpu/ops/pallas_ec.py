"""Fused Pallas TPU kernel for complete Jacobian EC addition (G1).

One EC add is ~16 Montgomery multiplies plus carry/select glue; composed from
per-op kernels the glue and per-mul HBM round-trips cap throughput at ~3.7M
adds/s on one chip. This kernel keeps the whole formula — field products,
carries, completeness selects (inf / P==Q / P==-Q), and the inlined doubling
branch — in VMEM/registers: reads 6 coordinate blocks, writes 3.

Formulas mirror ops/ec.py (ec_add/ec_double, a = 0 short-Weierstrass,
Z == 0 encoding infinity) bit-for-bit; ops/ec.ec_add dispatches here on TPU
for batches >= PALLAS_MIN_BATCH. (Reference counterpart: arkworks'
`ProjectiveCurve::add_assign` inside `VariableBaseMSM`, SURVEY.md §2.1.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_field import (
    PALLAS_MIN_BATCH,
    _add_rows,
    _is_zero_rows,
    _mont_mul_rows,
    _select_rows,
    _sub_rows,
)

EC_BLK = 512


def _double_rows(X, Y, Z, p_limbs, np_limbs):
    mul = lambda a, b: _mont_mul_rows(a, b, p_limbs, np_limbs)  # noqa: E731
    add = lambda a, b: _add_rows(a, b, p_limbs)  # noqa: E731
    sub = lambda a, b: _sub_rows(a, b, p_limbs)  # noqa: E731
    A = mul(X, X)
    B = mul(Y, Y)
    C = mul(B, B)
    XB = add(X, B)
    t = sub(mul(XB, XB), add(A, C))
    D = add(t, t)
    E = add(add(A, A), A)
    F = mul(E, E)
    X3 = sub(F, add(D, D))
    C2 = add(C, C)
    C4 = add(C2, C2)
    C8 = add(C4, C4)
    Y3 = sub(mul(E, sub(D, X3)), C8)
    YZ = mul(Y, Z)
    Z3 = add(YZ, YZ)
    return X3, Y3, Z3


def _ec_add_kernel(L, p_limbs, np_limbs, x1r, y1r, z1r, x2r, y2r, z2r, oxr, oyr, ozr):
    def rows(ref):
        t = ref[:].T
        return [t[i] for i in range(L)]

    X1, Y1, Z1 = rows(x1r), rows(y1r), rows(z1r)
    X2, Y2, Z2 = rows(x2r), rows(y2r), rows(z2r)
    mul = lambda a, b: _mont_mul_rows(a, b, p_limbs, np_limbs)  # noqa: E731
    add = lambda a, b: _add_rows(a, b, p_limbs)  # noqa: E731
    sub = lambda a, b: _sub_rows(a, b, p_limbs)  # noqa: E731

    Z1Z1 = mul(Z1, Z1)
    Z2Z2 = mul(Z2, Z2)
    U1 = mul(X1, Z2Z2)
    U2 = mul(X2, Z1Z1)
    S1 = mul(Y1, mul(Z2, Z2Z2))
    S2 = mul(Y2, mul(Z1, Z1Z1))
    H = sub(U2, U1)
    r = sub(S2, S1)
    xeq = _is_zero_rows(H)
    yeq = _is_zero_rows(r)
    HH = mul(H, H)
    HHH = mul(H, HH)
    V = mul(U1, HH)
    rr = mul(r, r)
    X3 = sub(sub(rr, HHH), add(V, V))
    Y3 = sub(mul(r, sub(V, X3)), mul(S1, HHH))
    Z3 = mul(mul(Z1, Z2), H)

    dX, dY, dZ = _double_rows(X1, Y1, Z1, p_limbs, np_limbs)
    both = xeq & yeq
    X3 = _select_rows(both, dX, X3)
    Y3 = _select_rows(both, dY, Y3)
    Z3 = _select_rows(both, dZ, Z3)

    q_inf = _is_zero_rows(Z2)
    X3 = _select_rows(q_inf, X1, X3)
    Y3 = _select_rows(q_inf, Y1, Y3)
    Z3 = _select_rows(q_inf, Z1, Z3)
    p_inf = _is_zero_rows(Z1)
    X3 = _select_rows(p_inf, X2, X3)
    Y3 = _select_rows(p_inf, Y2, Y3)
    Z3 = _select_rows(p_inf, Z2, Z3)

    oxr[:] = jnp.stack(X3, axis=0).T
    oyr[:] = jnp.stack(Y3, axis=0).T
    ozr[:] = jnp.stack(Z3, axis=0).T


@functools.lru_cache(maxsize=None)
def _ec_add_fn(L: int, p_limbs: tuple, np_limbs: tuple):
    kern = functools.partial(_ec_add_kernel, L, p_limbs, np_limbs)

    @jax.jit
    def run(x1, y1, z1, x2, y2, z2):
        n = x1.shape[0]
        spec = pl.BlockSpec((EC_BLK, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
        shp = jax.ShapeDtypeStruct((n, L), jnp.uint32)
        return pl.pallas_call(
            kern,
            out_shape=(shp, shp, shp),
            grid=(n // EC_BLK,),
            in_specs=[spec] * 6,
            out_specs=(spec, spec, spec),
        )(x1, y1, z1, x2, y2, z2)

    return run


def ec_add_pallas(df, p, q):
    """Complete Jacobian add via the fused kernel; (..., L) coord pytrees."""
    L = df.L
    shape = jnp.broadcast_shapes(
        *(c.shape[:-1] for c in p), *(c.shape[:-1] for c in q)
    )
    flat = [
        jnp.broadcast_to(c, (*shape, L)).reshape(-1, L) for c in (*p, *q)
    ]
    n = flat[0].shape[0]
    npad = -(-n // EC_BLK) * EC_BLK
    if npad != n:
        flat = [jnp.pad(c, ((0, npad - n), (0, 0))) for c in flat]
    fn = _ec_add_fn(
        L,
        tuple(int(x) for x in df.p_limbs),
        tuple(int(x) for x in df.nprime_limbs),
    )
    ox, oy, oz = fn(*flat)
    return tuple(c[:n].reshape(*shape, L) for c in (ox, oy, oz))
