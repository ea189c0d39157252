"""Fused Pallas TPU kernels for complete Jacobian EC addition (G1).

One EC add is ~20 Montgomery mul/sqr plus carry/select glue; composed from
per-op kernels the glue and per-mul HBM round-trips dominate. These kernels
keep the whole formula — field products, carries, completeness selects
(inf / P==Q / P==-Q), and the inlined doubling branch — in VMEM/registers.

Like the field kernel (see pallas_field.py docstring), every limb lives as a
full (SB, 128) VPU tile: coordinates are reshaped outside to limb-major
tiles (L, n/128, 128). Squares use the symmetric schoolbook (~half the limb
multiplies, bit-identical column sums).

Two kernels:
- `ec_add_pallas`: general Jacobian + Jacobian (12M + 9S per element);
- `ec_madd_pallas`: Jacobian + affine-with-infinity-flag (9M + 8S) — the MSM
  bucket-accumulation hot path, where the sorted base points are affine
  (encode_points emits Z in {0,1}).

Formulas mirror ops/ec.py (ec_add/ec_double, a = 0 short-Weierstrass,
Z == 0 encoding infinity) bit-for-bit; ops/ec.ec_add dispatches here on TPU
for batches >= PALLAS_MIN_BATCH. (Reference counterpart: arkworks'
`ProjectiveCurve::add_assign` inside `VariableBaseMSM`, SURVEY.md §2.1.)
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_field import (
    LANES,
    PALLAS_MIN_BATCH,
    _add_rows,
    _is_zero_rows,
    _mont_mul_rows,
    _mont_sqr_rows,
    _select_rows,
    _sub_rows,
    to_tiles,
)

# interpret mode: lets CPU tests execute the kernels (slowly)
_INTERPRET = os.environ.get("CKB_ZKP_TPU_PALLAS_INTERPRET", "0") not in ("", "0")

EC_SUBS = 8  # sublanes per block: 1024 elements


def _ops(p_limbs, np_limbs):
    mul = lambda a, b: _mont_mul_rows(a, b, p_limbs, np_limbs)  # noqa: E731
    sqr = lambda a: _mont_sqr_rows(a, p_limbs, np_limbs)  # noqa: E731
    add = lambda a, b: _add_rows(a, b, p_limbs)  # noqa: E731
    sub = lambda a, b: _sub_rows(a, b, p_limbs)  # noqa: E731
    return mul, sqr, add, sub


def _double_rows(X, Y, Z, p_limbs, np_limbs):
    mul, sqr, add, sub = _ops(p_limbs, np_limbs)
    A = sqr(X)
    B = sqr(Y)
    C = sqr(B)
    t = sub(sqr(add(X, B)), add(A, C))
    D = add(t, t)
    E = add(add(A, A), A)
    F = sqr(E)
    X3 = sub(F, add(D, D))
    C2 = add(C, C)
    C4 = add(C2, C2)
    C8 = add(C4, C4)
    Y3 = sub(mul(E, sub(D, X3)), C8)
    YZ = mul(Y, Z)
    Z3 = add(YZ, YZ)
    return X3, Y3, Z3


def _rows(ref, L):
    return [ref[i] for i in range(L)]


def _add_core(X1, Y1, Z1, X2, Y2, Z2, p_limbs, np_limbs):
    """Complete Jacobian + Jacobian on limb tiles (mirrors ops/ec.ec_add)."""
    mul, sqr, add, sub = _ops(p_limbs, np_limbs)

    Z1Z1 = sqr(Z1)
    Z2Z2 = sqr(Z2)
    U1 = mul(X1, Z2Z2)
    U2 = mul(X2, Z1Z1)
    S1 = mul(Y1, mul(Z2, Z2Z2))
    S2 = mul(Y2, mul(Z1, Z1Z1))
    H = sub(U2, U1)
    r = sub(S2, S1)
    xeq = _is_zero_rows(H)
    yeq = _is_zero_rows(r)
    HH = sqr(H)
    HHH = mul(H, HH)
    V = mul(U1, HH)
    rr = sqr(r)
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
    return X3, Y3, Z3


def _ec_add_kernel(L, p_limbs, np_limbs, x1r, y1r, z1r, x2r, y2r, z2r, oxr, oyr, ozr):
    X3, Y3, Z3 = _add_core(
        _rows(x1r, L), _rows(y1r, L), _rows(z1r, L),
        _rows(x2r, L), _rows(y2r, L), _rows(z2r, L),
        p_limbs, np_limbs,
    )
    oxr[:] = jnp.stack(X3, axis=0)
    oyr[:] = jnp.stack(Y3, axis=0)
    ozr[:] = jnp.stack(Z3, axis=0)


def _madd_core(X1, Y1, Z1, X2, Y2, q_inf, p_limbs, np_limbs):
    """P (Jacobian) + Q (affine, inf mask). Mirrors ec_add bit-for-bit
    for Q with Z2 in {0, 1}."""
    mul, sqr, add, sub = _ops(p_limbs, np_limbs)

    Z1Z1 = sqr(Z1)
    U2 = mul(X2, Z1Z1)
    S2 = mul(Y2, mul(Z1, Z1Z1))
    H = sub(U2, X1)  # U1 = X1 (Z2 = 1)
    r = sub(S2, Y1)  # S1 = Y1
    xeq = _is_zero_rows(H)
    yeq = _is_zero_rows(r)
    HH = sqr(H)
    HHH = mul(H, HH)
    V = mul(X1, HH)
    rr = sqr(r)
    X3 = sub(sub(rr, HHH), add(V, V))
    Y3 = sub(mul(r, sub(V, X3)), mul(Y1, HHH))
    Z3 = mul(Z1, H)

    # doubling branch doubles P, exactly as the general add does — keeps
    # the output limbs bit-identical to ops/ec.ec_add
    dX, dY, dZ = _double_rows(X1, Y1, Z1, p_limbs, np_limbs)
    both = xeq & yeq
    X3 = _select_rows(both, dX, X3)
    Y3 = _select_rows(both, dY, Y3)
    Z3 = _select_rows(both, dZ, Z3)

    X3 = _select_rows(q_inf, X1, X3)
    Y3 = _select_rows(q_inf, Y1, Y3)
    Z3 = _select_rows(q_inf, Z1, Z3)
    p_inf = _is_zero_rows(Z1)
    one_rows = [
        jnp.full_like(X1[0], int(v)) for v in _one_mont(p_limbs, np_limbs)
    ]
    z2_rows = _select_rows(q_inf, [jnp.zeros_like(c) for c in one_rows], one_rows)
    X3 = _select_rows(p_inf, X2, X3)
    Y3 = _select_rows(p_inf, Y2, Y3)
    Z3 = _select_rows(p_inf, z2_rows, Z3)
    return X3, Y3, Z3


def _ec_madd_kernel(
    L, p_limbs, np_limbs, x1r, y1r, z1r, x2r, y2r, inf2r, oxr, oyr, ozr
):
    X3, Y3, Z3 = _madd_core(
        _rows(x1r, L), _rows(y1r, L), _rows(z1r, L),
        _rows(x2r, L), _rows(y2r, L), inf2r[0] != 0,
        p_limbs, np_limbs,
    )
    oxr[:] = jnp.stack(X3, axis=0)
    oyr[:] = jnp.stack(Y3, axis=0)
    ozr[:] = jnp.stack(Z3, axis=0)


@functools.lru_cache(maxsize=None)
def _one_mont(p_limbs: tuple, np_limbs: tuple) -> tuple:
    """Montgomery form of 1 (= R mod p) as 16-bit limbs."""
    L = len(p_limbs)
    p = 0
    for v in reversed(p_limbs):
        p = (p << 16) | int(v)
    r = (1 << (16 * L)) % p
    return tuple((r >> (16 * k)) & 0xFFFF for k in range(L))


def _spec(L, sb):
    return pl.BlockSpec((L, sb, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM)


def _flag_spec(sb):
    return pl.BlockSpec((1, sb, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM)


@functools.lru_cache(maxsize=None)
def _ec_add_fn(L: int, sb: int, p_limbs: tuple, np_limbs: tuple):
    kern = functools.partial(_ec_add_kernel, L, p_limbs, np_limbs)

    @jax.jit
    def run(x1, y1, z1, x2, y2, z2):
        spec = _spec(L, sb)
        shp = jax.ShapeDtypeStruct(x1.shape, jnp.uint32)
        return pl.pallas_call(
            kern,
            out_shape=(shp, shp, shp),
            grid=(x1.shape[1] // sb,),
            in_specs=[spec] * 6,
            out_specs=(spec, spec, spec),
            interpret=_INTERPRET,
        )(x1, y1, z1, x2, y2, z2)

    return run


@functools.lru_cache(maxsize=None)
def _ec_madd_fn(L: int, sb: int, p_limbs: tuple, np_limbs: tuple):
    kern = functools.partial(_ec_madd_kernel, L, p_limbs, np_limbs)

    @jax.jit
    def run(x1, y1, z1, x2, y2, inf2):
        spec = _spec(L, sb)
        shp = jax.ShapeDtypeStruct(x1.shape, jnp.uint32)
        return pl.pallas_call(
            kern,
            out_shape=(shp, shp, shp),
            grid=(x1.shape[1] // sb,),
            in_specs=[spec] * 5 + [_flag_spec(sb)],
            out_specs=(spec, spec, spec),
            interpret=_INTERPRET,
        )(x1, y1, z1, x2, y2, inf2)

    return run


def _prep(df, coords, n, npad):
    """Broadcasted (n, L) coords -> padded limb-major tiles."""
    out = []
    for c in coords:
        if npad != n:
            c = jnp.pad(c, ((0, npad - n), (0, 0)))
        out.append(to_tiles(c, df.L))
    return out


def _ec_pad(n: int) -> tuple[int, int]:
    blk = EC_SUBS * LANES
    return -(-n // blk) * blk, EC_SUBS


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
    npad, sb = _ec_pad(n)
    tiles = _prep(df, flat, n, npad)
    fn = _ec_add_fn(
        L, sb,
        tuple(int(x) for x in df.p_limbs),
        tuple(int(x) for x in df.nprime_limbs),
    )
    ox, oy, oz = fn(*tiles)
    return tuple(
        c.reshape(L, -1).T[:n].reshape(*shape, L) for c in (ox, oy, oz)
    )


def ec_madd_pallas(df, p, q_affine):
    """P (Jacobian pytree) + Q ((X, Y, inf_mask) affine pytree)."""
    L = df.L
    X2, Y2, inf2 = q_affine
    shape = jnp.broadcast_shapes(
        *(c.shape[:-1] for c in p), X2.shape[:-1], Y2.shape[:-1], inf2.shape
    )
    flat = [
        jnp.broadcast_to(c, (*shape, L)).reshape(-1, L)
        for c in (*p, X2, Y2)
    ]
    n = flat[0].shape[0]
    npad, sb = _ec_pad(n)
    tiles = _prep(df, flat, n, npad)
    flags = jnp.broadcast_to(inf2, shape).reshape(-1).astype(jnp.uint32)
    if npad != n:
        # padded q lanes are infinity so acc passes through unchanged
        flags = jnp.pad(flags, (0, npad - n), constant_values=1)
    flags = flags.reshape(1, -1, LANES)
    fn = _ec_madd_fn(
        L, sb,
        tuple(int(x) for x in df.p_limbs),
        tuple(int(x) for x in df.nprime_limbs),
    )
    ox, oy, oz = fn(*tiles, flags)
    return tuple(
        c.reshape(L, -1).T[:n].reshape(*shape, L) for c in (ox, oy, oz)
    )


# ---------------------------------------------------------------- block scan
# MSM bucket accumulation spends O(N) adds computing block totals; as a
# lax.scan of B pallas launches, per-step overhead (~1 ms) dominates kernel
# compute (~0.35 ms at batch 32k). These kernels move the whole sequential
# scan INSIDE one pallas_call: grid over group tiles, fori_loop over the B
# block elements with the accumulator carried in registers — one launch,
# points read once, zero intermediate HBM traffic.
SCAN_SUBS = 8  # groups per block = SCAN_SUBS * 128


def _scan_madd_kernel(L, B, p_limbs, np_limbs, xr, yr, fr_, oxr, oyr, ozr):
    """xr/yr: (B, L, SB, 128) affine leaves; fr_: (B, SB, 128) inf flags.
    Outputs: block totals (L, SB, 128) x3 (Jacobian)."""
    one = _one_mont(p_limbs, np_limbs)
    tile = xr[0, 0]
    acc0 = (
        [jnp.full_like(tile, int(v)) for v in one],
        [jnp.full_like(tile, int(v)) for v in one],
        [jnp.zeros_like(tile) for _ in range(L)],
    )

    def body(b, acc):
        X1, Y1, Z1 = acc
        X2 = [xr[b, i] for i in range(L)]
        Y2 = [yr[b, i] for i in range(L)]
        return _madd_core(X1, Y1, Z1, X2, Y2, fr_[b] != 0, p_limbs, np_limbs)

    X3, Y3, Z3 = jax.lax.fori_loop(0, B, body, acc0)
    oxr[:] = jnp.stack(X3, axis=0)
    oyr[:] = jnp.stack(Y3, axis=0)
    ozr[:] = jnp.stack(Z3, axis=0)


def _scan_add_kernel(L, B, p_limbs, np_limbs, xr, yr, zr, oxr, oyr, ozr):
    """Jacobian variant: xr/yr/zr (B, L, SB, 128) -> block totals."""
    one = _one_mont(p_limbs, np_limbs)
    tile = xr[0, 0]
    acc0 = (
        [jnp.full_like(tile, int(v)) for v in one],
        [jnp.full_like(tile, int(v)) for v in one],
        [jnp.zeros_like(tile) for _ in range(L)],
    )

    def body(b, acc):
        X1, Y1, Z1 = acc
        X2 = [xr[b, i] for i in range(L)]
        Y2 = [yr[b, i] for i in range(L)]
        Z2 = [zr[b, i] for i in range(L)]
        return _add_core(X1, Y1, Z1, X2, Y2, Z2, p_limbs, np_limbs)

    X3, Y3, Z3 = jax.lax.fori_loop(0, B, body, acc0)
    oxr[:] = jnp.stack(X3, axis=0)
    oyr[:] = jnp.stack(Y3, axis=0)
    ozr[:] = jnp.stack(Z3, axis=0)


def _scan_spec(B, L, sb):
    return pl.BlockSpec(
        (B, L, sb, LANES), lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM
    )


def _scan_flag_spec(B, sb):
    return pl.BlockSpec(
        (B, sb, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )


@functools.lru_cache(maxsize=None)
def _scan_madd_fn(L: int, B: int, sb: int, p_limbs: tuple, np_limbs: tuple):
    kern = functools.partial(_scan_madd_kernel, L, B, p_limbs, np_limbs)

    @jax.jit
    def run(xb, yb, fb):  # (B, L, G/128, 128) x2, (B, G/128, 128)
        g128 = xb.shape[2]
        ospec = _spec(L, sb)
        shp = jax.ShapeDtypeStruct((L, g128, LANES), jnp.uint32)
        return pl.pallas_call(
            kern,
            out_shape=(shp, shp, shp),
            grid=(g128 // sb,),
            in_specs=[_scan_spec(B, L, sb)] * 2 + [_scan_flag_spec(B, sb)],
            out_specs=(ospec, ospec, ospec),
            interpret=_INTERPRET,
        )(xb, yb, fb)

    return run


@functools.lru_cache(maxsize=None)
def _scan_add_fn(L: int, B: int, sb: int, p_limbs: tuple, np_limbs: tuple):
    kern = functools.partial(_scan_add_kernel, L, B, p_limbs, np_limbs)

    @jax.jit
    def run(xb, yb, zb):
        g128 = xb.shape[2]
        ospec = _spec(L, sb)
        shp = jax.ShapeDtypeStruct((L, g128, LANES), jnp.uint32)
        return pl.pallas_call(
            kern,
            out_shape=(shp, shp, shp),
            grid=(g128 // sb,),
            in_specs=[_scan_spec(B, L, sb)] * 3,
            out_specs=(ospec, ospec, ospec),
            interpret=_INTERPRET,
        )(xb, yb, zb)

    return run


def _to_scan_tiles(df, c, G, B):
    """(N, L) with N = G*B, elements in sorted order -> (B, L, G/128, 128):
    step b of the in-kernel scan sees element g*B + b in lane-slot g."""
    L = df.L
    return c.reshape(G, B, L).transpose(1, 2, 0).reshape(B, L, G // LANES, LANES)


def ec_block_totals_madd(df, leaves, B: int):
    """Affine leaves (X, Y, inf) with leading axis N = G*B -> (G,) Jacobian
    block totals. Requires G % (SCAN_SUBS*128) == 0."""
    X, Y, inf = leaves
    L = df.L
    N = X.shape[0]
    G = N // B
    xb = _to_scan_tiles(df, X, G, B)
    yb = _to_scan_tiles(df, Y, G, B)
    fb = (
        inf.astype(jnp.uint32)
        .reshape(G, B)
        .T.reshape(B, G // LANES, LANES)
    )
    fn = _scan_madd_fn(
        L, B, SCAN_SUBS,
        tuple(int(x) for x in df.p_limbs),
        tuple(int(x) for x in df.nprime_limbs),
    )
    ox, oy, oz = fn(xb, yb, fb)
    return tuple(c.reshape(L, G).T for c in (ox, oy, oz))


def ec_block_totals_add(df, points, B: int):
    """Jacobian points (X, Y, Z) with leading axis N = G*B -> (G,) totals."""
    X, Y, Z = points
    L = df.L
    N = X.shape[0]
    G = N // B
    xb = _to_scan_tiles(df, X, G, B)
    yb = _to_scan_tiles(df, Y, G, B)
    zb = _to_scan_tiles(df, Z, G, B)
    fn = _scan_add_fn(
        L, B, SCAN_SUBS,
        tuple(int(x) for x in df.p_limbs),
        tuple(int(x) for x in df.nprime_limbs),
    )
    ox, oy, oz = fn(xb, yb, zb)
    return tuple(c.reshape(L, G).T for c in (ox, oy, oz))
