"""Fused Pallas TPU kernels for complete Jacobian EC adds (G1 and G2).

One EC add is ~20 Montgomery mul/sqr plus carry/select glue; composed from
per-op kernels the glue and per-mul HBM round-trips dominate. These kernels
keep the whole formula — field products, carries, completeness selects
(inf / P==Q / P==-Q), and the inlined doubling branch — in VMEM/registers.

Like the field kernel (see pallas_field.py docstring), every limb lives as a
full (SB, 128) VPU tile: coordinates are reshaped outside to limb-major
tiles (ext*L, n/128, 128), where ext = 1 for Fq (G1) and 2 for Fq2 (G2 —
c0 limbs then c1 limbs). Squares use the symmetric schoolbook (~half the
limb multiplies, bit-identical column sums); Fq2 multiplication uses the
same 3-multiply Karatsuba as ops/ec.DeviceFq2 (bit-exact).

Kernel families (each for ext in {1, 2}):
- `ec_add_pallas`: general Jacobian + Jacobian;
- `ec_madd_pallas`: Jacobian + affine-with-infinity-flag — the MSM bucket
  accumulation hot path (encode_points emits Z in {0,1});
- `ec_block_totals_madd` / `ec_block_totals_add`: a whole sequential
  accumulation scan inside ONE pallas_call (fori_loop over the B block
  elements, accumulator carried in registers) — a lax.scan of B separate
  launches costs ~1 ms per step in launch overhead alone.

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
)

# interpret mode: lets CPU tests execute the kernels (slowly)
_INTERPRET = os.environ.get("CKB_ZKP_TPU_PALLAS_INTERPRET", "0") not in ("", "0")

EC_SUBS = 8  # sublanes per block: 1024 elements
SCAN_SUBS = 8  # groups per scan-kernel block = SCAN_SUBS * 128


def scan_subs(ext: int) -> int:
    """Sublane block for the block-scan kernels (uniform; kept as a function
    so callers stay ext-agnostic if tiling ever needs to diverge)."""
    return SCAN_SUBS


def _scan_vmem_params(ext: int):
    """Fq2 (ext=2) doubles the limb rows: the scan kernels' (B, R, sb, 128)
    input blocks at B=32, R=32, sb=8 are 4 MB each, and with double buffering
    the default 16 MB scoped-VMEM cap OOMs at compile (observed on v5e, which
    has far more physical VMEM). Raise the cap for the wide kernels; the
    sublane dim must stay >= 8 (TPU tiling), so shrinking blocks instead is
    not an option."""
    if ext == 1:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


@functools.lru_cache(maxsize=None)
def _one_mont(p_limbs: tuple) -> tuple:
    """Montgomery form of 1 (= R mod p) as 16-bit limbs."""
    L = len(p_limbs)
    p = 0
    for v in reversed(p_limbs):
        p = (p << 16) | int(v)
    r = (1 << (16 * L)) % p
    return tuple((r >> (16 * k)) & 0xFFFF for k in range(L))


class _F:
    """Field ops on flat limb-tile lists: ext*L rows per element.

    ext=1: base field. ext=2: Fq2 = Fq[u]/(u^2+1), c0 rows then c1 rows,
    with the same Karatsuba multiply as ops/ec.DeviceFq2 (bit-exact).
    """

    def __init__(self, ext: int, p_limbs: tuple, np_limbs: tuple):
        self.ext = ext
        self.p = p_limbs
        self.np = np_limbs
        self.L = len(p_limbs)

    def _percomp(self, fn, *els):
        L = self.L
        out = []
        for k in range(self.ext):
            out.extend(fn(*[e[k * L : (k + 1) * L] for e in els]))
        return out

    def add(self, a, b):
        return self._percomp(lambda x, y: _add_rows(x, y, self.p), a, b)

    def sub(self, a, b):
        return self._percomp(lambda x, y: _sub_rows(x, y, self.p), a, b)

    def mul(self, a, b):
        L = self.L
        if self.ext == 1:
            return _mont_mul_rows(a, b, self.p, self.np)
        a0, a1 = a[:L], a[L:]
        b0, b1 = b[:L], b[L:]
        v0 = _mont_mul_rows(a0, b0, self.p, self.np)
        v1 = _mont_mul_rows(a1, b1, self.p, self.np)
        c0 = _sub_rows(v0, v1, self.p)  # beta = -1
        s = _mont_mul_rows(
            _add_rows(a0, a1, self.p), _add_rows(b0, b1, self.p), self.p, self.np
        )
        c1 = _sub_rows(s, _add_rows(v0, v1, self.p), self.p)
        return [*c0, *c1]

    def sqr(self, a):
        if self.ext == 1:
            return _mont_sqr_rows(a, self.p, self.np)
        return self.mul(a, a)  # DeviceFq2.sqr == mul(a, a), keep bit-exact

    def is_zero(self, a):
        return _is_zero_rows(a)

    def select(self, mask, a, b):
        return _select_rows(mask, a, b)

    def one_like(self, tile):
        rows = [jnp.full_like(tile, int(v)) for v in _one_mont(self.p)]
        if self.ext == 2:
            rows += [jnp.zeros_like(tile) for _ in range(self.L)]
        return rows

    def zero_like(self, tile):
        return [jnp.zeros_like(tile) for _ in range(self.ext * self.L)]


def _double_core(F: _F, X, Y, Z):
    A = F.sqr(X)
    B = F.sqr(Y)
    C = F.sqr(B)
    t = F.sub(F.sqr(F.add(X, B)), F.add(A, C))
    D = F.add(t, t)
    E = F.add(F.add(A, A), A)
    Fe = F.sqr(E)
    X3 = F.sub(Fe, F.add(D, D))
    C2 = F.add(C, C)
    C4 = F.add(C2, C2)
    C8 = F.add(C4, C4)
    Y3 = F.sub(F.mul(E, F.sub(D, X3)), C8)
    YZ = F.mul(Y, Z)
    Z3 = F.add(YZ, YZ)
    return X3, Y3, Z3


def _add_core(F: _F, X1, Y1, Z1, X2, Y2, Z2):
    """Complete Jacobian + Jacobian on limb tiles (mirrors ops/ec.ec_add)."""
    Z1Z1 = F.sqr(Z1)
    Z2Z2 = F.sqr(Z2)
    U1 = F.mul(X1, Z2Z2)
    U2 = F.mul(X2, Z1Z1)
    S1 = F.mul(Y1, F.mul(Z2, Z2Z2))
    S2 = F.mul(Y2, F.mul(Z1, Z1Z1))
    H = F.sub(U2, U1)
    r = F.sub(S2, S1)
    xeq = F.is_zero(H)
    yeq = F.is_zero(r)
    HH = F.sqr(H)
    HHH = F.mul(H, HH)
    V = F.mul(U1, HH)
    rr = F.sqr(r)
    X3 = F.sub(F.sub(rr, HHH), F.add(V, V))
    Y3 = F.sub(F.mul(r, F.sub(V, X3)), F.mul(S1, HHH))
    Z3 = F.mul(F.mul(Z1, Z2), H)

    dX, dY, dZ = _double_core(F, X1, Y1, Z1)
    both = xeq & yeq
    X3 = F.select(both, dX, X3)
    Y3 = F.select(both, dY, Y3)
    Z3 = F.select(both, dZ, Z3)

    q_inf = F.is_zero(Z2)
    X3 = F.select(q_inf, X1, X3)
    Y3 = F.select(q_inf, Y1, Y3)
    Z3 = F.select(q_inf, Z1, Z3)
    p_inf = F.is_zero(Z1)
    X3 = F.select(p_inf, X2, X3)
    Y3 = F.select(p_inf, Y2, Y3)
    Z3 = F.select(p_inf, Z2, Z3)
    return X3, Y3, Z3


def _madd_core(F: _F, X1, Y1, Z1, X2, Y2, q_inf):
    """P (Jacobian) + Q (affine, inf mask). Mirrors ec_add bit-for-bit for
    Q with Z2 in {0, 1} (Montgomery-mul by the Montgomery one is the limb
    identity, so U1 == X1, S1 == Y1, Z1*Z2 == Z1 exactly)."""
    Z1Z1 = F.sqr(Z1)
    U2 = F.mul(X2, Z1Z1)
    S2 = F.mul(Y2, F.mul(Z1, Z1Z1))
    H = F.sub(U2, X1)
    r = F.sub(S2, Y1)
    xeq = F.is_zero(H)
    yeq = F.is_zero(r)
    HH = F.sqr(H)
    HHH = F.mul(H, HH)
    V = F.mul(X1, HH)
    rr = F.sqr(r)
    X3 = F.sub(F.sub(rr, HHH), F.add(V, V))
    Y3 = F.sub(F.mul(r, F.sub(V, X3)), F.mul(Y1, HHH))
    Z3 = F.mul(Z1, H)

    # doubling branch doubles P, exactly as the general add does
    dX, dY, dZ = _double_core(F, X1, Y1, Z1)
    both = xeq & yeq
    X3 = F.select(both, dX, X3)
    Y3 = F.select(both, dY, Y3)
    Z3 = F.select(both, dZ, Z3)

    X3 = F.select(q_inf, X1, X3)
    Y3 = F.select(q_inf, Y1, Y3)
    Z3 = F.select(q_inf, Z1, Z3)
    p_inf = F.is_zero(Z1)
    one_rows = F.one_like(X1[0])
    z2_rows = F.select(q_inf, F.zero_like(X1[0]), one_rows)
    X3 = F.select(p_inf, X2, X3)
    Y3 = F.select(p_inf, Y2, Y3)
    Z3 = F.select(p_inf, z2_rows, Z3)
    return X3, Y3, Z3


def _rows(ref, nrows):
    return [ref[i] for i in range(nrows)]


# ---------------------------------------------------------------- kernels
def _ec_add_kernel(F, x1r, y1r, z1r, x2r, y2r, z2r, oxr, oyr, ozr):
    R = F.ext * F.L
    X3, Y3, Z3 = _add_core(
        F,
        _rows(x1r, R), _rows(y1r, R), _rows(z1r, R),
        _rows(x2r, R), _rows(y2r, R), _rows(z2r, R),
    )
    oxr[:] = jnp.stack(X3, axis=0)
    oyr[:] = jnp.stack(Y3, axis=0)
    ozr[:] = jnp.stack(Z3, axis=0)


def _ec_madd_kernel(F, x1r, y1r, z1r, x2r, y2r, inf2r, oxr, oyr, ozr):
    R = F.ext * F.L
    X3, Y3, Z3 = _madd_core(
        F,
        _rows(x1r, R), _rows(y1r, R), _rows(z1r, R),
        _rows(x2r, R), _rows(y2r, R), inf2r[0] != 0,
    )
    oxr[:] = jnp.stack(X3, axis=0)
    oyr[:] = jnp.stack(Y3, axis=0)
    ozr[:] = jnp.stack(Z3, axis=0)


def _scan_madd_kernel(F, B, xr, yr, fr_, oxr, oyr, ozr):
    """xr/yr: (B, R, SB, 128) affine leaves; fr_: (B, SB, 128) inf flags.
    Outputs: block totals (R, SB, 128) x3 (Jacobian)."""
    R = F.ext * F.L
    tile = xr[0, 0]
    acc0 = (F.one_like(tile), F.one_like(tile), F.zero_like(tile))

    def body(b, acc):
        X1, Y1, Z1 = acc
        X2 = [xr[b, i] for i in range(R)]
        Y2 = [yr[b, i] for i in range(R)]
        return _madd_core(F, X1, Y1, Z1, X2, Y2, fr_[b] != 0)

    X3, Y3, Z3 = jax.lax.fori_loop(0, B, body, acc0)
    oxr[:] = jnp.stack(X3, axis=0)
    oyr[:] = jnp.stack(Y3, axis=0)
    ozr[:] = jnp.stack(Z3, axis=0)


def _scan_add_kernel(F, B, xr, yr, zr, oxr, oyr, ozr):
    """Jacobian variant: xr/yr/zr (B, R, SB, 128) -> block totals."""
    R = F.ext * F.L
    tile = xr[0, 0]
    acc0 = (F.one_like(tile), F.one_like(tile), F.zero_like(tile))

    def body(b, acc):
        X1, Y1, Z1 = acc
        X2 = [xr[b, i] for i in range(R)]
        Y2 = [yr[b, i] for i in range(R)]
        Z2 = [zr[b, i] for i in range(R)]
        return _add_core(F, X1, Y1, Z1, X2, Y2, Z2)

    X3, Y3, Z3 = jax.lax.fori_loop(0, B, body, acc0)
    oxr[:] = jnp.stack(X3, axis=0)
    oyr[:] = jnp.stack(Y3, axis=0)
    ozr[:] = jnp.stack(Z3, axis=0)


# ---------------------------------------------------------------- plumbing
def _spec(R, sb):
    return pl.BlockSpec((R, sb, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM)


def _flag_spec(sb):
    return pl.BlockSpec((1, sb, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM)


def _ext(cf) -> int:
    """1 for DeviceField (G1), 2 for DeviceFq2 (G2, wraps .df)."""
    return 2 if hasattr(cf, "df") else 1


def _limbs(cf) -> tuple:
    df = getattr(cf, "df", cf)
    return (
        tuple(int(x) for x in df.p_limbs),
        tuple(int(x) for x in df.nprime_limbs),
    )


def _flatten_coord(cf, c):
    """(..., L) or (..., 2, L) coordinate -> (..., R) flat limbs."""
    if _ext(cf) == 2:
        return c.reshape(*c.shape[:-2], 2 * cf.L)
    return c


def _unflatten_coord(cf, c):
    if _ext(cf) == 2:
        return c.reshape(*c.shape[:-1], 2, cf.L)
    return c


@functools.lru_cache(maxsize=None)
def _ec_add_fn(ext: int, sb: int, p_limbs: tuple, np_limbs: tuple):
    F = _F(ext, p_limbs, np_limbs)
    R = ext * F.L
    kern = functools.partial(_ec_add_kernel, F)

    @jax.jit
    def run(x1, y1, z1, x2, y2, z2):
        spec = _spec(R, sb)
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
def _ec_madd_fn(ext: int, sb: int, p_limbs: tuple, np_limbs: tuple):
    F = _F(ext, p_limbs, np_limbs)
    R = ext * F.L
    kern = functools.partial(_ec_madd_kernel, F)

    @jax.jit
    def run(x1, y1, z1, x2, y2, inf2):
        spec = _spec(R, sb)
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


@functools.lru_cache(maxsize=None)
def _scan_madd_fn(ext: int, B: int, sb: int, p_limbs: tuple, np_limbs: tuple):
    F = _F(ext, p_limbs, np_limbs)
    R = ext * F.L
    kern = functools.partial(_scan_madd_kernel, F, B)

    @jax.jit
    def run(xb, yb, fb):  # (B, R, G/128, 128) x2, (B, G/128, 128)
        g128 = xb.shape[2]
        ospec = _spec(R, sb)
        shp = jax.ShapeDtypeStruct((R, g128, LANES), jnp.uint32)
        inspec = pl.BlockSpec(
            (B, R, sb, LANES), lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM
        )
        fspec = pl.BlockSpec(
            (B, sb, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )
        kwargs = {}
        params = _scan_vmem_params(ext)
        if params is not None:
            kwargs["compiler_params"] = params
        return pl.pallas_call(
            kern,
            out_shape=(shp, shp, shp),
            grid=(g128 // sb,),
            in_specs=[inspec, inspec, fspec],
            out_specs=(ospec, ospec, ospec),
            interpret=_INTERPRET,
            **kwargs,
        )(xb, yb, fb)

    return run


@functools.lru_cache(maxsize=None)
def _scan_add_fn(ext: int, B: int, sb: int, p_limbs: tuple, np_limbs: tuple):
    F = _F(ext, p_limbs, np_limbs)
    R = ext * F.L
    kern = functools.partial(_scan_add_kernel, F, B)

    @jax.jit
    def run(xb, yb, zb):
        g128 = xb.shape[2]
        ospec = _spec(R, sb)
        shp = jax.ShapeDtypeStruct((R, g128, LANES), jnp.uint32)
        inspec = pl.BlockSpec(
            (B, R, sb, LANES), lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM
        )
        kwargs = {}
        params = _scan_vmem_params(ext)
        if params is not None:
            kwargs["compiler_params"] = params
        return pl.pallas_call(
            kern,
            out_shape=(shp, shp, shp),
            grid=(g128 // sb,),
            in_specs=[inspec] * 3,
            out_specs=(ospec, ospec, ospec),
            interpret=_INTERPRET,
            **kwargs,
        )(xb, yb, zb)

    return run


def _ec_pad(n: int) -> tuple[int, int]:
    blk = EC_SUBS * LANES
    return -(-n // blk) * blk, EC_SUBS


def _prep(R, coords, n, npad):
    """Broadcasted flat (n, R) coords -> padded limb-major tiles."""
    out = []
    for c in coords:
        if npad != n:
            c = jnp.pad(c, ((0, npad - n), (0, 0)))
        out.append(c.T.reshape(R, -1, LANES))
    return out


def ec_add_pallas(cf, p, q):
    """Complete Jacobian add via the fused kernel; coordinate pytrees are
    (..., L) for G1 / (..., 2, L) for G2."""
    ext = _ext(cf)
    R = ext * cf.L
    flat = [_flatten_coord(cf, c) for c in (*p, *q)]
    shape = jnp.broadcast_shapes(*(c.shape[:-1] for c in flat))
    flat = [jnp.broadcast_to(c, (*shape, R)).reshape(-1, R) for c in flat]
    n = flat[0].shape[0]
    npad, sb = _ec_pad(n)
    tiles = _prep(R, flat, n, npad)
    fn = _ec_add_fn(ext, sb, *_limbs(cf))
    outs = fn(*tiles)
    return tuple(
        _unflatten_coord(cf, c.reshape(R, -1).T[:n].reshape(*shape, R))
        for c in outs
    )


def ec_madd_pallas(cf, p, q_affine):
    """P (Jacobian pytree) + Q ((X, Y, inf_mask) affine pytree)."""
    ext = _ext(cf)
    R = ext * cf.L
    X2, Y2, inf2 = q_affine
    flat = [_flatten_coord(cf, c) for c in (*p, X2, Y2)]
    shape = jnp.broadcast_shapes(*(c.shape[:-1] for c in flat), inf2.shape)
    flat = [jnp.broadcast_to(c, (*shape, R)).reshape(-1, R) for c in flat]
    n = flat[0].shape[0]
    npad, sb = _ec_pad(n)
    tiles = _prep(R, flat, n, npad)
    flags = jnp.broadcast_to(inf2, shape).reshape(-1).astype(jnp.uint32)
    if npad != n:
        # padded q lanes are infinity so acc passes through unchanged
        flags = jnp.pad(flags, (0, npad - n), constant_values=1)
    flags = flags.reshape(1, -1, LANES)
    fn = _ec_madd_fn(ext, sb, *_limbs(cf))
    outs = fn(*tiles, flags)
    return tuple(
        _unflatten_coord(cf, c.reshape(R, -1).T[:n].reshape(*shape, R))
        for c in outs
    )


# ---------------------------------------------------------------- block scan
def _to_scan_tiles(R, c, G, B):
    """(N, R) with N = G*B, elements in sorted order -> (B, R, G/128, 128):
    step b of the in-kernel scan sees element g*B + b in lane-slot g."""
    return c.reshape(G, B, R).transpose(1, 2, 0).reshape(B, R, G // LANES, LANES)


def ec_block_totals_madd(cf, leaves, B: int):
    """Affine leaves (X, Y, inf) with leading axis N = G*B -> (G,) Jacobian
    block totals. Requires G % (scan_subs(ext)*128) == 0."""
    X, Y, inf = leaves
    ext = _ext(cf)
    R = ext * cf.L
    Xf, Yf = _flatten_coord(cf, X), _flatten_coord(cf, Y)
    N = Xf.shape[0]
    G = N // B
    xb = _to_scan_tiles(R, Xf, G, B)
    yb = _to_scan_tiles(R, Yf, G, B)
    fb = inf.astype(jnp.uint32).reshape(G, B).T.reshape(B, G // LANES, LANES)
    fn = _scan_madd_fn(ext, B, scan_subs(ext), *_limbs(cf))
    outs = fn(xb, yb, fb)
    return tuple(_unflatten_coord(cf, c.reshape(R, G).T) for c in outs)


def ec_block_totals_add(cf, points, B: int):
    """Jacobian points (X, Y, Z) with leading axis N = G*B -> (G,) totals."""
    ext = _ext(cf)
    R = ext * cf.L
    flats = [_flatten_coord(cf, c) for c in points]
    N = flats[0].shape[0]
    G = N // B
    tiles = [_to_scan_tiles(R, c, G, B) for c in flats]
    fn = _scan_add_fn(ext, B, scan_subs(ext), *_limbs(cf))
    outs = fn(*tiles)
    return tuple(_unflatten_coord(cf, c.reshape(R, G).T) for c in outs)
