"""Fused Pallas TPU kernels for RCB complete projective EC ops.

The MSM v2 engine (ops/msm.py) is built from exactly four kernel families,
each keeping a whole formula chain in VMEM/registers so every wide EC
operation is ONE device kernel launch:

- `rcb_add_pallas` / `rcb_madd_pallas`: elementwise complete add (proj+proj,
  proj+affine-with-inf-flag);
- `rcb_scan_prefix_madd`: B-element blocked inclusive scan over sorted
  affine leaves, emitting ALL within-block prefixes W plus block totals T in
  one launch — W makes bucket-boundary prefix queries a single gather+add
  instead of per-query row reductions;
- `rcb_scan_prefix_add`: the projective-projective variant (recursion over
  block totals);
- `rcb_scan_total_add`: totals-only variant for tree reductions.

Formulas mirror ops/rcb.py (Renes–Costello–Batina, a = 0) bit-for-bit; the
identity is (0 : 1 : 0) so no completeness selects exist anywhere. Layouts
follow pallas_ec.py: each limb is a full (SB, 128) VPU tile, coordinates are
limb-major (R, n/128, 128) with R = ext * L (ext = 2 for Fq2/G2).

Reference counterpart: the Pippenger inner loops of arkworks'
`VariableBaseMSM` (/root/reference/groth16/src/prover.rs:187-190).
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
    _add_rows,
    _mont_mul_rows,
    _mont_mul_rows_mxu,
    _mont_sqr_rows,
    _mont_sqr_rows_mxu,
    _select_rows,
    _sub_rows,
    mxu_band_consts,
)
from .pallas_ec import _F, _one_mont

_INTERPRET = os.environ.get("CKB_ZKP_TPU_PALLAS_INTERPRET", "0") not in ("", "0")

# MXU Montgomery reduction inside the EC kernels (measured +19% on the G1
# scan, scripts/probe_scan6.py): the two constant-operand reduction
# convolutions ride the MXU as int8 band matmuls while the VPU keeps the
# schoolbook product + carries. Bit-identical to the VPU-only path
# (tests/test_pallas_field.py). Opt out with CKB_ZKP_TPU_MXU=0.
_USE_MXU = os.environ.get("CKB_ZKP_TPU_MXU", "1") not in ("", "0")
# The Fq2 (G2) kernels issue 3 MXU reduces per Karatsuba multiply; the
# resulting Mosaic program HANGS the remote TPU compiler (two >30 min
# attempts, round 5) where the VPU-only G2 program compiles in minutes.
# Keep the MXU reduce G1-only until the G2 program is validated end-to-end;
# opt back in with CKB_ZKP_TPU_MXU_G2=1.
_USE_MXU_G2 = os.environ.get("CKB_ZKP_TPU_MXU_G2", "0") not in ("", "0")

SUBS = 8  # sublanes per block (1024 lanes per grid step)


class _FRcb(_F):
    """_F plus the 3b constant multiply (add chain or baked constant rows)."""

    def __init__(self, ext, p_limbs, np_limbs, b3_small, b3_limbs):
        super().__init__(ext, p_limbs, np_limbs)
        self.b3_small = b3_small  # tiny int or None
        self.b3_limbs = b3_limbs  # flat (ext*L,) int tuple or None

    def mul_b3(self, t):
        if self.b3_small is not None:
            n = self.b3_small
            result = None
            base = t
            while n:
                if n & 1:
                    result = base if result is None else self.add(result, base)
                n >>= 1
                if n:
                    base = self.add(base, base)
            return result
        rows = [jnp.full_like(t[0], int(v)) for v in self.b3_limbs]
        return self.mul(t, rows)

    def identity_rows(self, tile):
        """(0 : 1 : 0) as limb-row lists."""
        return (self.zero_like(tile), self.one_like(tile), self.zero_like(tile))


class _FRcbMxu(_FRcb):
    """_FRcb with the MXU Montgomery reduction for every field multiply.

    m1/m2 are the in-kernel views of the mxu_band_consts band matrices
    (Pallas forbids captured array constants, so they arrive as kernel
    inputs); rs1/rs2 are static row-sum tuples. For Fq2 (ext=2) each of the
    three Karatsuba base multiplies uses the MXU reduce."""

    def __init__(self, base: _FRcb, m1, m2, rs1, rs2):
        _FRcb.__init__(
            self, base.ext, base.p, base.np, base.b3_small, base.b3_limbs
        )
        self._mxu = (m1, m2, rs1, rs2)

    def _mm(self, a, b):
        return _mont_mul_rows_mxu(a, b, self.p, self.np, *self._mxu)

    def mul(self, a, b):
        L = self.L
        if self.ext == 1:
            return self._mm(a, b)
        a0, a1 = a[:L], a[L:]
        b0, b1 = b[:L], b[L:]
        v0 = self._mm(a0, b0)
        v1 = self._mm(a1, b1)
        c0 = _sub_rows(v0, v1, self.p)  # beta = -1
        s = self._mm(_add_rows(a0, a1, self.p), _add_rows(b0, b1, self.p))
        c1 = _sub_rows(s, _add_rows(v0, v1, self.p), self.p)
        return [*c0, *c1]

    def sqr(self, a):
        if self.ext == 1:
            return _mont_sqr_rows_mxu(a, self.p, self.np, *self._mxu)
        return self.mul(a, a)  # keep bit-exact with DeviceFq2.sqr


def _mxu_wrap(kern_fn, extra, F, rs1, rs2, m1_ref, m2_ref, *refs):
    """Kernel shim: build the MXU field view from the two band-matrix refs
    (always the leading kernel inputs), then run the wrapped kernel body."""
    Fm = _FRcbMxu(F, m1_ref[:], m2_ref[:], rs1, rs2)
    return kern_fn(Fm, *extra, *refs)


def _rcb_add_core(F: _FRcb, p, q):
    """Algorithm 7 (a = 0) on limb-row lists; complete, no selects."""
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    t0 = F.mul(X1, X2)
    t1 = F.mul(Y1, Y2)
    t2 = F.mul(Z1, Z2)
    t3 = F.mul(F.add(X1, Y1), F.add(X2, Y2))
    t3 = F.sub(t3, F.add(t0, t1))
    t4 = F.mul(F.add(Y1, Z1), F.add(Y2, Z2))
    t4 = F.sub(t4, F.add(t1, t2))
    X3 = F.mul(F.add(X1, Z1), F.add(X2, Z2))
    Y3 = F.sub(X3, F.add(t0, t2))
    X3 = F.add(t0, t0)
    t0 = F.add(X3, t0)
    t2 = F.mul_b3(t2)
    Z3 = F.add(t1, t2)
    t1 = F.sub(t1, t2)
    Y3 = F.mul_b3(Y3)
    X3 = F.sub(F.mul(t3, t1), F.mul(t4, Y3))
    Y3 = F.add(F.mul(t1, Z3), F.mul(Y3, t0))
    Z3 = F.add(F.mul(Z3, t4), F.mul(t0, t3))
    return (X3, Y3, Z3)


def _rcb_madd_core(F: _FRcb, p, xy2, q_inf):
    """Algorithm 8 (a = 0, Z2 = 1) + identity-select for flagged leaves."""
    X1, Y1, Z1 = p
    X2, Y2 = xy2
    t0 = F.mul(X1, X2)
    t1 = F.mul(Y1, Y2)
    t3 = F.mul(F.add(X2, Y2), F.add(X1, Y1))
    t3 = F.sub(t3, F.add(t0, t1))
    t4 = F.add(F.mul(X2, Z1), X1)
    t5 = F.add(F.mul(Y2, Z1), Y1)
    X3 = F.add(t0, t0)
    t0 = F.add(X3, t0)
    t2 = F.mul_b3(Z1)
    Z3 = F.add(t1, t2)
    t1 = F.sub(t1, t2)
    Y3 = F.mul_b3(t4)
    X3 = F.sub(F.mul(t3, t1), F.mul(t5, Y3))
    Y3 = F.add(F.mul(t1, Z3), F.mul(Y3, t0))
    Z3 = F.add(F.mul(Z3, t5), F.mul(t0, t3))
    X3 = F.select(q_inf, X1, X3)
    Y3 = F.select(q_inf, Y1, Y3)
    Z3 = F.select(q_inf, Z1, Z3)
    return (X3, Y3, Z3)


def _rows(ref, n):
    return [ref[i] for i in range(n)]


# ------------------------------------------------------------ elementwise
def _add_kernel(F, x1, y1, z1, x2, y2, z2, ox, oy, oz):
    R = F.ext * F.L
    X3, Y3, Z3 = _rcb_add_core(
        F, (_rows(x1, R), _rows(y1, R), _rows(z1, R)),
        (_rows(x2, R), _rows(y2, R), _rows(z2, R)),
    )
    ox[:] = jnp.stack(X3, axis=0)
    oy[:] = jnp.stack(Y3, axis=0)
    oz[:] = jnp.stack(Z3, axis=0)


def _madd_kernel(F, x1, y1, z1, x2, y2, f2, ox, oy, oz):
    R = F.ext * F.L
    X3, Y3, Z3 = _rcb_madd_core(
        F, (_rows(x1, R), _rows(y1, R), _rows(z1, R)),
        (_rows(x2, R), _rows(y2, R)), f2[0] != 0,
    )
    ox[:] = jnp.stack(X3, axis=0)
    oy[:] = jnp.stack(Y3, axis=0)
    oz[:] = jnp.stack(Z3, axis=0)


def _unpack_limb_rows(rows):
    """R/2 packed u32 rows (two 16-bit limbs each) -> R limb rows."""
    out = []
    for v in rows:
        out.append(v & jnp.uint32(0xFFFF))
        out.append(v >> 16)
    return out


# ------------------------------------------------------------ blocked scans
def _scan_prefix_madd_packed_kernel(F, B, xr, yr, fr_, wx, wy, wz, tx, ty, tz):
    """Like _scan_prefix_madd_kernel but the affine leaves arrive PACKED
    (two 16-bit limbs per u32 word): halves the leaf HBM traffic and the
    per-window gather bytes. Unpacking is a few VPU shifts per tile."""
    R = F.ext * F.L

    def body(b, acc):
        xb, yb = xr[b], yr[b]
        x_rows = _unpack_limb_rows(_rows(xb, R // 2))
        y_rows = _unpack_limb_rows(_rows(yb, R // 2))
        nxt = _rcb_madd_core(F, acc, (x_rows, y_rows), fr_[b] != 0)
        wx[b] = jnp.stack(nxt[0], axis=0)
        wy[b] = jnp.stack(nxt[1], axis=0)
        wz[b] = jnp.stack(nxt[2], axis=0)
        return nxt

    tile = fr_[0]
    X, Y, Z = jax.lax.fori_loop(0, B, body, F.identity_rows(tile))
    tx[:] = jnp.stack(X, axis=0)
    ty[:] = jnp.stack(Y, axis=0)
    tz[:] = jnp.stack(Z, axis=0)


def _scan_prefix_madd_packedf_kernel(F, B, xr, yr, wx, wy, wz, tx, ty, tz):
    """Packed variant with the infinity flag in BIT 31 of the top packed X
    word (top limb < 2^15 for the supported curves, asserted by the packer):
    drops the separate flag array so the sorted-permutation path carries one
    less column through lax.sort."""
    R = F.ext * F.L
    Rp = R // 2

    def body(b, acc):
        xb, yb = xr[b], yr[b]
        flag = xb[Rp - 1] >> 31
        x_rows = _unpack_limb_rows(_rows(xb, Rp))
        x_rows[-1] = x_rows[-1] & jnp.uint32(0x7FFF)
        y_rows = _unpack_limb_rows(_rows(yb, Rp))
        nxt = _rcb_madd_core(F, acc, (x_rows, y_rows), flag != 0)
        wx[b] = jnp.stack(nxt[0], axis=0)
        wy[b] = jnp.stack(nxt[1], axis=0)
        wz[b] = jnp.stack(nxt[2], axis=0)
        return nxt

    tile = xr[0, 0]
    X, Y, Z = jax.lax.fori_loop(0, B, body, F.identity_rows(tile))
    tx[:] = jnp.stack(X, axis=0)
    ty[:] = jnp.stack(Y, axis=0)
    tz[:] = jnp.stack(Z, axis=0)


def _scan_prefix_madd_kernel(F, B, xr, yr, fr_, wx, wy, wz, tx, ty, tz):
    """xr/yr: (B, R, SB, 128) sorted affine leaves, fr_: (B, SB, 128) flags.
    W out: (B, R, SB, 128) x3 inclusive prefixes; T out: (R, SB, 128) x3."""
    R = F.ext * F.L
    tile = xr[0, 0]

    def body(b, acc):
        xb, yb = xr[b], yr[b]
        nxt = _rcb_madd_core(
            F, acc, (_rows(xb, R), _rows(yb, R)), fr_[b] != 0
        )
        wx[b] = jnp.stack(nxt[0], axis=0)
        wy[b] = jnp.stack(nxt[1], axis=0)
        wz[b] = jnp.stack(nxt[2], axis=0)
        return nxt

    X, Y, Z = jax.lax.fori_loop(0, B, body, F.identity_rows(tile))
    tx[:] = jnp.stack(X, axis=0)
    ty[:] = jnp.stack(Y, axis=0)
    tz[:] = jnp.stack(Z, axis=0)


def _scan_prefix_add_kernel(F, B, xr, yr, zr, wx, wy, wz, tx, ty, tz):
    R = F.ext * F.L
    tile = xr[0, 0]

    def body(b, acc):
        xb, yb, zb = xr[b], yr[b], zr[b]
        q = (_rows(xb, R), _rows(yb, R), _rows(zb, R))
        nxt = _rcb_add_core(F, acc, q)
        wx[b] = jnp.stack(nxt[0], axis=0)
        wy[b] = jnp.stack(nxt[1], axis=0)
        wz[b] = jnp.stack(nxt[2], axis=0)
        return nxt

    X, Y, Z = jax.lax.fori_loop(0, B, body, F.identity_rows(tile))
    tx[:] = jnp.stack(X, axis=0)
    ty[:] = jnp.stack(Y, axis=0)
    tz[:] = jnp.stack(Z, axis=0)


def _scan_total_add_kernel(F, B, xr, yr, zr, tx, ty, tz):
    R = F.ext * F.L
    tile = xr[0, 0]

    def body(b, acc):
        xb, yb, zb = xr[b], yr[b], zr[b]
        q = (_rows(xb, R), _rows(yb, R), _rows(zb, R))
        return _rcb_add_core(F, acc, q)

    X, Y, Z = jax.lax.fori_loop(0, B, body, F.identity_rows(tile))
    tx[:] = jnp.stack(X, axis=0)
    ty[:] = jnp.stack(Y, axis=0)
    tz[:] = jnp.stack(Z, axis=0)


# ------------------------------------------------------------ plumbing
def _spec(R, sb):
    return pl.BlockSpec((R, sb, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM)


def _bspec(B, R, sb):
    return pl.BlockSpec(
        (B, R, sb, LANES), lambda i: (0, 0, i, 0), memory_space=pltpu.VMEM
    )


def _fspec(B, sb):
    return pl.BlockSpec(
        (B, sb, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )


def _ext_of(cf) -> int:
    return 2 if hasattr(cf, "df") else 1


def _limbs_of(cf):
    df = getattr(cf, "df", cf)
    return (
        tuple(int(x) for x in df.p_limbs),
        tuple(int(x) for x in df.nprime_limbs),
    )


def _b3_key(rg):
    """(b3_small, b3_limbs_flat) hashable kernel-cache key from an RcbGroup."""
    if rg.b3_small is not None:
        return (int(rg.b3_small), None)
    import numpy as np

    flat = np.asarray(rg.b3_const).reshape(-1)
    return (None, tuple(int(v) for v in flat))


@functools.lru_cache(maxsize=None)
def _F_for(ext, p_limbs, np_limbs, b3_small, b3_limbs):
    return _FRcb(ext, p_limbs, np_limbs, b3_small, b3_limbs)


def _flatten(cf, c):
    if _ext_of(cf) == 2:
        return c.reshape(*c.shape[:-2], 2 * cf.L)
    return c


def _unflatten(cf, c):
    if _ext_of(cf) == 2:
        return c.reshape(*c.shape[:-1], 2, cf.L)
    return c


def _mxu_prep(kern_fn, extra, F, sb, p_limbs, np_limbs):
    """(kern, extra_inputs, extra_specs): wraps kern_fn with the MXU shim
    when enabled, else binds it plainly. `extra` is the static-arg tuple
    between F and the refs (the scan kernels' (B,), or ())."""
    if not _USE_MXU or (F.ext != 1 and not _USE_MXU_G2):
        return functools.partial(kern_fn, F, *extra), (), ()
    m1np, m2np, rs1, rs2 = mxu_band_consts(p_limbs, np_limbs, sb)
    # band matrices are small (<= 192 KB int8) — embedded as compiled
    # literals, one VMEM-resident block each. They stay NUMPY in this
    # (lru-cached) closure: converting to jnp here would capture a tracer
    # constant when the first caller is itself inside a trace, leaking it
    # into every later trace that reuses the cache entry.
    kern = functools.partial(_mxu_wrap, kern_fn, extra, F, rs1, rs2)
    specs = tuple(
        pl.BlockSpec(m.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for m in (m1np, m2np)
    )
    return kern, (m1np, m2np), specs


@functools.lru_cache(maxsize=None)
def _add_fn(ext, sb, p_limbs, np_limbs, b3_small, b3_limbs):
    F = _F_for(ext, p_limbs, np_limbs, b3_small, b3_limbs)
    R = ext * F.L
    kern, mxu_in, mxu_specs = _mxu_prep(
        _add_kernel, (), F, sb, p_limbs, np_limbs
    )

    @jax.jit
    def run(x1, y1, z1, x2, y2, z2):
        spec = _spec(R, sb)
        shp = jax.ShapeDtypeStruct(x1.shape, jnp.uint32)
        return pl.pallas_call(
            kern, out_shape=(shp, shp, shp), grid=(x1.shape[1] // sb,),
            in_specs=list(mxu_specs) + [spec] * 6,
            out_specs=(spec, spec, spec),
            interpret=_INTERPRET,
        )(*mxu_in, x1, y1, z1, x2, y2, z2)

    return run


@functools.lru_cache(maxsize=None)
def _madd_fn(ext, sb, p_limbs, np_limbs, b3_small, b3_limbs):
    F = _F_for(ext, p_limbs, np_limbs, b3_small, b3_limbs)
    R = ext * F.L
    kern, mxu_in, mxu_specs = _mxu_prep(
        _madd_kernel, (), F, sb, p_limbs, np_limbs
    )

    @jax.jit
    def run(x1, y1, z1, x2, y2, f2):
        spec = _spec(R, sb)
        fspec = pl.BlockSpec(
            (1, sb, LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )
        shp = jax.ShapeDtypeStruct(x1.shape, jnp.uint32)
        return pl.pallas_call(
            kern, out_shape=(shp, shp, shp), grid=(x1.shape[1] // sb,),
            in_specs=list(mxu_specs) + [spec] * 5 + [fspec],
            out_specs=(spec, spec, spec),
            interpret=_INTERPRET,
        )(*mxu_in, x1, y1, z1, x2, y2, f2)

    return run


@functools.lru_cache(maxsize=None)
def _scan_fn(kind, ext, B, sb, p_limbs, np_limbs, b3_small, b3_limbs):
    F = _F_for(ext, p_limbs, np_limbs, b3_small, b3_limbs)
    R = ext * F.L
    kerns = {
        "prefix_madd": _scan_prefix_madd_kernel,
        "prefix_madd_packed": _scan_prefix_madd_packed_kernel,
        "prefix_madd_packedf": _scan_prefix_madd_packedf_kernel,
        "prefix_add": _scan_prefix_add_kernel,
        "total_add": _scan_total_add_kernel,
    }
    kern, mxu_in, mxu_specs = _mxu_prep(
        kerns[kind], (B,), F, sb, p_limbs, np_limbs
    )
    with_w = kind != "total_add"
    r_in = R // 2 if kind.startswith("prefix_madd_packed") else R

    @jax.jit
    def run(*ins):  # (B, R, G/128, 128) coords (+ (B, G/128, 128) flags)
        g128 = ins[0].shape[2]
        tshp = jax.ShapeDtypeStruct((R, g128, LANES), jnp.uint32)
        wshp = jax.ShapeDtypeStruct((B, R, g128, LANES), jnp.uint32)
        in_specs = [_bspec(B, r_in, sb)] * 2
        if kind == "prefix_madd_packedf":
            pass  # flag rides bit 31 of the top packed X word
        elif kind.startswith("prefix_madd"):
            in_specs += [_fspec(B, sb)]
        else:
            in_specs += [_bspec(B, R, sb)]
        out_shape = ((wshp,) * 3 if with_w else ()) + (tshp,) * 3
        out_specs = ((_bspec(B, R, sb),) * 3 if with_w else ()) + (
            _spec(R, sb),
        ) * 3
        # W outputs double-buffer on top of the inputs: at B = 32 the
        # working set is ~21 MB for G1 and ~2x for G2 — beyond the default
        # 16 MB scoped-VMEM cap (v5e has far more physical VMEM)
        params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
        return pl.pallas_call(
            kern, out_shape=out_shape, grid=(g128 // sb,),
            in_specs=list(mxu_specs) + in_specs, out_specs=out_specs,
            interpret=_INTERPRET, compiler_params=params,
        )(*mxu_in, *ins)

    return run


# ------------------------------------------------------------ public API
def _prep_elem(cf, coords):
    """Standard coord arrays (n, ...) -> padded (R, npad/128, 128) tiles."""
    ext = _ext_of(cf)
    R = ext * cf.L
    flat = [_flatten(cf, c).reshape(-1, R) for c in coords]
    n = flat[0].shape[0]
    blk = SUBS * LANES
    npad = -(-n // blk) * blk
    tiles = []
    for c in flat:
        if npad != n:
            c = jnp.pad(c, ((0, npad - n), (0, 0)))
        tiles.append(c.T.reshape(R, -1, LANES))
    return tiles, n, npad


def _post_elem(cf, outs, n, shape_tail):
    R = outs[0].shape[0]
    return tuple(
        _unflatten(cf, c.reshape(R, -1).T[:n].reshape(*shape_tail, R))
        for c in outs
    )


def rcb_add_pallas(rg, p, q):
    """Elementwise complete projective add; ONE kernel launch."""
    cf = rg.cf
    # normalize broadcasting: materialize both operands at the batch shape
    ndrop = 2 if _ext_of(cf) == 2 else 1
    shape = jnp.broadcast_shapes(
        *(c.shape[:-ndrop] for c in p), *(c.shape[:-ndrop] for c in q)
    )
    coords = [
        jnp.broadcast_to(c, (*shape, *c.shape[len(c.shape) - ndrop :]))
        for c in (*p, *q)
    ]
    tiles, n, _ = _prep_elem(cf, coords)
    fn = _add_fn(_ext_of(cf), SUBS, *_limbs_of(cf), *_b3_key(rg))
    outs = fn(*tiles)
    return _post_elem(cf, outs, n, shape)


def rcb_madd_pallas(rg, p, q_affine):
    """Elementwise p + (x, y, inf); ONE kernel launch."""
    cf = rg.cf
    ndrop = 2 if _ext_of(cf) == 2 else 1
    x2, y2, inf2 = q_affine
    shape = jnp.broadcast_shapes(
        *(c.shape[:-ndrop] for c in p),
        x2.shape[:-ndrop], y2.shape[:-ndrop], inf2.shape,
    )
    coords = [
        jnp.broadcast_to(c, (*shape, *c.shape[len(c.shape) - ndrop :]))
        for c in (*p, x2, y2)
    ]
    tiles, n, npad = _prep_elem(cf, coords)
    flags = jnp.broadcast_to(inf2, shape).reshape(-1).astype(jnp.uint32)
    if npad != n:
        flags = jnp.pad(flags, (0, npad - n), constant_values=1)
    flags = flags.reshape(1, -1, LANES)
    fn = _madd_fn(_ext_of(cf), SUBS, *_limbs_of(cf), *_b3_key(rg))
    outs = fn(*tiles, flags)
    return _post_elem(cf, outs, n, shape)


def _to_scan_tiles(R, c, G, B):
    """(N, R) flat coords, element n = g*B + b -> (B, R, G/128, 128)."""
    return c.reshape(G, B, R).transpose(1, 2, 0).reshape(B, R, G // LANES, LANES)


def _t_to_standard(cf, outs, G):
    R = outs[0].shape[0]
    return tuple(_unflatten(cf, c.reshape(R, G).T) for c in outs)


def scan_tile_align(ext: int) -> int:
    """Element-count multiple required by the scan kernels (B excluded)."""
    return SUBS * LANES


def rcb_scan_prefix_madd(rg, leaves, B):
    """Sorted affine leaves (X, Y, inf), N = G*B with G % 1024 == 0 ->
    (w_get, T): w_get(q) gathers the inclusive prefix at positions q (one
    gather, no adds); T are the (G,) block totals, standard coord arrays."""
    cf = rg.cf
    X, Y, inf = leaves
    R = _ext_of(cf) * cf.L
    Xf = _flatten(cf, X).reshape(-1, R)
    Yf = _flatten(cf, Y).reshape(-1, R)
    N = Xf.shape[0]
    G = N // B
    xb = _to_scan_tiles(R, Xf, G, B)
    yb = _to_scan_tiles(R, Yf, G, B)
    fb = inf.astype(jnp.uint32).reshape(G, B).T.reshape(B, G // LANES, LANES)
    fn = _scan_fn("prefix_madd", _ext_of(cf), B, SUBS, *_limbs_of(cf), *_b3_key(rg))
    wx, wy, wz, tx, ty, tz = fn(xb, yb, fb)

    def w_get(q):
        g, b = q // B, q % B
        out = []
        for w in (wx, wy, wz):
            w3 = w.reshape(B, R, G)
            out.append(_unflatten(cf, w3[b, :, g].reshape(q.shape[0], R)))
        return tuple(out)

    return w_get, _t_to_standard(cf, (tx, ty, tz), G)


def pack_limbs(rg, coord):
    """Standard coord array -> (n, R/2) packed u32 (limb 2i | limb 2i+1<<16)."""
    cf = rg.cf
    R = _ext_of(cf) * cf.L
    flat = _flatten(cf, coord).reshape(-1, R)
    return flat[:, 0::2] | (flat[:, 1::2] << 16)


def rcb_scan_prefix_madd_packed(rg, leaves_packed, B):
    """rcb_scan_prefix_madd over PACKED leaves (pack_limbs output)."""
    cf = rg.cf
    Xp, Yp, inf = leaves_packed
    R = _ext_of(cf) * cf.L
    Rp = R // 2
    N = Xp.shape[0]
    G = N // B
    xb = _to_scan_tiles(Rp, Xp, G, B)
    yb = _to_scan_tiles(Rp, Yp, G, B)
    fb = inf.astype(jnp.uint32).reshape(G, B).T.reshape(B, G // LANES, LANES)
    fn = _scan_fn(
        "prefix_madd_packed", _ext_of(cf), B, SUBS, *_limbs_of(cf), *_b3_key(rg)
    )
    wx, wy, wz, tx, ty, tz = fn(xb, yb, fb)

    def w_get(q):
        g, b = q // B, q % B
        out = []
        for w in (wx, wy, wz):
            w3 = w.reshape(B, R, G)
            out.append(_unflatten(cf, w3[b, :, g].reshape(q.shape[0], R)))
        return tuple(out)

    return w_get, _t_to_standard(cf, (tx, ty, tz), G)


def pack_limbs_flag(rg, X, Y, inf):
    """(Xp, Yp) packed coord arrays with the inf flag in bit 31 of Xp's top
    word. Requires top-limb headroom (p < 2^(16L-1)): true of BN254 (2^254)
    and BLS12-381 (2^381) — asserted against the field modulus."""
    cf = rg.cf
    df = getattr(cf, "df", cf)
    assert df.spec.modulus >> (16 * df.L - 1) == 0, "no flag headroom"
    Xp = pack_limbs(rg, X)
    Yp = pack_limbs(rg, Y)
    rp = Xp.shape[1]
    top = Xp[:, rp - 1] | (inf.astype(jnp.uint32) << 31)
    Xp = jnp.concatenate([Xp[:, : rp - 1], top[:, None]], axis=1)
    return Xp, Yp


def _col_to_scan_tiles(col, G, B):
    """(N,) sorted column, element n = g*B + b -> (B, G/128, 128)."""
    return col.reshape(G, B).T.reshape(B, G // LANES, LANES)


def rcb_scan_prefix_madd_cols(rg, xcols, ycols, B):
    """rcb_scan_prefix_madd over SORTED per-word columns (lax.sort output:
    the permutation is applied by the sort itself, which beats an XLA row
    gather ~4x at 2^21 — measured, probe_gather). xcols carry the flag bit
    (pack_limbs_flag); N = G*B with G % 1024 == 0."""
    cf = rg.cf
    R = _ext_of(cf) * cf.L
    N = xcols[0].shape[0]
    G = N // B
    xb = jnp.stack([_col_to_scan_tiles(c, G, B) for c in xcols], axis=1)
    yb = jnp.stack([_col_to_scan_tiles(c, G, B) for c in ycols], axis=1)
    fn = _scan_fn(
        "prefix_madd_packedf", _ext_of(cf), B, SUBS, *_limbs_of(cf), *_b3_key(rg)
    )
    wx, wy, wz, tx, ty, tz = fn(xb, yb)

    def w_get(q):
        g, b = q // B, q % B
        out = []
        for w in (wx, wy, wz):
            w3 = w.reshape(B, R, G)
            out.append(_unflatten(cf, w3[b, :, g].reshape(q.shape[0], R)))
        return tuple(out)

    return w_get, _t_to_standard(cf, (tx, ty, tz), G)


def rcb_scan_prefix_add(rg, pts, B):
    """Projective (N,) points -> (W (N,), T (G,)) standard coord arrays."""
    cf = rg.cf
    R = _ext_of(cf) * cf.L
    flats = [_flatten(cf, c).reshape(-1, R) for c in pts]
    N = flats[0].shape[0]
    G = N // B
    tiles = [_to_scan_tiles(R, c, G, B) for c in flats]
    fn = _scan_fn("prefix_add", _ext_of(cf), B, SUBS, *_limbs_of(cf), *_b3_key(rg))
    wx, wy, wz, tx, ty, tz = fn(*tiles)
    W = tuple(
        _unflatten(
            cf, w.reshape(B, R, G).transpose(2, 0, 1).reshape(N, R)
        )
        for w in (wx, wy, wz)
    )
    return W, _t_to_standard(cf, (tx, ty, tz), G)


def rcb_scan_total_add(rg, pts, B):
    """Projective (N,) points -> block totals T (G,) only."""
    cf = rg.cf
    R = _ext_of(cf) * cf.L
    flats = [_flatten(cf, c).reshape(-1, R) for c in pts]
    N = flats[0].shape[0]
    G = N // B
    tiles = [_to_scan_tiles(R, c, G, B) for c in flats]
    fn = _scan_fn("total_add", _ext_of(cf), B, SUBS, *_limbs_of(cf), *_b3_key(rg))
    outs = fn(*tiles)
    return _t_to_standard(cf, outs, G)
