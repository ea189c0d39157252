"""Pippenger multi-scalar multiplication on TPU — the flagship kernel.

Replaces arkworks' `VariableBaseMSM::multi_scalar_mul` / `FixedBaseMSM`
(reference call sites: /root/reference/groth16/src/prover.rs:164-190,
/root/reference/groth16/src/generator.rs:206-256, curve/src/lib.rs:38-45).

TPU-first formulation (no data-dependent scatter-adds):
- window size = 16 bits = one limb, so digit extraction is a limb gather;
- per window: sort points by digit, segmented associative scan with the
  complete EC-add as combiner (O(log N) depth), segment tails scattered into
  a dense bucket array with a drop-sentinel;
- bucket weighting  sum_b b*B_b  via a reversed associative scan (suffix
  sums) + binary-tree fold;
- windows processed under lax.scan (one traced instance), then combined with
  16 doublings per window — everything stays inside a single jit.

Sharding: points/scalars shard over the mesh batch axis; per-shard partial
window sums are jnp.sum-free EC values reduced with psum-style tree adds in
parallel/msm_sharded (see ckb_zkp_tpu.parallel).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..host.curves import AffinePoint
from ..host.pairing import PairingCurve
from .field import DeviceField, device_field
from .limbs import BASE_BITS, ints_to_limbs, limbs_to_ints
from .ec import (
    DeviceFq2,
    ec_add,
    ec_double,
    ec_neg,
    point_infinity,
    point_select,
    to_affine,
)
from .rcb import RcbGroup, rcb_group
from .scan_utils import (
    blocked_reduce,
    blocked_scan,
    hs_scan,
    prefix_at_indices,
)


# ---------------------------------------------------------------- MSM v2
# Pippenger over RCB complete projective formulas (ops/rcb.py). Per window:
# sort by digit, ONE pallas scan launch produces every within-block prefix W
# plus block totals T; bucket-boundary prefixes E_b are then one gather plus
# one wide add (E_b = block_prefix[g_b - 1] + W[q_b]); the bucket weighting
# telescopes to (nb-1) * E_last - sum(E_b). All wide EC ops are single fused
# kernel launches; everything below 256 lanes stays XLA-fused (zero launch
# cost). Window size adapts to N (16-bit windows = one scalar limb when the
# bucket machinery amortizes, 8-bit below).

_RCB_B = 32  # scan-kernel block: elements per in-register accumulation

import os as _os

# G2 (Fq2) device MSMs run at POW2 widths (see DeviceCurveGroup.msm): the
# exact-aligned non-pow2 G2 scan program hangs the remote TPU compiler.
_G2_ALIGNED = _os.environ.get("CKB_ZKP_TPU_G2_ALIGNED", "0") not in ("", "0")


def _rcb_align(rg) -> int:
    from .pallas_rcb import scan_tile_align

    ext = 2 if hasattr(rg.cf, "df") else 1
    return _RCB_B * scan_tile_align(ext)


def _rcb_kernel_ok(rg, n: int) -> bool:
    df = getattr(rg.cf, "df", rg.cf)
    return df.use_pallas and n % _rcb_align(rg) == 0


def _wide_batch(rg, p) -> int:
    import math

    ndrop = 2 if hasattr(rg.cf, "df") else 1
    return math.prod(p[0].shape[:-ndrop])


def _wide_add(rg, p, q):
    from .pallas_field import PALLAS_MIN_BATCH
    from .pallas_rcb import rcb_add_pallas

    df = getattr(rg.cf, "df", rg.cf)
    if df.use_pallas and _wide_batch(rg, p) >= PALLAS_MIN_BATCH:
        return rcb_add_pallas(rg, p, q)
    return rg.add(p, q)


def _pad_leading(pts, n_to: int, fill):
    n = jax.tree.leaves(pts)[0].shape[0]
    if n == n_to:
        return pts
    return jax.tree.map(
        lambda c, f: jnp.concatenate(
            [c, jnp.broadcast_to(f, (n_to - n, *f.shape))], axis=0
        ),
        tuple(pts),
        fill,
    )


def _scan_prefix_madd(rg, leaves, B: int):
    """Sorted affine leaves -> (w_get(q) -> prefix points, T (G,) totals)."""
    from .pallas_rcb import rcb_scan_prefix_madd

    n = leaves[0].shape[0] if leaves[2].ndim == 1 else None
    n = leaves[2].shape[0]
    if _rcb_kernel_ok(rg, n):
        return rcb_scan_prefix_madd(rg, leaves, B)
    npad = -(-n // B) * B
    X, Y, inf = leaves
    if npad != n:
        X = jnp.concatenate([X, jnp.zeros((npad - n, *X.shape[1:]), X.dtype)], 0)
        Y = jnp.concatenate([Y, jnp.zeros((npad - n, *Y.shape[1:]), Y.dtype)], 0)
        inf = jnp.concatenate([inf, jnp.ones((npad - n,), bool)], 0)
    G = npad // B

    def to_bg(c):
        return jnp.moveaxis(c.reshape(G, B, *c.shape[1:]), 1, 0)

    def step(acc, leaf):
        nxt = rg.madd(acc, leaf)
        return nxt, nxt

    T, W = jax.lax.scan(
        step, rg.identity((G,)), (to_bg(X), to_bg(Y), to_bg(inf))
    )

    def w_get(q):
        return jax.tree.map(lambda c: c[q % B, q // B], W)

    return w_get, T


def _kernel_capable(rg) -> bool:
    df = getattr(rg.cf, "df", rg.cf)
    return df.use_pallas


_SMALL_SCAN_MAX = 32  # bottom handled by ONE kernel launch (B = n steps);
# kept at the production block size so VMEM stays within the scan cap


def _full_prefix(rg, pts, B: int):
    """Inclusive prefix over (n,) projective points.

    Kernel path: pad to the scan-tile alignment (identity padding), ONE scan
    launch for every level, recurse on the REAL block totals only (padded
    lanes produce identity totals), and finish small tails with a single
    B = n kernel launch — a sequential per-element XLA scan at the bottom
    costs tens of ms in tiny-op overhead (measured, probe_window)."""
    from .pallas_rcb import rcb_scan_prefix_add

    n = jax.tree.leaves(pts)[0].shape[0]
    if _kernel_capable(rg) and 1 < n <= _SMALL_SCAN_MAX:
        align = _rcb_align(rg) // _RCB_B  # lane tile (1024)
        padded = _pad_leading(pts, n * align, rg.identity(()))
        W, _T = rcb_scan_prefix_add(rg, padded, n)
        return jax.tree.map(lambda c: c[:n], W)
    if n <= 2 * B or not _kernel_capable(rg):
        if n <= 2 * B:
            def step(acc, x):
                nxt = rg.add(acc, x)
                return nxt, nxt

            _, P = jax.lax.scan(step, rg.identity(()), tuple(pts))
            return P
        npad = -(-n // B) * B
        padded = _pad_leading(pts, npad, rg.identity(()))
        G = npad // B

        def to_bg(c):
            return jnp.moveaxis(c.reshape(G, B, *c.shape[1:]), 1, 0)

        def step(acc, x):
            nxt = rg.add(acc, x)
            return nxt, nxt

        T, Wb = jax.lax.scan(
            step, rg.identity((G,)), jax.tree.map(to_bg, padded)
        )
        W = jax.tree.map(
            lambda c: jnp.moveaxis(c, 0, 1).reshape(npad, *c.shape[2:])[:n], Wb
        )
        g_real = -(-n // B)
        T = jax.tree.map(lambda c: c[:g_real], T)
    else:
        align = _rcb_align(rg)
        npad = -(-n // align) * align
        padded = _pad_leading(pts, npad, rg.identity(()))
        W, T = rcb_scan_prefix_add(rg, padded, B)
        g_real = -(-n // B)
        W = jax.tree.map(lambda c: c[:n], W)
        T = jax.tree.map(lambda c: c[:g_real], T)
    P2 = _full_prefix(rg, T, B)
    Pex = jax.tree.map(
        lambda c, i: jnp.concatenate([i[None], c[:-1]], axis=0),
        P2,
        rg.identity(()),
    )
    rep = jax.tree.map(lambda c: jnp.repeat(c, B, axis=0)[:n], Pex)
    return _wide_add(rg, rep, W)


def _boundary_before(rg, T, j, ident_q):
    """Inclusive prefix of the (G,) totals T at per-query indices j (j may
    be -1 -> identity), WITHOUT materializing the full prefix array.

    prefix(T, j) = W0[j] + prefix(T1, j//B - 1) recursively, where each
    W-emitting scan launch yields the within-block prefixes W_l and the
    next level's block totals; the top level (<= 128 points) finishes as an
    XLA log-depth prefix. Replaces _full_prefix + row gather in the MSM
    window tail: ~5 kernel launches instead of the recursive materialize
    (repeat + G-wide adds at every level) — the tail was launch-overhead
    bound (~0.44 ms/launch), not EC-math bound."""
    from .pallas_rcb import rcb_scan_prefix_add

    B = _RCB_B
    align = _rcb_align(rg)
    levels = []
    pts = T
    n = jax.tree.leaves(pts)[0].shape[0]
    while n > 128 and _kernel_capable(rg):
        npad = -(-n // align) * align
        padded = _pad_leading(pts, npad, rg.identity(()))
        W, Tn = rcb_scan_prefix_add(rg, padded, B)
        g_real = -(-n // B)
        levels.append((jax.tree.map(lambda c: c[:n], W), n))
        pts = jax.tree.map(lambda c: c[:g_real], Tn)
        n = g_real
    Ptop = hs_scan(rg.add, pts)  # (n,) inclusive, XLA log-depth

    from .ec import point_select

    cf = rg.cf
    out = None
    k = j
    for W, nl in levels:
        valid = k >= 0
        kc = jnp.clip(k, 0, nl - 1)
        w = jax.tree.map(lambda c: c[kc], W)
        w = point_select(cf, valid, w, ident_q)
        out = w if out is None else _wide_add(rg, out, w)
        k = jnp.where(valid, k // B - 1, -1)
    valid = k >= 0
    kc = jnp.clip(k, 0, n - 1)
    top = jax.tree.map(lambda c: c[kc], Ptop)
    top = point_select(cf, valid, top, ident_q)
    out = top if out is None else _wide_add(rg, out, top)
    return out


def _reduce_pts(rg, pts, B: int):
    """Sum of (n,) projective points -> single point (same pad+slice
    structure as _full_prefix: one totals launch per level, single-launch
    small tail)."""
    from .pallas_rcb import rcb_scan_total_add

    n = jax.tree.leaves(pts)[0].shape[0]
    align = _rcb_align(rg)
    while n > _SMALL_SCAN_MAX and _kernel_capable(rg):
        npad = -(-n // align) * align
        pts = _pad_leading(pts, npad, rg.identity(()))
        pts = rcb_scan_total_add(rg, pts, B)
        n = -(-n // B)
        pts = jax.tree.map(lambda c: c[:n], pts)
    if n == 1:
        return jax.tree.map(lambda c: c[0], pts)
    if _kernel_capable(rg):
        lanes = align // _RCB_B
        pts = _pad_leading(pts, n * lanes, rg.identity(()))
        T = rcb_scan_total_add(rg, pts, n)  # lane 0 carries all real data
        return jax.tree.map(lambda c: c[0], T)
    # CPU fallback: widths stay under the pallas threshold, XLA-fused
    return blocked_reduce(rg.add, tuple(pts), rg.identity(()), block=64)


def _scale_pow2_minus1(rg, p, c: int):
    """(2^c - 1) * p for a single point (tiny, XLA-fused)."""
    t = jax.lax.fori_loop(0, c, lambda _, a: rg.double(a), p)
    return rg.add(t, rg.neg(p))


def _wide_madd(rg, p, leaves):
    from .pallas_field import PALLAS_MIN_BATCH
    from .pallas_rcb import rcb_madd_pallas

    df = getattr(rg.cf, "df", rg.cf)
    if df.use_pallas and _wide_batch(rg, p) >= PALLAS_MIN_BATCH:
        return rcb_madd_pallas(rg, p, leaves)
    return rg.madd(p, leaves)


def _bucket_counts(digits, nb: int):
    """cnt[b] = #{i : digits[i] <= b} via a histogram + cumsum.

    For 16-bit digits the histogram is an int8 one-hot matmul over the
    (hi-byte, lo-byte) split — N x 256 x 256 MACs ride the MXU at ~0.3 ms
    versus ~44 ms for jnp.searchsorted's 21-step gather loop (measured,
    probe_window)."""
    if nb > 256:
        assert nb == 1 << 16
        hi = (digits >> 8).astype(jnp.int32)
        lo = (digits & jnp.uint32(0xFF)).astype(jnp.int32)
        ar = jnp.arange(256, dtype=jnp.int32)
        A = (hi[:, None] == ar[None]).astype(jnp.int8)
        Bm = (lo[:, None] == ar[None]).astype(jnp.int8)
        hist2 = jax.lax.dot_general(
            A, Bm, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (hi, lo)
        hist = hist2.reshape(nb)
    else:
        ar = jnp.arange(nb, dtype=jnp.int32)
        oh = (digits.astype(jnp.int32)[:, None] == ar[None]).astype(jnp.int32)
        hist = jnp.sum(oh, axis=0)
    return jnp.cumsum(hist)



class DeviceCurveGroup:
    """Device-side view of one curve group (G1 over Fq, or G2 over Fq2)."""

    # True only where the fused mixed-add kernel applies (short-Weierstrass
    # G1/G2 over Fq/Fq2 on TPU); subclasses with other point representations
    # (extended Edwards) inherit False.
    _affine_leaves = False
    # RCB projective engine: a = 0 short-Weierstrass only; Edwards subclasses
    # (which do not run DeviceCurveGroup.__init__) inherit False.
    _use_rcb = False

    def __init__(self, curve: PairingCurve, group: str, window_bits: int = 16):
        assert window_bits in (1, 2, 4, 8, 16), "windows must not straddle limbs"
        self.curve = curve
        self.group = group
        self.c = window_bits
        self.nb = 1 << window_bits
        self.nwindows = 0  # set below once fr is known
        self.fq = device_field(curve.fq)
        self.fr = device_field(curve.fr)
        if group == "g1":
            self.cf = self.fq
            self.host_group = curve.g1
        elif group == "g2":
            self.cf = DeviceFq2(self.fq)
            self.host_group = curve.g2
        else:
            raise ValueError(group)
        self._affine_leaves = self.fq.use_pallas
        # RCB projective MSM engine: short-Weierstrass a = 0 groups only
        # (Edwards subclasses keep the generic Jacobian path)
        self._use_rcb = self.host_group.a in (0, (0, 0))
        self.nwindows = self.fr.L * BASE_BITS // self.c
        # below this size, MSMs run on host ints: tiny protocol-layer MSMs
        # would otherwise pile up one XLA compile per shape. On the TPU
        # tunnel every compile costs minutes (a 10-constraint CLI circuit
        # timed out entirely on device), so the cutoff is higher there; the
        # device path serves all large batches. CKB_ZKP_TPU_HOST_MSM_MAX
        # overrides (the multi-chip dryrun raises it so its reference prover
        # and setup stay compile-free)
        import os as _os

        self.small_host_threshold = int(
            _os.environ.get(
                "CKB_ZKP_TPU_HOST_MSM_MAX",
                "512" if jax.default_backend() == "cpu" else "4096",
            )
        )
        # chunk size for fixed-base batches. The pallas mixed-add path keeps
        # temporaries in VMEM, so big chunks are fine; the XLA fallback
        # materializes (N, L, L) mul temporaries (G2 at 2^18 OOMs unchunked)
        if self.fq.use_pallas:
            # RCB chunk program streams blocks through VMEM, so big chunks
            # only cost HBM; fewer chunks = fewer per-launch overheads
            self._fb_chunk = 1 << 18
        else:
            self._fb_chunk = (1 << 15) if group == "g1" else (1 << 14)
        self._msm_jit = jax.jit(self._msm_impl)
        self._fixed_base_jit = jax.jit(self._fixed_base_impl)
        self._fixed_base_chunked_jit = jax.jit(self._fixed_base_chunked)
        self._table = jax.jit(self._table_impl)
        self._normalize_jit = jax.jit(self._normalize)
        self._normalize_proj_jit = jax.jit(self._normalize_proj)

    def _normalize(self, P):
        """Jacobian -> affine-encoded Jacobian (Z in {0, 1}).

        The variable-base MSM's affine-leaf fast path requires Z in
        {0, one}; fixed-base MSM outputs (setup query/SRS arrays, the main
        producers of long-lived MSM inputs) are general-Z, so they get batch
        normalized exactly like the reference's setup does (arkworks
        `batch_normalization`, /root/reference/groth16/src/generator.rs:270).
        """
        x, y, inf = to_affine(self.cf, P)
        ones = self.cf.ones(inf.shape)
        mask = inf[..., None] if self.group == "g1" else inf[..., None, None]
        z = jnp.where(mask, 0, ones).astype(jnp.uint32)
        return (x, y, z)

    # ------------- pluggable point ops (overridden by Edwards backends) ----
    def p_add(self, a, b):
        return ec_add(self.cf, a, b)

    def p_double(self, a):
        return ec_double(self.cf, a)

    def p_neg(self, a):
        return ec_neg(self.cf, a)

    def p_identity(self, batch_shape=()):
        return point_infinity(self.cf, batch_shape)

    # ------------- host <-> device -------------
    def _coord_encode(self, coords) -> jnp.ndarray:
        if self.group == "g1":
            return self.fq.encode(coords)
        flat = [c for pair in coords for c in pair]
        return self.fq.encode(flat).reshape(len(coords), 2, self.fq.L)

    def encode_points(self, pts: list[AffinePoint]):
        """Affine host points -> Jacobian limb arrays (Z=1, or Z=0 for inf).

        Z is built in numpy (no eager device ops — see encode_scalars); the
        coordinate arrays are numpy for small batches, device for large."""
        xs = self._coord_encode([p.x for p in pts])
        ys = self._coord_encode([p.y for p in pts])
        n = len(pts)
        one = np.asarray(self.fq.r_limbs, dtype=np.uint32)  # 1 in Montgomery
        if self.group == "g1":
            Z = np.broadcast_to(one, (n, self.fq.L)).copy()
        else:
            Z = np.zeros((n, 2, self.fq.L), dtype=np.uint32)
            Z[:, 0, :] = one
        inf = np.array([p.infinity for p in pts], dtype=bool)
        Z[inf] = 0
        return (xs, ys, Z)

    def decode_points(self, p) -> list[AffinePoint]:
        """Jacobian device arrays -> host affine points."""
        n = jax.tree.leaves(p)[0].shape[0]
        if n <= self.small_host_threshold:
            return self.decode_points_host(p)
        x, y, inf = to_affine(self.cf, p)
        inf = np.asarray(jax.device_get(inf)).reshape(-1)
        if self.group == "g1":
            xs = self.fq.decode(x.reshape(-1, self.fq.L))
            ys = self.fq.decode(y.reshape(-1, self.fq.L))
        else:
            xf = self.fq.decode(x.reshape(-1, self.fq.L))
            yf = self.fq.decode(y.reshape(-1, self.fq.L))
            xs = list(zip(xf[0::2], xf[1::2]))
            ys = list(zip(yf[0::2], yf[1::2]))
        out = []
        for i in range(len(inf)):
            if inf[i]:
                out.append(self.host_group.infinity)
            else:
                out.append(AffinePoint(xs[i], ys[i]))
        return out

    def decode_point(self, p) -> AffinePoint:
        # host-side expansion: an eager device reshape would cost a remote
        # compile per shape on the TPU tunnel
        P = tuple(np.asarray(jax.device_get(c))[None] for c in p)
        return self.decode_points_host(P)[0]

    # ------- host-only decoding (no device compute, hence no compiles) -------
    def _limbs_to_int_demont(self, limbs) -> int:
        v = 0
        for x in reversed(limbs.tolist()):
            v = (v << BASE_BITS) | int(x)
        p = self.fq.spec.modulus
        return v * pow(self.fq.R, -1, p) % p

    def _coord_host(self, arr, i):
        if self.group == "g1":
            return self._limbs_to_int_demont(arr[i])
        return (
            self._limbs_to_int_demont(arr[i, 0]),
            self._limbs_to_int_demont(arr[i, 1]),
        )

    def decode_points_host(self, P) -> list[AffinePoint]:
        """Jacobian device arrays -> host affine, all math in Python ints."""
        X, Y, Z = (np.asarray(jax.device_get(c)) for c in P)
        p = self.fq.spec.modulus
        host = self.host_group
        f = host.f
        out = []
        for i in range(X.shape[0]):
            z = self._coord_host(Z, i)
            if (z == 0) if self.group == "g1" else (z == (0, 0)):
                out.append(host.infinity)
                continue
            x = self._coord_host(X, i)
            y = self._coord_host(Y, i)
            zinv = f.inv(z)
            zinv2 = f.mul(zinv, zinv)
            out.append(
                AffinePoint(f.mul(x, zinv2), f.mul(y, f.mul(zinv, zinv2)))
            )
        return out

    def _scalars_host(self, scalars) -> list[int]:
        arr = np.asarray(jax.device_get(scalars))
        out = []
        for i in range(arr.shape[0]):
            v = 0
            for x in reversed(arr[i].tolist()):
                v = (v << BASE_BITS) | int(x)
            out.append(v)
        return out

    def encode_point(self, pt: AffinePoint):
        P = self.encode_points([pt])
        return jax.tree.map(lambda c: c[0], P)

    def encode_scalars(self, scalars: list[int]):
        """Canonical (non-Montgomery) Fr limbs for MSM digit extraction.

        Returns numpy: scalars often feed host-path MSMs (small batches),
        and an eager device round-trip on the TPU tunnel is a remote
        compile. Device consumers transfer lazily at dispatch."""
        r = self.fr.spec.modulus
        return ints_to_limbs([s % r for s in scalars], self.fr.L)

    # ------------- variable-base Pippenger -------------
    def msm(self, P, scalars):
        """Public MSM entry: pads N to a power of two (>= 8) so compiled
        graphs are reused across nearby sizes (infinity points / zero scalars
        are absorbing) — EXCEPT inputs already at the scan kernels' tile
        alignment, which run at their exact size (query arrays are emitted
        align-padded by the generator precisely so the big prover MSMs skip
        the up-to-2x pow2 padding waste). Tiny CPU batches run on host ints
        instead."""
        n = scalars.shape[0]
        if n <= self.small_host_threshold:
            pts = self.decode_points_host(P)
            ss = self._scalars_host(scalars)
            return self.encode_point(self.host_group.msm(pts, ss))
        n_pts = jax.tree.leaves(P)[0].shape[0]
        if n_pts > n:
            # points pre-padded wider than the scalars (pow2-padded G2
            # query arrays): zero-extend the scalars to match
            scalars = jnp.concatenate(
                [scalars,
                 jnp.zeros((n_pts - n, scalars.shape[1]), scalars.dtype)],
                axis=0,
            )
            n = n_pts
        min_n = 8
        if self._use_rcb and self.fq.use_pallas:
            # pad every device MSM up to the scan kernels' tile alignment:
            # one compiled graph serves all mid sizes and the in-kernel path
            # beats a 32-step XLA scan even on mostly-identity padding.
            # G2 stays at POW2 widths: the non-pow2 Fq2 scan program (33
            # sort operands at e.g. 1081344) never returned from the remote
            # TPU compiler (3 attempts, 40-60 min each, round 5) while the
            # pow2 variant is the round-4-proven executable. Exact aligned
            # widths can be re-enabled with CKB_ZKP_TPU_G2_ALIGNED=1.
            min_n = _rcb_align(rcb_group(self))
            if n % min_n == 0 and (self.group != "g2" or _G2_ALIGNED
                                   or n & (n - 1) == 0):
                return self._msm_jit(tuple(P), scalars)
        np2 = max(min_n, 1 << (n - 1).bit_length())
        if np2 != n:
            pad = self.p_identity((np2 - n,))
            P = jax.tree.map(
                lambda c, z: jnp.concatenate([c, z], axis=0), tuple(P), pad
            )
            scalars = jnp.concatenate(
                [scalars, jnp.zeros((np2 - n, scalars.shape[1]), scalars.dtype)],
                axis=0,
            )
        return self._msm_jit(P, scalars)

    def _digits(self, scalars, w):
        """Extract c-bit window w (w may be traced) from 16-bit limbs."""
        bitpos = w * self.c
        limb = scalars[:, bitpos // BASE_BITS]
        return (limb >> (bitpos % BASE_BITS)) & (self.nb - 1)

    def _window_sum(self, P, digits):
        """Sum of b * (sum of points with digit b) for one c-bit window.

        Work-efficient via the group structure: sort points by digit, then
        the bucket sums are differences of inclusive prefix sums at the
        bucket boundaries — B_b = E_b - E_{b-1} with E_b = sum of points
        with digit <= b. Only the nb boundary prefixes are materialized
        (prefix_at_indices: O(N) EC adds, one traced combiner per level,
        versus O(N log N) for a full segmented scan). The bucket weighting
        telescopes:  sum_b b*B_b = (nb-1)*E_{nb-1} - sum_{b<nb-1} E_b.

        In affine-leaf mode (`_affine_leaves`, set by _msm_impl handing in an
        (X, Y, inf_mask) triple), the O(N) level-1 combines run the fused
        mixed-add kernel (9M+8S vs 12M+9S) and the per-window gather moves
        2 coordinates instead of 3.
        """
        order = jnp.argsort(digits)
        d = digits[order].astype(jnp.int32)
        inf = self.p_identity()
        add = self.p_add
        cnt = jnp.searchsorted(
            d, jnp.arange(self.nb, dtype=jnp.int32), side="right"
        ).astype(jnp.int32)
        if self._affine_leaves:
            # gather X and Y separately: XLA's row gather is ~6x slower per
            # byte on 128-byte rows than 64-byte rows (measured), so one
            # fused (N, 2L) gather loses to two (N, L) gathers
            X, Y, infm = P
            leaves = (X[order], Y[order], infm[order])
            E = self._prefix_boundary_leaf(leaves, cnt - 1)
        else:
            Ps = tuple(c[order] for c in P)
            E = prefix_at_indices(add, Ps, inf, cnt - 1)  # (nb,) E_b
        e_last = jax.tree.map(lambda c: c[self.nb - 1], E)
        e_head = jax.tree.map(lambda c: c[: self.nb - 1], E)
        sum_e = jax.tree.map(lambda c: c[-1], hs_scan(add, e_head))
        # (nb-1)*E_last = 2^c * E_last - E_last
        def dbl(_, a):
            return self.p_double(a)

        t = jax.lax.fori_loop(0, self.c, dbl, e_last)
        acc = add(t, self.p_neg(e_last))
        return add(acc, self.p_neg(sum_e))

    # ---- boundary-prefix machinery for affine-leaf MSM windows ----
    # Structure mirrors scan_utils.prefix_at_indices, but the O(N) block
    # totals run inside single pallas launches (ec_block_totals_*) instead
    # of a lax.scan of B launches (~1 ms per step of launch overhead).
    _SCAN_B = 32

    def _promote_leaves(self, lv):
        x, y, m = lv
        ones = self.cf.ones(m.shape)
        mask = m.reshape(m.shape + (1,) * (ones.ndim - m.ndim))
        z = jnp.where(mask, 0, ones).astype(jnp.uint32)
        return (x, y, z)

    def _within_block_partial(self, elems, gq, r, promote=None):
        """Prefix of elems rows [gq*B .. gq*B+r] per query (hs over B)."""
        B = self._SCAN_B
        qn = gq.shape[0]
        idxs = gq[:, None] * B + jnp.arange(B, dtype=jnp.int32)[None]
        rows = jax.tree.map(lambda x: x[idxs], elems)  # (Q, B, ...)
        flat = jax.tree.map(lambda x: x.reshape(qn * B, *x.shape[2:]), rows)
        if promote is not None:
            flat = promote(flat)
        keep = (jnp.arange(B, dtype=jnp.int32)[None] <= r[:, None]).reshape(-1)
        ident = self.p_identity()
        identb = jax.tree.map(
            lambda i: jnp.broadcast_to(i, (qn * B, *i.shape)), ident
        )
        masked = point_select(self.cf, keep, flat, identb)
        resq = jax.tree.map(lambda x: x.reshape(qn, B, *x.shape[1:]), masked)
        movq = jax.tree.map(lambda x: jnp.moveaxis(x, 1, 0), resq)
        return jax.tree.map(lambda x: x[-1], hs_scan(self.p_add, movq))

    def _prefix_boundary_leaf(self, leaves, q):
        """Inclusive prefix at each q over sorted affine leaves (q=-1 ->
        identity); N must be a multiple of B*SCAN_SUBS*128 (MSM pads to a
        power of two >= 2^15 before this path engages)."""
        from .pallas_ec import SCAN_SUBS, ec_block_totals_madd, ec_madd_pallas

        n = leaves[0].shape[0]
        B = self._SCAN_B
        if n % (B * SCAN_SUBS * 128) != 0:
            return prefix_at_indices(
                self.p_add,
                leaves,
                self.p_identity(),
                q,
                leaf_combine=lambda acc, lv: ec_madd_pallas(self.cf, acc, lv),
                leaf_identity=(
                    self.cf.zeros(),
                    self.cf.zeros(),
                    jnp.asarray(True),
                ),
                promote=self._promote_leaves,
            )
        totals = ec_block_totals_madd(self.cf, leaves, B)  # (n/B,) Jacobian
        qc = jnp.maximum(q, 0)
        gq, r = qc // B, qc % B
        before = self._prefix_boundary_jac(totals, gq - 1)
        part2 = self._within_block_partial(
            leaves, gq, r, promote=self._promote_leaves
        )
        out = self.p_add(before, part2)
        qn = q.shape[0]
        identq = jax.tree.map(
            lambda i: jnp.broadcast_to(i, (qn, *i.shape)), self.p_identity()
        )
        return point_select(self.cf, q >= 0, out, identq)

    def _prefix_boundary_jac(self, pts, q):
        """Jacobian-level recursion of _prefix_boundary_leaf."""
        from .pallas_ec import SCAN_SUBS, ec_block_totals_add

        n = pts[0].shape[0]
        B = self._SCAN_B
        qn = q.shape[0]
        identq = jax.tree.map(
            lambda i: jnp.broadcast_to(i, (qn, *i.shape)), self.p_identity()
        )
        qc = jnp.maximum(q, 0)
        if n <= 2 * B * 128:
            pref = hs_scan(self.p_add, pts)
            out = jax.tree.map(lambda x: x[jnp.minimum(qc, n - 1)], pref)
            return point_select(self.cf, q >= 0, out, identq)
        blk = B * SCAN_SUBS * 128
        if n % blk != 0:
            npad = -(-n // blk) * blk
            pad = self.p_identity((npad - n,))
            pts = jax.tree.map(
                lambda c, z: jnp.concatenate([c, z], axis=0), tuple(pts), pad
            )
        totals = ec_block_totals_add(self.cf, pts, B)
        gq, r = qc // B, qc % B
        before = self._prefix_boundary_jac(totals, gq - 1)
        part2 = self._within_block_partial(pts, gq, r)
        out = self.p_add(before, part2)
        return point_select(self.cf, q >= 0, out, identq)

    # ------------- RCB projective Pippenger (MSM v2) -------------
    def _msm_window_bits(self, n: int) -> int:
        """Static window size: 16-bit windows (digit == one scalar limb)
        once the O(2^c) bucket machinery amortizes, 8-bit below."""
        return 16 if n >= (1 << 18) else 8

    def _msm_rcb(self, P, scalars):
        """Pippenger over complete projective adds; returns a Jacobian point.

        Reference hot path: /root/reference/groth16/src/prover.rs:187-190
        (arkworks VariableBaseMSM). P must be affine-encoded (Z in {0,1})."""
        rg = rcb_group(self)
        n = scalars.shape[0]
        c = self._msm_window_bits(n)
        nb = 1 << c
        nwin = self.fr.L * BASE_BITS // c
        X, Y, Z = P
        inf = self.cf.is_zero(Z)
        ident_q = rg.identity((nb,))
        packed = _rcb_kernel_ok(rg, n)
        if packed:
            # pack two 16-bit limbs per u32 word ONCE (flag in bit 31 of the
            # top X word): per window, ONE lax.sort carries every coord
            # column to sorted order — the TPU sort beats an XLA row gather
            # ~4x at 2^21 (measured, scripts/probe_gather.py)
            from .pallas_rcb import pack_limbs_flag, rcb_scan_prefix_madd_cols

            Xp, Yp = pack_limbs_flag(rg, X, Y, inf)
            rp = Xp.shape[1]
            xy_cols = [Xp[:, i] for i in range(rp)] + [
                Yp[:, i] for i in range(rp)
            ]

        def window(w):
            bitpos = w * c
            limb = jnp.take(scalars, bitpos // BASE_BITS, axis=1)
            digits = (limb >> (bitpos % BASE_BITS)) & jnp.uint32(nb - 1)
            if packed:
                srt = jax.lax.sort(
                    [digits] + xy_cols, num_keys=1, is_stable=False
                )
                w_get, T = rcb_scan_prefix_madd_cols(
                    rg, srt[1 : 1 + rp], srt[1 + rp :], _RCB_B
                )
            else:
                order = jnp.argsort(digits)
                leaves = (X[order], Y[order], inf[order])
                w_get, T = _scan_prefix_madd(rg, leaves, _RCB_B)
            cnt = _bucket_counts(digits, nb)
            q = cnt.astype(jnp.int32) - 1
            qc = jnp.maximum(q, 0)
            e_wb = w_get(qc)
            g = qc // _RCB_B
            if packed:
                before = _boundary_before(rg, T, g - 1, ident_q)
            else:
                pfull = _full_prefix(rg, T, _RCB_B)
                before = jax.tree.map(
                    lambda c_: c_[jnp.maximum(g - 1, 0)], pfull
                )
                before = point_select(self.cf, g > 0, before, ident_q)
            E = _wide_add(rg, before, e_wb)
            E = point_select(self.cf, q >= 0, E, ident_q)
            e_last = jax.tree.map(lambda c_: c_[nb - 1], E)
            head = jax.tree.map(lambda c_: c_[: nb - 1], E)
            sum_e = _reduce_pts(rg, head, _RCB_B)
            t = _scale_pow2_minus1(rg, e_last, c)
            return rg.add(t, rg.neg(sum_e))

        _, S = jax.lax.scan(
            lambda carry, w: (None, window(w)), None, jnp.arange(nwin)
        )

        def outer(i, acc):
            acc = jax.lax.fori_loop(0, c, lambda _, a: rg.double(a), acc)
            s_w = jax.tree.map(lambda c_: c_[nwin - 1 - i], S)
            return rg.add(acc, s_w)

        out = jax.lax.fori_loop(0, nwin, outer, rg.identity(()))
        return rg.to_jacobian(out)

    def _msm_impl(self, P, scalars):
        """P: Jacobian (X,Y,Z) with leading axis N; scalars: (N, L) canonical.

        P must be affine-encoded (Z in {0, 1}, as `encode_points` emits —
        true of every MSM input in the framework: query/generator arrays and
        identity padding); affine-leaf mode relies on it for the fused
        mixed-add and for gathering only 2 coordinates per window.

        Windows run under lax.scan (one traced instance, sequential at
        runtime): batching windows with vmap multiplies every scan
        intermediate by the window count and blows out HBM at 2^16+ points.
        """
        if self._use_rcb:
            return self._msm_rcb(P, scalars)
        W = self.nwindows
        if self._affine_leaves:
            X, Y, Z = P
            P = (X, Y, self.cf.is_zero(Z))

        def body(_, w):
            return None, self._window_sum(P, self._digits(scalars, w))

        _, S = jax.lax.scan(body, None, jnp.arange(W))

        def outer(i, acc):
            def dbl(_, a):
                return self.p_double(a)

            acc = jax.lax.fori_loop(0, self.c, dbl, acc)
            s_w = jax.tree.map(lambda c: c[W - 1 - i], S)
            return self.p_add(acc, s_w)

        return jax.lax.fori_loop(0, W, outer, self.p_identity())

    # ------------- fixed-base (setup path) -------------
    def _table_impl(self, base):
        """Window tables T[w, d] = d * 2^(cw) * base, w < nwindows, d < 2^c."""

        def row(b, _):
            rep = jax.tree.map(lambda c: jnp.broadcast_to(c, (self.nb,) + c.shape), b)
            mult = blocked_scan(
                self.p_add, rep, self.p_identity()
            )  # [b, 2b, ..., nb*b]
            table_row = jax.tree.map(
                lambda m, z: jnp.concatenate([z, m[:-1]], axis=0),
                mult,
                self.p_identity((1,)),
            )
            next_b = jax.tree.map(lambda m: m[-1], mult)  # nb * b
            return next_b, table_row

        _, table = jax.lax.scan(row, base, None, length=self.nwindows)
        return table

    def _fixed_base_impl(self, table, scalars):
        """scalars: (N, L) canonical limbs -> (N,) affine-encoded points.

        Table rows are affine-encoded (host-built, window_table), so the
        accumulate is a fused mixed add (9M+8S) where pallas applies; the
        d = 0 row entry is infinity, masked by digit == 0.

        Normalization (Jacobian -> Z in {0, 1}) is fused into the same
        compiled graph: downstream variable-base MSMs assume affine encoding
        (arkworks `batch_normalization` parity, generator.rs:270)."""
        n = scalars.shape[0]
        if self._use_rcb:
            return self._fixed_base_rcb(table, scalars)
        use_madd = self._affine_leaves and n >= 256

        def body(w, acc):
            digits = self._digits(scalars, w).astype(jnp.int32)
            row = jax.tree.map(lambda t: t[w], table)
            if use_madd:
                from .pallas_ec import ec_madd_pallas

                X, Y, _Z = row
                return ec_madd_pallas(
                    self.cf, acc, (X[digits], Y[digits], digits == 0)
                )
            picked = jax.tree.map(lambda t: t[digits], row)
            return self.p_add(acc, picked)

        out = jax.lax.fori_loop(0, self.nwindows, body, self.p_identity((n,)))
        return self._normalize(out)

    def _fixed_base_rcb(self, table, scalars):
        """Fixed-base accumulation over RCB projective adds.

        Table-row selection is an EXACT int8 one-hot matmul over shifted
        byte planes riding the MXU — an XLA row gather of (N, L) u32 from
        the 2^c-row table costs ~9 ms per window-chunk at 2^18 (~70% of
        setup wall-clock, probe_msm2) while the matmul is bandwidth-bound
        at ~0.5 ms. Each output element is one product (one-hot), summed
        byte planes reconstruct the u32 limbs exactly. The d = 0 row is
        infinity, masked by digit == 0. Output stays PROJECTIVE;
        fixed_base_msm normalizes once over the whole batch."""
        rg = rcb_group(self)
        n = scalars.shape[0]
        X, Y, _Z = table
        nwin, nb = X.shape[0], X.shape[1]
        if nb != 256:
            def body_gather(w, acc):
                digits = self._digits(scalars, w).astype(jnp.int32)
                return _wide_madd(
                    rg, acc, (X[w][digits], Y[w][digits], digits == 0)
                )

            return jax.lax.fori_loop(
                0, self.nwindows, body_gather, rg.identity((n,))
            )
        coord_shape = X.shape[2:]  # (L,) or (2, L)
        R = int(np.prod(coord_shape))
        pair = jnp.concatenate(
            [X.reshape(nwin, nb, R), Y.reshape(nwin, nb, R)], axis=-1
        )  # (W, 256, 2R) u32 of 16-bit limbs
        lo = (pair & jnp.uint32(0xFF)).astype(jnp.int32)
        hi = ((pair >> 8) & jnp.uint32(0xFF)).astype(jnp.int32)
        planes = (
            jnp.concatenate([lo, hi], axis=-1) - 128
        ).astype(jnp.int8)  # (W, 256, 4R), values in [-128, 127]
        ar = jnp.arange(nb, dtype=jnp.int32)

        def body(w, acc):
            digits = self._digits(scalars, w).astype(jnp.int32)
            oh = (digits[:, None] == ar[None]).astype(jnp.int8)
            out = (
                jax.lax.dot_general(
                    oh, planes[w], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                + 128  # undo the shift: exactly one 1 per one-hot row
            )
            vals = (
                out[:, : 2 * R] + (out[:, 2 * R :] << 8)
            ).astype(jnp.uint32)
            Xg = vals[:, :R].reshape(n, *coord_shape)
            Yg = vals[:, R:].reshape(n, *coord_shape)
            return _wide_madd(rg, acc, (Xg, Yg, digits == 0))

        return jax.lax.fori_loop(0, self.nwindows, body, rg.identity((n,)))

    def _normalize_proj(self, p):
        """Projective -> affine-encoded Jacobian (Z in {0, one})."""
        X, Y, Z = p
        zinv = self.cf.batch_inv(Z)  # zeros stay zero
        x = self.cf.mul(X, zinv)
        y = self.cf.mul(Y, zinv)
        inf = self.cf.is_zero(Z)
        ones = self.cf.ones(inf.shape)
        mask = inf[..., None] if self.group == "g1" else inf[..., None, None]
        z = jnp.where(mask, 0, ones).astype(jnp.uint32)
        return (x, y, z)

    def _fixed_base_chunked(self, table, scalars3):
        """scalars3: (k, C, L) -> (k*C,) points; one traced chunk instance.

        Chunking bounds HBM (a full-width EC add materializes (N, L, L) mul
        temporaries — 2^18 G2 scalars OOM unchunked) and keeps ONE compiled
        chunk graph shared across all chunk positions."""

        def body(_, s):
            return None, self._fixed_base_impl(table, s)

        _, out = jax.lax.scan(body, None, scalars3)
        return jax.tree.map(lambda c: c.reshape(-1, *c.shape[2:]), out)

    def fixed_base_msm(self, table, scalars, pad_output: bool = False):
        """Public fixed-base entry with the same power-of-two padding.

        `table` may be a lazy FixedBase wrapper (preferred) or raw device
        window tables. With pad_output=True the pow2-padded array is
        returned whole (padding rows are infinity — zero scalars), letting
        callers keep shape-stable arrays without an extra device slice.
        """
        if isinstance(table, FixedBase):
            n = scalars.shape[0]
            if n <= self.small_host_threshold:
                ss = self._scalars_host(scalars)
                fb_many = getattr(self.host_group, "fixed_base_mul_many", None)
                if fb_many is not None:
                    pts = fb_many(table.base_affine, ss)
                else:
                    pts = [self.host_group.mul(table.base_affine, s) for s in ss]
                return self.encode_points(pts)
            table = table.table
        n = scalars.shape[0]
        align = _rcb_align(rcb_group(self)) if self._use_rcb else 0
        if (self.fq.use_pallas and align and n >= align
                and (self.group != "g2" or _G2_ALIGNED)):
            # align-pad like the variable-base entry: query arrays keep the
            # exact generator width so prover MSMs skip the pow2 waste
            np2 = -(-n // align) * align
        else:
            # G2 queries pow2-pad here so the prover-side pow2 guard in
            # msm() never re-pads per proof
            np2 = max(8, 1 << (n - 1).bit_length())
        if np2 != n:
            pad_fn = np.pad if isinstance(scalars, np.ndarray) else jnp.pad
            scalars = pad_fn(scalars, ((0, np2 - n), (0, 0)))
        chunk = self._fb_chunk
        if np2 > chunk:
            if self._use_rcb:
                # python-level chunk loop: ONE compiled chunk program serves
                # every batch size (the lax.scan variant bakes the chunk
                # count into the executable — a fresh multi-second program
                # load per circuit size through the TPU tunnel); dispatches
                # pipeline device-side, the concat is a tiny copy program.
                # Align-padded widths add at most one smaller tail chunk
                # (one extra compiled chunk shape).
                outs = [
                    self._fixed_base_jit(
                        table, scalars[i : min(i + chunk, np2)]
                    )
                    for i in range(0, np2, chunk)
                ]
                out = jax.tree.map(
                    lambda *cs: jnp.concatenate(cs, axis=0), *outs
                )
            else:
                s3 = scalars.reshape(np2 // chunk, chunk, scalars.shape[-1])
                out = self._fixed_base_chunked_jit(table, s3)
        else:
            out = self._fixed_base_jit(table, scalars)
        if self._use_rcb:
            # one whole-batch normalization (projective -> affine-encoded
            # Jacobian) instead of per-chunk batch inversions
            out = self._normalize_proj_jit(out)
        if pad_output:
            return out
        return jax.tree.map(lambda c: c[:n], out)

    def fixed_base_table(self, base_affine: AffinePoint):
        """Window table T[w, d] = d * 2^(cw) * base, affine-encoded.

        Built on HOST (Jacobian + one batch inversion, ~0.2 s) and uploaded:
        the device scan build executed in ~42 s (G1) / ~146 s (G2) through
        the TPU tunnel and cost two compiled programs. Backends whose host
        group lacks `window_table` (ristretto) keep the device build."""
        wt = getattr(self.host_group, "window_table", None)
        if wt is None:
            base = self.encode_points([base_affine])
            base = jax.tree.map(lambda c: c[0], base)
            return self._table(base)
        rows = wt(base_affine, self.c, self.nwindows)
        enc = self.encode_points([pt for row in rows for pt in row])
        return jax.tree.map(
            lambda c: jnp.asarray(c).reshape(
                self.nwindows, self.nb, *c.shape[1:]
            ),
            enc,
        )

    def fixed_base(self, base_affine: AffinePoint) -> "FixedBase":
        """Lazy fixed-base context: the device window table is only built on
        first large-batch use (table construction is itself a big kernel)."""
        return FixedBase(self, base_affine)


class FixedBase:
    def __init__(self, dg: DeviceCurveGroup, base_affine: AffinePoint):
        self.dg = dg
        self.base_affine = base_affine
        self._table = None

    @property
    def table(self):
        if self._table is None:
            self._table = self.dg.fixed_base_table(self.base_affine)
        return self._table


@functools.lru_cache(maxsize=None)
def _device_group_by_name(curve_name: str, group: str, window_bits: int) -> DeviceCurveGroup:
    from ..host.pairing import get_curve

    return DeviceCurveGroup(get_curve(curve_name), group, window_bits)


def device_group(
    curve: PairingCurve, group: str, window_bits: int | None = None
) -> DeviceCurveGroup:
    if window_bits is None:
        # 8-bit windows: 256-bucket reduction keeps XLA graphs small (the
        # 2^16-bucket variant compiles pathologically slowly); scan work per
        # window doubles but stays N-dominated for large MSMs
        window_bits = 8
    return _device_group_by_name(curve.name, group, window_bits)


# ---- fixed-base-list MSM with cached device encodings ----
# Pedersen-style commitments repeatedly MSM over the SAME generator list
# (spartan/hyrax/libra packing commits, bulletproofs A_I/A_O/S). Encoding
# the generators once per list makes the device Pippenger a drop-in for the
# host path above a size threshold.
FIXED_BASE_MSM_MIN = 1 << 10
_fixed_base_cache: dict[int, tuple[object, object]] = {}


def msm_over_fixed_base(
    curve, base_points: list, scalars: list[int], cache: bool = True
) -> AffinePoint:
    """MSM of scalars over a prefix of a generator list.

    With cache=True (default) the device encoding is memoized per list —
    for long-lived generator lists (Pedersen commit bases). Pass cache=False
    for one-shot lists (e.g. the bulletproofs IPA round slices,
    inner_product_proof.rs:22-174) so device encodings are not retained."""
    host = curve.g1
    if len(scalars) < FIXED_BASE_MSM_MIN or getattr(curve, "is_edwards", False):
        # jubjub/baby_jubjub have no device backend yet: host Pippenger
        return host.msm(base_points[: len(scalars)], scalars)
    if getattr(curve, "name", "") == "curve25519":
        from .ristretto_device import device_ristretto_group

        dg = device_ristretto_group()
    else:
        dg = device_group(curve, "g1")
    if cache:
        key = id(base_points)
        ent = _fixed_base_cache.get(key)
        if ent is None or ent[0] is not base_points:
            enc = dg.encode_points(base_points)
            _fixed_base_cache[key] = (base_points, enc)
            ent = _fixed_base_cache[key]
        enc = ent[1]
    else:
        enc = dg.encode_points(base_points)
    P = jax.tree.map(lambda c: c[: len(scalars)], enc)
    return dg.decode_point(dg.msm(P, dg.encode_scalars(scalars)))
