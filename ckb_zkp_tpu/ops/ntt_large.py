"""Large-domain NTT: four-step decomposition in limb-major tile layout.

Why this exists: the radix-2 ladder in ops/ntt.py keeps data as (n, L)
interleaved limbs, and its stage temporaries reshape to (g, 2, half, L).
XLA pads the minor L=16 dim to 128 lanes, an 8x HBM expansion that both
taxes bandwidth at every size and OOMs outright at n = 2^24 (round-3
diagnosis: "Extra memory due to padding: 7.00G (8.0x expansion)", compile
OOM 20.5G of 15.75G HBM). BASELINE.md names ntt 2^24 a headline metric.

Fix (this module): for n >= LARGE_NTT_MIN the transform runs as a single-
device four-step NTT (DFT_n = col DFT_n1 . twiddle . row DFT_n2, n = n1*n2,
the same algebra as the mesh-sharded parallel/ntt.py but on one chip) with
all bulk data in LIMB-MAJOR tile layout (L, rows, lanes): the minor dims are
always >= 128 lanes, so nothing pads. Field arithmetic runs with the limb
axis at position 0 — carry resolution is the same bit-packed adder as
ops/limbs.py transposed to axis 0, and multiplies go straight to the fused
Pallas kernel's native (L, M, 128) tile format (pallas_field.mont_mul_tiles),
skipping the per-call transposes mont_mul pays.

Both row/column ladders are radix-2 DIF along the SUBLANE axis of an
(L, m, W) block — pairs are contiguous row-slices, twiddles are host-built
constants (m <= 4096 elements), and the bit-reversal is a static gather of
contiguous 4*W-byte rows (512 B at W >= 128). The inner n1 x n2 twiddle grid
w^(k1*b) is built on device once per (domain, direction) and cached.

Bit-exactness: canonical Montgomery limbs are a unique representation, so
this path returns arrays identical to Domain._fft_core for every size
(tests/test_ntt_large.py checks all four transform variants).

Reference counterpart: arkworks `GeneralEvaluationDomain` at QAP scale
(/root/reference/groth16/src/r1cs_to_qap.rs:144-170); the reference has no
large-domain specialization — this decomposition is TPU layout engineering.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..host.field import FieldSpec
from .field import DeviceField, device_field
from .limbs import BASE_BITS, MASK, ints_to_limbs


# ---------------------------------------------------------------- limb-axis-0
# Field helpers for (L, ...) limb-major arrays. Same algebra as ops/limbs.py
# / DeviceField (bit-identical results), carries resolved along axis 0.

def _ks_resolve0(t: jnp.ndarray):
    """Bit-packed carry resolve along axis 0 (see limbs.ks_resolve)."""
    nl = t.shape[0]
    g = (t >> BASE_BITS).astype(jnp.uint32)
    p = ((t & MASK) == MASK).astype(jnp.uint32)
    c_chunks = []
    cin = jnp.zeros(t.shape[1:], jnp.uint32)
    for lo in range(0, nl, 31):
        hi = min(lo + 31, nl)
        width = hi - lo
        G = cin * 0
        P = cin * 0
        for i in range(width):
            G = G + (g[lo + i] << np.uint32(i))
            P = P + (p[lo + i] << np.uint32(i))
        GP = G | P
        S = G + GP + cin
        c_bits = S ^ G ^ GP  # bit i = carry INTO limb lo+i
        c_chunks.append(
            jnp.stack([(c_bits >> np.uint32(i)) & 1 for i in range(width)], 0)
        )
        cin = (c_bits >> np.uint32(width)) & 1
    c = jnp.concatenate(c_chunks, 0)
    return (t + c) & MASK, cin


def _col(v: np.ndarray, ndim: int) -> np.ndarray:
    """(L,) host limbs -> (L, 1, ..., 1) broadcastable constant."""
    return v.reshape((v.shape[0],) + (1,) * (ndim - 1))


def _cond_sub_p0(df: DeviceField, x: jnp.ndarray) -> jnp.ndarray:
    d, borrow_free = _ks_resolve0(x + _col(df.comp_p1, x.ndim))
    return jnp.where((borrow_free > 0)[None], d, x)


def add0(df: DeviceField, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    s, _ = _ks_resolve0(a + b)
    return _cond_sub_p0(df, s)


def sub0(df: DeviceField, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    t = a + (MASK - b)
    t = t.at[0].add(1)
    d, no_borrow = _ks_resolve0(t)
    d2, _ = _ks_resolve0(d + _col(df.p_limbs.astype(np.uint32), d.ndim))
    return jnp.where((no_borrow > 0)[None], d, d2)


def mul0(df: DeviceField, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product of (L, A, W) limb-major blocks (equal shapes)."""
    per_limb = a.size // a.shape[0]
    if df.use_pallas and per_limb % (8 * 128) == 0:
        from .pallas_field import LANES, mont_mul_tiles

        L = a.shape[0]
        at = a.reshape(L, -1, LANES)
        return mont_mul_tiles(df, at, b.reshape(L, -1, LANES)).reshape(a.shape)
    # CPU/test fallback: interleave, reuse the XLA path, de-interleave
    return jnp.moveaxis(df.mul(jnp.moveaxis(a, 0, -1), jnp.moveaxis(b, 0, -1)), -1, 0)


# ---------------------------------------------------------------- tables

def _bitrev_indices(m: int) -> np.ndarray:
    bits = m.bit_length() - 1
    idx = np.arange(m, dtype=np.uint32)
    out = np.zeros_like(idx)
    for b in range(bits):
        out |= ((idx >> b) & 1) << (bits - 1 - b)
    return out.astype(np.int32)


def _host_mont_powers(
    spec: FieldSpec, base: int, count: int, L: int, scale: int = 1
) -> np.ndarray:
    """(L, count) limb-major Montgomery powers [scale * base^i for i < count]."""
    p = spec.modulus
    R = (1 << (BASE_BITS * L)) % p
    vals = []
    cur = scale % p
    for _ in range(count):
        vals.append(cur * R % p)
        cur = cur * base % p
    return np.ascontiguousarray(ints_to_limbs(vals, L).T)


class FourStepDomain:
    """Single-device four-step NTT over a size-n subgroup (n = n1*n2).

    API mirrors Domain: (n, L) Montgomery limbs in natural order, natural
    order out, forward/inverse/coset variants.
    """

    def __init__(self, spec: FieldSpec, n: int):
        assert n >= 1 << 8 and (n & (n - 1)) == 0
        self.spec = spec
        self.n = n
        self.df = device_field(spec)
        logn = n.bit_length() - 1
        self.n1 = 1 << ((logn + 1) // 2)
        self.n2 = n // self.n1
        p = spec.modulus
        L = self.df.L
        self.omega = spec.root_of_unity(n)
        self.omega_inv = pow(self.omega, -1, p)
        self.n_inv = pow(n, -1, p)
        self.coset_g = spec.generator
        self.coset_g_inv = pow(self.coset_g, -1, p)
        # host-built small tables (limb-major numpy; become program consts)
        w1 = pow(self.omega, self.n2, p)  # order n1
        w2 = pow(self.omega, self.n1, p)  # order n2
        hp = functools.partial(_host_mont_powers, spec, L=L)
        self._tab = {
            (1, False): hp(w1, self.n1),
            (1, True): hp(pow(w1, -1, p), self.n1),
            (2, False): hp(w2, self.n2),
            (2, True): hp(pow(w2, -1, p), self.n2),
        }
        self._br1 = _bitrev_indices(self.n1)
        self._br2 = _bitrev_indices(self.n2)
        # rank-1 coset factors: g^i = g^(a*n2) * g^b at input (a, b) grid;
        # g^-j = (g^-n1)^k2 * g^-k1 at output (k2, k1) grid
        self._cvec = {
            ("a", False): hp(pow(self.coset_g, self.n2, p), self.n1),
            ("b", False): hp(self.coset_g, self.n2),
            # n_inv folded into the k2 vector: the coset-inverse tail then
            # needs two rank-1 muls, not three full-grid passes (2^24 HBM)
            ("k2", True): hp(
                pow(self.coset_g_inv, self.n1, p), self.n2, scale=self.n_inv
            ),
            ("k1", True): hp(self.coset_g_inv, self.n1),
        }
        self._ninv_limbs = np.ascontiguousarray(
            ints_to_limbs([self.n_inv * ((1 << (BASE_BITS * L)) % p) % p], L).T
        )  # (L, 1)
        self._grids: dict[bool, jnp.ndarray] = {}
        self._grid_builder = jax.jit(self._build_grid)
        self._core = jax.jit(
            self._fft_core, static_argnames=("inverse", "coset")
        )

    # ---- n1 x n2 twiddle grid, cached per direction ----
    def _build_grid(self, row: jnp.ndarray) -> jnp.ndarray:
        """row: (L, n2) = base^b -> grid (L, n1, n2) with grid[k1, b] = base^(k1*b)."""
        df, L, n1, n2 = self.df, self.df.L, self.n1, self.n2
        one = np.ascontiguousarray(
            np.broadcast_to(df.r_limbs.reshape(L, 1, 1), (L, 1, 1))
        ).astype(np.uint32)
        T = jnp.broadcast_to(jnp.asarray(one), (L, n1, n2))
        sq = row[:, None, :]  # (L, 1, n2): base^(b * 2^bit)
        k1 = np.arange(n1, dtype=np.uint32)
        for bit in range(n1.bit_length() - 1):
            sel = ((k1 >> bit) & 1).astype(bool).reshape(1, n1, 1)
            prod = mul0(df, T, jnp.broadcast_to(sq, T.shape))
            T = jnp.where(jnp.asarray(sel), prod, T)
            sq = mul0(df, sq, sq)
        return T

    # retain both direction grids only while their total HBM footprint stays
    # under this cap (2^24 grids are ~1 GB each and holding both plus the
    # transform working set exhausts the chip; alternating ntt/intt above the
    # cap rebuilds the grid each call, ~1 s at 2^24)
    _GRID_CACHE_BYTES = int(
        os.environ.get("CKB_ZKP_TPU_NTT_GRID_CACHE_BYTES", str(1 << 30))
    )

    def _grid(self, inverse: bool) -> jnp.ndarray:
        if inverse not in self._grids:
            grid_bytes = self.df.L * self.n1 * self.n2 * 4
            if grid_bytes * (len(self._grids) + 1) > self._GRID_CACHE_BYTES:
                self._grids.clear()
            base = self.omega_inv if inverse else self.omega
            row = jnp.asarray(
                _host_mont_powers(self.spec, base, self.n2, self.df.L)
            )
            self._grids[inverse] = self._grid_builder(row)
        return self._grids[inverse]

    # ---- DIF ladder along axis 1 of (L, m, W); minor dims stay >= W ----
    def _ladder(self, X: jnp.ndarray, which: int, inverse: bool):
        df = self.df
        L, m, W = X.shape
        tab = self._tab[(which, inverse)]  # (L, m) numpy
        logm = m.bit_length() - 1
        for s in range(logm):
            half = m >> (s + 1)
            y = X.reshape(L, m // (2 * half), 2 * half * W)
            a = y[..., : half * W]
            b = y[..., half * W:]
            top = add0(df, a, b)
            d = sub0(df, a, b)
            tw = np.ascontiguousarray(tab[:, :: 1 << s][:, :half])  # (L, half)
            twb = jnp.broadcast_to(
                jnp.asarray(tw)[:, None, :, None], (L, 1, half, W)
            ).reshape(L, 1, half * W)
            bot = mul0(df, d, jnp.broadcast_to(twb, d.shape))
            X = jnp.concatenate([top, bot], axis=-1).reshape(L, m, W)
        br = self._br1 if which == 1 else self._br2
        return jnp.take(X, jnp.asarray(br), axis=1)

    # ---- core ----
    def _fft_core(self, x, grid, *, inverse: bool, coset: bool):
        df, L, n1, n2 = self.df, self.df.L, self.n1, self.n2
        X = x.reshape(n1, n2, L).transpose(2, 0, 1)  # (L, n1, n2), X[a, b]
        if coset and not inverse:
            ca = jnp.asarray(self._cvec[("a", False)])[:, :, None]  # (L, n1, 1)
            cb = jnp.asarray(self._cvec[("b", False)])[:, None, :]  # (L, 1, n2)
            X = mul0(df, X, jnp.broadcast_to(ca, X.shape))
            X = mul0(df, X, jnp.broadcast_to(cb, X.shape))
        X = self._ladder(X, 1, inverse)  # column DFTs -> Y[k1, b]
        X = mul0(df, X, grid)  # *= w^(k1*b)
        X = jnp.swapaxes(X, 1, 2)  # (L, n2, n1): Y'[b, k1]
        X = self._ladder(X, 2, inverse)  # row DFTs -> Z'[k2, k1]
        if inverse:
            if coset:
                # ("k2", True) carries the n_inv factor (see __init__)
                ck2 = jnp.asarray(self._cvec[("k2", True)])[:, :, None]
                ck1 = jnp.asarray(self._cvec[("k1", True)])[:, None, :]
                X = mul0(df, X, jnp.broadcast_to(ck2, X.shape))
                X = mul0(df, X, jnp.broadcast_to(ck1, X.shape))
            else:
                ninv = jnp.asarray(self._ninv_limbs)[:, :, None]  # (L, 1, 1)
                X = mul0(df, X, jnp.broadcast_to(ninv, X.shape))
        # Z'[k2, k1] row-major IS the natural-order output (k = k1 + n1*k2)
        return X.transpose(1, 2, 0).reshape(self.n, L)

    def fft(self, x: jnp.ndarray, *, inverse: bool = False, coset: bool = False):
        assert x.shape == (self.n, self.df.L), (x.shape, self.n)
        return self._core(x, self._grid(inverse), inverse=inverse, coset=coset)

    # ---- large-domain Lagrange coefficients (Groth16/KZG setup path) ----
    def _hs_mul_scan(self, X: jnp.ndarray, axis: int, reverse: bool):
        """Inclusive Hillis-Steele product scan of (L, n1, n2) along axis."""
        df = self.df
        n = X.shape[axis]

        def sl(a, b):
            s = [slice(None)] * 3
            s[axis] = slice(a, b)
            return tuple(s)

        # identity-shifted full-width steps (never ragged slices): every
        # multiply keeps per-limb element counts at the full grid width, so
        # the limb-major Pallas mul stays engaged (ragged widths would fall
        # back to the interleaved XLA path and its 8x lane padding)
        one_col = jnp.asarray(
            np.asarray(df.r_limbs, dtype=np.uint32).reshape(df.L, 1, 1)
        )
        shift = 1
        while shift < n:
            pad_shape = list(X.shape)
            pad_shape[axis] = shift
            pad = jnp.broadcast_to(one_col, tuple(pad_shape))
            if reverse:
                # out[i] = prod X[i..]: combine X[i] with X[i + shift]
                shifted = jnp.concatenate([X[sl(shift, n)], pad], axis=axis)
            else:
                # out[i] = prod X[..i]: combine X[i] with X[i - shift]
                shifted = jnp.concatenate([pad, X[sl(0, n - shift)]], axis=axis)
            X = mul0(df, X, shifted)
            shift *= 2
        return X

    def _batch_inv_grid(self, X: jnp.ndarray) -> jnp.ndarray:
        """Montgomery-trick batch inversion of a nonzero (L, n1, n2) grid,
        fully limb-major (the (n, L) batch_inv layout pads 8x at 2^24)."""
        df = self.df
        L, n1, n2 = X.shape
        prefix = self._hs_mul_scan(X, 2, reverse=False)  # within-row prefixes
        suffix = self._hs_mul_scan(X, 2, reverse=True)
        row_tot = prefix[:, :, n2 - 1 : n2]  # (L, n1, 1)
        rp = self._hs_mul_scan(row_tot.swapaxes(1, 2), 2, False).swapaxes(1, 2)
        rs = self._hs_mul_scan(row_tot.swapaxes(1, 2), 2, True).swapaxes(1, 2)
        one = jnp.asarray(
            np.asarray(df.r_limbs, dtype=np.uint32).reshape(L, 1, 1)
        )
        # total product inverse via one Fermat inversion (interleaved, tiny)
        tot = rp[:, n1 - 1 : n1, :]  # (L, 1, 1)
        tot_i = jnp.moveaxis(
            df.inv(jnp.moveaxis(tot, 0, -1)), -1, 0
        )
        rows_left = jnp.concatenate([one, rp[:, : n1 - 1, :]], axis=1)
        rows_right = jnp.concatenate([rs[:, 1:, :], one], axis=1)
        row_out = mul0(
            df,
            mul0(df, jnp.broadcast_to(rows_left, rows_right.shape), rows_right),
            jnp.broadcast_to(tot_i, rows_right.shape),
        )  # (L, n1, 1): inverse of each row's total product
        ones_col = jnp.broadcast_to(one, (L, n1, 1))
        left = jnp.concatenate([ones_col, prefix[:, :, : n2 - 1]], axis=2)
        right = jnp.concatenate([suffix[:, :, 1:], ones_col], axis=2)
        out = mul0(df, mul0(df, left, right), jnp.broadcast_to(row_out, X.shape))
        return out

    def evaluate_all_lagrange_coefficients(self, tau: int) -> jnp.ndarray:
        """[L_i(tau)]_{i<n} as (n, L) Montgomery limbs — the limb-major
        large-domain route for the Groth16/KZG setup instance map
        (reference: groth16/src/r1cs_to_qap.rs:58-110; removes the
        LARGE_NTT_MIN guard of ops/ntt.py)."""
        df, p = self.df, self.spec.modulus
        L, n1, n2 = df.L, self.n1, self.n2
        t = tau % p
        if pow(t, self.n, p) == 1:
            # tau in the domain: L_i = delta_i (host-built one-hot)
            idx, cur = 0, 1
            for i in range(self.n):
                if cur == t:
                    idx = i
                    break
                cur = cur * self.omega % p
            out = np.zeros((self.n, L), dtype=np.uint32)
            out[idx] = df.r_limbs
            return jnp.asarray(out)
        zt_over_n = (pow(t, self.n, p) - 1) * pow(self.n, -1, p) % p
        hp = functools.partial(_host_mont_powers, self.spec, L=L)
        # w^i at grid (a, b), i = a*n2 + b: rank-1 (w^n2)^a x w^b, with
        # zt_over_n folded into the a-vector
        ca = jnp.asarray(hp(pow(self.omega, n2, p), n1, scale=zt_over_n))
        cb = jnp.asarray(hp(self.omega, n2))
        wa = jnp.asarray(hp(pow(self.omega, n2, p), n1))
        t_limbs = jnp.asarray(
            np.ascontiguousarray(
                ints_to_limbs([t * ((1 << (BASE_BITS * L)) % p) % p], L).T
            )
        ).reshape(L, 1, 1)
        return self._lagrange_jit_core(ca, cb, wa, t_limbs)

    @functools.cached_property
    def _lagrange_jit_core(self):
        df, L, n1, n2 = self.df, self.df.L, self.n1, self.n2

        @jax.jit
        def core(ca, cb, wa, t_limbs):
            # num[a, b] = zt_over_n * w^(a*n2) * w^b   (rank-1 product)
            num = mul0(
                df,
                jnp.broadcast_to(ca[:, :, None], (L, n1, n2)),
                jnp.broadcast_to(cb[:, None, :], (L, n1, n2)),
            )
            # den[a, b] = t - w^i (nonzero: t is outside the domain)
            wgrid = mul0(
                df,
                jnp.broadcast_to(wa[:, :, None], (L, n1, n2)),
                jnp.broadcast_to(cb[:, None, :], (L, n1, n2)),
            )
            den = sub0(df, jnp.broadcast_to(t_limbs, wgrid.shape), wgrid)
            out = mul0(df, num, self._batch_inv_grid(den))
            return out.transpose(1, 2, 0).reshape(self.n, L)

        return core

    # ---- public API (matches Domain) ----
    def ntt(self, coeffs):
        return self.fft(coeffs)

    def intt(self, evals):
        return self.fft(evals, inverse=True)

    def coset_ntt(self, coeffs):
        return self.fft(coeffs, coset=True)

    def coset_intt(self, evals):
        return self.fft(evals, inverse=True, coset=True)


@functools.lru_cache(maxsize=None)
def get_fourstep_domain(spec: FieldSpec, n: int) -> FourStepDomain:
    return FourStepDomain(spec, n)
