"""Device (TPU) prime-field arithmetic: batched Montgomery limb kernels.

`DeviceField` wraps a host `FieldSpec` with jittable, batch-vectorized
arithmetic on (..., L) uint32 limb arrays in Montgomery form. This is the
framework's replacement for arkworks' `ark-ff` Montgomery backend (the math
substrate the whole reference stack sits on — SURVEY.md §2.1); unlike the
reference, elements are vectors over TPU lanes, and every op is shaped for
XLA: static shapes, python-unrolled limb loops, lax.scan carry chains.

All public ops take/return *canonical* (fully carry-propagated, < p) limbs in
Montgomery form unless noted.
"""

from __future__ import annotations

import functools
import math
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..host.field import FieldSpec
from .limbs import (
    BASE_BITS,
    MASK,
    carry_propagate,
    geq,
    int_to_limbs,
    ints_to_limbs,
    ks_resolve,
    limbs_to_ints,
    nlimbs_for,
)


class DeviceField:
    """Batched Montgomery arithmetic over spec.modulus with 16-bit limbs."""

    def __init__(self, spec: FieldSpec):
        self.spec = spec
        p = spec.modulus
        self.L = nlimbs_for(spec.bits)
        assert spec.bits <= 16 * self.L - 1, "need headroom: 2p < R"
        self.R = (1 << (BASE_BITS * self.L)) % p
        self.R2 = self.R * self.R % p
        self.n0 = int((-pow(p, -1, 1 << BASE_BITS)) % (1 << BASE_BITS))
        R_full = 1 << (BASE_BITS * self.L)
        self.nprime_limbs = int_to_limbs((-pow(p, -1, R_full)) % R_full, self.L)
        self.p_limbs = int_to_limbs(p, self.L)
        # ~p + 1 (two's complement) for the flat conditional-subtract
        self.comp_p1 = (MASK - self.p_limbs).astype(np.uint32)
        self.comp_p1[0] += 1  # p is odd, so no limb overflow
        self.r_limbs = int_to_limbs(self.R, self.L)  # = one in Montgomery form
        self.r2_limbs = int_to_limbs(self.R2, self.L)
        self.one_raw = int_to_limbs(1, self.L)
        # fused Pallas Montgomery kernel on TPU backends (bit-identical to
        # the XLA path; CKB_ZKP_TPU_NO_PALLAS=1 forces XLA everywhere)
        self.use_pallas = (
            jax.default_backend() == "tpu"
            and os.environ.get("CKB_ZKP_TPU_NO_PALLAS", "0") in ("", "0")
        )
        # jit the hot entry points (ops compose fine when already inside jit;
        # nested jit is inlined by the tracer)
        self.add = jax.jit(self.add)
        self.sub = jax.jit(self.sub)
        self.neg = jax.jit(self.neg)
        self.mul = jax.jit(self.mul)
        self.sqr = jax.jit(self.sqr)
        self.inv = jax.jit(self.inv)
        self.batch_inv = jax.jit(self.batch_inv)
        self.to_mont = jax.jit(self.to_mont)
        self.from_mont = jax.jit(self.from_mont)
        self.pow_fixed = jax.jit(self.pow_fixed, static_argnums=1)

    # ------------- constants as jnp -------------
    def zeros(self, batch_shape=()) -> jnp.ndarray:
        return jnp.zeros((*batch_shape, self.L), jnp.uint32)

    def ones(self, batch_shape=()) -> jnp.ndarray:
        return jnp.broadcast_to(
            jnp.asarray(self.r_limbs), (*batch_shape, self.L)
        ).astype(jnp.uint32)

    def const(self, value: int, batch_shape=()) -> jnp.ndarray:
        """Canonical int -> Montgomery-form constant."""
        v = value % self.spec.modulus * self.R % self.spec.modulus
        return jnp.broadcast_to(
            jnp.asarray(int_to_limbs(v, self.L)), (*batch_shape, self.L)
        ).astype(jnp.uint32)

    # ------------- canonicalization -------------
    def _cond_sub_p(self, x: jnp.ndarray) -> jnp.ndarray:
        """x in [0, 2p) canonical limbs -> x mod p (complement trick, flat)."""
        d, borrow_free = ks_resolve(x + jnp.asarray(self.comp_p1))
        # borrow_free == 1  <=>  x >= p; d == x - p (mod R)
        return jnp.where(borrow_free[..., None].astype(bool), d, x)

    # ------------- add/sub/neg -------------
    def add(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        s, _ = ks_resolve(a + b)  # 2p < R: carry-out impossible
        return self._cond_sub_p(s)

    def sub(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """a - b mod p via two's complement: a + ~b + 1 (flat, no borrows)."""
        t = a + (MASK - b)
        t = t.at[..., 0].add(1)
        d, no_borrow = ks_resolve(t)  # d = a - b mod R
        d2, _ = ks_resolve(d + jnp.asarray(self.p_limbs))  # (a-b mod R) + p - R
        return jnp.where(no_borrow[..., None].astype(bool), d, d2)

    def neg(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.sub(self.zeros(a.shape[:-1]), a)

    def is_zero(self, a: jnp.ndarray) -> jnp.ndarray:
        return jnp.all(a == 0, axis=-1)

    def eq(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        return jnp.all(a == b, axis=-1)

    # ------------- multiplication -------------
    @staticmethod
    def _skew_cols(m: jnp.ndarray, L: int) -> jnp.ndarray:
        """Anti-diagonal sums of (..., L, L): out[k] = sum_{i+j=k} m[i, j].

        Skew trick: pad each row to width 2L+1 and reshape — element (i, j)
        lands at flat index i*(2L+1)+j = i*2L + (i+j), i.e. column i+j of an
        (L, 2L) view. One pad + two reshapes + one row-sum, exact in uint32
        (column sums < 2L * 2^16 <= 2^21). This keeps a field multiply at
        ~10 traced ops per product instead of ~2 gathers per column, which
        is what keeps ec_add (and therefore every MSM/NTT graph that inlines
        it) compilable in seconds rather than minutes.
        """
        pad = [(0, 0)] * (m.ndim - 1) + [(0, L + 1)]
        z = jnp.pad(m, pad)  # (..., L, 2L+1)
        flat = z.reshape(*z.shape[:-2], L * (2 * L + 1))[..., : L * 2 * L]
        return flat.reshape(*z.shape[:-2], L, 2 * L).sum(-2)  # (..., 2L)

    def _product_cols(self, a: jnp.ndarray, b: jnp.ndarray, ncols: int) -> jnp.ndarray:
        """Lazy column sums of the schoolbook product, columns [0, ncols)."""
        L = self.L
        outer = a[..., :, None] * b[..., None, :]  # exact: (2^16-1)^2 < 2^32
        lo = outer & MASK
        hi = outer >> BASE_BITS
        cols_lo = self._skew_cols(lo, L)  # col k: sum_{i+j=k}
        cols_hi = self._skew_cols(hi, L)  # needs shift by one limb (i+j+1)
        cols = cols_lo.at[..., 1:].add(cols_hi[..., :-1])
        return cols[..., :ncols]

    def _school_product(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Full 2L-limb product, canonical limbs. a,b canonical (..., L)."""
        cols = jax.lax.optimization_barrier(self._product_cols(a, b, 2 * self.L))
        return carry_propagate(cols)

    def _mul_mod_R(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """(a*b) mod R: canonical low L limbs of the product (half cost)."""
        cols = jax.lax.optimization_barrier(self._product_cols(a, b, self.L))
        return carry_propagate(cols)

    def _mont_reduce(self, t: jnp.ndarray) -> jnp.ndarray:
        """Montgomery-reduce canonical 2L limbs (value < R*p) to t*R^-1 mod p.

        Separated-operand (SOS) form: m = (t mod R) * (-p^-1 mod R) mod R;
        out = (t + m*p) / R. Fully vectorized — no per-limb recurrence.
        """
        L = self.L
        # optimization barriers stop XLA from re-fusing (and re-computing)
        # the big product chains into every consumer
        t = jax.lax.optimization_barrier(t)
        m = jax.lax.optimization_barrier(
            self._mul_mod_R(t[..., :L], jnp.asarray(self.nprime_limbs))
        )
        mp = jax.lax.optimization_barrier(
            self._school_product(m, jnp.asarray(self.p_limbs))
        )
        s, _ = ks_resolve(t + mp)  # t+mp < 2Rp < 2^(32L); limbs <= 2*MASK
        s = jax.lax.optimization_barrier(s)
        return self._cond_sub_p(s[..., L:])  # low half is 0; value < 2p

    def _pallas_batch(self, a: jnp.ndarray, b: jnp.ndarray) -> int:
        if not self.use_pallas:
            return 0
        return math.prod(jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1]))

    def mul(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Montgomery product: (a*b*R^-1) mod p."""
        from .pallas_field import PALLAS_MIN_BATCH, mont_mul

        if self._pallas_batch(a, b) >= PALLAS_MIN_BATCH:
            return mont_mul(self, a, b)
        return self._mont_reduce(self._school_product(a, b))

    def sqr(self, a: jnp.ndarray) -> jnp.ndarray:
        return self.mul(a, a)

    # ------------- exponentiation / inversion -------------
    def pow_fixed(self, a: jnp.ndarray, e: int) -> jnp.ndarray:
        """a^e for a *static* Python-int exponent (trace-compact fori_loop)."""
        if e == 0:
            return self.ones(a.shape[:-1])
        nbits = e.bit_length()
        bits = jnp.asarray(
            np.array([(e >> i) & 1 for i in range(nbits)], dtype=np.uint32)
        )
        one = self.ones(a.shape[:-1])

        def body(i, state):
            r, base = state
            r = jnp.where(bits[i][..., None].astype(bool), self.mul(r, base), r)
            base = self.sqr(base)
            return r, base

        r, _ = jax.lax.fori_loop(0, nbits, body, (one, a))
        return r

    def inv(self, a: jnp.ndarray) -> jnp.ndarray:
        """Fermat inversion; a must be nonzero (0 maps to 0)."""
        return self.pow_fixed(a, self.spec.modulus - 2)

    def batch_inv(self, a: jnp.ndarray) -> jnp.ndarray:
        """Montgomery-trick batch inversion along axis 0; zeros -> zeros.

        Cost: 2 associative scans (O(log N) depth) + one Fermat inversion of a
        single element — the device-friendly replacement for arkworks'
        sequential `batch_inversion`.
        """
        from .scan_utils import blocked_scan, hs_scan

        z = self.is_zero(a)
        x = jnp.where(z[..., None], self.ones(a.shape[:-1]), a)
        one = self.ones(a.shape[1:-1])
        if self.use_pallas and a.shape[0] > 64:
            # log2(N) full-width fused-kernel launches beat block*levels
            # narrow sequential steps on the TPU (per-launch overhead
            # dominates narrow widths — probe_micro)
            prefix = hs_scan(self.mul, x)
            suffix = hs_scan(self.mul, x, reverse=True)
        else:
            prefix = blocked_scan(self.mul, x, one)
            suffix = blocked_scan(self.mul, x, one, reverse=True)
        total_inv = self.inv(prefix[-1])
        n = a.shape[0]
        left = jnp.concatenate([self.ones((1, *a.shape[1:-1])), prefix[: n - 1]], 0)
        right = jnp.concatenate([suffix[1:], self.ones((1, *a.shape[1:-1]))], 0)
        out = self.mul(self.mul(left, right), total_inv)
        return jnp.where(z[..., None], self.zeros(a.shape[:-1]), out)

    def powers(self, base: int, n: int) -> jnp.ndarray:
        """[base^0 .. base^(n-1)] (n need not be a power of two), on device."""
        table = self.ones((1,))
        b_pow = self.encode([base])
        while table.shape[0] < n:
            table = jnp.concatenate([table, self.mul(table, b_pow)], axis=0)
            b_pow = self.sqr(b_pow)
        return table[:n]

    # ------------- Montgomery conversion -------------
    def to_mont(self, raw: jnp.ndarray) -> jnp.ndarray:
        return self.mul(raw, jnp.asarray(self.r2_limbs))

    def from_mont(self, a: jnp.ndarray) -> jnp.ndarray:
        from .pallas_field import PALLAS_MIN_BATCH, mont_mul

        one = jnp.asarray(self.one_raw)
        if self._pallas_batch(a, one) >= PALLAS_MIN_BATCH:
            # mont(a, 1) = a * R^-1 — same reduction, fused kernel
            return mont_mul(self, a, one)
        return self._mont_reduce(
            jnp.concatenate([a, jnp.zeros_like(a)], axis=-1)
        )

    # ------------- host <-> device -------------
    # Below this batch size, Montgomery conversion happens in host Python
    # ints (no device compute): tiny protocol-layer conversions otherwise
    # cost one XLA compile per shape — minutes each on the TPU tunnel.
    HOST_CONVERT_MAX = 4096

    def encode(self, ints) -> jnp.ndarray:
        """List/iterable of Python ints -> (N, L) Montgomery-form limb array.

        Small batches are converted entirely on host and returned as numpy
        (JAX ops accept numpy operands; the transfer happens lazily at the
        consuming dispatch). Returning a jnp array here would force an eager
        device round-trip — on the TPU tunnel even a copy is a remote
        compile costing minutes."""
        p = self.spec.modulus
        vals = [x % p for x in ints]
        if len(vals) <= self.HOST_CONVERT_MAX:
            return ints_to_limbs([v * self.R % p for v in vals], self.L)
        raw = jnp.asarray(ints_to_limbs(vals, self.L))
        return self.to_mont(raw)

    def encode_scalar(self, x: int) -> jnp.ndarray:
        return self.encode([x])[0]

    def decode(self, a: jnp.ndarray) -> list[int]:
        """(..., L) Montgomery-form -> canonical Python ints."""
        p = self.spec.modulus
        n = math.prod(a.shape[:-1])
        if n <= self.HOST_CONVERT_MAX:
            rinv = pow(self.R, -1, p)
            raw = limbs_to_ints(np.asarray(jax.device_get(a)))
            return [x * rinv % p for x in raw]
        return limbs_to_ints(np.asarray(jax.device_get(self.from_mont(a))))

    def decode_scalar(self, a: jnp.ndarray) -> int:
        return self.decode(a.reshape(1, -1))[0]


@functools.lru_cache(maxsize=None)
def device_field(spec: FieldSpec) -> DeviceField:
    return DeviceField(spec)
