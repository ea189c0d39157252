"""Radix-2 NTT (finite-field FFT) evaluation domains on device.

Replaces arkworks' `GeneralEvaluationDomain` as used by the reference's QAP
witness map and AHP provers (/root/reference/groth16/src/r1cs_to_qap.rs:144-170,
/root/reference/marlin/src/ahp/prover.rs:160-204). TPU-first design:

- iterative DIF stages expressed as reshape/stack (no scatter), output in
  bit-reversed order fixed by one static gather;
- twiddle tables built on device by repeated doubling (log n batched muls);
- coset ops exploit Z(g*w^i) = g^n - 1 being constant on the coset, so the
  vanishing division is a single batched scalar mul (same trick the reference
  relies on, r1cs_to_qap.rs:164-169);
- Lagrange-coefficient evaluation is a batched formula + one batch inversion.

All polynomial data is (n, L) uint32 Montgomery limbs over Fr.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from ..host.field import FieldSpec
from .field import DeviceField

# Domains at/above this size route through the limb-major four-step path
# (ops/ntt_large.py): the interleaved ladder's (g, 2, half, L) temporaries
# lane-pad 8x and OOM HBM at 2^24. Kept high enough (2^23) that every
# prove/setup-path program below it is untouched (warm-cache safety).
LARGE_NTT_MIN = int(os.environ.get("CKB_ZKP_TPU_LARGE_NTT_MIN", str(1 << 23)))


def _bitrev_indices(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n, dtype=np.uint32)
    out = np.zeros_like(idx)
    for b in range(bits):
        out |= ((idx >> b) & 1) << (bits - 1 - b)
    return out.astype(np.int32)


class Domain:
    """Multiplicative subgroup of size n (power of two) of Fr^*."""

    def __init__(self, df: DeviceField, n: int):
        assert n >= 1 and (n & (n - 1)) == 0
        spec = df.spec
        self.df = df
        self.n = n
        p = spec.modulus
        self.omega = spec.root_of_unity(n)
        self.omega_inv = pow(self.omega, -1, p) if n > 1 else 1
        self.n_inv = pow(n, -1, p)
        # coset generator: the field's multiplicative generator, as arkworks
        self.coset_g = spec.generator
        self.coset_g_inv = pow(self.coset_g, -1, p)
        # big tables (twiddles, bitrev, coset scales) enter as ARGUMENTS:
        # closure-captured device arrays embed as dense literals in the
        # lowered program, and at 2^21 the remote compile request exceeds
        # the TPU tunnel's body limit (HTTP 413, BENCH r3 run 1)
        self._fft_jit = jax.jit(
            self._fft_core, static_argnames=("inverse", "coset")
        )
        self._lagrange_jit = jax.jit(self._lagrange_core)
        # one compiled builder serves every base of this domain size (the
        # base enters as data); building the table with eager doubling ops
        # instead costs ~log2(n) separate compiles on the TPU tunnel
        self._table_builder = jax.jit(self._build_pow_table)
        self._bitrev_dev = None
        self.is_large = n >= LARGE_NTT_MIN
        self._fourstep = None
        if not self.is_large:
            # build power tables eagerly (outside any trace) so the lru_cache
            # never captures tracers; large domains never touch the n-sized
            # tables (the four-step path builds its own small ones)
            for base in (self.omega, self.omega_inv, self.coset_g, self.coset_g_inv):
                self._pow_table(base)

    @functools.cached_property
    def _bitrev(self) -> np.ndarray:
        # numpy, NOT jnp: first access may happen inside a trace (_fft_impl
        # under shard_map), and caching a traced constant leaks the tracer
        return _bitrev_indices(self.n)

    # ---- twiddle/power tables (device, cached) ----
    def _build_pow_table(self, w_pow: jnp.ndarray) -> jnp.ndarray:
        """w_pow: (1, L) mont base -> [base^0 .. base^(n-1)] by doubling."""
        df = self.df
        table = df.ones((1,))
        length = 1
        while length < self.n:
            table = jnp.concatenate([table, df.mul(table, w_pow)], axis=0)
            w_pow = df.sqr(w_pow)
            length *= 2
        return table

    @functools.lru_cache(maxsize=None)
    def _pow_table(self, base: int) -> jnp.ndarray:
        """[base^0 .. base^(n-1)] as (n, L) Montgomery limbs, built on device."""
        return self._table_builder(self.df.encode([base]))

    # ---- core transform ----
    def fft(self, x: jnp.ndarray, *, inverse: bool = False, coset: bool = False):
        """NTT over the domain; natural order in and out. Dispatches the
        jitted core with the (device-cached) tables as runtime operands."""
        if self.is_large:
            if self._fourstep is None:
                from .ntt_large import get_fourstep_domain

                self._fourstep = get_fourstep_domain(self.df.spec, self.n)
            return self._fourstep.fft(x, inverse=inverse, coset=coset)
        table = self._pow_table(self.omega_inv if inverse else self.omega)
        if coset:
            scale = self._pow_table(
                self.coset_g_inv if inverse else self.coset_g
            )
        else:
            scale = self.df.zeros((1,))  # dead operand on non-coset paths
        if self._bitrev_dev is None:
            # device-resident copy made OUTSIDE any trace (we are in eager
            # dispatch here); avoids a per-call host->device transfer
            self._bitrev_dev = jnp.asarray(self._bitrev)
        return self._fft_jit(
            x, table, scale, self._bitrev_dev, inverse=inverse, coset=coset
        )

    def _fft_impl(self, x, *, inverse: bool = False, coset: bool = False):
        """Closure-constant variant for SMALL domains composed inside larger
        traces (the four-step sharded NTT's local transforms)."""
        table = self._pow_table(self.omega_inv if inverse else self.omega)
        scale = (
            self._pow_table(self.coset_g_inv if inverse else self.coset_g)
            if coset
            else self.df.zeros((1,))
        )
        return self._fft_core(
            x, table, scale, self._bitrev, inverse=inverse, coset=coset
        )

    def _fft_core(
        self, x, table, coset_scale, bitrev, *, inverse: bool, coset: bool
    ):
        """coset=True: forward evaluates on gH (coset_fft); inverse
        interpolates from gH (coset_ifft).

        DIF radix-2 with ONE traced stage instance under lax.fori_loop on a
        fixed (n, L) layout: stage s pairs i with i^half (half = n >> (s+1)),
        top rows get a+b, bottom rows (a-b)*omega^((i & (half-1)) << s). The
        earlier Python-unrolled reshape/stack formulation traced log2(n)
        distinct stages (each with its own Pallas mul shape) and took tens of
        minutes to compile through the TPU tunnel's remote compiler.
        """
        df, n = self.df, self.n
        L = df.L
        assert x.shape[0] == n, (x.shape, n)
        if coset and not inverse:
            x = df.mul(x, coset_scale)
        if n > 1:
            # DIF stages unrolled with STATIC shapes: each stage is two
            # contiguous reshape-slices, one add, one sub-mul and a stack —
            # no partner gathers (a (n, L) row gather costs ~40 ms at 2^21
            # on the TPU, x2 per stage x 21 stages it dominated the whole
            # witness map — BENCH r3 run 2). Every stage's field ops
            # flatten to the same (n/2, L) shape, so ONE compiled mul
            # kernel serves all stages. Twiddles omega^(j << s) are strided
            # slices of the power table.
            logn = n.bit_length() - 1
            for s in range(logn):
                half = n >> (s + 1)
                y = x.reshape(-1, 2, half, L)
                a, b = y[:, 0], y[:, 1]
                top = df.add(a, b)
                tw = table[:: 1 << s][:half]
                bot = df.mul(df.sub(a, b), tw[None])
                x = jnp.stack([top, bot], axis=1).reshape(n, L)
            x = x[bitrev]
        if inverse:
            x = df.mul(x, df.const(self.n_inv, (1,)))
            if coset:
                x = df.mul(x, coset_scale)
        return x

    # ---- public API (mirrors GeneralEvaluationDomain) ----
    def ntt(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        return self.fft(coeffs)

    def intt(self, evals: jnp.ndarray) -> jnp.ndarray:
        return self.fft(evals, inverse=True)

    def coset_ntt(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        return self.fft(coeffs, coset=True)

    def coset_intt(self, evals: jnp.ndarray) -> jnp.ndarray:
        return self.fft(evals, inverse=True, coset=True)

    def divide_by_vanishing_poly_on_coset(self, evals: jnp.ndarray) -> jnp.ndarray:
        """evals of q on gH -> evals of q / (x^n - 1) on gH (constant divisor)."""
        z = pow(self.coset_g, self.n, self.df.spec.modulus) - 1
        zinv = pow(z, -1, self.df.spec.modulus)
        return self.df.mul(evals, self.df.const(zinv, (1,)))

    def evaluate_vanishing_polynomial(self, tau: int) -> int:
        return (pow(tau, self.n, self.df.spec.modulus) - 1) % self.df.spec.modulus

    def evaluate_all_lagrange_coefficients(self, tau: int) -> jnp.ndarray:
        """[L_i(tau)]_{i<n} on device: (t^n - 1) * w^i / (n * (t - w^i)).

        Used by the Groth16 trusted setup (reference:
        groth16/src/r1cs_to_qap.rs:58-110 instance map).
        """
        df, p = self.df, self.df.spec.modulus
        if self.is_large:
            # limb-major route: the n-sized interleaved power table the small
            # kernel consumes is exactly the layout the four-step path exists
            # to avoid (8x lane padding OOMs the chip at 2^24)
            if self._fourstep is None:
                from .ntt_large import get_fourstep_domain

                self._fourstep = get_fourstep_domain(self.df.spec, self.n)
            return self._fourstep.evaluate_all_lagrange_coefficients(tau)
        t = tau % p
        pow_w = self._pow_table(self.omega)  # w^i
        if pow(t, self.n, p) == 1:
            # tau in the domain: L_i = delta_i
            idx = 0
            cur = 1
            for i in range(self.n):
                if cur == t:
                    idx = i
                    break
                cur = cur * self.omega % p
            out = df.zeros((self.n,))
            return out.at[idx].set(df.ones(()))
        zt_over_n = (pow(t, self.n, p) - 1) * pow(self.n, -1, p) % p
        return self._lagrange_jit(
            pow_w, df.encode([zt_over_n]), df.encode([t])
        )

    def _lagrange_core(self, pow_w, zt_enc, t_enc):
        df = self.df
        num = df.mul(pow_w, zt_enc)
        den = df.sub(jnp.broadcast_to(t_enc, pow_w.shape), pow_w)
        return df.mul(num, df.batch_inv(den))


@functools.lru_cache(maxsize=None)
def get_domain(spec: FieldSpec, n: int) -> Domain:
    from .field import device_field

    return Domain(device_field(spec), n)
