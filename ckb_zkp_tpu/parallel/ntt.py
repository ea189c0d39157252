"""Sharded NTT: four-step decomposition with all_to_all stage exchange.

DFT_N for N = N1*N2 splits into column DFT_N1 + twiddle + row DFT_N2 with
mesh transposes (the TPU-native version of multi-host butterfly exchange,
SURVEY.md §5). Layouts:

    natural x (N,) == M[n1, n2] row-major (n = n1*N2 + n2), sharded over n1
    fft_t(x)  -> B[k1, k2] sharded over k1 rows — the "transposed" spectrum;
                 X[k1 + N1*k2] = B[k1, k2]
    ifft_from_t(B) -> natural x, row-sharded (includes the 1/N scaling)

Pointwise products are layout-agnostic, so polynomial multiplication runs
fft_t -> pointwise -> ifft_from_t without materializing natural-order
spectra (transpose-free convolution).
"""

from __future__ import annotations

import functools
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..host.field import FieldSpec
from ..ops.field import device_field
from ..ops.ntt import get_domain
from .mesh import SHARD_AXIS


@functools.lru_cache(maxsize=None)
def get_sharded_domain(
    spec: FieldSpec, n: int, mesh, axis: str = SHARD_AXIS
) -> "ShardedDomain":
    """Cached ShardedDomain: the jitted shard-mapped transforms live on the
    instance, so re-instantiating per prove recompiles them all."""
    return ShardedDomain(spec, n, mesh, axis)


class ShardedDomain:
    def __init__(self, spec: FieldSpec, n: int, mesh, axis: str = SHARD_AXIS):
        self.spec = spec
        self.n = n
        self.mesh = mesh
        self.axis = axis
        self.d = mesh.shape[axis]
        logn = n.bit_length() - 1
        assert 1 << logn == n
        self.n1 = 1 << ((logn + 1) // 2)
        self.n2 = n // self.n1
        assert self.n1 % self.d == 0 and self.n2 % self.d == 0, (
            "mesh must divide both NTT factor dims"
        )
        self.df = device_field(spec)
        self.dom1 = get_domain(spec, self.n1)
        self.dom2 = get_domain(spec, self.n2)
        p = spec.modulus
        self.omega = spec.root_of_unity(n)
        self.omega_inv = pow(self.omega, -1, p)
        self.coset_g = spec.generator
        self.coset_g_inv = pow(self.coset_g, -1, p)
        self.fft_t = jax.jit(self._shardmapped(self._forward_local))
        self.ifft_from_t = jax.jit(self._shardmapped(self._inverse_local))
        # natural-order coset transforms for the sharded QAP witness map
        # (groth16/src/r1cs_to_qap.rs:144-169 parity, mesh-sharded)
        self.coset_eval = jax.jit(
            self._shardmapped(
                lambda x: self._ntt_from_t_local(
                    self._coset_scale_local(self._ifft_t_local(x), False)
                )
            )
        )
        self.coset_interp = jax.jit(
            self._shardmapped(
                lambda q: self._from_t_local(
                    self._coset_scale_local(self._ifft_t_local(q), True)
                )
            )
        )

    def _shardmapped(self, local):
        spec_in = P(self.axis, None)
        return shard_map(
            local, mesh=self.mesh, in_specs=spec_in, out_specs=spec_in
        )

    def _twiddle_block(self, base: int, k1_count, k1_off, n2_count, n2_off):
        """T[i, j] = base^((k1_off+i) * (n2_off+j)), Montgomery form."""
        df = self.df
        n2v = jax.lax.broadcasted_iota(jnp.uint32, (n2_count, 1), 0)[:, 0] + n2_off
        col = df.ones((n2_count,))
        b = base % self.spec.modulus
        for bit in range(max(1, (self.n2).bit_length())):
            sel = ((n2v >> bit) & 1).astype(bool)
            col = jnp.where(sel[:, None], df.mul(col, df.const(b, (1,))), col)
            b = b * b % self.spec.modulus
        k1v = jax.lax.broadcasted_iota(jnp.uint32, (k1_count, 1), 0)[:, 0] + k1_off
        T = df.ones((k1_count, n2_count))
        sq = col
        for bit in range(max(1, (self.n1).bit_length())):
            sel = ((k1v >> bit) & 1).astype(bool)
            T = jnp.where(sel[:, None, None], df.mul(T, sq[None]), T)
            sq = df.sqr(sq)
        return T

    def _pow_vec(self, base: int, count: int, off):
        """[base^(off+i)]_{i<count} Montgomery, off may be traced."""
        df = self.df
        p = self.spec.modulus
        v = jax.lax.broadcasted_iota(jnp.uint32, (count, 1), 0)[:, 0] + off
        out = df.ones((count,))
        b = base % p
        for bit in range(max(1, (2 * self.n).bit_length())):
            sel = ((v >> bit) & 1).astype(bool)
            out = jnp.where(sel[:, None], df.mul(out, df.const(b, (1,))), out)
            b = b * b % p
        return out

    def _coset_scale_local(self, B, inverse: bool):
        """Multiply transposed-layout coeffs C[k1, k2] by g^(+-(k1 + n1*k2)).

        Natural coeff index k = k1 + n1*k2, rows = local k1 shard."""
        df, d, n1, n2 = self.df, self.d, self.n1, self.n2
        me = jax.lax.axis_index(self.axis)
        g = self.coset_g_inv if inverse else self.coset_g
        p = self.spec.modulus
        n1d = n1 // d
        B = B.reshape(n1d, n2, df.L)
        col = self._pow_vec(g, n1d, me * n1d)  # g^k1
        row = self._pow_vec(pow(g, n1, p), n2, 0)  # (g^n1)^k2
        B = df.mul(B, df.mul(col[:, None], row[None]))
        return B.reshape(n1d * n2, df.L)

    # ---- inverse transform, natural -> transposed coeffs (with 1/N):
    # _forward_local with inverse butterflies and omega^-1 twiddles ----
    def _ifft_t_local(self, x):
        df, d, n1, n2 = self.df, self.d, self.n1, self.n2
        me = jax.lax.axis_index(self.axis)
        x = x.reshape(n1 // d, n2, df.L)
        x = jax.lax.all_to_all(x, self.axis, split_axis=1, concat_axis=0, tiled=True)
        ifft1 = partial(self.dom1._fft_impl, inverse=True, coset=False)
        x = jax.vmap(ifft1, in_axes=1, out_axes=1)(x)  # includes 1/n1
        x = df.mul(
            x, self._twiddle_block(self.omega_inv, n1, 0, n2 // d, me * (n2 // d))
        )
        x = jax.lax.all_to_all(x, self.axis, split_axis=0, concat_axis=1, tiled=True)
        ifft2 = partial(self.dom2._fft_impl, inverse=True, coset=False)
        x = jax.vmap(ifft2, in_axes=0, out_axes=0)(x)  # includes 1/n2
        return x.reshape(n1 // d * n2, df.L)

    # ---- forward transform, transposed coeffs -> natural evals:
    # _inverse_local with forward butterflies and omega twiddles ----
    def _ntt_from_t_local(self, B):
        df, d, n1, n2 = self.df, self.d, self.n1, self.n2
        me = jax.lax.axis_index(self.axis)
        B = B.reshape(n1 // d, n2, df.L)
        fft2 = partial(self.dom2._fft_impl, inverse=False, coset=False)
        B = jax.vmap(fft2, in_axes=0, out_axes=0)(B)
        B = df.mul(
            B, self._twiddle_block(self.omega, n1 // d, me * (n1 // d), n2, 0)
        )
        B = jax.lax.all_to_all(B, self.axis, split_axis=1, concat_axis=0, tiled=True)
        fft1 = partial(self.dom1._fft_impl, inverse=False, coset=False)
        B = jax.vmap(fft1, in_axes=1, out_axes=1)(B)
        B = jax.lax.all_to_all(B, self.axis, split_axis=0, concat_axis=1, tiled=True)
        return B.reshape(n1 // d * n2, df.L)

    def _from_t_local(self, B):
        """Pure mesh transpose: transposed layout -> natural order."""
        df, d, n1, n2 = self.df, self.d, self.n1, self.n2
        B = B.reshape(n1 // d, n2, df.L)
        B = jax.lax.all_to_all(B, self.axis, split_axis=1, concat_axis=0, tiled=True)
        B = jnp.swapaxes(B, 0, 1)  # (n2/d, n1, L): rows k2, cols k1
        return B.reshape((n2 // d) * n1, df.L)

    # ---- forward: natural row-sharded -> transposed spectrum row-sharded ----
    def _forward_local(self, x):
        df, d, n1, n2 = self.df, self.d, self.n1, self.n2
        me = jax.lax.axis_index(self.axis)
        x = x.reshape(n1 // d, n2, df.L)
        # to column shards: (n1, n2/d, L)
        x = jax.lax.all_to_all(x, self.axis, split_axis=1, concat_axis=0, tiled=True)
        fft1 = partial(self.dom1._fft_impl, inverse=False, coset=False)
        x = jax.vmap(fft1, in_axes=1, out_axes=1)(x)
        x = df.mul(x, self._twiddle_block(self.omega, n1, 0, n2 // d, me * (n2 // d)))
        # back to row shards: (n1/d, n2, L)
        x = jax.lax.all_to_all(x, self.axis, split_axis=0, concat_axis=1, tiled=True)
        fft2 = partial(self.dom2._fft_impl, inverse=False, coset=False)
        x = jax.vmap(fft2, in_axes=0, out_axes=0)(x)
        return x.reshape(n1 // d * n2, df.L)

    # ---- inverse: transposed spectrum row-sharded -> natural row-sharded ----
    def _inverse_local(self, B):
        df, d, n1, n2 = self.df, self.d, self.n1, self.n2
        me = jax.lax.axis_index(self.axis)
        B = B.reshape(n1 // d, n2, df.L)
        ifft2 = partial(self.dom2._fft_impl, inverse=True, coset=False)
        B = jax.vmap(ifft2, in_axes=0, out_axes=0)(B)  # includes 1/n2
        B = df.mul(
            B, self._twiddle_block(self.omega_inv, n1 // d, me * (n1 // d), n2, 0)
        )
        # to column shards: (n1, n2/d, L)
        B = jax.lax.all_to_all(B, self.axis, split_axis=1, concat_axis=0, tiled=True)
        ifft1 = partial(self.dom1._fft_impl, inverse=True, coset=False)
        B = jax.vmap(ifft1, in_axes=1, out_axes=1)(B)  # includes 1/n1
        # back to natural row shards
        B = jax.lax.all_to_all(B, self.axis, split_axis=0, concat_axis=1, tiled=True)
        return B.reshape(n1 // d * n2, df.L)
