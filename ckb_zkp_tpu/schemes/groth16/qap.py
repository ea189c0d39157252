"""R1CS -> QAP reduction shared by the generator and prover.

Parity: /root/reference/groth16/src/r1cs_to_qap.rs. The evaluation domain has
size next_pow2(num_constraints + num_inputs); rows [nc, nc+ni) of A carry the
input-binding identity entries (a[nc+i] = input_i), exactly as the reference's
instance/witness maps (r1cs_to_qap.rs:80-95, :139-142).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ...ops.field import DeviceField, device_field
from ...ops.ntt import Domain, get_domain
from ...ops.sparse import DeviceCoo
from ...r1cs import R1csShape


def domain_size_for(shape: R1csShape) -> int:
    need = shape.num_constraints + shape.num_inputs
    n = 1
    while n < need:
        n *= 2
    return n


# On non-CPU backends (the TPU tunnel), circuits with domains up to this size
# run the QAP reduction in host Python ints: every distinct compiled shape
# costs minutes through the tunnel's remote compiler, which made a
# 10-constraint CLI proof slower than a 2^20 one. CPU backends keep the
# device path (compiles are cheap and the tests exercise it).
HOST_QAP_MAX = 1 << 12


def _host_ntt(xs: list[int], omega: int, p: int) -> list[int]:
    n = len(xs)
    if n == 1:
        return list(xs)
    w2 = omega * omega % p
    even = _host_ntt(xs[0::2], w2, p)
    odd = _host_ntt(xs[1::2], w2, p)
    out = [0] * n
    w = 1
    for i in range(n // 2):
        t = w * odd[i] % p
        out[i] = (even[i] + t) % p
        out[i + n // 2] = (even[i] - t) % p
        w = w * omega % p
    return out


class QapMatrices:
    """Device COO matrices for A (input-augmented), B, C over the QAP domain."""

    def __init__(self, shape: R1csShape, spec, host_mode: bool | None = None):
        """host_mode=None: automatic (host ints for small circuits on the TPU
        tunnel). Explicit True forces the exact host-int pipeline at any size
        (used by the multi-chip dryrun as its compile-free reference prover);
        False forces the device path."""
        self.df: DeviceField = device_field(spec)
        self.spec = spec
        self.m = domain_size_for(shape)
        if host_mode is None:
            host_mode = (
                jax.default_backend() != "cpu" and self.m <= HOST_QAP_MAX
            )
        self.host_mode = host_mode
        nc, ni = shape.num_constraints, shape.num_inputs
        nv = shape.num_variables
        from ...ops.sparse import aligned_cols

        self.num_cols_pad = aligned_cols(nv)
        a_rows = np.concatenate(
            [shape.a.rows, np.arange(nc, nc + ni, dtype=np.int32)]
        )
        a_cols = np.concatenate([shape.a.cols, np.arange(ni, dtype=np.int32)])
        a_coeffs = list(shape.a.coeffs) + [1] * ni
        self._host_coo = (
            (a_rows, a_cols, a_coeffs),
            (shape.b.rows, shape.b.cols, list(shape.b.coeffs)),
            (shape.c.rows, shape.c.cols, list(shape.c.coeffs)),
        )
        self.num_variables = nv
        if self.host_mode:
            self.domain = None
            self.a = self.b = self.c = None
            return
        self.domain: Domain = get_domain(spec, self.m)
        self.a = DeviceCoo(self.df, a_rows, a_cols, a_coeffs, self.m, nv)
        self.b = DeviceCoo(
            self.df, shape.b.rows, shape.b.cols, shape.b.coeffs, self.m, nv
        )
        self.c = DeviceCoo(
            self.df, shape.c.rows, shape.c.cols, shape.c.coeffs, self.m, nv
        )

    # ---- host path (small circuits on the TPU tunnel) ----
    def _host_matvec(self, coo, z: list[int]) -> list[int]:
        rows, cols, coeffs = coo
        p = self.spec.modulus
        out = [0] * self.m
        for r, c, v in zip(rows, cols, coeffs):
            out[int(r)] = (out[int(r)] + v * z[int(c)]) % p
        return out

    def witness_map_host(self, z: list[int]) -> list[int]:
        """Host-int witness map: same pipeline as `witness_map`, exact."""
        p = self.spec.modulus
        spec = self.spec
        n = self.m
        omega = spec.root_of_unity(n)
        omega_inv = pow(omega, -1, p)
        n_inv = pow(n, -1, p)
        g = spec.generator

        def intt(xs):
            out = _host_ntt(xs, omega_inv, p)
            return [x * n_inv % p for x in out]

        def coset_ntt(xs):
            scaled, cur = [], 1
            for c in xs:
                scaled.append(c * cur % p)
                cur = cur * g % p
            return _host_ntt(scaled, omega, p)

        a = coset_ntt(intt(self._host_matvec(self._host_coo[0], z)))
        b = coset_ntt(intt(self._host_matvec(self._host_coo[1], z)))
        c = coset_ntt(intt(self._host_matvec(self._host_coo[2], z)))
        zinv = pow(pow(g, n, p) - 1, -1, p)
        q = [(x * y - w) % p * zinv % p for x, y, w in zip(a, b, c)]
        ginv = pow(g, -1, p)
        h, res, cur = intt(q), [], 1
        for x in h:
            res.append(x * cur % p)
            cur = cur * ginv % p
        return res[: self.m - 1]

    def evaluations_at_host(self, t: int):
        """u_i(t), v_i(t), w_i(t) as host ints (setup instance map)."""
        p = self.spec.modulus
        n = self.m
        omega = self.spec.root_of_unity(n)
        # Lagrange coefficients L_i(t)
        if pow(t, n, p) == 1:
            lag = [0] * n
            cur = 1
            for i in range(n):
                if cur == t % p:
                    lag[i] = 1
                cur = cur * omega % p
        else:
            zt_over_n = (pow(t, n, p) - 1) * pow(n, -1, p) % p
            lag, cur = [], 1
            for _ in range(n):
                lag.append(zt_over_n * cur % p * pow((t - cur) % p, -1, p) % p)
                cur = cur * omega % p
        nv = self.num_variables
        out = []
        for coo in self._host_coo:
            rows, cols, coeffs = coo
            acc = [0] * nv
            for r, c, v in zip(rows, cols, coeffs):
                acc[int(c)] = (acc[int(c)] + v * lag[int(r)]) % p
            out.append(acc)
        return tuple(out)

    def witness_map(self, z_mont, sdom=None):
        """Full assignment (mont) -> h coefficients (mont, full length m).

        The reference's hot loop 1 (r1cs_to_qap.rs:113-172): sparse matvecs,
        4 iNTT/coset-NTT pairs, pointwise ops, constant vanishing division.
        The logical h has m-1 coefficients; the top coefficient is zero in
        exact arithmetic and callers pair it with an infinity query point,
        so the pow2 shape is kept (shared compiled graphs, no device slice).

        With `sdom` (a parallel.ShardedDomain over the prover mesh) the six
        NTTs run as four-step transforms with all_to_all stage exchange —
        the mesh-sharded replacement for the reference's rayon-parallel
        arkworks FFTs (SURVEY §2.3); the sparse matvecs stay replicated.
        """
        df, dom = self.df, self.domain
        if z_mont.shape[0] < self.a.num_cols_pad:  # shape-stable compile cache
            z_mont = jnp.concatenate(
                [z_mont, df.zeros((self.a.num_cols_pad - z_mont.shape[0],))], 0
            )
        a = self.a.matvec(z_mont)
        b = self.b.matvec(z_mont)
        c = self.c.matvec(z_mont)
        if sdom is not None:
            assert sdom.n == self.m
            ca = sdom.coset_eval(a)
            cb = sdom.coset_eval(b)
            cc = sdom.coset_eval(c)
            q = df.sub(df.mul(ca, cb), cc)
            return sdom.coset_interp(dom.divide_by_vanishing_poly_on_coset(q))
        tdom = dom
        if self.m >= (1 << 14):
            # the limb-major four-step transform beats the interleaved
            # ladder 3-6x at witness-map scale (measured at 2^17..2^22,
            # scripts/probe_ntt_ab.py: e.g. 237 ms vs 728 ms per
            # intt+coset_ntt pair at 2^21) — the ladder's (.., L) stage
            # temporaries pay XLA's 8x lane padding at every stage
            from ...ops.ntt_large import get_fourstep_domain

            tdom = get_fourstep_domain(self.spec, self.m)
        ca = tdom.coset_ntt(tdom.intt(a))
        cb = tdom.coset_ntt(tdom.intt(b))
        cc = tdom.coset_ntt(tdom.intt(c))
        q = df.sub(df.mul(ca, cb), cc)
        return tdom.coset_intt(dom.divide_by_vanishing_poly_on_coset(q))

    # ---- fused single-program witness map (TPU-tunnel dispatch economy) ----
    # Every dispatch through the tunnel costs ~25 ms of host wall-clock; the
    # unfused witness map issues ~12 (3 matvecs, 6 four-step cores, pointwise
    # glue). One jitted program also lets XLA fuse the pointwise chains into
    # the transform stages. Only built for four-step-sized domains.
    FUSED_MIN = 1 << 14

    @functools.cached_property
    def _fused_core(self):
        from ...ops.ntt_large import get_fourstep_domain

        tdom = get_fourstep_domain(self.spec, self.m)
        df, dom = self.df, self.domain

        @functools.partial(jax.jit, static_argnames=("out_len",))
        def core(z_can, ac, acf, ar, bc, bcf, br, cc_, ccf, cr,
                 grid_f, grid_i, *, out_len):
            z_mont = df.to_mont(z_can)
            a = self.a._gather_mul_reduce(z_mont, ac, acf, ar, out_len=self.m)
            b = self.b._gather_mul_reduce(z_mont, bc, bcf, br, out_len=self.m)
            c = self.c._gather_mul_reduce(z_mont, cc_, ccf, cr, out_len=self.m)
            ea = tdom._fft_core(
                tdom._fft_core(a, grid_i, inverse=True, coset=False),
                grid_f, inverse=False, coset=True,
            )
            eb = tdom._fft_core(
                tdom._fft_core(b, grid_i, inverse=True, coset=False),
                grid_f, inverse=False, coset=True,
            )
            ec = tdom._fft_core(
                tdom._fft_core(c, grid_i, inverse=True, coset=False),
                grid_f, inverse=False, coset=True,
            )
            q = dom.divide_by_vanishing_poly_on_coset(
                df.sub(df.mul(ea, eb), ec)
            )
            h = tdom._fft_core(q, grid_i, inverse=True, coset=True)
            h_can = df.from_mont(h)
            if out_len > self.m:
                h_can = jnp.concatenate(
                    [h_can,
                     jnp.zeros((out_len - self.m, h_can.shape[1]), h_can.dtype)],
                    axis=0,
                )
            return h_can[:out_len]

        return core

    def witness_map_fused(self, z_can, out_len: int):
        """Canonical witness limbs -> canonical h scalars (out_len, L), the
        whole QAP reduction (to_mont + matvecs + 6 NTTs + quotient +
        from_mont) as ONE compiled program / ONE dispatch."""
        from ...ops.ntt_large import get_fourstep_domain

        tdom = get_fourstep_domain(self.spec, self.m)
        a, b, c = self.a, self.b, self.c
        if z_can.shape[0] < a.num_cols_pad:  # shape-stable compile cache
            z_can = jnp.concatenate(
                [z_can,
                 jnp.zeros((a.num_cols_pad - z_can.shape[0], z_can.shape[1]),
                           z_can.dtype)],
                axis=0,
            )
        return self._fused_core(
            z_can,
            a.r_cols, a.r_coeffs, a.r_rows,
            b.r_cols, b.r_coeffs, b.r_rows,
            c.r_cols, c.r_coeffs, c.r_rows,
            tdom._grid(False), tdom._grid(True),
            out_len=out_len,
        )

    def evaluations_at(self, t: int):
        """u_i(t), v_i(t), w_i(t) for every variable i (setup instance map)."""
        lag = self.domain.evaluate_all_lagrange_coefficients(t)  # (m, L)
        u = self.a.rmatvec(lag)
        v = self.b.rmatvec(lag)
        w = self.c.rmatvec(lag)
        return u, v, w
