"""Host-list facade over the device NTT domain (+ arkworks domain helpers).

Protocol layers (Marlin, PLONK, aSVC) speak Python-int coefficient lists;
this wrapper routes the transforms through the device Domain and adds the
`GeneralEvaluationDomain` helpers the reference relies on: bivariate_eval,
batch_evals, diagonal_evals, reindex_by_subdomain
(/root/reference/marlin/src/ahp/arithmetic.rs:12-45, ark-poly 0.2).
"""

from __future__ import annotations

import functools

from ..host.field import FieldSpec
from .field import device_field
from .ntt import get_domain


class HDomain:
    # below these sizes, transforms run as host recursive NTT (avoids
    # per-size XLA compiles). The cutoff is much higher on non-CPU backends:
    # each compile goes through the TPU tunnel's remote compiler and costs
    # minutes, dwarfing any device speedup at these sizes.
    HOST_SIZE = 256
    HOST_SIZE_TUNNEL = 4096

    def __init__(self, spec: FieldSpec, num_coeffs: int):
        import jax

        n = 1
        while n < max(1, num_coeffs):
            n *= 2
        self.spec = spec
        self.size = n
        self.p = spec.modulus
        self._df = device_field(spec)
        host_max = (
            self.HOST_SIZE
            if jax.default_backend() == "cpu"
            else self.HOST_SIZE_TUNNEL
        )
        self._host_mode = n <= host_max or n == 1
        self._dom = None if self._host_mode else get_domain(spec, n)
        self.omega = (
            spec.root_of_unity(n) if self._host_mode else self._dom.omega
        )
        self.coset_g = spec.generator

    # ---- transforms ----
    def _pad(self, xs: list[int]) -> list[int]:
        assert len(xs) <= self.size, (len(xs), self.size)
        return [x % self.p for x in xs] + [0] * (self.size - len(xs))

    def _host_ntt(self, xs: list[int], omega: int) -> list[int]:
        n = len(xs)
        if n == 1:
            return list(xs)
        p = self.p
        w2 = omega * omega % p
        even = self._host_ntt(xs[0::2], w2)
        odd = self._host_ntt(xs[1::2], w2)
        out = [0] * n
        w = 1
        for i in range(n // 2):
            t = w * odd[i] % p
            out[i] = (even[i] + t) % p
            out[i + n // 2] = (even[i] - t) % p
            w = w * omega % p
        return out

    def fft(self, coeffs: list[int]) -> list[int]:
        if self._host_mode:
            return self._host_ntt(self._pad(coeffs), self.omega)
        df = self._df
        return df.decode(self._dom.ntt(df.encode(self._pad(coeffs))))

    def ifft(self, evals: list[int]) -> list[int]:
        if self._host_mode:
            p = self.p
            out = self._host_ntt(self._pad(evals), pow(self.omega, -1, p))
            n_inv = pow(self.size, -1, p)
            return [x * n_inv % p for x in out]
        df = self._df
        return df.decode(self._dom.intt(df.encode(self._pad(evals))))

    def coset_fft(self, coeffs: list[int]) -> list[int]:
        if self._host_mode:
            p = self.p
            g = self.coset_g
            scaled, cur = [], 1
            for c in self._pad(coeffs):
                scaled.append(c * cur % p)
                cur = cur * g % p
            return self._host_ntt(scaled, self.omega)
        df = self._df
        return df.decode(self._dom.coset_ntt(df.encode(self._pad(coeffs))))

    def coset_ifft(self, evals: list[int]) -> list[int]:
        if self._host_mode:
            p = self.p
            out = self.ifft(evals)
            ginv = pow(self.coset_g, -1, p)
            res, cur = [], 1
            for c in out:
                res.append(c * cur % p)
                cur = cur * ginv % p
            return res
        df = self._df
        return df.decode(self._dom.coset_intt(df.encode(self._pad(evals))))

    # ---- host helpers ----
    @functools.cached_property
    def elements(self) -> list[int]:
        out, cur = [], 1
        for _ in range(self.size):
            out.append(cur)
            cur = cur * self.omega % self.p
        return out

    def evaluate_vanishing(self, x: int) -> int:
        return (pow(x, self.size, self.p) - 1) % self.p

    @property
    def size_as_field_element(self) -> int:
        return self.size % self.p

    def bivariate_eval(self, x: int, y: int) -> int:
        """u_H(x, y) = (v_H(x) - v_H(y)) / (x - y); n*x^(n-1) on the diagonal."""
        p = self.p
        if x % p != y % p:
            num = (self.evaluate_vanishing(x) - self.evaluate_vanishing(y)) % p
            return num * pow((x - y) % p, -1, p) % p
        return self.size * pow(x, self.size - 1, p) % p

    def batch_evals(self, x: int) -> list[int]:
        """[u_H(x, u_i)] = v_H(x)/(x - u_i) for all domain elements."""
        p = self.p
        v_x = self.evaluate_vanishing(x)
        return [v_x * pow((x - u) % p, -1, p) % p for u in self.elements]

    def diagonal_evals(self) -> list[int]:
        """[u_H(u_i, u_i)] = n * u_i^(n-1) = n * u_i^-1 (ark ordering trick)."""
        p = self.p
        out = [self.size * u % p for u in self.elements]
        return [out[0]] + out[1:][::-1]

    def reindex_by_subdomain(self, other: "HDomain", index: int) -> int:
        """ark-poly 0.2 GeneralEvaluationDomain::reindex_by_subdomain."""
        period = self.size // other.size
        if index < other.size:
            return index * period
        i = index - other.size
        x = period - 1
        return i + (i // x) + 1
