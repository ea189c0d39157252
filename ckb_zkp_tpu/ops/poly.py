"""Dense polynomial arithmetic over Fr on device.

Replaces arkworks `DensePolynomial` ops used by KZG/Marlin/aSVC
(/root/reference/marlin/src/pc/kzg10.rs:211-226, asvc/src/lib.rs:195-217).
Coefficients are (n, L) Montgomery limb arrays, ascending degree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .field import DeviceField
from .ntt import get_domain
from .scan_utils import blocked_reduce


def poly_trim_len(coeffs_host: list[int]) -> int:
    n = len(coeffs_host)
    while n > 1 and coeffs_host[n - 1] == 0:
        n -= 1
    return n


def poly_add(df: DeviceField, a, b):
    n = max(a.shape[0], b.shape[0])
    a = pad_to(df, a, n)
    b = pad_to(df, b, n)
    return df.add(a, b)


def poly_sub(df: DeviceField, a, b):
    n = max(a.shape[0], b.shape[0])
    return df.sub(pad_to(df, a, n), pad_to(df, b, n))


def pad_to(df: DeviceField, a, n: int):
    if a.shape[0] >= n:
        return a
    return jnp.concatenate([a, df.zeros((n - a.shape[0],))], axis=0)


def poly_scale(df: DeviceField, a, c: int):
    return df.mul(a, df.const(c, (1,)))


def poly_mul(df: DeviceField, a, b):
    """Product via NTT on a domain of size >= deg(a)+deg(b)+1."""
    out_len = a.shape[0] + b.shape[0] - 1
    n = 1
    while n < out_len:
        n *= 2
    dom = get_domain(df.spec, n)
    ea = dom.ntt(pad_to(df, a, n))
    eb = dom.ntt(pad_to(df, b, n))
    return dom.intt(df.mul(ea, eb))[:out_len]


def poly_eval(df: DeviceField, coeffs, x: int) -> jnp.ndarray:
    """Evaluate at a host scalar x; returns (L,) Montgomery element."""
    n = coeffs.shape[0]
    pw = df.powers(x, n)
    terms = df.mul(coeffs, pw)
    return blocked_reduce(df.add, terms, df.zeros(()))


def poly_divide_linear(df: DeviceField, coeffs, z: int):
    """(q, r) with p(x) = q(x) * (x - z) + r  — synthetic division.

    Sequential over coefficients (lax.scan, high->low), batched over limbs.
    """
    n = coeffs.shape[0]
    if n == 1:
        return df.zeros((1,)), coeffs[0]
    zc = df.const(z)
    rev = coeffs[::-1]  # high -> low

    def step(carry, c):
        q_i = df.add(c, df.mul(zc, carry))
        return q_i, q_i

    r, qs = jax.lax.scan(step, df.zeros(()), rev)
    # qs holds Horner partials; the first n-1 are quotient coeffs (descending),
    # the final partial (== r) is the remainder p(z)
    q_desc = qs[: n - 1]
    return q_desc[::-1], r
