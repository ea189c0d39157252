"""Device elliptic-curve point arithmetic (Jacobian, batched, branch-free).

Generic over the coordinate field: `DeviceField` (G1 over Fq) or `DeviceFq2`
(G2 over Fq2), so one set of formulas serves both groups — the reference gets
this genericity from arkworks' `SWModelParameters`
(/root/reference/curve/src/lib.rs:20-46). Completeness (inf / P==Q / P==-Q) is
handled with `where` selects, never data-dependent branches, so everything
jits to static control flow.

Points are pytrees (X, Y, Z) of (..., coord) limb arrays; Z == 0 encodes
infinity. Curves used here all have a = 0.
"""

from __future__ import annotations

import jax.numpy as jnp

from .field import DeviceField


class DeviceFq2:
    """Fq2 = Fq[u]/(u^2 + 1) on device; elements are (..., 2, L) limbs."""

    def __init__(self, df: DeviceField):
        self.df = df
        self.L = df.L

    def zeros(self, batch_shape=()):
        return self.df.zeros((*batch_shape, 2))

    def ones(self, batch_shape=()):
        return jnp.stack(
            [self.df.ones(batch_shape), self.df.zeros(batch_shape)], axis=-2
        )

    def add(self, a, b):
        return self.df.add(a, b)

    def sub(self, a, b):
        return self.df.sub(a, b)

    def neg(self, a):
        return self.df.neg(a)

    def mul(self, a, b):
        df = self.df
        a0, a1 = a[..., 0, :], a[..., 1, :]
        b0, b1 = b[..., 0, :], b[..., 1, :]
        v0 = df.mul(a0, b0)
        v1 = df.mul(a1, b1)
        c0 = df.sub(v0, v1)  # beta = -1
        c1 = df.sub(df.mul(df.add(a0, a1), df.add(b0, b1)), df.add(v0, v1))
        return jnp.stack([c0, c1], axis=-2)

    def sqr(self, a):
        return self.mul(a, a)

    def is_zero(self, a):
        return jnp.all(a == 0, axis=(-1, -2))

    def eq(self, a, b):
        return jnp.all(a == b, axis=(-1, -2))

    def select(self, mask, a, b):
        return jnp.where(mask[..., None, None], a, b)

    def inv(self, a):
        df = self.df
        a0, a1 = a[..., 0, :], a[..., 1, :]
        norm = df.add(df.sqr(a0), df.sqr(a1))
        ninv = df.inv(norm)
        return jnp.stack([df.mul(a0, ninv), df.neg(df.mul(a1, ninv))], axis=-2)

    def batch_inv(self, a):
        df = self.df
        a0, a1 = a[..., 0, :], a[..., 1, :]
        norm = df.add(df.sqr(a0), df.sqr(a1))
        ninv = df.batch_inv(norm)
        return jnp.stack([df.mul(a0, ninv), df.neg(df.mul(a1, ninv))], axis=-2)


def _field_select(cf, mask, a, b):
    if isinstance(cf, DeviceField):
        return jnp.where(mask[..., None], a, b)
    return cf.select(mask, a, b)


def point_select(cf, mask, p, q):
    return tuple(_field_select(cf, mask, a, b) for a, b in zip(p, q))


def point_infinity(cf, batch_shape=()):
    return (cf.ones(batch_shape), cf.ones(batch_shape), cf.zeros(batch_shape))


def is_infinity(cf, p):
    return cf.is_zero(p[2])


def ec_double(cf, p):
    """Jacobian doubling, a = 0. Infinity (Z=0) propagates automatically."""
    X, Y, Z = p
    A = cf.sqr(X)
    B = cf.sqr(Y)
    C = cf.sqr(B)
    t = cf.sub(cf.sqr(cf.add(X, B)), cf.add(A, C))
    D = cf.add(t, t)  # 2((X+B)^2 - A - C)
    E = cf.add(cf.add(A, A), A)  # 3A
    F = cf.sqr(E)
    X3 = cf.sub(F, cf.add(D, D))
    C8 = cf.add(C, C)
    C8 = cf.add(C8, C8)
    C8 = cf.add(C8, C8)
    Y3 = cf.sub(cf.mul(E, cf.sub(D, X3)), C8)
    Z3t = cf.mul(Y, Z)
    Z3 = cf.add(Z3t, Z3t)
    return (X3, Y3, Z3)


def _pallas_ec_batch(cf, p, q) -> int:
    if isinstance(cf, DeviceField):
        if not getattr(cf, "use_pallas", False):
            return 0
        ndrop = 1
    elif isinstance(cf, DeviceFq2):
        if not getattr(cf.df, "use_pallas", False):
            return 0
        ndrop = 2
    else:
        return 0
    import math

    shape = jnp.broadcast_shapes(
        *(c.shape[:-ndrop] for c in p), *(c.shape[:-ndrop] for c in q)
    )
    return math.prod(shape)


def ec_add(cf, p, q):
    """Complete Jacobian addition via selects (handles inf, P==Q, P==-Q)."""
    from .pallas_field import PALLAS_MIN_BATCH

    if _pallas_ec_batch(cf, p, q) >= PALLAS_MIN_BATCH:
        from .pallas_ec import ec_add_pallas

        return ec_add_pallas(cf, p, q)
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    Z1Z1 = cf.sqr(Z1)
    Z2Z2 = cf.sqr(Z2)
    U1 = cf.mul(X1, Z2Z2)
    U2 = cf.mul(X2, Z1Z1)
    S1 = cf.mul(Y1, cf.mul(Z2, Z2Z2))
    S2 = cf.mul(Y2, cf.mul(Z1, Z1Z1))
    H = cf.sub(U2, U1)
    r = cf.sub(S2, S1)
    xeq = cf.is_zero(H)
    yeq = cf.is_zero(r)
    HH = cf.sqr(H)
    HHH = cf.mul(H, HH)
    V = cf.mul(U1, HH)
    X3 = cf.sub(cf.sub(cf.sqr(r), HHH), cf.add(V, V))
    Y3 = cf.sub(cf.mul(r, cf.sub(V, X3)), cf.mul(S1, HHH))
    Z3 = cf.mul(cf.mul(Z1, Z2), H)
    general = (X3, Y3, Z3)  # P == -Q gives H=0 -> Z3=0 -> infinity, free
    res = point_select(cf, xeq & yeq, ec_double(cf, p), general)
    res = point_select(cf, is_infinity(cf, q), p, res)
    res = point_select(cf, is_infinity(cf, p), q, res)
    return res


def ec_neg(cf, p):
    return (p[0], cf.neg(p[1]), p[2])


def ec_scalar_mul_fixed(cf, p, k: int):
    """p * static-int k (double-and-add; for tests/small host-free paths)."""
    acc = point_infinity(cf, p[0].shape[: -1 if isinstance(cf, DeviceField) else -2])
    base = p
    while k > 0:
        if k & 1:
            acc = ec_add(cf, acc, base)
        base = ec_double(cf, base)
        k >>= 1
    return acc


def to_affine(cf, p):
    """Batch-normalize Jacobian -> affine (x, y, inf_mask) on device."""
    X, Y, Z = p
    zinv = cf.batch_inv(Z)  # zeros stay zero
    zinv2 = cf.sqr(zinv)
    x = cf.mul(X, zinv2)
    y = cf.mul(Y, cf.mul(zinv, zinv2))
    return x, y, is_infinity(cf, p)
