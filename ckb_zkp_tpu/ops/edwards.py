"""Device twisted-Edwards point arithmetic for ristretto255 (curve25519).

Fills the SURVEY §2.1 obligation "curve25519 field (2^255-19) + Ristretto
group kernels (for Spartan/Hyrax/Bulletproofs configs on curve25519)" — the
reference delegates these to `curve25519-dalek`
(/root/reference/curve25519/src/group.rs:29-47).

TPU-first: extended coordinates (X, Y, Z, T) with a = -1. The unified
addition (add-2008-hwcd-3) is *complete* on the Ristretto quotient group —
identity, doubling, and inverse cases all fall out of the same 8-mul formula
with zero `where` selects, which makes the Edwards combiner ~2x cheaper per
traced op than the Weierstrass complete add in ops/ec.py. Points are pytrees
(X, Y, Z, T) of (..., L) uint32 Montgomery limb arrays over Fq = 2^255-19.
"""

from __future__ import annotations

import jax.numpy as jnp

from .field import DeviceField


def ed_identity(df: DeviceField, batch_shape=()):
    """(0, 1, 1, 0) — the Edwards identity; valid input to ed_add/ed_double."""
    return (
        df.zeros(batch_shape),
        df.ones(batch_shape),
        df.ones(batch_shape),
        df.zeros(batch_shape),
    )


def ed_add(df: DeviceField, d2_mont: jnp.ndarray, p, q):
    """Unified extended addition, a = -1 (add-2008-hwcd-3): 8M + 8add.

    `d2_mont` is the Montgomery-form constant 2*d. Complete for all inputs in
    the prime-order Ristretto subgroup (incl. P==Q, P==-Q, identity) — the
    same completeness the host RistrettoGroup.add relies on
    (host/ristretto.py).
    """
    X1, Y1, Z1, T1 = p
    X2, Y2, Z2, T2 = q
    A = df.mul(df.sub(Y1, X1), df.sub(Y2, X2))
    B = df.mul(df.add(Y1, X1), df.add(Y2, X2))
    C = df.mul(df.mul(T1, d2_mont), T2)
    D = df.mul(Z1, Z2)
    D = df.add(D, D)
    E = df.sub(B, A)
    F = df.sub(D, C)
    G = df.add(D, C)
    H = df.add(B, A)
    return (df.mul(E, F), df.mul(G, H), df.mul(F, G), df.mul(E, H))


def ed_double(df: DeviceField, p):
    """Dedicated doubling (dbl-2008-hwcd), a = -1: 4M + 4S. Identity-safe."""
    X1, Y1, Z1, _ = p
    A = df.sqr(X1)
    B = df.sqr(Y1)
    Zsq = df.sqr(Z1)
    C = df.add(Zsq, Zsq)
    H = df.add(A, B)
    XY = df.add(X1, Y1)
    E = df.sub(H, df.sqr(XY))
    G = df.sub(A, B)
    F = df.add(C, G)
    return (df.mul(E, F), df.mul(G, H), df.mul(F, G), df.mul(E, H))


def ed_neg(df: DeviceField, p):
    X, Y, Z, T = p
    return (df.neg(X), Y, Z, df.neg(T))
