"""Complete projective short-Weierstrass point ops (Renes–Costello–Batina).

The MSM/fixed-base hot paths accumulate with these instead of the Jacobian
complete-add in ops/ec.py: for a = 0 curves (BN254, BLS12-381, both groups)
the RCB formulas are *complete* — one branch-free formula covers P == Q,
P == -Q and either operand at infinity (encoded (0 : 1 : 0)) — so the VPU
never pays the Jacobian path's always-on doubling branch and completeness
selects. Costs: add 12M, mixed add 11M, double 8M (+2 multiplications by
3b, which collapse to a handful of additions when 3b is a small integer —
G1 of both curves — and to one constant multiply for the G2 twists).

Reference counterpart: arkworks' `ProjectiveCurve` add/double used inside
`VariableBaseMSM`/`FixedBaseMSM` (SURVEY.md §2.1); formulas are Algorithms
7-9 of Renes–Costello–Batina 2016 (eprint 2015/1060) for a = 0.

Representation: homogeneous projective (X : Y : Z), x = X/Z, y = Y/Z —
NOT the Jacobian (X/Z^2, X/Z^3) used elsewhere; `to_jacobian` converts (3
muls) so MSM results re-enter the framework's Jacobian surfaces unchanged.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .ec import DeviceFq2
from .field import DeviceField


def _small_mul(cf, x, n: int):
    """n * x for a tiny static int n via double-and-add on field adds."""
    assert n >= 1
    result = None
    base = x
    while n:
        if n & 1:
            result = base if result is None else cf.add(result, base)
        n >>= 1
        if n:
            base = cf.add(base, base)
    return result


class RcbGroup:
    """RCB complete-formula ops over a coordinate field (Fq or Fq2).

    `b` is the curve constant (int for G1, (c0, c1) ints for G2 twists).
    """

    SMALL_B3_MAX = 1 << 10

    def __init__(self, cf, b):
        self.cf = cf
        if isinstance(cf, DeviceFq2):
            df = cf.df
            p = df.spec.modulus
            b0, b1 = b
            b3 = (3 * b0 % p, 3 * b1 % p)
            if b3[1] == 0 and 0 < b3[0] <= self.SMALL_B3_MAX:
                self.b3_small: int | None = b3[0]
                self.b3_const = None
            else:
                self.b3_small = None
                # numpy, NOT jnp: RcbGroup may be first built inside a jit
                # trace, and a traced constant cached here would leak
                self.b3_const = np.asarray(df.encode(list(b3))).reshape(
                    2, df.L
                )
        else:
            assert isinstance(cf, DeviceField)
            p = cf.spec.modulus
            b3 = 3 * b % p
            if 0 < b3 <= self.SMALL_B3_MAX:
                self.b3_small = b3
                self.b3_const = None
            else:
                self.b3_small = None
                self.b3_const = np.asarray(cf.encode([b3])).reshape(cf.L)

    # ---- identity (0 : 1 : 0) ----
    def identity(self, batch_shape=()):
        cf = self.cf
        return (cf.zeros(batch_shape), cf.ones(batch_shape), cf.zeros(batch_shape))

    def is_identity(self, p):
        return self.cf.is_zero(p[2])

    def neg(self, p):
        return (p[0], self.cf.neg(p[1]), p[2])

    def mul_b3(self, t):
        if self.b3_small is not None:
            return _small_mul(self.cf, t, self.b3_small)
        return self.cf.mul(t, self.b3_const)

    # ---- Algorithm 7: complete projective add, a = 0 ----
    def add(self, p, q):
        cf = self.cf
        X1, Y1, Z1 = p
        X2, Y2, Z2 = q
        t0 = cf.mul(X1, X2)
        t1 = cf.mul(Y1, Y2)
        t2 = cf.mul(Z1, Z2)
        t3 = cf.mul(cf.add(X1, Y1), cf.add(X2, Y2))
        t3 = cf.sub(t3, cf.add(t0, t1))  # X1Y2 + X2Y1
        t4 = cf.mul(cf.add(Y1, Z1), cf.add(Y2, Z2))
        t4 = cf.sub(t4, cf.add(t1, t2))  # Y1Z2 + Y2Z1
        X3 = cf.mul(cf.add(X1, Z1), cf.add(X2, Z2))
        Y3 = cf.sub(X3, cf.add(t0, t2))  # X1Z2 + X2Z1
        X3 = cf.add(t0, t0)
        t0 = cf.add(X3, t0)  # 3 X1X2
        t2 = self.mul_b3(t2)  # 3b Z1Z2
        Z3 = cf.add(t1, t2)
        t1 = cf.sub(t1, t2)
        Y3 = self.mul_b3(Y3)  # 3b (X1Z2 + X2Z1)
        X3 = cf.sub(cf.mul(t3, t1), cf.mul(t4, Y3))
        Y3 = cf.add(cf.mul(t1, Z3), cf.mul(Y3, t0))
        Z3 = cf.add(cf.mul(Z3, t4), cf.mul(t0, t3))
        return (X3, Y3, Z3)

    # ---- Algorithm 8: mixed add (Q affine, Z2 = 1), a = 0 ----
    def madd_noinf(self, p, xy2):
        """p + (x2, y2, 1); q must NOT be the identity."""
        cf = self.cf
        X1, Y1, Z1 = p
        X2, Y2 = xy2
        t0 = cf.mul(X1, X2)
        t1 = cf.mul(Y1, Y2)
        t3 = cf.mul(cf.add(X2, Y2), cf.add(X1, Y1))
        t3 = cf.sub(t3, cf.add(t0, t1))  # X1Y2 + X2Y1
        t4 = cf.add(cf.mul(X2, Z1), X1)  # X2Z1 + X1
        t5 = cf.add(cf.mul(Y2, Z1), Y1)  # Y2Z1 + Y1
        X3 = cf.add(t0, t0)
        t0 = cf.add(X3, t0)  # 3 X1X2
        t2 = self.mul_b3(Z1)  # 3b Z1
        Z3 = cf.add(t1, t2)
        t1 = cf.sub(t1, t2)
        Y3 = self.mul_b3(t4)  # 3b (X2Z1 + X1)
        X3 = cf.sub(cf.mul(t3, t1), cf.mul(t5, Y3))
        Y3 = cf.add(cf.mul(t1, Z3), cf.mul(Y3, t0))
        Z3 = cf.add(cf.mul(Z3, t5), cf.mul(t0, t3))
        return (X3, Y3, Z3)

    def madd(self, p, q_affine):
        """p + Q where Q = (x2, y2, inf_mask) may be the identity."""
        from .ec import point_select

        x2, y2, inf2 = q_affine
        out = self.madd_noinf(p, (x2, y2))
        return point_select(self.cf, inf2, p, out)

    # ---- Algorithm 9: doubling, a = 0 ----
    def double(self, p):
        cf = self.cf
        X, Y, Z = p
        t0 = cf.sqr(Y)
        Z3 = cf.add(t0, t0)
        Z3 = cf.add(Z3, Z3)
        Z3 = cf.add(Z3, Z3)  # 8 Y^2
        t1 = cf.mul(Y, Z)
        t2 = self.mul_b3(cf.sqr(Z))  # 3b Z^2
        X3 = cf.mul(t2, Z3)
        Y3 = cf.add(t0, t2)
        Z3 = cf.mul(t1, Z3)
        t1 = cf.add(t2, t2)
        t2 = cf.add(t1, t2)
        t0 = cf.sub(t0, t2)
        Y3 = cf.add(X3, cf.mul(t0, Y3))
        X3 = cf.mul(cf.add(cf.mul(X, Y), cf.mul(X, Y)), t0)
        return (X3, Y3, Z3)

    # ---- conversions ----
    def from_affine_enc(self, P):
        """Affine-encoded Jacobian (X, Y, Z in {0, one}) -> projective.

        Finite points map to (X : Y : 1); infinity (Z = 0) must map to
        (0 : 1 : 0) — X/Y are forced so the formulas see the identity.
        """
        from .ec import point_select

        X, Y, Z = P
        inf = self.cf.is_zero(Z)
        return point_select(self.cf, inf, self.identity(inf.shape), (X, Y, Z))

    def to_jacobian(self, p):
        """Projective -> Jacobian with the same affine value: (XZ, YZ^2, Z).

        The identity (0 : 1 : 0) maps to Z = 0, the framework's Jacobian
        infinity encoding — no select needed."""
        cf = self.cf
        X, Y, Z = p
        z2 = cf.sqr(Z)
        return (cf.mul(X, Z), cf.mul(Y, z2), Z)


def rcb_group(dg) -> RcbGroup:
    """RcbGroup for a DeviceCurveGroup (cached on the instance)."""
    g = getattr(dg, "_rcb", None)
    if g is None:
        g = dg._rcb = RcbGroup(dg.cf, dg.host_group.b)
    return g
