"""Host-side short-Weierstrass elliptic curve groups (exact, Python ints).

Generic over the coordinate field so the same code serves G1 (Fq), G2 (Fq2)
and the untwisted E(Fq12) needed by the Miller loop.

Parity: replaces `ark-ec`'s `AffineCurve/ProjectiveCurve` host types used by
the reference (e.g. /root/reference/curve/src/lib.rs:20-46). Bulk scalar-muls
and MSMs run on TPU (ops/msm.py); this layer is the O(1) verifier/oracle path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Generic, TypeVar

F = TypeVar("F")


class FieldOps(Generic[F]):
    """Minimal field interface for generic curve formulas."""

    zero: F
    one: F

    def add(self, a: F, b: F) -> F: ...
    def sub(self, a: F, b: F) -> F: ...
    def mul(self, a: F, b: F) -> F: ...
    def neg(self, a: F) -> F: ...
    def inv(self, a: F) -> F: ...

    def sqr(self, a: F) -> F:
        return self.mul(a, a)

    def eq(self, a: F, b: F) -> bool:
        return a == b

    def is_zero(self, a: F) -> bool:
        return self.eq(a, self.zero)

    def scalar(self, a: F, k: int) -> F:
        """a * small-int k."""
        r = self.zero
        base = a
        while k > 0:
            if k & 1:
                r = self.add(r, base)
            base = self.add(base, base)
            k >>= 1
        return r


class IntField(FieldOps[int]):
    def __init__(self, q: int):
        self.q = q
        self.zero = 0
        self.one = 1

    def add(self, a, b):
        return (a + b) % self.q

    def sub(self, a, b):
        return (a - b) % self.q

    def mul(self, a, b):
        return a * b % self.q

    def neg(self, a):
        return -a % self.q

    def inv(self, a):
        return pow(a, -1, self.q)

    def scalar(self, a, k):
        return a * k % self.q


class Fq2Field(FieldOps):
    def __init__(self, tower):
        self.t = tower
        self.zero = (0, 0)
        self.one = (1, 0)

    def add(self, a, b):
        return self.t.f2_add(a, b)

    def sub(self, a, b):
        return self.t.f2_sub(a, b)

    def mul(self, a, b):
        return self.t.f2_mul(a, b)

    def neg(self, a):
        return self.t.f2_neg(a)

    def inv(self, a):
        return self.t.f2_inv(a)

    def scalar(self, a, k):
        return self.t.f2_scalar(a, k)


class Fq12Field(FieldOps):
    def __init__(self, tower):
        self.t = tower
        self.zero = tower.ZERO12
        self.one = tower.ONE12

    def add(self, a, b):
        return self.t.f12_add(a, b)

    def sub(self, a, b):
        return self.t.f12_sub(a, b)

    def mul(self, a, b):
        return self.t.f12_mul(a, b)

    def neg(self, a):
        return self.t.f12_sub(self.t.ZERO12, a)

    def inv(self, a):
        return self.t.f12_inv(a)


@dataclass
class AffinePoint(Generic[F]):
    """Affine point; ``infinity=True`` ignores x/y (mirrors ark's SW affine)."""

    x: F
    y: F
    infinity: bool = False

    def __eq__(self, other: object) -> bool:
        if not isinstance(other, AffinePoint):
            return NotImplemented
        if self.infinity or other.infinity:
            return self.infinity == other.infinity
        return self.x == other.x and self.y == other.y

    def __hash__(self):
        return hash(("pt", repr(self.x), repr(self.y), self.infinity))


class WeierstrassGroup(Generic[F]):
    """y^2 = x^3 + a*x + b over a FieldOps instance."""

    def __init__(self, field: FieldOps[F], a: F, b: F, order: int):
        self.f = field
        self.a = a
        self.b = b
        self.order = order  # prime subgroup order r

    @property
    def infinity(self) -> AffinePoint[F]:
        return AffinePoint(self.f.zero, self.f.zero, True)

    def is_on_curve(self, p: AffinePoint[F]) -> bool:
        if p.infinity:
            return True
        f = self.f
        lhs = f.sqr(p.y)
        rhs = f.add(f.add(f.mul(f.sqr(p.x), p.x), f.mul(self.a, p.x)), self.b)
        return f.eq(lhs, rhs)

    def neg(self, p: AffinePoint[F]) -> AffinePoint[F]:
        if p.infinity:
            return p
        return AffinePoint(p.x, self.f.neg(p.y))

    def double(self, p: AffinePoint[F]) -> AffinePoint[F]:
        if p.infinity:
            return p
        f = self.f
        if f.is_zero(p.y):
            return self.infinity
        # lambda = (3x^2 + a) / 2y
        num = f.add(f.scalar(f.sqr(p.x), 3), self.a)
        lam = f.mul(num, f.inv(f.scalar(p.y, 2)))
        x3 = f.sub(f.sqr(lam), f.scalar(p.x, 2))
        y3 = f.sub(f.mul(lam, f.sub(p.x, x3)), p.y)
        return AffinePoint(x3, y3)

    def add(self, p: AffinePoint[F], q: AffinePoint[F]) -> AffinePoint[F]:
        if p.infinity:
            return q
        if q.infinity:
            return p
        f = self.f
        if f.eq(p.x, q.x):
            if f.eq(p.y, q.y):
                return self.double(p)
            return self.infinity
        lam = f.mul(f.sub(q.y, p.y), f.inv(f.sub(q.x, p.x)))
        x3 = f.sub(f.sub(f.sqr(lam), p.x), q.x)
        y3 = f.sub(f.mul(lam, f.sub(p.x, x3)), p.y)
        return AffinePoint(x3, y3)

    def sub(self, p: AffinePoint[F], q: AffinePoint[F]) -> AffinePoint[F]:
        return self.add(p, self.neg(q))

    def mul(self, p: AffinePoint[F], k: int) -> AffinePoint[F]:
        k %= self.order
        r = self.infinity
        base = p
        while k > 0:
            if k & 1:
                r = self.add(r, base)
            base = self.double(base)
            k >>= 1
        return r

    def msm(self, points: list[AffinePoint[F]], scalars: list[int]) -> AffinePoint[F]:
        """Naive host MSM (oracle for the TPU Pippenger kernel; small inputs only)."""
        acc = self.infinity
        for p, s in zip(points, scalars):
            acc = self.add(acc, self.mul(p, s))
        return acc
