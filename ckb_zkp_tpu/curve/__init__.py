"""Curve registry and abstraction.

Parity: the `zkp-curve` crate (/root/reference/curve/src/lib.rs:20-53) — a
single trait unifying pairing and non-pairing groups behind `Fr/Fq/Affine` +
an MSM entry point. Here the registry hands out the host `PairingCurve`
(exact math + pairings) together with its device groups (Pippenger MSM);
`vartime_multiscalar_mul` routes to host ints for small batches and the
device kernel otherwise, mirroring the reference's `Curve::
vartime_multiscalar_mul` default.

The non-pairing Ristretto25519 backend (reference `zkp-curve25519`,
host/ristretto.py) plugs into the same registry: Spartan/Hyrax/Bulletproofs
only touch `fr`, `g1` group ops, and `g1_gen`, so they run on it unchanged.
"""

from __future__ import annotations

from ..host.curves import AffinePoint
from ..host.pairing import PairingCurve, get_curve
from ..host.ristretto import Curve25519
from ..ops.msm import DeviceCurveGroup, device_group

SUPPORTED = ("bn254", "bls12_381", "curve25519")


def curves() -> tuple[str, ...]:
    return SUPPORTED


class Curve:
    """Unified view: host groups + device MSM for one named curve."""

    def __init__(self, name: str):
        if name == "curve25519":
            c = Curve25519()
            self.inner = c
            self.name = c.name
            self.fr = c.fr
            self.fq = c.fq
            self.g1 = c.g1
            self.g2 = None
            self.g1_gen = c.g1_gen
            self.g2_gen = None
            return
        self.inner: PairingCurve = get_curve(name)
        self.name = self.inner.name
        self.fr = self.inner.fr
        self.fq = self.inner.fq
        self.g1 = self.inner.g1
        self.g2 = self.inner.g2
        self.g1_gen = self.inner.g1_gen
        self.g2_gen = self.inner.g2_gen

    def device(self, group: str = "g1") -> DeviceCurveGroup:
        if self.name == "curve25519":
            from ..ops.ristretto_device import device_ristretto_group

            return device_ristretto_group()
        return device_group(self.inner, group)

    def vartime_multiscalar_mul(
        self, scalars: list[int], points: list[AffinePoint], group: str = "g1"
    ) -> AffinePoint:
        dg = self.device(group)
        if len(points) <= dg.small_host_threshold:
            host = self.g1 if group == "g1" else self.g2
            return host.msm(points, scalars)
        P = dg.encode_points(points)
        s = dg.encode_scalars(scalars)
        return dg.decode_point(dg.msm(P, s))

    def pairing(self, p: AffinePoint, q: AffinePoint):
        if self.name == "curve25519":
            raise NotImplementedError("curve25519 is a non-pairing group")
        return self.inner.pairing(p, q)
