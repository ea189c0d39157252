"""Curve registry and abstraction.

Parity: the `zkp-curve` crate (/root/reference/curve/src/lib.rs:20-53) — a
single trait unifying pairing and non-pairing groups behind `Fr/Fq/Affine` +
an MSM entry point. Here the registry hands out the host `PairingCurve`
(exact math + pairings) together with its device groups (Pippenger MSM);
`vartime_multiscalar_mul` routes to host ints for small batches and the
device kernel otherwise, mirroring the reference's `Curve::
vartime_multiscalar_mul` default.

The non-pairing Ristretto25519 backend (reference `zkp-curve25519`) is
tracked for the next round; Spartan/Hyrax/Bulletproofs are already generic
over this interface.
"""

from __future__ import annotations

from ..host.curves import AffinePoint
from ..host.pairing import PairingCurve, get_curve
from ..ops.msm import DeviceCurveGroup, device_group

SUPPORTED = ("bn254", "bls12_381")


def curves() -> tuple[str, ...]:
    return SUPPORTED


class Curve:
    """Unified view: host groups + device MSM for one named curve."""

    def __init__(self, name: str):
        self.inner: PairingCurve = get_curve(name)
        self.name = self.inner.name
        self.fr = self.inner.fr
        self.fq = self.inner.fq
        self.g1 = self.inner.g1
        self.g2 = self.inner.g2
        self.g1_gen = self.inner.g1_gen
        self.g2_gen = self.inner.g2_gen

    def device(self, group: str = "g1") -> DeviceCurveGroup:
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
        return self.inner.pairing(p, q)
