"""Device Pippenger MSM over the ristretto255 group (curve25519).

Completes the curve25519 column of SURVEY §2.1: the reference delegates this
group's MSM to `curve25519-dalek`'s `VartimeMultiscalarMul`
(/root/reference/curve25519/src/group.rs:29-47); here the same windowed
Pippenger machinery as the pairing curves (ops/msm.py) runs over device
twisted-Edwards kernels (ops/edwards.py). Spartan/Hyrax/Bulletproofs on
curve25519 get large commitment MSMs on TPU instead of host ints.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..host import ristretto as rhost
from ..host.ristretto import Curve25519, RistrettoPoint
from .edwards import ed_add, ed_double, ed_identity, ed_neg
from .field import device_field
from .limbs import BASE_BITS, ints_to_limbs
from .msm import DeviceCurveGroup


class DeviceRistrettoGroup(DeviceCurveGroup):
    """Pippenger over extended-Edwards (X, Y, Z, T) device points.

    Reuses DeviceCurveGroup's window scan / fixed-base machinery through the
    pluggable p_add/p_double/p_neg/p_identity point ops; only the point
    representation (4 coords, unified complete addition, no selects) and the
    host<->device codecs differ.
    """

    def __init__(self, curve: Curve25519, window_bits: int = 8):
        assert window_bits in (1, 2, 4, 8, 16)
        self.curve = curve
        self.group = "ristretto"
        self.c = window_bits
        self.nb = 1 << window_bits
        self.fq = device_field(curve.fq)  # 2^255 - 19
        self.fr = device_field(curve.fr)  # group order l = 2^252 + delta
        self.cf = self.fq
        self.host_group = curve.g1
        self.nwindows = self.fr.L * BASE_BITS // self.c
        self.small_host_threshold = 512 if jax.default_backend() == "cpu" else 0
        self._fb_chunk = 1 << 15
        self._d2 = jnp.asarray(
            np.asarray(self.fq.const(2 * rhost.D % rhost.P))
        )
        self._msm_jit = jax.jit(self._msm_impl)
        self._fixed_base_jit = jax.jit(self._fixed_base_impl)
        self._table = jax.jit(self._table_impl)
        # Edwards MSM has no affine-leaf fast path (_affine_leaves is False),
        # so fixed-base outputs need no normalization
        self._normalize_jit = lambda P: P

    def _normalize(self, P):
        # extended-Edwards (X, Y, Z, T): generic Z is fine downstream
        return P

    # ------------- point ops (twisted Edwards, a = -1) -------------
    def p_add(self, a, b):
        return ed_add(self.fq, self._d2, a, b)

    def p_double(self, a):
        return ed_double(self.fq, a)

    def p_neg(self, a):
        return ed_neg(self.fq, a)

    def p_identity(self, batch_shape=()):
        return ed_identity(self.fq, batch_shape)

    # ------------- host <-> device -------------
    def encode_points(self, pts: list[RistrettoPoint]):
        """Host extended points -> (X, Y, Z, T) Montgomery limb arrays."""
        P = rhost.P
        coords = [[], [], [], []]
        for pt in pts:
            for lst, v in zip(coords, (pt.X, pt.Y, pt.Z, pt.T)):
                lst.append(v % P)
        return tuple(self.fq.encode(c) for c in coords)

    def encode_point(self, pt: RistrettoPoint):
        P = self.encode_points([pt])
        return jax.tree.map(lambda c: c[0], P)

    def decode_points(self, p) -> list[RistrettoPoint]:
        return self.decode_points_host(p)

    def decode_points_host(self, p) -> list[RistrettoPoint]:
        """(X, Y, Z, T) device arrays -> host points (projective as-is; the
        host RistrettoPoint is projective-aware, no inversion needed)."""
        arrs = [np.asarray(jax.device_get(c)) for c in p]
        n = arrs[0].shape[0]
        out = []
        for i in range(n):
            x, y, z, t = (self._limbs_to_int_demont(a[i]) for a in arrs)
            out.append(RistrettoPoint(x, y, z, t))
        return out

    def encode_scalars(self, scalars: list[int]) -> jnp.ndarray:
        r = rhost.L
        return jnp.asarray(ints_to_limbs([s % r for s in scalars], self.fr.L))


@functools.lru_cache(maxsize=None)
def device_ristretto_group(window_bits: int = 8) -> DeviceRistrettoGroup:
    return DeviceRistrettoGroup(Curve25519(), window_bits)
