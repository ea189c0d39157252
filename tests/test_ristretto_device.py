"""Device twisted-Edwards kernels + ristretto255 Pippenger MSM vs host oracle."""

import random

import pytest

from ckb_zkp_tpu.host.ristretto import BASEPOINT, IDENTITY, Curve25519, RistrettoGroup
from ckb_zkp_tpu.ops.ristretto_device import DeviceRistrettoGroup


@pytest.fixture(scope="module")
def dg():
    g = DeviceRistrettoGroup(Curve25519())
    g.small_host_threshold = 0  # force the device path under test
    return g


@pytest.fixture(scope="module")
def host():
    return RistrettoGroup()


def _rand_points(host, rng, n):
    return [host.mul(BASEPOINT, rng.randrange(1, host.order)) for _ in range(n)]


def test_encode_decode_roundtrip(dg, host):
    rng = random.Random(7)
    pts = _rand_points(host, rng, 5) + [IDENTITY]
    back = dg.decode_points(dg.encode_points(pts))
    assert all(a == b for a, b in zip(back, pts))


def test_device_add_double_neg(dg, host):
    import jax

    rng = random.Random(11)
    a, b = _rand_points(host, rng, 2)
    A = dg.encode_points([a, a, a, IDENTITY])
    B = dg.encode_points([b, a, IDENTITY, b])
    got = dg.decode_points(jax.jit(dg.p_add)(A, B))
    want = [host.add(a, b), host.add(a, a), a, b]
    assert got == want
    got2 = dg.decode_points(jax.jit(dg.p_double)(A))
    assert got2[:3] == [host.double(a)] * 3 and got2[3] == IDENTITY
    got3 = dg.decode_points(jax.jit(dg.p_neg)(A))
    assert got3[0] == host.neg(a)
    # P + (-P) = identity through the unified formula
    got4 = dg.decode_points(jax.jit(dg.p_add)(A, jax.jit(dg.p_neg)(A)))
    assert got4[0] == IDENTITY


@pytest.mark.parametrize("n", [1, 3, 17, 70])
def test_device_msm_matches_host(dg, host, n):
    rng = random.Random(n)
    pts = _rand_points(host, rng, n)
    scalars = [rng.randrange(host.order) for _ in range(n)]
    if n > 2:
        scalars[1] = 0
        pts[2] = IDENTITY
    want = host.msm(pts, scalars)
    got = dg.decode_point(dg.msm(dg.encode_points(pts), dg.encode_scalars(scalars)))
    assert got == want


def test_fixed_base_msm(dg, host):
    rng = random.Random(3)
    scalars = [rng.randrange(host.order) for _ in range(9)]
    fb = dg.fixed_base(BASEPOINT)
    got = dg.decode_points(dg.fixed_base_msm(fb.table, dg.encode_scalars(scalars)))
    want = [host.mul(BASEPOINT, s) for s in scalars]
    assert got == want


def test_registry_vartime_msm_routes_to_device():
    from ckb_zkp_tpu.curve import Curve

    c = Curve("curve25519")
    dg = c.device()
    assert isinstance(dg, DeviceRistrettoGroup)
    rng = random.Random(5)
    host = c.g1
    pts = [host.mul(BASEPOINT, rng.randrange(1, host.order)) for _ in range(4)]
    scalars = [rng.randrange(host.order) for _ in range(4)]
    # small batch -> host path; still must agree with direct device MSM
    want = host.msm(pts, scalars)
    assert c.vartime_multiscalar_mul(scalars, pts) == want
