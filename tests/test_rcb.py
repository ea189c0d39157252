"""RCB complete projective formulas vs the host curve oracle."""

import random

import jax
import pytest

from ckb_zkp_tpu.host.pairing import get_curve
from ckb_zkp_tpu.ops.msm import device_group
from ckb_zkp_tpu.ops.rcb import rcb_group

RNG = random.Random(7)


@pytest.fixture(scope="module", params=["bn254", "bls12_381"])
def curve(request):
    return get_curve(request.param)


def rand_points(curve, group, n):
    g = curve.g1 if group == "g1" else curve.g2
    gen = curve.g1_gen if group == "g1" else curve.g2_gen
    return [g.mul(gen, RNG.randrange(1, curve.fr.modulus)) for _ in range(n)]


def decode(dg, rg, p):
    return dg.decode_points_host(rg.to_jacobian(p))


@pytest.mark.parametrize("group", ["g1", "g2"])
def test_rcb_add_double_vs_host(curve, group):
    dg = device_group(curve, group)
    rg = rcb_group(dg)
    host = dg.host_group
    pts = rand_points(curve, group, 4)
    qts = rand_points(curve, group, 4)
    P = rg.from_affine_enc(dg.encode_points(pts))
    Q = rg.from_affine_enc(dg.encode_points(qts))
    assert decode(dg, rg, rg.add(P, Q)) == [
        host.add(a, b) for a, b in zip(pts, qts)
    ]
    assert decode(dg, rg, rg.double(P)) == [host.double(a) for a in pts]
    # add is complete: P + P must equal double
    assert decode(dg, rg, rg.add(P, P)) == [host.double(a) for a in pts]


@pytest.mark.parametrize("group", ["g1", "g2"])
def test_rcb_edge_cases(curve, group):
    dg = device_group(curve, group)
    rg = rcb_group(dg)
    host = dg.host_group
    a = rand_points(curve, group, 1)[0]
    neg_a = host.neg(a)
    inf = host.infinity
    pts = [a, a, inf, a, inf]
    qts = [neg_a, inf, a, a, inf]
    P = rg.from_affine_enc(dg.encode_points(pts))
    Q = rg.from_affine_enc(dg.encode_points(qts))
    assert decode(dg, rg, rg.add(P, Q)) == [
        host.add(x, y) for x, y in zip(pts, qts)
    ]
    # doubling the identity stays the identity
    ident = rg.identity((2,))
    assert decode(dg, rg, rg.double(ident)) == [inf, inf]
    assert decode(dg, rg, rg.neg(P)) == [host.neg(x) for x in pts]


@pytest.mark.parametrize("group", ["g1", "g2"])
def test_rcb_madd_vs_host(curve, group):
    dg = device_group(curve, group)
    rg = rcb_group(dg)
    host = dg.host_group
    a = rand_points(curve, group, 1)[0]
    pts = rand_points(curve, group, 3) + [a, a, host.infinity, a]
    qts = rand_points(curve, group, 3) + [a, host.neg(a), a, host.infinity]
    P = rg.from_affine_enc(dg.encode_points(pts))
    X, Y, Z = dg.encode_points(qts)
    got = decode(dg, rg, rg.madd(P, (X, Y, dg.cf.is_zero(Z))))
    assert got == [host.add(x, y) for x, y in zip(pts, qts)]
    # identity accumulator + affine leaf (the scan kernels' first step)
    ident = rg.identity((len(qts),))
    got0 = decode(dg, rg, rg.madd(ident, (X, Y, dg.cf.is_zero(Z))))
    assert got0 == qts


def test_rcb_jit_composes(curve):
    """The formulas must trace/jit cleanly (they feed lax loops in MSM)."""
    dg = device_group(curve, "g1")
    rg = rcb_group(dg)
    host = dg.host_group
    pts = rand_points(curve, "g1", 2)
    P = rg.from_affine_enc(dg.encode_points(pts))

    @jax.jit
    def chain(P):
        return rg.to_jacobian(rg.add(rg.double(P), P))

    got = dg.decode_points_host(chain(P))
    assert got == [host.mul(p, 3) for p in pts]
