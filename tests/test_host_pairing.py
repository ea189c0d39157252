"""Host math layer: curve/group sanity and pairing bilinearity.

Mirrors the reference's reliance on arkworks-tested pairings
(/root/reference/groth16/src/verifier.rs:32-43): we validate generators lie on
their curves, have order r, and that e(aP, bQ) == e(P, Q)^(ab).
"""

import pytest

from ckb_zkp_tpu.host.pairing import get_curve


@pytest.fixture(scope="module", params=["bn254", "bls12_381"])
def curve(request):
    return get_curve(request.param)


def test_generators_on_curve(curve):
    assert curve.g1.is_on_curve(curve.g1_gen)
    assert curve.g2.is_on_curve(curve.g2_gen)


def test_generator_order(curve):
    r = curve.fr.modulus
    assert curve.g1.mul(curve.g1_gen, r).infinity
    assert curve.g2.mul(curve.g2_gen, r).infinity
    assert not curve.g1.mul(curve.g1_gen, r - 1).infinity


def test_two_adic_roots(curve):
    for spec in (curve.fr, curve.fq):
        root = spec.two_adic_root
        assert pow(root, 1 << (spec.two_adicity - 1), spec.modulus) == spec.modulus - 1


def test_pairing_bilinearity(curve):
    t = curve.tower
    a, b = 12345, 98765
    P, Q = curve.g1_gen, curve.g2_gen
    e_ab = curve.pairing(curve.g1.mul(P, a), curve.g2.mul(Q, b))
    e_base = curve.pairing(P, Q)
    assert e_ab == t.f12_pow(e_base, a * b)
    assert e_base != t.ONE12
    # e(aP, Q) * e(-aP, Q) == 1
    prod = curve.product_of_pairings(
        [(curve.g1.mul(P, a), Q), (curve.g1.neg(curve.g1.mul(P, a)), Q)]
    )
    assert prod == t.ONE12


def test_pairing_nondegenerate_and_unit(curve):
    t = curve.tower
    assert curve.pairing(curve.g1.infinity, curve.g2_gen) == t.ONE12
    assert curve.pairing(curve.g1_gen, curve.g2.infinity) == t.ONE12
