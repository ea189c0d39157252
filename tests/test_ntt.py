"""NTT domain vs a naive host-side polynomial oracle."""

import random

import pytest

from ckb_zkp_tpu.host.pairing import get_curve
from ckb_zkp_tpu.ops.field import device_field
from ckb_zkp_tpu.ops.ntt import get_domain

RNG = random.Random(7)


@pytest.fixture(scope="module", params=["bn254", "bls12_381"])
def fr(request):
    return get_curve(request.param).fr


def poly_eval(coeffs, x, p):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % p
    return acc


@pytest.mark.parametrize("n", [1, 2, 8, 64])
def test_ntt_matches_naive_eval(fr, n):
    p = fr.modulus
    df = device_field(fr)
    dom = get_domain(fr, n)
    coeffs = [RNG.randrange(p) for _ in range(n)]
    evals = df.decode(dom.ntt(df.encode(coeffs)))
    w = dom.omega
    expect = [poly_eval(coeffs, pow(w, i, p), p) for i in range(n)]
    assert evals == expect


@pytest.mark.parametrize("n", [8, 64])
def test_intt_roundtrip(fr, n):
    p = fr.modulus
    df = device_field(fr)
    dom = get_domain(fr, n)
    coeffs = [RNG.randrange(p) for _ in range(n)]
    back = df.decode(dom.intt(dom.ntt(df.encode(coeffs))))
    assert back == coeffs


def test_coset_roundtrip_and_eval(fr):
    n, p = 32, fr.modulus
    df = device_field(fr)
    dom = get_domain(fr, n)
    coeffs = [RNG.randrange(p) for _ in range(n)]
    on_coset = df.decode(dom.coset_ntt(df.encode(coeffs)))
    g, w = dom.coset_g, dom.omega
    expect = [poly_eval(coeffs, g * pow(w, i, p) % p, p) for i in range(n)]
    assert on_coset == expect
    back = df.decode(dom.coset_intt(dom.coset_ntt(df.encode(coeffs))))
    assert back == coeffs


def test_qap_style_vanishing_division(fr):
    """The Groth16 h-poly flow: h = coset_intt((ab - c)_coset / (g^n - 1)).

    Mirrors /root/reference/groth16/src/r1cs_to_qap.rs:144-170.
    """
    n, p = 16, fr.modulus
    df = device_field(fr)
    dom = get_domain(fr, n)
    a = [RNG.randrange(p) for _ in range(n)]
    b = [RNG.randrange(p) for _ in range(n)]
    # host: full product P = a*b (deg <= 2n-2), split P = c + Z*h with deg c < n
    P = [0] * (2 * n - 1)
    for i, ai in enumerate(a):
        for j, bj in enumerate(b):
            P[i + j] = (P[i + j] + ai * bj) % p
    h = P[n:] + [0]  # quotient coeffs (deg <= n-2), padded to n
    c = [(P[i] + P[n + i]) % p if i < n - 1 else P[i] for i in range(n)]
    # device: pointwise on the coset, divide by constant Z, interpolate
    ab_ev = df.mul(dom.coset_ntt(df.encode(a)), dom.coset_ntt(df.encode(b)))
    num = df.sub(ab_ev, dom.coset_ntt(df.encode(c)))
    h_dev = df.decode(dom.coset_intt(dom.divide_by_vanishing_poly_on_coset(num)))
    assert h_dev == h


def test_lagrange_coefficients(fr):
    n, p = 16, fr.modulus
    df = device_field(fr)
    dom = get_domain(fr, n)
    tau = RNG.randrange(p)
    ls = df.decode(dom.evaluate_all_lagrange_coefficients(tau))
    w = dom.omega
    # oracle: L_i(tau) = prod_{j!=i} (tau - w^j)/(w^i - w^j)
    xs = [pow(w, i, p) for i in range(n)]
    for i in [0, 1, 7, 15]:
        num, den = 1, 1
        for j in range(n):
            if j != i:
                num = num * (tau - xs[j]) % p
                den = den * (xs[i] - xs[j]) % p
        assert ls[i] == num * pow(den, -1, p) % p


def test_lagrange_at_domain_point(fr):
    n = 8
    df = device_field(fr)
    dom = get_domain(fr, n)
    tau = pow(dom.omega, 3, fr.modulus)
    ls = df.decode(dom.evaluate_all_lagrange_coefficients(tau))
    assert ls == [0, 0, 0, 1, 0, 0, 0, 0]
