"""Device Montgomery limb kernels vs the host Python-int oracle.

Conformance model mirrors the reference's reliance on arkworks field tests;
here the oracle is ckb_zkp_tpu.host.field (exact integers).
"""

import random

import numpy as np
import pytest

from ckb_zkp_tpu.host.pairing import get_curve
from ckb_zkp_tpu.ops.field import DeviceField

RNG = random.Random(0xC0FFEE)


def specs():
    bn = get_curve("bn254")
    bls = get_curve("bls12_381")
    return [bn.fr, bn.fq, bls.fr, bls.fq]


@pytest.fixture(scope="module", params=specs(), ids=lambda s: s.name)
def df(request):
    return DeviceField(request.param)


def rand_elems(spec, n):
    p = spec.modulus
    xs = [RNG.randrange(p) for _ in range(n - 3)] + [0, 1, p - 1]
    return xs


def test_roundtrip(df):
    xs = rand_elems(df.spec, 16)
    a = df.encode(xs)
    assert df.decode(a) == xs


def test_add_sub_neg(df):
    p = df.spec.modulus
    xs, ys = rand_elems(df.spec, 32), rand_elems(df.spec, 32)[::-1]
    a, b = df.encode(xs), df.encode(ys)
    assert df.decode(df.add(a, b)) == [(x + y) % p for x, y in zip(xs, ys)]
    assert df.decode(df.sub(a, b)) == [(x - y) % p for x, y in zip(xs, ys)]
    assert df.decode(df.neg(a)) == [-x % p for x in xs]


def test_mul(df):
    p = df.spec.modulus
    xs, ys = rand_elems(df.spec, 64), rand_elems(df.spec, 64)[::-1]
    a, b = df.encode(xs), df.encode(ys)
    assert df.decode(df.mul(a, b)) == [x * y % p for x, y in zip(xs, ys)]
    assert df.decode(df.sqr(a)) == [x * x % p for x in xs]


def test_pow_and_inv(df):
    p = df.spec.modulus
    xs = rand_elems(df.spec, 8)
    a = df.encode(xs)
    e = 0x1234567
    assert df.decode(df.pow_fixed(a, e)) == [pow(x, e, p) for x in xs]
    inv = df.decode(df.inv(a))
    for x, xi in zip(xs, inv):
        assert (x * xi) % p == (1 if x else 0)


def test_batch_inv(df):
    p = df.spec.modulus
    xs = rand_elems(df.spec, 33)
    a = df.encode(xs)
    out = df.decode(df.batch_inv(a))
    for x, xi in zip(xs, out):
        assert (x * xi) % p == (1 if x else 0)


def test_broadcasting(df):
    p = df.spec.modulus
    xs = rand_elems(df.spec, 12)
    a = df.encode(xs).reshape(3, 4, df.L)
    b = df.encode(xs[:4]).reshape(1, 4, df.L)
    out = df.mul(a, b)
    flat = df.decode(out.reshape(12, df.L))
    expect = [xs[i] * xs[i % 4] % p for i in range(12)]
    assert flat == expect
