"""Device EC ops and Pippenger MSM vs the host oracle."""

import random

import pytest

from ckb_zkp_tpu.host.pairing import get_curve
from ckb_zkp_tpu.ops import ec
from ckb_zkp_tpu.ops.msm import device_group

RNG = random.Random(99)


# field kernels are tested over both curves in test_device_field; the EC and
# MSM formulas are generic over the coordinate field, so one pairing curve
# keeps this suite affordable on CPU
@pytest.fixture(scope="module", params=["bn254"])
def curve(request):
    return get_curve(request.param)


@pytest.fixture(autouse=True)
def force_device_msm(curve):
    # these tests exercise the device kernels; disable the host shortcut
    for grp in ("g1", "g2"):
        device_group(curve, grp).small_host_threshold = 0
    yield


def rand_points(curve, group, n):
    g = curve.g1 if group == "g1" else curve.g2
    gen = curve.g1_gen if group == "g1" else curve.g2_gen
    return [g.mul(gen, RNG.randrange(1, curve.fr.modulus)) for _ in range(n)]


@pytest.mark.parametrize("group", ["g1", "g2"])
def test_encode_decode_roundtrip(curve, group):
    dg = device_group(curve, group)
    pts = rand_points(curve, group, 5) + [dg.host_group.infinity]
    assert dg.decode_points(dg.encode_points(pts)) == pts


@pytest.mark.parametrize("group", ["g1", "g2"])
def test_add_double(curve, group):
    dg = device_group(curve, group)
    host = dg.host_group
    pts = rand_points(curve, group, 4)
    P = dg.encode_points(pts)
    Q = dg.encode_points(pts[1:] + pts[:1])
    got = dg.decode_points(ec.ec_add(dg.cf, P, Q))
    expect = [host.add(a, b) for a, b in zip(pts, pts[1:] + pts[:1])]
    assert got == expect
    got_dbl = dg.decode_points(ec.ec_double(dg.cf, P))
    assert got_dbl == [host.double(a) for a in pts]


@pytest.mark.parametrize("group", ["g1"])
def test_add_edge_cases(curve, group):
    dg = device_group(curve, group)
    host = dg.host_group
    p = rand_points(curve, group, 1)[0]
    cases = [
        (p, p),  # doubling through add
        (p, host.neg(p)),  # P + (-P) = inf
        (p, host.infinity),
        (host.infinity, p),
        (host.infinity, host.infinity),
    ]
    P = dg.encode_points([a for a, _ in cases])
    Q = dg.encode_points([b for _, b in cases])
    got = dg.decode_points(ec.ec_add(dg.cf, P, Q))
    assert got == [host.add(a, b) for a, b in cases]


@pytest.mark.parametrize("group", ["g1", "g2"])
def test_msm_matches_host(curve, group):
    dg = device_group(curve, group)
    host = dg.host_group
    n = 17
    pts = rand_points(curve, group, n - 1) + [host.infinity]
    scalars = [RNG.randrange(curve.fr.modulus) for _ in range(n - 2)] + [0, 7]
    P = dg.encode_points(pts)
    s = dg.encode_scalars(scalars)
    got = dg.decode_point(dg.msm(P, s))
    assert got == host.msm(pts, scalars)


def test_msm_repeated_points(curve):
    """Equal points in the same bucket exercise the doubling path."""
    dg = device_group(curve, "g1")
    host = dg.host_group
    p = rand_points(curve, "g1", 1)[0]
    pts = [p, p, p, host.double(p)]
    scalars = [3, 3, 5, 9]
    got = dg.decode_point(dg.msm(dg.encode_points(pts), dg.encode_scalars(scalars)))
    assert got == host.mul(p, 3 + 3 + 5 + 18)


def test_fixed_base_msm(curve):
    dg = device_group(curve, "g1")
    host = dg.host_group
    table = dg.fixed_base_table(curve.g1_gen)  # raw device table path
    scalars = [0, 1, 2, RNG.randrange(curve.fr.modulus), curve.fr.modulus - 1]
    got = dg.decode_points(dg.fixed_base_msm(table, dg.encode_scalars(scalars)))
    assert got == [host.mul(curve.g1_gen, s) for s in scalars]


def test_prefix_at_indices():
    import jax.numpy as jnp
    import numpy as np

    from ckb_zkp_tpu.ops.scan_utils import prefix_at_indices

    rng = np.random.default_rng(7)
    for n, block, hs_base in [(37, 8, 16), (1000, 8, 16), (5000, 32, 64)]:
        x = jnp.asarray(rng.integers(0, 1000, size=(n, 2)), dtype=jnp.int32)
        q = jnp.asarray(
            np.concatenate([[-1, 0, n - 1], rng.integers(-1, n, size=29)]),
            dtype=jnp.int32,
        )
        got = prefix_at_indices(
            lambda a, b: a + b, x, jnp.zeros((2,), jnp.int32), q, block, hs_base
        )
        cs = np.cumsum(np.asarray(x), axis=0)
        want = np.stack(
            [np.zeros(2, np.int64) if qi < 0 else cs[qi] for qi in np.asarray(q)]
        )
        assert np.array_equal(np.asarray(got), want), (n, block, hs_base)


def test_msm_recursive_prefix_path(curve):
    """MSM large enough to recurse past prefix_at_indices' HS base case."""
    import ckb_zkp_tpu.ops.scan_utils as su

    dg = device_group(curve, "g1")
    host = dg.host_group
    n = 640
    base = rand_points(curve, "g1", 8)
    pts = [base[i % 8] for i in range(n)]
    scalars = [RNG.randrange(curve.fr.modulus) for _ in range(n)]
    orig = su.prefix_at_indices

    def small_base(combine, elems, identity, q, block=8, hs_base=32):
        return orig(combine, elems, identity, q, block, hs_base)

    try:
        su.prefix_at_indices = small_base
        import ckb_zkp_tpu.ops.msm as msm_mod

        msm_mod.prefix_at_indices = small_base
        got = dg.decode_point(
            dg.msm(dg.encode_points(pts), dg.encode_scalars(scalars))
        )
    finally:
        su.prefix_at_indices = orig
        import ckb_zkp_tpu.ops.msm as msm_mod

        msm_mod.prefix_at_indices = orig
    assert got == host.msm(pts, scalars)


def test_hs_scan_and_segment_sum():
    import jax.numpy as jnp
    import numpy as np

    from ckb_zkp_tpu.ops.scan_utils import hs_scan, hs_segment_sum_sorted

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.integers(0, 1000, size=(37, 2)), dtype=jnp.int32)
    fwd = hs_scan(lambda a, b: a + b, x)
    assert np.array_equal(np.asarray(fwd), np.cumsum(np.asarray(x), axis=0))
    rev = hs_scan(lambda a, b: a + b, x, reverse=True)
    assert np.array_equal(
        np.asarray(rev), np.cumsum(np.asarray(x)[::-1], axis=0)[::-1]
    )
    # segmented: sorted ids with gaps and an out-of-range sentinel
    ids = jnp.asarray(np.sort(rng.integers(0, 6, size=24)), dtype=jnp.int32)
    vals = jnp.asarray(rng.integers(0, 100, size=(24,)), dtype=jnp.int32)
    out = hs_segment_sum_sorted(lambda a, b: a + b, vals, ids, 6, jnp.int32(0))
    want = np.zeros(6, dtype=np.int64)
    for i, s in zip(np.asarray(ids), np.asarray(vals)):
        want[i] += s
    assert np.array_equal(np.asarray(out), want)


def test_bucket_counts_matches_reference():
    """The one-hot matmul histogram must agree with a direct count for both
    window sizes (8-bit and 16-bit digits)."""
    import numpy as np
    import jax.numpy as jnp

    from ckb_zkp_tpu.ops.msm import _bucket_counts

    rng = np.random.default_rng(2)
    for nb, n in ((256, 5000), (1 << 16, 20000)):
        d = rng.integers(0, nb, n, dtype=np.uint32)
        got = np.asarray(_bucket_counts(jnp.asarray(d), nb))
        want = np.cumsum(np.bincount(d, minlength=nb))
        assert (got == want).all()
