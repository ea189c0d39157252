"""Four-step large-domain NTT (ops/ntt_large.py) vs the radix-2 ladder.

Canonical Montgomery limbs are a unique representation, so the two paths
must agree array-exactly on every transform variant.
"""

import numpy as np
import pytest

from ckb_zkp_tpu.host.pairing import get_curve
from ckb_zkp_tpu.ops import ntt as ntt_mod
from ckb_zkp_tpu.ops.field import device_field
from ckb_zkp_tpu.ops.ntt import Domain
from ckb_zkp_tpu.ops.ntt_large import FourStepDomain

N = 1 << 10


@pytest.fixture(scope="module")
def setup():
    spec = get_curve("bn254").fr
    fr = device_field(spec)
    dom = Domain(fr, N)  # fresh (uncached) domain: small path regardless
    four = FourStepDomain(spec, N)
    rng = np.random.default_rng(7)
    x = fr.encode([int(v) for v in rng.integers(0, 1 << 63, size=N)])
    return fr, dom, four, np.asarray(x)


@pytest.mark.parametrize("inverse,coset", [
    (False, False), (True, False), (False, True), (True, True),
])
def test_matches_radix2(setup, inverse, coset):
    fr, dom, four, x = setup
    want = np.asarray(dom.fft(x, inverse=inverse, coset=coset))
    got = np.asarray(four.fft(x, inverse=inverse, coset=coset))
    assert want.shape == got.shape == (N, fr.L)
    assert np.array_equal(want, got)


def test_roundtrip(setup):
    fr, dom, four, x = setup
    back = np.asarray(four.intt(four.ntt(x)))
    assert np.array_equal(back, x)
    back_c = np.asarray(four.coset_intt(four.coset_ntt(x)))
    assert np.array_equal(back_c, x)


def test_domain_routes_large():
    """Runs in a SUBPROCESS: in a full-suite process (~170 loaded CPU
    executables) this test deterministically segfaults inside jax's
    persistent-cache executable deserialization (compilation_cache.py
    get_executable_and_time) — an upstream XLA:CPU issue, reproducible
    only at suite scale, not standalone (r4 bisection). The subprocess
    keeps the routing check while isolating the fragile deserialize."""
    import os
    import subprocess
    import sys

    script = r"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from ckb_zkp_tpu.host.pairing import get_curve
from ckb_zkp_tpu.ops import ntt as ntt_mod
from ckb_zkp_tpu.ops.field import device_field
from ckb_zkp_tpu.ops.ntt import Domain

N = 1 << 10
spec = get_curve("bn254").fr
fr = device_field(spec)
dom = Domain(fr, N)
rng = np.random.default_rng(7)
x = np.asarray(fr.encode([int(v) for v in rng.integers(0, 1 << 63, size=N)]))
ntt_mod.LARGE_NTT_MIN = N
routed = Domain(fr, N)
assert routed.is_large
assert np.array_equal(np.asarray(routed.ntt(x)), np.asarray(dom.ntt(x)))
assert np.array_equal(
    np.asarray(routed.coset_intt(x)), np.asarray(dom.coset_intt(x))
)
print("ROUTE OK")
"""
    env = dict(os.environ)
    env.setdefault("PYTHONPATH", "")
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep
        + env["PYTHONPATH"]
    )
    res = subprocess.run(
        [sys.executable, "-c", script],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert res.returncode == 0, res.stdout + res.stderr
    assert "ROUTE OK" in res.stdout


def test_lagrange_coefficients_match_small_kernel(setup):
    """Limb-major large-domain Lagrange kernel (setup instance map) vs the
    small-domain batched formula — array-exact, both tau cases."""
    fr, dom, four, x = setup
    tau = 0xABCDEF0123456789
    want = np.asarray(dom.evaluate_all_lagrange_coefficients(tau))
    got = np.asarray(four.evaluate_all_lagrange_coefficients(tau))
    assert np.array_equal(want, got)
    # tau inside the domain -> delta vector
    spec = get_curve("bn254").fr
    t_in = pow(spec.root_of_unity(N), 5, spec.modulus)
    want_in = np.asarray(dom.evaluate_all_lagrange_coefficients(t_in))
    got_in = np.asarray(four.evaluate_all_lagrange_coefficients(t_in))
    assert np.array_equal(want_in, got_in)


def test_odd_log2_split(setup):
    """n = 2^9: n1 != n2 exercises the asymmetric factor split."""
    fr, dom, four, x = setup
    spec = get_curve("bn254").fr
    n = 1 << 9
    d9 = Domain(fr, n)
    f9 = FourStepDomain(spec, n)
    assert f9.n1 != f9.n2
    y = x[:n]
    assert np.array_equal(np.asarray(d9.ntt(y)), np.asarray(f9.ntt(y)))
