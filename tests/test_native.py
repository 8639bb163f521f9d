"""Cross-validation of the C++ host backend against the XLA/FFT estimators.

The native module plays the role the reference gives its independent
reference-value generator (tests/gen_refs.py): two implementations derived
separately must agree.
"""

import numpy as np
import pytest

from fugue_tpu.inference import mcmc_utils as mu
from fugue_tpu.utils import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain"
)


def ar1(rng, phi, n):
    x = np.empty(n)
    innov = rng.normal(size=n)
    x[0] = innov[0]
    for i in range(1, n):
        x[i] = phi * x[i - 1] + innov[i]
    return x


@pytest.mark.parametrize("phi", [0.0, 0.5, 0.9])
def test_ess_cross_validates(phi):
    rng = np.random.default_rng(0)
    x = ar1(rng, phi, 8000)
    a = native.ess(x)
    b = float(mu.ess(x))
    assert a == pytest.approx(b, rel=0.02), (a, b)


def test_ess_batch():
    rng = np.random.default_rng(1)
    xs = np.stack([ar1(rng, 0.0, 4000), ar1(rng, 0.8, 4000)])
    got = native.ess_batch(xs)
    want = np.asarray(mu.ess(xs))
    np.testing.assert_allclose(got, want, rtol=0.02)


def test_multichain_ess_cross_validates():
    rng = np.random.default_rng(2)
    chains = np.stack([ar1(rng, 0.6, 3000) for _ in range(4)])
    a = native.ess_multichain(chains)
    b = float(mu.ess_multichain(chains))
    assert a == pytest.approx(b, rel=0.02), (a, b)


def test_split_rhat_cross_validates():
    rng = np.random.default_rng(3)
    good = rng.normal(size=(4, 2000))
    assert native.split_r_hat(good) == pytest.approx(
        float(mu.split_r_hat(good)), abs=1e-6
    )
    bad = good + np.array([0.0, 0.0, 0.0, 2.0])[:, None]
    assert native.split_r_hat(bad) == pytest.approx(
        float(mu.split_r_hat(bad)), rel=1e-6
    )
    assert native.split_r_hat(bad) > 1.1


def test_quantiles_match_numpy():
    rng = np.random.default_rng(4)
    x = rng.normal(size=10001)
    qs = [0.025, 0.25, 0.5, 0.75, 0.975]
    got = native.quantiles(x, qs)
    want = np.quantile(x, qs)
    np.testing.assert_allclose(got, want, rtol=1e-10)
