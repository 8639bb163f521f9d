"""Elliptical slice sampling (inference/ess.py).

No reference counterpart; validated against exact conjugate-Gaussian
posteriors (the latent-Gaussian setting the sampler is built for)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

import fugue_tpu as ft
from fugue_tpu.errors import StagingError
from fugue_tpu.inference.ess import ess_chain


def test_conjugate_scalar_normal():
    # prior N(1, 2^2); y=3 at sigma=1 → posterior N(1 + 4/5*(3-1), 4/5)
    def model():
        mu = ft.sample("mu", ft.Normal(1.0, 2.0))
        ft.observe("y", ft.Normal(mu, 1.0), jnp.array(3.0))

    res = ess_chain(jax.random.PRNGKey(0), model, n_samples=1500,
                    n_warmup=200, n_chains=32)
    x = np.asarray(res.samples["mu"]).reshape(-1)
    post_mean, post_var = 1.0 + 0.8 * 2.0, 0.8
    assert abs(x.mean() - post_mean) < 0.03
    assert abs(x.var() - post_var) < 0.12 * post_var
    # tuning-free: a well-matched ellipse accepts within a few shrinks
    assert res.mean_shrink_iters < 8.0


def test_gp_regression_conjugate_posterior():
    """f ~ MVN(0, K); y ~ N(f, s^2 I): posterior is exactly
    N(K(K+s^2 I)^{-1} y, K - K(K+s^2 I)^{-1} K)."""
    xg = np.linspace(0.0, 1.0, 5)
    K = np.exp(-0.5 * ((xg[:, None] - xg[None, :]) / 0.4) ** 2) + 1e-6 * np.eye(5)
    s = 0.3
    rng = np.random.default_rng(0)
    y = np.sin(2 * np.pi * xg) + rng.normal(0, s, 5)

    Kj = jnp.asarray(K)
    yj = jnp.asarray(y)

    def model():
        f = ft.sample("f", ft.MultivariateNormal(jnp.zeros(5), Kj))
        ft.observe("y", ft.Normal(f, s), yj)

    res = ess_chain(jax.random.PRNGKey(1), model, n_samples=2000,
                    n_warmup=300, n_chains=32)
    fs = np.asarray(res.samples["f"]).reshape(-1, 5)

    A = K @ np.linalg.inv(K + s**2 * np.eye(5))
    post_mean = A @ y
    post_cov = K - A @ K
    np.testing.assert_allclose(fs.mean(0), post_mean, atol=0.04)
    np.testing.assert_allclose(
        np.cov(fs.T), post_cov, atol=0.05
    )


def test_non_gaussian_likelihood_classification():
    """GP-classification shape: Bernoulli likelihood through a Gaussian
    latent — the case ESS exists for (no conjugacy, no tuning)."""
    def model():
        f = ft.sample("f", ft.Normal(0.0, 1.5))
        ft.observe("y", ft.Bernoulli(jax.nn.sigmoid(f)),
                   jnp.array([True, True, True, False]))

    res = ess_chain(jax.random.PRNGKey(2), model, n_samples=3000,
                    n_warmup=300, n_chains=16)
    f = np.asarray(res.samples["f"]).reshape(-1)
    # ground truth by quadrature
    grid = np.linspace(-8, 8, 8001)
    p = 1 / (1 + np.exp(-grid))
    logp = stats.norm.logpdf(grid, 0, 1.5) + 3 * np.log(p) + np.log1p(-p)
    w = np.exp(logp - logp.max()); w /= w.sum()
    m = (w * grid).sum()
    v = (w * (grid - m) ** 2).sum()
    assert abs(f.mean() - m) < 0.05
    assert abs(f.var() - v) < 0.15 * v


def test_non_gaussian_prior_raises():
    def model():
        p = ft.sample("p", ft.Beta(2.0, 2.0))
        ft.observe("y", ft.Bernoulli(p), jnp.array(True))

    with pytest.raises(StagingError, match="Normal"):
        ess_chain(jax.random.PRNGKey(0), model, n_samples=10, n_warmup=0)


def test_centered_hierarchy_raises():
    def model():
        mu = ft.sample("mu", ft.Normal(0.0, 5.0))
        theta = ft.sample("theta", ft.Normal(mu, 1.0))  # prior depends on mu
        ft.observe("y", ft.Normal(theta, 1.0), jnp.array(0.3))

    with pytest.raises(StagingError, match="non-centered"):
        ess_chain(jax.random.PRNGKey(0), model, n_samples=10, n_warmup=0)


def test_noncentered_hierarchy_works():
    """The documented rewrite: scale applied OUTSIDE the prior."""
    def model():
        mu = ft.sample("mu", ft.Normal(0.0, 5.0))
        theta_raw = ft.sample("theta_raw", ft.Normal(0.0, 1.0))
        ft.observe("y", ft.Normal(mu + 2.0 * theta_raw, 1.0), jnp.array(0.3))

    res = ess_chain(jax.random.PRNGKey(3), model, n_samples=500,
                    n_warmup=100, n_chains=16)
    assert np.isfinite(np.asarray(res.samples["mu"])).all()


def test_seed_reproducibility():
    def model():
        mu = ft.sample("mu", ft.Normal(0.0, 1.0))
        ft.observe("y", ft.Normal(mu, 1.0), jnp.array(0.5))

    r1 = ess_chain(jax.random.PRNGKey(7), model, n_samples=50, n_warmup=10,
                   n_chains=8)
    r2 = ess_chain(jax.random.PRNGKey(7), model, n_samples=50, n_warmup=10,
                   n_chains=8)
    np.testing.assert_array_equal(
        np.asarray(r1.final_flat), np.asarray(r2.final_flat)
    )


def test_discrete_values_not_stale_in_kernel_cache():
    """ADVICE r2 (high): ess_chain's drive cache keyed discrete conditioning
    on site NAMES only while the values were closed over in the jitted
    transition, so alternating Gibbs-style calls on one staged model silently
    reused the first call's stale conditioning."""
    def model():
        mu = ft.sample("mu", ft.Normal(0.0, 2.0))
        k = ft.sample("k", ft.Bernoulli(0.5))
        ft.observe("y", ft.Normal(mu + jnp.where(k, 3.0, -3.0), 0.5),
                   jnp.array(0.0))

    staged = ft.stage(model)
    kw = dict(n_samples=800, n_warmup=100, n_chains=16, staged=staged)
    r1 = ess_chain(jax.random.PRNGKey(3),
                   discrete={"k": jnp.asarray(True)}, **kw)
    r0 = ess_chain(jax.random.PRNGKey(3),
                   discrete={"k": jnp.asarray(False)}, **kw)
    # posterior mean of mu is -(y-shift) shrunk: +/- 12/4.25 ~= +/-2.82
    assert float(np.mean(np.asarray(r1.samples["mu"]))) < -2.0
    assert float(np.mean(np.asarray(r0.samples["mu"]))) > 2.0
