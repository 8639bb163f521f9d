"""Posterior/prior predictive sampling (PredictiveHandler + vmapped replay).

Closed-form target: Normal-Normal model — with posterior
N(mu_n, tau_n^2), the posterior predictive is N(mu_n, tau_n^2 + sigma^2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fugue_tpu as ft
from fugue_tpu.inference.predictive import predictive


def test_prior_predictive_single_draw():
    def model():
        p = ft.sample("p", ft.Beta(2.0, 2.0))
        ft.observe("y", ft.Bernoulli(p), jnp.ones(10, bool))
        return p

    out = predictive(jax.random.PRNGKey(0), model, batch_ndim=0)
    assert set(out) == {"p", "y"}
    assert out["y"].shape == (10,)
    assert out["y"].dtype == jnp.bool_


def test_prior_predictive_batched_moments():
    """With no latents pinned, predictive y ~ marginal: y = mu + eps,
    mu~N(0,1), eps~N(0,1) → Var(y) = 2."""
    def model():
        mu = ft.sample("mu", ft.Normal(0.0, 1.0))
        ft.observe("y", ft.Normal(mu, 1.0), 0.0)
        return mu

    n = 4000
    out = predictive(
        jax.random.PRNGKey(1), model,
        {"_dummy": jnp.zeros(n)}, batch_ndim=1,
    )
    ys = np.asarray(out["y"])
    assert ys.shape == (n,)
    assert ys.mean() == pytest.approx(0.0, abs=4 * np.sqrt(2 / n))
    assert ys.var() == pytest.approx(2.0, abs=0.15)


def test_posterior_predictive_normal_normal():
    """Pin mu to draws from the exact posterior; the predictive draws must
    match N(mu_n, tau_n^2 + sigma^2) moments."""
    sigma = 1.0
    data = np.array([1.4, 2.1, 1.7, 2.4, 1.9])
    n_obs = len(data)
    # prior N(0, 2^2)
    tau_n2 = 1.0 / (1.0 / 4.0 + n_obs / sigma**2)
    mu_n = tau_n2 * (data.sum() / sigma**2)

    def model():
        mu = ft.sample("mu", ft.Normal(0.0, 2.0))
        ft.observe("y", ft.Normal(mu, sigma), jnp.asarray(data))
        return mu

    n_chains, n_draws = 8, 2000
    mus = mu_n + np.sqrt(tau_n2) * np.asarray(
        jax.random.normal(jax.random.PRNGKey(2), (n_chains, n_draws))
    )
    out = predictive(
        jax.random.PRNGKey(3), model, {"mu": jnp.asarray(mus)}
    )
    ys = np.asarray(out["y"])
    assert ys.shape == (n_chains, n_draws, n_obs)
    assert "mu" not in out  # pinned latents are not re-emitted
    pred_var = tau_n2 + sigma**2
    n_tot = ys.size
    assert ys.mean() == pytest.approx(mu_n, abs=4 * np.sqrt(pred_var / n_tot))
    assert ys.var() == pytest.approx(pred_var, rel=0.05)


def test_return_sites_filter_and_fresh_latents():
    def model():
        mu = ft.sample("mu", ft.Normal(0.0, 1.0))
        extra = ft.sample("extra", ft.Normal(mu, 1.0))
        ft.observe("y", ft.Normal(extra, 1.0), 0.0)
        return extra

    out = predictive(
        jax.random.PRNGKey(4), model,
        {"mu": jnp.zeros((2, 3))},
    )
    # unpinned latent "extra" is drawn fresh and returned
    assert set(out) == {"extra", "y"}
    assert out["extra"].shape == (2, 3)

    only_y = predictive(
        jax.random.PRNGKey(4), model,
        {"mu": jnp.zeros((2, 3))}, return_sites=["y"],
    )
    assert set(only_y) == {"y"}


def test_batch_shape_mismatch_raises():
    def model():
        ft.sample("a", ft.Normal(0.0, 1.0))
        ft.sample("b", ft.Normal(0.0, 1.0))

    with pytest.raises(ValueError, match="batch shapes disagree"):
        predictive(
            jax.random.PRNGKey(0), model,
            {"a": jnp.zeros((2, 3)), "b": jnp.zeros((2, 4))},
        )
