"""Dynamic (trans-dimensional) MH tests: RJMCMC birth/death correctness.

Reference parity: structure-varying model support with birth-from-prior and
the site-count dimension term (mh.rs:637-744, FG-20/21).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

import fugue_tpu as ft
from fugue_tpu.inference.mh_dynamic import adaptive_mcmc_chain_dynamic


def test_fixed_structure_matches_conjugate():
    """On a static model the dynamic chain reduces to plain MH."""
    obs = jnp.array([1] * 12 + [0] * 7, dtype=bool)

    def model():
        p = ft.sample("p", ft.Beta(2.0, 3.0))
        ft.observe("obs", ft.Bernoulli(p), obs)
        return p

    res = adaptive_mcmc_chain_dynamic(
        jax.random.PRNGKey(0), model, n_samples=3000, n_warmup=500
    )
    ps = res.values("p")
    assert ps.mean() == pytest.approx(14 / 24, abs=0.02)
    assert res.birth_count == 0 and res.death_count == 0


def test_transdimensional_model_selection():
    """Structure flag chooses between a 1-parameter and 2-parameter model;
    the posterior over the flag must match the analytic evidence ratio."""
    y_obs = 2.4

    def model():
        use_b = ft.sample("use_b", ft.Bernoulli(0.3))
        a = ft.sample("a", ft.Normal(0.0, 1.0))
        if bool(np.asarray(use_b)):
            b = ft.sample("b", ft.Normal(0.0, 1.0))
            mean = a + b
        else:
            mean = a
        ft.observe("y", ft.Normal(mean, 0.5), jnp.asarray(y_obs))
        return mean

    # analytic: evidence under model0: y ~ N(0, 1 + 0.25); model1: N(0, 2.25)
    z0 = st.norm(0, np.sqrt(1.25)).pdf(y_obs)
    z1 = st.norm(0, np.sqrt(2.25)).pdf(y_obs)
    post_use_b = 0.3 * z1 / (0.3 * z1 + 0.7 * z0)

    res = adaptive_mcmc_chain_dynamic(
        jax.random.PRNGKey(1), model, n_samples=6000, n_warmup=1000
    )
    freq = res.presence("b").mean()
    assert freq == pytest.approx(post_use_b, abs=0.05), (freq, post_use_b)
    assert res.birth_count > 0 and res.death_count > 0


def test_within_model_posterior_conditional():
    """Conditional on the structure flag, the continuous posterior is the
    right conjugate posterior."""
    y_obs = 1.0

    def model():
        use_b = ft.sample("use_b", ft.Bernoulli(0.5))
        a = ft.sample("a", ft.Normal(0.0, 1.0))
        mean = a
        if bool(np.asarray(use_b)):
            b = ft.sample("b", ft.Normal(0.0, 1.0))
            mean = a + b
        ft.observe("y", ft.Normal(mean, 0.5), jnp.asarray(y_obs))
        return mean

    res = adaptive_mcmc_chain_dynamic(
        jax.random.PRNGKey(2), model, n_samples=8000, n_warmup=1000
    )
    has_b = res.presence("b")
    a_vals = res.values("a")
    # model-0 samples: posterior of a | y, no b: precision 1 + 4 → mean 4y/5
    a0 = a_vals[~has_b[: len(a_vals)]]
    assert a0.mean() == pytest.approx(0.8 * y_obs, abs=0.08)


def test_adaptation_and_acceptance_reasonable():
    def model():
        mu = ft.sample("mu", ft.Normal(0.0, 5.0))
        ft.observe("y", ft.Normal(mu, 1.0), jnp.array([1.0, 1.5]))
        return mu

    res = adaptive_mcmc_chain_dynamic(
        jax.random.PRNGKey(3), model, n_samples=1500, n_warmup=800
    )
    assert 0.2 < res.accept_rate < 0.7
