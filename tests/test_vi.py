"""Mean-field VI regressions.

Reference parity: Normal-Normal conjugate (tests/f_vi_regressions.rs:18-50 —
posterior N(1.8, sqrt(0.2)) pattern), Beta guide exactness, discrete-latent
rejection (vi.rs:577-600), plateau convergence, prior-guide estimate_elbo.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fugue_tpu as ft
from fugue_tpu.inference.vi import (
    GuideError,
    MeanFieldGuide,
    VIConfig,
    elbo,
    estimate_elbo,
    optimize_meanfield_vi,
)


def normal_model():
    """mu ~ N(0,2); y=[1.2,0.8,1.5,0.9,1.1] at sigma=1 → posterior
    N(5.5/5.25, 1/sqrt(5.25))."""
    ys = jnp.array([1.2, 0.8, 1.5, 0.9, 1.1])
    mu = ft.sample("mu", ft.Normal(0.0, 2.0))
    ft.observe("ys", ft.Normal(mu, 1.0), ys)
    return mu


def test_normal_posterior_recovery():
    res = optimize_meanfield_vi(
        jax.random.PRNGKey(0), normal_model,
        VIConfig(n_iterations=1500, n_samples=32, learning_rate=0.05),
    )
    tau = 0.25 + 5.0
    post_mean = float(jnp.array([1.2, 0.8, 1.5, 0.9, 1.1]).sum()) / tau
    post_sd = 1 / np.sqrt(tau)
    loc = float(res.params["mu"]["loc"])
    scale = float(jax.nn.softplus(res.params["mu"]["raw_scale"]))
    assert loc == pytest.approx(post_mean, abs=0.05)
    assert scale == pytest.approx(post_sd, rel=0.2)
    # mean-field Normal family on a Normal posterior is exact → high ELBO
    assert res.final_elbo() > -20


def test_beta_guide_conjugate():
    """Beta family on Beta-Bernoulli: the guide family CONTAINS the true
    posterior Beta(14,10) → VI should land near it (FG-17/FG-60)."""
    obs = jnp.array([1] * 12 + [0] * 7, dtype=bool)

    def model():
        p = ft.sample("p", ft.Beta(2.0, 3.0))
        ft.observe("obs", ft.Bernoulli(p), obs)
        return p

    res = optimize_meanfield_vi(
        jax.random.PRNGKey(1), model,
        VIConfig(n_iterations=3000, n_samples=128, learning_rate=0.05),
    )
    a = float(jnp.exp(res.params["p"]["raw_a"]))
    b = float(jnp.exp(res.params["p"]["raw_b"]))
    # posterior mean matches tightly; the total-concentration direction has
    # weak curvature + pathwise-gamma gradient noise, so variance converges
    # more slowly — checked within 50%
    assert a / (a + b) == pytest.approx(14 / 24, abs=0.03)
    draws = res.posterior_sample(jax.random.PRNGKey(2), 4000)["p"]
    assert float(jnp.mean(draws)) == pytest.approx(14 / 24, abs=0.03)
    assert float(jnp.var(draws)) == pytest.approx(14 * 10 / (24**2 * 25), rel=0.5)


def test_lognormal_guide_positive_site():
    """Positive-support site gets a LogNormal factor; all guide draws > 0."""
    ks = jnp.array([3, 2, 2])

    def model():
        lam = ft.sample("lam", ft.Gamma(2.0, 1.0))
        ft.observe("ks", ft.Poisson(lam), ks)
        return lam

    res = optimize_meanfield_vi(
        jax.random.PRNGKey(3), model,
        VIConfig(n_iterations=1500, n_samples=32, learning_rate=0.05),
    )
    draws = res.posterior_sample(jax.random.PRNGKey(4), 4000)["lam"]
    assert float(jnp.min(draws)) > 0
    assert float(jnp.mean(draws)) == pytest.approx(9 / 4, rel=0.1)


def test_discrete_latent_rejected():
    """Typed GuideError for discrete latents (reference: vi.rs:577-600)."""
    def model():
        z = ft.sample("z", ft.Bernoulli(0.5))
        return z

    staged = ft.stage(model)
    with pytest.raises(GuideError):
        MeanFieldGuide(staged)


def test_plateau_early_stop():
    """Trivial target converges long before the iteration budget (FG-44)."""
    def model():
        return ft.sample("x", ft.Normal(0.0, 1.0))

    res = optimize_meanfield_vi(
        jax.random.PRNGKey(5), model,
        VIConfig(n_iterations=5000, n_samples=16, learning_rate=0.1,
                 plateau_window=50, plateau_tol=2e-3, check_every=50),
    )
    assert res.converged
    assert res.n_iterations_run < 5000


def test_estimate_elbo_prior_guide():
    """Prior-guide ELBO is finite and below the optimized one (FG-46)."""
    e0 = estimate_elbo(jax.random.PRNGKey(6), normal_model, n_samples=256)
    assert np.isfinite(e0)
    res = optimize_meanfield_vi(
        jax.random.PRNGKey(7), normal_model,
        VIConfig(n_iterations=800, n_samples=32),
    )
    assert res.final_elbo() > e0


def test_elbo_estimator_unbiasedness():
    """For a Normal model with the guide set AT the posterior, ELBO equals
    the log evidence (KL = 0)."""
    import scipy.stats as st

    ys = np.array([1.2, 0.8, 1.5, 0.9, 1.1])
    staged = ft.stage(normal_model)
    guide = MeanFieldGuide(staged)
    tau = 0.25 + 5.0
    params = {
        "mu": {
            "loc": jnp.asarray(ys.sum() / tau),
            "raw_scale": jnp.asarray(
                float(np.log(np.expm1(1 / np.sqrt(tau))))
            ),
        }
    }
    cov = np.eye(5) + 4.0 * np.ones((5, 5))
    exact_logz = st.multivariate_normal(np.zeros(5), cov).logpdf(ys)
    e = float(np.asarray(elbo(jax.random.PRNGKey(8), guide, params, 8192)))
    assert e == pytest.approx(exact_logz, abs=0.02)


def test_robbins_monro_sgd_path():
    """Decayed SGA (the reference's Robbins-Monro schedule) also converges."""
    res = optimize_meanfield_vi(
        jax.random.PRNGKey(9), normal_model,
        VIConfig(n_iterations=3000, n_samples=32, learning_rate=0.1,
                 decay=0.6, optimizer="sgd"),
    )
    tau = 0.25 + 5.0
    assert float(res.params["mu"]["loc"]) == pytest.approx(
        float(jnp.array([1.2, 0.8, 1.5, 0.9, 1.1]).sum()) / tau, abs=0.1
    )


def test_fullrank_captures_correlation():
    """Full-rank ADVI learns the off-diagonal covariance a mean-field guide
    cannot represent."""
    from fugue_tpu.inference.vi import optimize_fullrank_vi

    rho = 0.9

    def model():
        x = ft.sample("x", ft.Normal(0.0, 1.0))
        y = ft.sample("y", ft.Normal(rho * x, float(np.sqrt(1 - rho**2))))
        return x, y

    res = optimize_fullrank_vi(
        jax.random.PRNGKey(0), model,
        VIConfig(n_iterations=3000, n_samples=32, learning_rate=0.05),
    )
    cov = np.asarray(res.guide.covariance(res.params))
    assert cov[0, 0] == pytest.approx(1.0, rel=0.15)
    assert cov[1, 1] == pytest.approx(1.0, rel=0.15)
    assert cov[0, 1] == pytest.approx(rho, rel=0.15)
    draws = res.posterior_sample(jax.random.PRNGKey(1), 4000)
    corr = np.corrcoef(
        np.asarray(draws["x"]).ravel(), np.asarray(draws["y"]).ravel()
    )[0, 1]
    assert corr == pytest.approx(rho, abs=0.06)


def test_fullrank_transforms_positive_site():
    """Full-rank guide respects support transforms: positive site stays
    positive and matches the conjugate mean."""
    from fugue_tpu.inference.vi import optimize_fullrank_vi

    ks = jnp.array([3, 2, 2])

    def model():
        lam = ft.sample("lam", ft.Gamma(2.0, 1.0))
        ft.observe("ks", ft.Poisson(lam), ks)
        return lam

    res = optimize_fullrank_vi(
        jax.random.PRNGKey(2), model,
        VIConfig(n_iterations=2000, n_samples=32),
    )
    draws = res.posterior_sample(jax.random.PRNGKey(3), 4000)["lam"]
    assert float(jnp.min(draws)) > 0
    assert float(jnp.mean(draws)) == pytest.approx(9 / 4, rel=0.1)


def test_vi_resume_continues_from_params():
    """VI resume (r4): optimization continues from a previous result's
    variational parameters (runtime arguments; one executable per mode) —
    the segmented-long-run workflow for dispatch-limited devices."""
    from fugue_tpu.inference.vi import (
        VIConfig, optimize_fullrank_vi, optimize_meanfield_vi,
    )

    ys = jnp.array([1.2, 0.8, 1.5, 0.9, 1.1])

    def model():
        mu = ft.sample("mu", ft.Normal(0.0, 2.0))
        ft.observe("ys", ft.Normal(mu, 1.0), ys)

    staged = ft.stage(model)
    cfg = VIConfig(n_iterations=300, n_samples=16,
                   plateau_window=10**9, check_every=300)
    r1 = optimize_meanfield_vi(jax.random.PRNGKey(0), staged=staged,
                               config=cfg)
    r2 = optimize_meanfield_vi(jax.random.PRNGKey(1), staged=staged,
                               config=cfg, resume=r1)
    # the resumed segment starts near r1's solution, so its ELBO never
    # dips back to the cold-start level
    assert r2.elbo_history[0] > r1.elbo_history[0] + 1.0
    tau = 0.25 + 5.0
    loc = float(np.asarray(r2.params["mu"]["loc"]))
    assert loc == pytest.approx(float(ys.sum()) / tau, abs=0.05)
    # repeated resumes share one executable
    n = len(staged._kernel_cache)
    optimize_meanfield_vi(jax.random.PRNGKey(2), staged=staged,
                          config=cfg, resume=r2)
    assert len(staged._kernel_cache) == n

    f1 = optimize_fullrank_vi(jax.random.PRNGKey(3), staged=staged,
                              config=cfg)
    f2 = optimize_fullrank_vi(jax.random.PRNGKey(4), staged=staged,
                              config=cfg, resume=f1)
    assert np.isfinite(f2.elbo_history).all()
    assert f2.elbo_history[-1] >= f1.elbo_history[-1] - 1.0
