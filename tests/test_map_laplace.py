"""MAP + Laplace engine: conjugate known-answer tests.

Follows the reference's validation discipline (tests/analytical_validation.rs,
src/inference/validation.rs:73-166): seeded, closed-form posteriors, with
tolerances justified inline. The engine itself is beyond reference parity
(the reference has no optimizer — see fugue_tpu/inference/map_laplace.py).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import betaln

import fugue_tpu as ft
from fugue_tpu.errors import ModelStructureError
from fugue_tpu.inference.map_laplace import (
    LaplaceResult,
    MAPConfig,
    map_estimate,
    laplace_approximation,
)


def _normal_normal():
    mu = ft.sample("mu", ft.Normal(0.0, 1.0))
    ft.observe("y", ft.Normal(mu, 1.0), 1.5)


def test_map_normal_normal_exact():
    # Posterior is N(0.75, 0.5): the MAP equals the mean, the curvature of
    # the Gaussian log-density is exactly 1/var, and Laplace is exact for a
    # Gaussian — so everything must match to optimizer tolerance.
    r = map_estimate(
        jax.random.PRNGKey(0), _normal_normal,
        MAPConfig(n_iterations=200, optimizer="lbfgs"),
    )
    assert r.converged
    assert abs(float(r.latents["mu"]) - 0.75) < 1e-8
    la = laplace_approximation(r)
    assert abs(float(la.cov[0, 0]) - 0.5) < 1e-8
    # evidence: y ~ N(0, 1 + 1) marginally
    exact = -0.5 * math.log(2 * math.pi * 2.0) - 1.5**2 / (2 * 2.0)
    assert abs(la.log_evidence - exact) < 1e-8
    assert abs(float(la.sd("mu")) - math.sqrt(0.5)) < 1e-8


def test_map_adam_path_positive_support():
    # LogNormal latent exercises the exp unconstraining transform; the MAP
    # of the unconstrained density has a closed form: with z = log(sig),
    # d/dz [ -z^2/2 - n z - S e^{-2z}/2 ] = 0  =>  e^{2z}(z + n) = S.
    data = [1.0, -0.5, 2.0]

    def model():
        sig = ft.sample("sig", ft.LogNormal(0.0, 1.0))
        for i, y in enumerate(data):
            ft.observe(ft.addr("y", i), ft.Normal(0.0, sig), y)

    r = map_estimate(
        jax.random.PRNGKey(2), model,
        MAPConfig(n_iterations=2000, learning_rate=0.05),
    )
    assert r.converged, r.grad_norm
    S = sum(y * y for y in data)
    z = float(jnp.log(r.latents["sig"]))
    assert abs(math.exp(2 * z) * (z + len(data)) - S) < 1e-6


def test_laplace_evidence_beta_bernoulli():
    # p ~ Beta(2, 2), 7 heads / 3 tails. Exact ordered-sequence evidence is
    # B(9, 5) / B(2, 2). Laplace on the logit scale is accurate to O(1/n);
    # measured error at n=10 is 0.011 nats — assert within 0.05.
    flips = [1.0] * 7 + [0.0] * 3

    def model():
        p = ft.sample("p", ft.Beta(2.0, 2.0))
        for i, y in enumerate(flips):
            ft.observe(ft.addr("flip", i), ft.Bernoulli(p), y)

    r = map_estimate(
        jax.random.PRNGKey(3), model,
        MAPConfig(n_iterations=300, optimizer="lbfgs"),
    )
    la = laplace_approximation(r)
    exact = betaln(9, 5) - betaln(2, 2)
    assert abs(la.log_evidence - exact) < 0.05
    # posterior draws live in (0, 1)
    s = la.sample(jax.random.PRNGKey(4), 256)["p"]
    assert s.shape == (256,)
    assert jnp.all((s > 0) & (s < 1))


def test_map_linear_regression_matches_ridge():
    # a, b ~ N(0, tau); y ~ N(a x + b, sigma). The MAP is the ridge solution
    # (X'X/sig^2 + I/tau^2)^-1 X'y/sig^2 — solved here with numpy lstsq
    # machinery and compared exactly.
    rng = np.random.default_rng(0)
    x = rng.normal(size=20)
    y = 2.0 * x - 1.0 + rng.normal(size=20) * 0.3
    tau, sig = 5.0, 0.3

    def model():
        a = ft.sample("a", ft.Normal(0.0, tau))
        b = ft.sample("b", ft.Normal(0.0, tau))
        ft.observe("y", ft.Normal(a * jnp.asarray(x) + b, sig), jnp.asarray(y))

    r = map_estimate(
        jax.random.PRNGKey(5), model,
        MAPConfig(n_iterations=300, optimizer="lbfgs"),
    )
    X = np.stack([x, np.ones_like(x)], axis=1)
    A = X.T @ X / sig**2 + np.eye(2) / tau**2
    w = np.linalg.solve(A, X.T @ y / sig**2)
    assert abs(float(r.latents["a"]) - w[0]) < 1e-6
    assert abs(float(r.latents["b"]) - w[1]) < 1e-6
    # Laplace covariance of a Gaussian posterior is exact: inv(A)
    la = laplace_approximation(r)
    assert np.allclose(np.asarray(la.cov), np.linalg.inv(A), atol=1e-8)


def test_map_restarts_shape_and_best_selection():
    r = map_estimate(
        jax.random.PRNGKey(6), _normal_normal,
        MAPConfig(n_iterations=50, n_restarts=3),
    )
    assert r.history.shape == (3, 50)
    # every restart improved on its own start, and the reported optimum is
    # at least as good as every restart's final objective (best selection);
    # intermediate iterates may transiently beat the endpoint under Adam.
    assert (r.history[:, -1] > r.history[:, 0]).all()
    assert r.log_joint >= r.history[:, -1].max() - 1e-6


def test_map_rejects_unpinned_discrete():
    def model():
        k = ft.sample("k", ft.Bernoulli(0.5))
        mu = ft.sample("mu", ft.Normal(jnp.where(k, 2.0, -2.0), 1.0))
        ft.observe("y", ft.Normal(mu, 1.0), 1.9)

    with pytest.raises(ModelStructureError):
        map_estimate(jax.random.PRNGKey(7), model)

    # pinning the discrete site makes it a continuous problem again:
    # posterior of mu | k=1 is N((2+1.9)/2, 1/2)
    r = map_estimate(
        jax.random.PRNGKey(7), model,
        MAPConfig(n_iterations=200, optimizer="lbfgs"),
        discrete={"k": jnp.asarray(True)},
    )
    assert abs(float(r.latents["mu"]) - (2.0 + 1.9) / 2) < 1e-6


def test_map_result_trace_roundtrip():
    r = map_estimate(
        jax.random.PRNGKey(8), _normal_normal,
        MAPConfig(n_iterations=100, optimizer="lbfgs"),
    )
    tr = r.trace()
    assert abs(tr.total_log_weight() - r.log_joint) < 1e-8  # identity transform
    assert isinstance(laplace_approximation(r), LaplaceResult)


def test_warm_start_from_map():
    # init_position=(d,) broadcasts with jitter; sampling proceeds and the
    # posterior mean still matches the conjugate value (N(0.75, 0.5)).
    import fugue_tpu as ft

    r = map_estimate(
        jax.random.PRNGKey(9), _normal_normal,
        MAPConfig(n_iterations=100, optimizer="lbfgs"),
    )
    res = ft.hmc_chain(
        jax.random.PRNGKey(10), _normal_normal, n_samples=400, n_warmup=300,
        n_chains=8, init_position=r.z,
    )
    mu = np.asarray(res.samples["mu"])
    assert abs(mu.mean() - 0.75) < 0.06  # ~3 MC SE at ESS>=1000
    nres = ft.nuts_chain(
        jax.random.PRNGKey(11), _normal_normal, n_samples=200, n_warmup=200,
        n_chains=4, init_position=r.z,
    )
    assert abs(np.asarray(nres.samples["mu"]).mean() - 0.75) < 0.08
    # shape validation
    with pytest.raises(ValueError):
        ft.hmc_chain(jax.random.PRNGKey(12), _normal_normal, n_samples=2,
                     n_warmup=2, n_chains=2, init_position=jnp.zeros((3,)))
