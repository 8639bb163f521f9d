"""Simulation-based calibration (inference/sbc.py) — Talts et al. 2018.

Beyond-parity harness: the positive control (correct pipeline) must yield
uniform ranks; the negative control (deliberately wrong inference prior)
must be REJECTED by the same chi-square gate."""

import jax
import jax.numpy as jnp
import pytest

import fugue_tpu as ft
from fugue_tpu.errors import StagingError
from fugue_tpu.inference.sbc import SBCResult, sbc


def _model(data):
    mu = ft.sample("mu", ft.Normal(0.0, 1.0))
    sig = ft.sample("sig", ft.LogNormal(0.0, 0.5))
    ft.observe("y", ft.Normal(mu, sig), data["y"])


def test_correct_pipeline_is_calibrated():
    r = sbc(jax.random.PRNGKey(0), _model, {"y": jnp.zeros(8)},
            n_datasets=96, n_posterior=63, n_warmup=200, thin=4)
    assert isinstance(r, SBCResult)
    assert r.ranks.shape == (96, 2)
    assert r.ranks.min() >= 0 and r.ranks.max() <= 63
    assert r.passed, r.report()
    assert "PASS" in r.report()


def test_wrong_inference_prior_is_rejected():
    """Negative control: generate under mu ~ N(0,1) but INFER under
    mu ~ N(3,0.3) — the rank histogram must pile against one edge and the
    chi-square gate must fail."""

    def wrong(data):
        mu = ft.sample("mu", ft.Normal(3.0, 0.3))
        sig = ft.sample("sig", ft.LogNormal(0.0, 0.5))
        ft.observe("y", ft.Normal(mu, sig), data["y"])

    r = sbc(jax.random.PRNGKey(1), _model, {"y": jnp.zeros(8)},
            n_datasets=96, n_posterior=63, n_warmup=200, thin=4,
            inference_model_fn=wrong)
    assert not r.passed, r.report()


def test_structural_guards():
    def disc(data):
        ft.sample("k", ft.Bernoulli(0.5))
        mu = ft.sample("mu", ft.Normal(0.0, 1.0))
        ft.observe("y", ft.Normal(mu, 1.0), data["y"])

    with pytest.raises(StagingError):
        sbc(jax.random.PRNGKey(0), disc, {"y": jnp.zeros(3)}, n_datasets=4)

    def missing_template(data):
        mu = ft.sample("mu", ft.Normal(0.0, 1.0))
        ft.observe("y", ft.Normal(mu, 1.0), data["y"])
        ft.observe("y2", ft.Normal(mu, 1.0), jnp.zeros(2))

    with pytest.raises(StagingError, match="every observed address"):
        sbc(jax.random.PRNGKey(0), missing_template, {"y": jnp.zeros(3)},
            n_datasets=4)
