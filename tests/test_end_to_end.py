"""End-to-end workflow tests: full user journeys through the public API.

Reference parity: tests/end_to_end_workflows.rs (1,074 LoC) +
inference_integration.rs — compose modeling, staging, multiple engines,
diagnostics, and persistence in realistic sequences.
"""


import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fugue_tpu as ft
from fugue_tpu.runtime.checkpoint import load_checkpoint, save_checkpoint


def test_workflow_model_to_report(tmp_path):
    """Model → stage → NUTS → diagnostics → persisted samples → reload."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, 30))
    y = jnp.asarray(2.0 * np.asarray(x) + 0.5 + rng.normal(0, 0.3, 30))

    def model():
        w = ft.sample("w", ft.Normal(0.0, 3.0))
        b = ft.sample("b", ft.Normal(0.0, 3.0))
        s = ft.sample("s", ft.LogNormal(-1.0, 0.7))
        ft.observe("y", ft.Normal(w * x + b, s), y)
        return w

    staged = ft.stage(model)
    res = ft.nuts_chain(jax.random.PRNGKey(0), staged=staged,
                        n_samples=600, n_warmup=600, n_chains=8)
    summaries = ft.summarize_samples(res.samples)
    by_name = {s.name: s for s in summaries}
    assert by_name["w"].mean == pytest.approx(2.0, abs=0.15)
    assert by_name["b"].mean == pytest.approx(0.5, abs=0.15)
    assert all(s.r_hat < 1.05 for s in summaries)

    path = str(tmp_path / "samples.npz")
    save_checkpoint(path, dict(res.samples))
    restored = load_checkpoint(path, dict(res.samples))
    np.testing.assert_array_equal(
        np.asarray(res.samples["w"]), np.asarray(restored["w"])
    )


def test_workflow_engine_agreement():
    """MH, HMC, NUTS, SMC, and VI all recover the same conjugate posterior."""
    obs = jnp.array([1] * 12 + [0] * 7, dtype=bool)

    def model():
        p = ft.sample("p", ft.Beta(2.0, 3.0))
        ft.observe("obs", ft.Bernoulli(p), obs)
        return p

    staged = ft.stage(model)
    exact = 14 / 24
    means = {}

    mh = ft.adaptive_mcmc_chain(jax.random.PRNGKey(0), staged=staged,
                                n_samples=1500, n_warmup=500, n_chains=8)
    means["mh"] = float(np.asarray(mh.samples["p"]).mean())

    hmc = ft.hmc_chain(jax.random.PRNGKey(1), staged=staged,
                       n_samples=1000, n_warmup=500, n_chains=8)
    means["hmc"] = float(np.asarray(hmc.samples["p"]).mean())

    nuts = ft.nuts_chain(jax.random.PRNGKey(2), staged=staged,
                         n_samples=1000, n_warmup=500, n_chains=8)
    means["nuts"] = float(np.asarray(nuts.samples["p"]).mean())

    smc = ft.adaptive_smc(jax.random.PRNGKey(3), 2048, staged=staged)
    means["smc"] = float(smc.posterior_mean("p"))

    vi = ft.optimize_meanfield_vi(
        jax.random.PRNGKey(4), staged=staged,
        config=ft.VIConfig(n_iterations=2000, n_samples=64),
    )
    draws = vi.posterior_sample(jax.random.PRNGKey(5), 4000)["p"]
    means["vi"] = float(jnp.mean(draws))

    for name, m in means.items():
        assert m == pytest.approx(exact, abs=0.03), (name, m, means)


def test_workflow_dsl_to_inference():
    """DSL text → compile → stage → SMC evidence → MH posterior."""
    from fugue_tpu.dsl.compiler import compile_model
    from scipy.special import betaln

    src = """
    let p <- sample("p", beta(1.0, 1.0));
    for i in 0..n { observe(("flip", i), bernoulli(p), flips[i]); }
    return p
    """
    flips = [1, 1, 0, 1, 1, 1, 0, 1]
    model = compile_model(src).build({"n": 8, "flips": flips})
    staged = ft.stage(model)

    smc = ft.adaptive_smc(jax.random.PRNGKey(0), 2048, staged=staged)
    exact_logz = float(betaln(1 + 6, 1 + 2) - betaln(1, 1))
    assert smc.log_evidence == pytest.approx(exact_logz, abs=0.1)

    mh = ft.adaptive_mcmc_chain(jax.random.PRNGKey(1), staged=staged,
                                n_samples=1500, n_warmup=500, n_chains=8)
    assert float(np.asarray(mh.samples["p"]).mean()) == pytest.approx(
        7 / 10, abs=0.02
    )


def test_workflow_prior_predictive_and_posterior_predictive():
    """Prior/posterior predictive via handlers + staged replay."""
    ys = jnp.array([1.0, 1.2, 0.9])

    def model():
        mu = ft.sample("mu", ft.Normal(0.0, 2.0))
        ft.observe("ys", ft.Normal(mu, 0.5), ys)
        y_new = ft.sample("y_new", ft.Normal(mu, 0.5))
        return y_new

    staged = ft.stage(model)
    # posterior over mu via HMC
    res = ft.hmc_chain(jax.random.PRNGKey(0), staged=staged,
                       n_samples=800, n_warmup=400, n_chains=8)
    y_pred = np.asarray(res.samples["y_new"])
    tau = 0.25 + 3 / 0.25
    post_mean = float(ys.sum()) / 0.25 / tau
    assert y_pred.mean() == pytest.approx(post_mean, abs=0.05)
    # predictive variance = posterior var + obs var
    assert y_pred.var() == pytest.approx(1 / tau + 0.25, rel=0.15)


def test_workflow_structure_error_recovery():
    """Safe/strict/reconciling scoring in a pipeline that receives traces
    from an evolving model version."""
    def model_v1():
        mu = ft.sample("mu", ft.Normal(0.0, 1.0))
        return mu

    def model_v2():
        mu = ft.sample("mu", ft.Normal(0.0, 1.0))
        extra = ft.sample("scale", ft.LogNormal(0.0, 0.5))
        return mu * extra

    _, t1 = ft.run(ft.PriorHandler(jax.random.PRNGKey(0)), model_v1)

    with pytest.raises(ft.ModelStructureError):
        ft.score_given_trace_strict(model_v2, t1)

    import warnings as w

    with w.catch_warnings():
        w.simplefilter("ignore")
        _, safe = ft.score_given_trace_safe(model_v2, t1)
    assert float(safe.total_log_weight()) == -np.inf

    _, rec, report = ft.score_given_trace_reconciled(
        jax.random.PRNGKey(1), model_v2, t1
    )
    assert report.birthed == ["scale"]
    assert np.isfinite(float(rec.total_log_weight()))
