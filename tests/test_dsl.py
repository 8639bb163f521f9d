"""DSL compiler + session façade tests.

Reference parity: the wasm DSL subset compiles and produces byte-identical
addresses (dsl.rs), incremental MH/HMC sessions, bootstrap particle filter,
one-shot SMC, and posterior log-joint grids (crates/fugue-wasm/src/*)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fugue_tpu as ft
from fugue_tpu.dsl.compiler import CompiledModel, DSLError, compile_model
from fugue_tpu.dsl.sessions import (
    HmcSession,
    MhSession,
    ParticleFilter,
    log_joint_grid,
    smc_run,
)
from fugue_tpu.inference.mh import adaptive_mcmc_chain


COIN_SRC = """
let p <- sample("p", beta(2.0, 3.0));
for i in 0..n {
    observe(("y", i), bernoulli(p), ys[i]);
}
return p
"""


def test_compile_and_stage_coin():
    cm = compile_model(COIN_SRC)
    ys = [1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    model = cm.build({"n": len(ys), "ys": ys})
    staged = ft.stage(model)
    assert [s.address for s in staged.sites] == ["p"]
    assert len(staged.observed_addresses) == 19
    assert staged.observed_addresses[0] == "y#0"  # addr! escaping semantics

    res = adaptive_mcmc_chain(
        jax.random.PRNGKey(0), staged=staged, model_fn=None,
        n_samples=1500, n_warmup=500, n_chains=8,
    )
    assert np.asarray(res.samples["p"]).mean() == pytest.approx(14 / 24, abs=0.01)


def test_dsl_expressions_and_builtins():
    src = """
let mu <- sample("mu", normal(0.0, 2.0));
let shifted = mu * 2.0 + 1.0;
observe("y", normal(shifted, exp(0.0)), data[0]);
factor(-0.5);
return shifted
"""
    cm = compile_model(src)
    model = cm.build({"data": [3.0]})
    result, trace = ft.run(ft.PriorHandler(jax.random.PRNGKey(0)), model)
    assert float(result) == pytest.approx(2 * float(trace.get_real("mu")) + 1.0)
    assert float(trace.log_factors) == pytest.approx(-0.5)


def test_dsl_parse_errors():
    with pytest.raises(DSLError):
        compile_model("let x <- sample(42, normal(0,1));")
    with pytest.raises(DSLError):
        compile_model('let x <- sample("x", nosuchdist(1.0));')
    with pytest.raises(DSLError):
        compile_model("observe(")


def test_dsl_soft_runtime_error_degrades():
    """Unbound identifier at run time → factor(-inf) + warning, not a crash
    (reference: dsl.rs:1-34 soft degrade)."""
    cm = CompiledModel.compile('let mu <- sample("mu", normal(0.0, 1.0));')
    # hand-patch a bad statement referencing an unbound name at exec time
    from fugue_tpu.dsl.compiler import Factor, Var

    cm.stmts.append(Factor(Var("missing")))
    model = cm.build({})
    _, trace = ft.run(ft.PriorHandler(jax.random.PRNGKey(0)), model)
    assert float(trace.total_log_weight()) == -np.inf
    warnings = cm.take_warnings()
    assert warnings and "missing" in warnings[0]
    assert cm.take_warnings() == []  # drained


def test_mh_session_incremental():
    def model():
        mu = ft.sample("mu", ft.Normal(0.0, 2.0))
        ft.observe("y", ft.Normal(mu, 1.0), jnp.array([1.0, 1.2, 0.8]))
        return mu

    sess = MhSession(jax.random.PRNGKey(0), model, n_chains=4, history_cap=100)
    out = sess.step(150)
    assert out["mu"].shape == (4,)
    assert len(sess.history) == 100  # capped
    vals = sess.chain_values("mu")
    assert vals.shape == (100, 4)
    assert 0.0 < sess.accept_rate < 1.0


def test_particle_filter_tracks_state():
    """PF tracks a drifting latent state (reference: pf.rs random-walk SSM)."""
    rng = np.random.default_rng(0)
    true_x = np.cumsum(rng.normal(0, 0.3, 30))
    obs = true_x + rng.normal(0, 0.5, 30)

    pf = ParticleFilter(jax.random.PRNGKey(1), n_particles=1024,
                        process_sd=0.3, obs_sd=0.5)
    means = [pf.observe(y)["mean"] for y in obs]
    rmse = np.sqrt(np.mean((np.asarray(means) - true_x) ** 2))
    assert rmse < 0.5
    assert pf.estimates[-1]["ess"] > 10


def test_smc_run_json():
    def model():
        p = ft.sample("p", ft.Beta(2.0, 2.0))
        ft.observe("y", ft.Bernoulli(p), jnp.array([True, True, False]))
        return p

    out = smc_run(jax.random.PRNGKey(2), model, n_particles=512)
    assert set(out) >= {"log_evidence", "n_stages", "ess", "posterior_means"}
    assert out["posterior_means"]["p"] == pytest.approx(4 / 7, abs=0.05)


def test_log_joint_grid():
    def model():
        x = ft.sample("x", ft.Normal(0.0, 1.0))
        y = ft.sample("y", ft.Normal(0.0, 1.0))
        ft.observe("obs", ft.Normal(x + y, 0.5), jnp.array(1.0))
        return x, y

    grid = log_joint_grid(model, "x", "y", (-2, 2), (-2, 2), resolution=32)
    assert grid["log_joint"].shape == (32, 32)
    # ridge along x + y = 1: the peak row/col must satisfy it approximately
    iy, ix = np.unravel_index(np.argmax(grid["log_joint"]), (32, 32))
    assert grid["x"][ix] + grid["y"][iy] == pytest.approx(1.0, abs=0.6)


def test_hmc_session_reexported():
    assert HmcSession is not None


def test_mh_session_pinned_scale():
    """Pinned proposal scale: adaptation disabled (reference: WasmMh optional
    pinned scale, mh.rs:16-80)."""
    def model():
        mu = ft.sample("mu", ft.Normal(0.0, 2.0))
        ft.observe("y", ft.Normal(mu, 1.0), jnp.array([1.0]))
        return mu

    sess = MhSession(jax.random.PRNGKey(5), model, n_chains=4,
                     pinned_scale=0.7)
    sess.step(100)
    scales = np.asarray(sess._state.adapt.scale())
    np.testing.assert_allclose(scales, 0.7, rtol=1e-6)


def test_particle_filter_resamples_on_low_ess():
    pf = ParticleFilter(jax.random.PRNGKey(6), n_particles=256,
                        process_sd=0.5, obs_sd=0.1)
    # a jump forces weight collapse → resampling keeps ESS healthy and the
    # filter re-locks onto the new level
    for y in [0.0, 0.0, 3.0, 3.0, 3.0]:
        est = pf.observe(y)
    assert est["ess"] > 10
    assert abs(est["mean"] - 3.0) < 0.3


def test_dsl_extra_distributions():
    """The beyond-parity extras are reachable from the DSL surface."""
    import numpy as np
    from fugue_tpu.dsl.compiler import compile_model
    import fugue_tpu as ft
    import jax

    src = """
let tau <- sample("tau", halfcauchy(2.0));
observe("y", normal(0.0, tau), data[0]);
return tau
"""
    cm = compile_model(src)
    staged = ft.stage(cm.build({"data": [1.2]}))
    res = ft.adaptive_mcmc_chain(jax.random.PRNGKey(0), staged=staged,
                                 n_samples=200, n_warmup=200, n_chains=4)
    assert np.isfinite(np.asarray(res.samples["tau"])).all()


def test_bernoulli_logits_in_dsl():
    src = """
let w <- sample("w", normal(0.0, 1.0));
observe("y", bernoulli_logits(w * 2.0), data[0]);
return w
"""
    compiled = compile_model(src)
    model_fn = compiled.build({"data": [1]})
    staged = ft.stage(model_fn)
    assert staged.dim == 1
    lp = float(staged.log_joint(staged.sample_prior(jax.random.PRNGKey(0))))
    assert np.isfinite(lp)
