"""Multi-device sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4 item 8: CPU mesh simulation replaces the reference's
non-existent distributed tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fugue_tpu as ft
from fugue_tpu.parallel.mesh import (
    CHAIN_AXIS,
    make_chain_data_mesh,
    make_chain_mesh,
)
from fugue_tpu.parallel.sharded import sharded_hmc_chain, sharded_smc
from fugue_tpu.inference.mcmc_utils import split_r_hat


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    return make_chain_mesh()


def coin_model():
    obs = jnp.array([1] * 12 + [0] * 7, dtype=bool)
    p = ft.sample("p", ft.Beta(2.0, 3.0))
    ft.observe("obs", ft.Bernoulli(p), obs)
    return p


def test_mesh_construction(mesh):
    assert mesh.devices.size == 8
    assert mesh.axis_names == (CHAIN_AXIS,)
    m2 = make_chain_data_mesh(4, 2)
    assert m2.axis_names == (CHAIN_AXIS, "data")
    assert m2.devices.shape == (4, 2)


def test_sharded_hmc_posterior(mesh):
    res = sharded_hmc_chain(
        jax.random.PRNGKey(0), coin_model, n_samples=500, n_warmup=400,
        n_chains=64, mesh=mesh,
    )
    ps = np.asarray(res.samples["p"])
    assert ps.shape == (64, 500)
    assert ps.mean() == pytest.approx(14 / 24, abs=0.01)
    assert float(split_r_hat(ps[:8])) < 1.05
    # every shard adapted the SAME kernel (collective consensus)
    assert res.step_size > 0


def test_sharded_hmc_chain_axis_is_sharded(mesh):
    res = sharded_hmc_chain(
        jax.random.PRNGKey(1), coin_model, n_samples=50, n_warmup=50,
        n_chains=32, mesh=mesh,
    )
    shardings = res.final_positions.sharding
    # chain axis spread over 8 devices
    assert len(shardings.device_set) == 8


def test_sharded_hmc_matches_quality_of_unsharded(mesh):
    """Sharded and unsharded drivers both hit the conjugate posterior."""
    from fugue_tpu.inference.hmc import hmc_chain

    res_s = sharded_hmc_chain(
        jax.random.PRNGKey(2), coin_model, n_samples=800, n_warmup=400,
        n_chains=32, mesh=mesh,
    )
    res_u = hmc_chain(
        jax.random.PRNGKey(2), coin_model, n_samples=800, n_warmup=400,
        n_chains=32,
    )
    m_s = float(np.asarray(res_s.samples["p"]).mean())
    m_u = float(np.asarray(res_u.samples["p"]).mean())
    assert m_s == pytest.approx(14 / 24, abs=0.01)
    assert m_u == pytest.approx(14 / 24, abs=0.01)


def test_sharded_smc(mesh):
    res = sharded_smc(jax.random.PRNGKey(3), 1024, coin_model, mesh=mesh)
    assert float(res.posterior_mean("p")) == pytest.approx(14 / 24, abs=0.015)
    assert res.ess > 100


def test_sharded_data_plate_psum(mesh):
    """The context-parallel analog: a large observation plate sharded across
    devices, per-shard log-likelihood partial sums psum-reduced
    (SURVEY.md §2.3 SP row)."""
    n_obs = 64
    rng = np.random.default_rng(0)
    ys_np = rng.normal(1.0, 1.0, n_obs)
    ys = jnp.asarray(ys_np)

    staged = ft.stage(lambda: _plate_model(ys))

    def _local_loglik(mu, ys_local):
        return jnp.sum(ft.Normal(mu, 1.0).log_prob(ys_local))

    from fugue_tpu.parallel.sharded import _shard_map
    from jax.sharding import PartitionSpec as P

    def shard_fn(mu, ys_local):
        local = _local_loglik(mu[0], ys_local)
        return jax.lax.psum(local, CHAIN_AXIS)[None]

    mapped = _shard_map(
        shard_fn, mesh, in_specs=(P(), P(CHAIN_AXIS)), out_specs=P(),
    )
    mu = jnp.asarray([0.7])
    total = jax.jit(mapped)(mu, ys)
    expected = float(jnp.sum(ft.Normal(0.7, 1.0).log_prob(ys)))
    assert float(total[0]) == pytest.approx(expected, rel=1e-6)


def _plate_model(ys):
    mu = ft.sample("mu", ft.Normal(0.0, 2.0))
    ft.observe("ys", ft.Normal(mu, 1.0), ys)
    return mu


def test_sharded_mh(mesh):
    """MH under jit sharding constraints: pure chain-DP over the mesh."""
    from fugue_tpu.inference.mh import adaptive_mcmc_chain

    res = adaptive_mcmc_chain(
        jax.random.PRNGKey(9), coin_model, n_samples=400, n_warmup=200,
        n_chains=64, mesh=mesh,
    )
    ps = np.asarray(res.samples["p"])
    assert ps.shape == (64, 400)
    assert ps.mean() == pytest.approx(14 / 24, abs=0.015)
    assert len(res.final_state.log_joint.sharding.device_set) == 8


def test_sharded_nuts_posterior(mesh):
    """NUTS chains sharded over the mesh: collective warmup adaptation
    (acceptance pmean, epsilon consensus, Welford mass merge) produces one
    kernel and the conjugate posterior."""
    from fugue_tpu.parallel.sharded import sharded_nuts_chain
    from fugue_tpu.inference.nuts import NUTSConfig

    res = sharded_nuts_chain(
        jax.random.PRNGKey(4), coin_model, n_samples=400, n_warmup=300,
        n_chains=32, mesh=mesh, config=NUTSConfig(max_depth=6),
    )
    ps = np.asarray(res.samples["p"])
    assert ps.shape == (32, 400)
    assert ps.mean() == pytest.approx(14 / 24, abs=0.012)
    assert float(split_r_hat(ps[:8])) < 1.05
    # eps is a cross-shard consensus scalar; depths are sane
    assert res.step_size > 0
    assert 1 <= float(np.asarray(res.tree_depths).mean()) <= 6
    # chain axis spread over all 8 devices
    assert len(res.final_positions.sharding.device_set) == 8


# ---------------------------------------------------------------------------
# shard-local SMC resampling (VERDICT r1 item 4 / SURVEY §7 hard part 4)
# ---------------------------------------------------------------------------


def _hier_model():
    rng = np.random.default_rng(5)
    data = jnp.asarray(rng.normal(0.4, 1.0, (4, 6)))
    mu = ft.sample("mu", ft.Normal(0.0, 2.0))
    tau = ft.sample("tau", ft.LogNormal(0.0, 0.5))
    for i in range(4):
        th = ft.sample(ft.addr("th", i), ft.Normal(mu, tau))
        ft.observe(ft.addr("y", i), ft.Normal(th, 1.0), data[i])
    return mu


def test_sharded_smc_matches_single_device_logz(mesh):
    """Sharded run must agree with the single-device run: the beta ladder
    and evidence math run on gathered (N,) weight vectors, so stage counts
    match exactly and logZ matches to float tolerance."""
    from fugue_tpu.inference.smc import SMCConfig, adaptive_smc

    cfg = SMCConfig(rejuvenation_steps=2)
    res_s = adaptive_smc(jax.random.PRNGKey(7), 1024, _hier_model,
                         cfg, mesh=mesh)
    res_u = adaptive_smc(jax.random.PRNGKey(7), 1024, _hier_model, cfg)
    assert res_s.n_stages == res_u.n_stages
    assert res_s.log_evidence == pytest.approx(res_u.log_evidence, abs=0.5)
    assert float(res_s.posterior_mean("mu")) == pytest.approx(
        float(res_u.posterior_mean("mu")), abs=0.1
    )


def test_ring_gather_exact_vs_take(mesh):
    """_ring_gather reproduces jnp.take(x, ancestors) exactly for any
    ancestor assignment, on every tree leaf shape."""
    from jax.sharding import PartitionSpec as P
    from fugue_tpu.inference.smc import _ring_gather
    from fugue_tpu.parallel.sharded import _shard_map

    N, nloc = 64, 8
    rng = np.random.default_rng(1)
    tree = {
        "a": jnp.asarray(rng.normal(size=(N,))),
        "b": jnp.asarray(rng.normal(size=(N, 3))),
    }
    anc = jnp.asarray(rng.integers(0, N, size=(N,)))

    def f(tree_local, anc_local):
        return _ring_gather(tree_local, anc_local, CHAIN_AXIS, 8)

    out = jax.jit(
        _shard_map(
            f, mesh,
            in_specs=({"a": P(CHAIN_AXIS), "b": P(CHAIN_AXIS, None)},
                      P(CHAIN_AXIS)),
            out_specs={"a": P(CHAIN_AXIS), "b": P(CHAIN_AXIS, None)},
        )
    )(tree, anc)
    np.testing.assert_array_equal(np.asarray(out["a"]),
                                  np.asarray(tree["a"])[np.asarray(anc)])
    np.testing.assert_array_equal(np.asarray(out["b"]),
                                  np.asarray(tree["b"])[np.asarray(anc)])


def test_sharded_smc_hlo_has_no_particle_allgather(mesh):
    """The compiled sharded-SMC program must not all-gather the particle
    pytree: the only all-gathers are the (N,) weight/log-lik vectors (and
    scalar reductions). Particle movement is collective-permute."""
    from fugue_tpu.inference.smc import SMCConfig, adaptive_smc

    staged = ft.stage(_hier_model)
    cfg = SMCConfig(rejuvenation_steps=1)
    N = 1024
    # warm the cache so the compiled executable is present
    adaptive_smc(jax.random.PRNGKey(0), N, staged=staged, config=cfg,
                 mesh=mesh)
    jit_drive = staged._kernel_cache[("smc_drive", N, cfg, id(mesh))]
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    hlo = jit_drive.lower(k1, k2).compile().as_text()
    assert "collective-permute" in hlo  # the ring is actually in the program
    import re

    # every all-gather output must stay <= N f64 elements (weight vectors);
    # a gathered particle pytree leaf would be N x trailing dims and appear
    # as a larger gather, and multi-site models would gather d x N.
    sizes = []
    # HLO line shape: `%x = f64[1024]{0} all-gather(...)` — shape precedes op
    for m in re.finditer(
        r"=\s*[a-z0-9]+\[([0-9,]*)\][^=\n]*\ball-gather", hlo
    ):
        dims = [int(x) for x in m.group(1).split(",") if x]
        sizes.append(int(np.prod(dims)) if dims else 1)
    assert sizes, "expected some (small) all-gathers in the sharded program"
    assert max(sizes) <= N, f"large all-gather found: {sizes}"


def test_sharded_chees_posterior(mesh):
    from fugue_tpu.parallel.sharded import sharded_chees_chain

    res = sharded_chees_chain(
        jax.random.PRNGKey(21), coin_model, n_samples=500, n_warmup=500,
        n_chains=64, mesh=mesh,
    )
    ps = np.asarray(res.samples["p"])
    assert ps.shape == (64, 500)
    assert ps.mean() == pytest.approx(14 / 24, abs=0.01)
    assert float(split_r_hat(ps[:8])) < 1.05
    # (eps, T) consensus is replicated; trajectory stays bounded and sane
    assert res.step_size > 0 and res.trajectory_length > 0
    assert 1.0 <= res.mean_leapfrog <= 1024


def test_sharded_chees_matches_quality_of_unsharded(mesh):
    from fugue_tpu.inference.chees import chees_chain
    from fugue_tpu.parallel.sharded import sharded_chees_chain

    res_s = sharded_chees_chain(
        jax.random.PRNGKey(2), coin_model, n_samples=400, n_warmup=400,
        n_chains=32, mesh=mesh,
    )
    res_u = chees_chain(
        jax.random.PRNGKey(2), coin_model, n_samples=400, n_warmup=400,
        n_chains=32,
    )
    m_s = float(np.asarray(res_s.samples["p"]).mean())
    m_u = float(np.asarray(res_u.samples["p"]).mean())
    assert abs(m_s - m_u) < 0.02


def test_sharded_pt_posterior(mesh):
    """PT with the chain batch sharded: bimodal target mixes; the beta=1
    marginal matches the exact mixture weights (VERDICT r2 item 7)."""
    from fugue_tpu.parallel.sharded import sharded_pt_chain
    from fugue_tpu.inference.tempering import PTConfig

    def bimodal():
        x = ft.sample("x", ft.Normal(0.0, 10.0))
        # likelihood: mixture of N(-3, .5) and N(3, .5), weights .5/.5
        lp = jnp.logaddexp(
            ft.Normal(-3.0, 0.5).log_prob(x), ft.Normal(3.0, 0.5).log_prob(x)
        ) + jnp.log(0.5)
        ft.factor(lp)

    res = sharded_pt_chain(
        jax.random.PRNGKey(0), bimodal, n_samples=400, n_warmup=300,
        config=PTConfig(n_temps=6, beta_min=0.05, n_leapfrog=8),
        n_chains=16, mesh=mesh,
    )
    xs = np.asarray(res.samples["x"]).reshape(-1)
    frac_right = float((xs > 0).mean())
    assert abs(frac_right - 0.5) < 0.15  # both modes visited, near-even
    assert res.swap_rate.shape == (5,)
    assert np.all(np.asarray(res.swap_rate) > 0.05)  # ladder communicates


def test_sharded_pt_matches_single_device_statistics(mesh):
    """Sharded and single-device PT agree on the conjugate posterior."""
    from fugue_tpu.parallel.sharded import sharded_pt_chain
    from fugue_tpu.inference.tempering import PTConfig, pt_chain

    ys = jnp.array([1.0, 1.4, 0.6])

    def model():
        mu = ft.sample("mu", ft.Normal(0.0, 1.0))
        ft.observe("ys", ft.Normal(mu, 1.0), ys)

    cfg = PTConfig(n_temps=4, beta_min=0.1, n_leapfrog=8)
    post_mean = float(ys.sum()) / 4.0
    r_sh = sharded_pt_chain(jax.random.PRNGKey(1), model, n_samples=400,
                            n_warmup=300, config=cfg, n_chains=16, mesh=mesh)
    r_1d = pt_chain(jax.random.PRNGKey(2), model, n_samples=400,
                    n_warmup=300, config=cfg, n_chains=16)
    m_sh = float(np.asarray(r_sh.samples["mu"]).mean())
    m_1d = float(np.asarray(r_1d.samples["mu"]).mean())
    assert m_sh == pytest.approx(post_mean, abs=0.05)
    assert m_1d == pytest.approx(post_mean, abs=0.05)


def test_sharded_ess_posterior(mesh):
    """ESS chains sharded over the mesh recover the conjugate posterior;
    per-shard key folding keeps shard draw streams distinct."""
    from fugue_tpu.parallel.sharded import sharded_ess_chain

    def model():
        mu = ft.sample("mu", ft.Normal(1.0, 2.0))
        ft.observe("y", ft.Normal(mu, 1.0), jnp.array(3.0))

    res = sharded_ess_chain(jax.random.PRNGKey(0), model, n_samples=600,
                            n_warmup=100, n_chains=64, mesh=mesh)
    x = np.asarray(res.samples["mu"])
    assert x.shape == (64, 600)
    post_mean, post_var = 1.0 + 0.8 * 2.0, 0.8
    assert x.mean() == pytest.approx(post_mean, abs=0.04)
    assert x.var() == pytest.approx(post_var, rel=0.15)
    # shards genuinely differ (key folding worked)
    assert not np.allclose(x[0], x[8])


def test_sharded_gibbs_posterior(mesh):
    """HMC-within-Gibbs sharded over chains: the mixed continuous+discrete
    switch model recovers the exact conditional (VERDICT r2 item 7 — the
    last engine without a sharded variant)."""
    from fugue_tpu.parallel.sharded import sharded_gibbs_chain

    def switch():
        z = ft.sample("z", ft.Bernoulli(0.7))
        th = ft.sample("theta", ft.Normal(0.0, 1.0))
        ft.observe("y", ft.Normal(th + jnp.where(z, 1.0, -1.0), 1.0),
                   jnp.array(0.8))

    res = sharded_gibbs_chain(jax.random.PRNGKey(0), switch, n_samples=800,
                              n_warmup=300, n_chains=16, mesh=mesh)
    th = np.asarray(res.samples["theta"])
    zs = np.asarray(res.samples["z"])
    assert th.shape == (16, 800)
    # exact posterior: P(z=1|y) and E[theta|y] by 2-component conjugacy
    from scipy import stats as st
    m1 = st.norm(1.0, np.sqrt(2)).pdf(0.8) * 0.7
    m0 = st.norm(-1.0, np.sqrt(2)).pdf(0.8) * 0.3
    pz = m1 / (m1 + m0)
    e_th = pz * (0.8 - 1.0) / 2 + (1 - pz) * (0.8 + 1.0) / 2
    assert abs(zs.mean() - pz) < 0.04
    assert abs(th.mean() - e_th) < 0.05
    # shards genuinely differ (key folding worked)
    assert not np.allclose(th[0], th[2])


def test_sharded_smc_resume_bitwise():
    """Sharded SMC resume: the carry's sharded leaves (particles, weight
    vectors) round-trip through the resume program and the split ladder is
    bitwise identical to the uninterrupted sharded run."""
    from fugue_tpu.inference.smc import SMCConfig
    from fugue_tpu.parallel.sharded import sharded_smc

    def model():
        mu = ft.sample("mu", ft.Normal(0.0, 10.0))
        ft.observe("y", ft.Normal(mu, 0.05), jnp.array(3.0))

    staged = ft.stage(model)
    key = jax.random.PRNGKey(4)
    full = sharded_smc(key, 1024, staged=staged,
                       config=SMCConfig(rejuvenation_steps=2))
    part = sharded_smc(key, 1024, staged=staged,
                       config=SMCConfig(rejuvenation_steps=2, max_stages=2))
    assert not part.converged
    done = sharded_smc(jax.random.PRNGKey(0), 1024, staged=staged,
                       config=SMCConfig(rejuvenation_steps=2), resume=part)
    assert done.converged
    np.testing.assert_array_equal(
        np.asarray(done.particles["mu"]), np.asarray(full.particles["mu"]))
    np.testing.assert_allclose(done.log_evidence, full.log_evidence,
                               rtol=1e-12)


# ---------------------------------------------------------------------------
# sharded VI (VERDICT r4 missing #1: the last engine joins the mesh)
# ---------------------------------------------------------------------------

_VI_N = 64
_vi_rng = np.random.default_rng(7)
_VI_YS = jnp.asarray(_vi_rng.normal(1.8, 1.0, _VI_N))


def _vi_model(ys):
    mu = ft.sample("mu", ft.Normal(0.0, 2.0))
    ft.observe("ys", ft.Normal(mu, 1.0), ys)
    return mu


def _vi_posterior():
    ybar = float(_VI_YS.mean())
    prec = 0.25 + _VI_N
    return _VI_N * ybar / prec, (1.0 / prec) ** 0.5


def test_sharded_vi_data_mode_matches_unsharded(mesh):
    """Data-plate sharding: same key => same guide draws on every shard,
    psum'd likelihood partials => the optimization trajectory matches the
    single-device run (same contract as test_sharded_hmc_matches_quality_
    of_unsharded, but here the match is deterministic)."""
    from fugue_tpu.inference.vi import VIConfig, optimize_meanfield_vi
    from fugue_tpu.parallel.sharded import sharded_vi

    staged = ft.stage(_vi_model, _VI_YS)
    cfg = VIConfig(n_iterations=400, n_samples=8, learning_rate=0.05)
    res_s = sharded_vi(jax.random.PRNGKey(0), staged=staged, config=cfg,
                       mesh=mesh, shard="data")
    res_u = optimize_meanfield_vi(jax.random.PRNGKey(0), staged=staged,
                                  config=cfg)
    post_mean, post_sd = _vi_posterior()
    loc_s = float(res_s.params["mu"]["loc"])
    loc_u = float(res_u.params["mu"]["loc"])
    assert loc_s == pytest.approx(post_mean, abs=0.05)
    assert loc_s == pytest.approx(loc_u, abs=1e-6)
    sd_s = float(jax.nn.softplus(res_s.params["mu"]["raw_scale"]))
    assert sd_s == pytest.approx(post_sd, abs=0.05)


def test_sharded_vi_sample_mode_posterior(mesh):
    """MC-sample sharding: per-shard independent draws, psum-averaged
    gradients (n_samples x 8 effective samples)."""
    from fugue_tpu.inference.vi import VIConfig
    from fugue_tpu.parallel.sharded import sharded_vi

    staged = ft.stage(_vi_model, _VI_YS)
    cfg = VIConfig(n_iterations=400, n_samples=4, learning_rate=0.05)
    res = sharded_vi(jax.random.PRNGKey(1), staged=staged, config=cfg,
                     mesh=mesh, shard="samples")
    post_mean, post_sd = _vi_posterior()
    assert float(res.params["mu"]["loc"]) == pytest.approx(post_mean, abs=0.05)
    assert float(jax.nn.softplus(res.params["mu"]["raw_scale"])) == (
        pytest.approx(post_sd, abs=0.05))


def test_sharded_vi_fullrank_and_mesh_kwarg(mesh):
    """optimize_fullrank_vi(mesh=...) routes to the sharded driver; the
    full-rank guide recovers the conjugate mean on the unconstrained space."""
    from fugue_tpu.inference.vi import VIConfig, optimize_fullrank_vi

    staged = ft.stage(_vi_model, _VI_YS)
    cfg = VIConfig(n_iterations=400, n_samples=8, learning_rate=0.05)
    res = optimize_fullrank_vi(jax.random.PRNGKey(2), staged=staged,
                               config=cfg, mesh=mesh)
    post_mean, _ = _vi_posterior()
    assert float(np.asarray(res.params["loc"])[0]) == pytest.approx(
        post_mean, abs=0.06)


def test_sharded_vi_resume_continues(mesh):
    from fugue_tpu.inference.vi import VIConfig
    from fugue_tpu.parallel.sharded import sharded_vi

    staged = ft.stage(_vi_model, _VI_YS)
    cfg = VIConfig(n_iterations=200, n_samples=8, learning_rate=0.05,
                   plateau_window=1000)  # no early exit
    seg1 = sharded_vi(jax.random.PRNGKey(3), staged=staged, config=cfg,
                      mesh=mesh, shard="data")
    seg2 = sharded_vi(jax.random.PRNGKey(4), staged=staged, config=cfg,
                      mesh=mesh, shard="data", resume=seg1)
    post_mean, _ = _vi_posterior()
    assert float(seg2.params["mu"]["loc"]) == pytest.approx(post_mean, abs=0.05)
    # the second segment starts where the first ended (not from init)
    assert abs(float(seg1.params["mu"]["loc"]) - post_mean) < 0.2


def test_sharded_vi_data_mode_validation(mesh):
    from fugue_tpu.inference.vi import VIConfig
    from fugue_tpu.parallel.sharded import sharded_vi

    # no data leaves at all -> typed refusal for shard="data"
    staged = ft.stage(lambda: ft.sample("x", ft.Normal(0.0, 1.0)))
    with pytest.raises(ValueError, match="data leaf"):
        sharded_vi(jax.random.PRNGKey(0), staged=staged,
                   config=VIConfig(n_iterations=10), mesh=mesh, shard="data")
    # ...and shard="auto" falls back to sample-mode sharding cleanly
    res = sharded_vi(jax.random.PRNGKey(0), staged=staged,
                     config=VIConfig(n_iterations=50, n_samples=4), mesh=mesh)
    assert np.isfinite(res.final_elbo())


def test_sharded_vi_data_mode_replicates_non_plate_leaves(mesh):
    """Only leaves with the LARGEST leading axis (the plate) are sharded;
    a small per-latent constant whose length happens to divide the device
    count must be REPLICATED (r5 review: sharding it silently sliced the
    prior and corrupted the psum'd ELBO with no error)."""
    from fugue_tpu.inference.vi import VIConfig, optimize_meanfield_vi
    from fugue_tpu.parallel.sharded import sharded_vi

    d = 8  # == n_devices: the dangerous case
    prior_mu = jnp.full((d,), 0.5)
    rng = np.random.default_rng(11)
    ys = jnp.asarray(rng.normal(0.5, 1.0, (64, d)))

    def model(prior_mu, ys):
        w = ft.sample("w", ft.Normal(prior_mu, 1.0))
        ft.observe("ys", ft.Normal(w[None, :], 1.0), ys)

    staged = ft.stage(model, prior_mu, ys)
    cfg = VIConfig(n_iterations=300, n_samples=8)
    res_s = sharded_vi(jax.random.PRNGKey(0), staged=staged, config=cfg,
                       mesh=mesh)  # auto -> data (ys rows = 64 = 8*n_dev)
    res_u = optimize_meanfield_vi(jax.random.PRNGKey(0), staged=staged,
                                  config=cfg)
    loc_s = np.asarray(res_s.params["w"]["loc"])
    loc_u = np.asarray(res_u.params["w"]["loc"])
    # conjugate per-coordinate posterior: (0.5 + sum ys_j)/(1 + 64)
    post = (0.5 + np.asarray(ys).sum(0)) / 65.0
    np.testing.assert_allclose(loc_s, loc_u, atol=1e-6)
    np.testing.assert_allclose(loc_s, post, atol=0.1)
