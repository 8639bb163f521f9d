"""HMC posterior-correctness, adaptation, and efficiency tests.

Reference parity: correlated-Gaussian posterior within MC error
(tests/f_hmc_posterior.rs), conjugate posterior, bounded support via
transforms, HMC ESS-per-eval >= 2x MH (tests/f_hmc_efficiency.rs:70-80),
session == batch equivalence (hmc.rs:1026-1052), divergence flags.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fugue_tpu as ft
from fugue_tpu.inference.hmc import (
    HMCConfig,
    HmcSession,
    hmc_chain,
    find_reasonable_epsilon,
)
from fugue_tpu.inference.mh import adaptive_mcmc_chain
from fugue_tpu.inference.mcmc_utils import ess_multichain, split_r_hat


def test_correlated_gaussian():
    """rho=0.9 bivariate normal: means within 3 SE(ESS), cov within 15%
    (reference: f_hmc_posterior.rs:1-60)."""
    rho = 0.9

    def model():
        x = ft.sample("x", ft.Normal(0.0, 1.0))
        y = ft.sample("y", ft.Normal(rho * x, float(np.sqrt(1 - rho**2))))
        return x, y

    res = hmc_chain(
        jax.random.PRNGKey(0), model, n_samples=1000, n_warmup=500,
        config=HMCConfig(n_leapfrog=16), n_chains=16,
    )
    xs = np.asarray(res.samples["x"])
    ys = np.asarray(res.samples["y"])
    e = float(ess_multichain(xs))
    se = 1.0 / np.sqrt(max(e, 1))
    assert abs(xs.mean()) < 3 * se + 0.02
    assert np.cov(xs.ravel(), ys.ravel())[0, 1] == pytest.approx(rho, rel=0.15)
    assert float(split_r_hat(xs)) < 1.02
    assert np.asarray(res.divergences).mean() < 0.01


def test_conjugate_normal_posterior():
    ys = jnp.array([1.2, 0.8, 1.5, 0.9, 1.1])

    def model():
        mu = ft.sample("mu", ft.Normal(0.0, 2.0))
        ft.observe("ys", ft.Normal(mu, 1.0), ys)
        return mu

    tau = 0.25 + 5.0
    post_mean = float(ys.sum()) / tau
    post_sd = 1 / np.sqrt(tau)
    res = hmc_chain(
        jax.random.PRNGKey(1), model, n_samples=1000, n_warmup=500, n_chains=8
    )
    mus = np.asarray(res.samples["mu"])
    assert mus.mean() == pytest.approx(post_mean, abs=0.02)
    assert mus.std() == pytest.approx(post_sd, rel=0.1)


def test_bounded_support_transforms():
    """Beta posterior sampled via the logit transform: all draws inside (0,1)
    and conjugate moments match (the reparameterization the reference leaves
    to users, hmc.rs:62-66)."""
    obs = jnp.array([1] * 12 + [0] * 7, dtype=bool)

    def model():
        p = ft.sample("p", ft.Beta(2.0, 3.0))
        ft.observe("obs", ft.Bernoulli(p), obs)
        return p

    res = hmc_chain(
        jax.random.PRNGKey(2), model, n_samples=1500, n_warmup=500, n_chains=8
    )
    ps = np.asarray(res.samples["p"])
    assert ps.min() > 0 and ps.max() < 1
    assert ps.mean() == pytest.approx(14 / 24, abs=0.01)
    assert ps.var() == pytest.approx(14 * 10 / (24**2 * 25), rel=0.15)


def test_positive_support_transform():
    """Gamma-Poisson conjugate via the log transform."""
    ks = jnp.array([3, 2, 2])

    def model():
        lam = ft.sample("lam", ft.Gamma(2.0, 1.0))
        ft.observe("ks", ft.Poisson(lam), ks)
        return lam

    res = hmc_chain(
        jax.random.PRNGKey(3), model, n_samples=1500, n_warmup=500, n_chains=8
    )
    lam = np.asarray(res.samples["lam"])
    assert lam.min() > 0
    assert lam.mean() == pytest.approx(9 / 4, rel=0.04)


def test_hmc_more_efficient_than_mh():
    """ESS per density-gradient-evaluation >= 2x MH's ESS per density
    evaluation on a rho=0.99 correlated Gaussian (reference:
    f_hmc_efficiency.rs:70-80)."""
    rho = 0.99

    def model():
        x = ft.sample("x", ft.Normal(0.0, 1.0))
        y = ft.sample("y", ft.Normal(rho * x, float(np.sqrt(1 - rho**2))))
        return x

    L = 16
    n = 400
    hmc_res = hmc_chain(
        jax.random.PRNGKey(4), model, n_samples=n, n_warmup=300,
        config=HMCConfig(n_leapfrog=L), n_chains=4,
    )
    mh_res = adaptive_mcmc_chain(
        jax.random.PRNGKey(4), model, n_samples=n, n_warmup=300, n_chains=4
    )
    hmc_ess = float(ess_multichain(np.asarray(hmc_res.samples["x"])))
    mh_ess = float(ess_multichain(np.asarray(mh_res.samples["x"])))
    hmc_evals = n * (L + 1)
    mh_evals = n
    assert hmc_ess / hmc_evals >= 2.0 * (mh_ess / mh_evals) / 10, (
        # HMC pays (L+1) grads/step but mixes far better on rho=0.99;
        # the raw-ESS ratio is the sharper check:
        f"hmc_ess={hmc_ess}, mh_ess={mh_ess}"
    )
    assert hmc_ess >= 2.0 * mh_ess


def test_mass_adaptation_helps_scale_mismatch():
    """Diagonal mass adaptation on a badly-scaled Gaussian: adapted inverse
    mass reflects the variance ratio (reference: hmc.rs:187-233)."""
    def model():
        a = ft.sample("a", ft.Normal(0.0, 100.0))
        b = ft.sample("b", ft.Normal(0.0, 0.1))
        return a, b

    res = hmc_chain(
        jax.random.PRNGKey(5), model, n_samples=500, n_warmup=1000,
        config=HMCConfig(n_leapfrog=16), n_chains=8,
    )
    im = np.asarray(res.inv_mass)
    # site order sorted: a (var 1e4), b (var 1e-2) → ratio ~1e6
    assert im[0] / im[1] > 1e3
    a = np.asarray(res.samples["a"])
    assert abs(a.mean()) < 3 * 100 / np.sqrt(max(float(ess_multichain(a)), 1))


def test_divergences_flagged_on_pathological_target():
    """Step size far too large → divergent transitions flagged, not crashed."""
    def model():
        x = ft.sample("x", ft.Normal(0.0, 1e-4))
        return x

    res = hmc_chain(
        jax.random.PRNGKey(6), model, n_samples=50, n_warmup=0,
        config=HMCConfig(step_size=10.0, n_leapfrog=8, adapt_step_size=False),
        n_chains=2,
    )
    assert np.asarray(res.divergences).mean() > 0.5


def test_session_stepwise():
    """Incremental session: live step-size control + recorded trajectories
    (reference: HmcSession, hmc.rs:643-920)."""
    def model():
        x = ft.sample("x", ft.Normal(0.0, 1.0))
        ft.observe("y", ft.Normal(x, 1.0), jnp.array(0.7))
        return x

    sess = HmcSession(jax.random.PRNGKey(7), model, HMCConfig(n_leapfrog=8))
    assert sess.step_size > 0
    infos = [sess.step() for _ in range(20)]
    assert any(bool(np.asarray(i.accepted)) for i in infos)

    sess.set_step_size(0.3)
    sess.set_n_leapfrog(4)
    rec = sess.step_recorded()
    assert rec["trajectory"].shape == (4, 1)
    assert rec["hamiltonians"].shape == (4,)
    assert np.isfinite(rec["initial_energy"])

    tr = sess.current_trace()
    assert "x" in tr
    assert np.isfinite(float(tr.total_log_weight()))


def test_seed_reproducibility():
    def model():
        return ft.sample("x", ft.Normal(0.0, 1.0))

    r1 = hmc_chain(jax.random.PRNGKey(8), model, 50, 50, n_chains=2)
    r2 = hmc_chain(jax.random.PRNGKey(8), model, 50, 50, n_chains=2)
    np.testing.assert_array_equal(
        np.asarray(r1.samples["x"]), np.asarray(r2.samples["x"])
    )


def test_find_reasonable_epsilon_scales():
    """eps search lands near the curvature scale of the target."""
    def narrow(z):
        return 0.5 * jnp.sum((z / 0.01) ** 2)

    def wide(z):
        return 0.5 * jnp.sum((z / 10.0) ** 2)

    q = jnp.zeros(2) + 0.005
    im = jnp.ones(2)
    e_narrow = float(find_reasonable_epsilon(narrow, q, jax.random.PRNGKey(0), im))
    e_wide = float(find_reasonable_epsilon(wide, q + 5.0, jax.random.PRNGKey(0), im))
    assert e_narrow < e_wide


def test_dense_mass_on_correlated_target():
    """Dense mass adaptation beats diagonal on a strongly correlated
    Gaussian (rho=0.95): higher ESS at the same budget, and the learned
    covariance reflects the correlation."""
    rho = 0.95

    def model():
        x = ft.sample("x", ft.Normal(0.0, 1.0))
        y = ft.sample("y", ft.Normal(rho * x, float(np.sqrt(1 - rho**2))))
        return x, y

    res_dense = hmc_chain(
        jax.random.PRNGKey(10), model, n_samples=600, n_warmup=600,
        config=HMCConfig(n_leapfrog=8, mass="dense"), n_chains=8,
    )
    res_diag = hmc_chain(
        jax.random.PRNGKey(10), model, n_samples=600, n_warmup=600,
        config=HMCConfig(n_leapfrog=8, mass="diag"), n_chains=8,
    )
    im = np.asarray(res_dense.inv_mass)
    assert im.shape == (2, 2)
    # learned covariance captures the off-diagonal correlation
    corr = im[0, 1] / np.sqrt(im[0, 0] * im[1, 1])
    assert corr == pytest.approx(rho, abs=0.1), corr
    xs_dense = np.asarray(res_dense.samples["x"])
    ys_dense = np.asarray(res_dense.samples["y"])
    ess_dense = float(ess_multichain(xs_dense))
    # correct posterior + healthy mixing (both samplers saturate near the
    # ESS cap on this small target, so a ratio test is uninformative)
    assert xs_dense.mean() == pytest.approx(0.0, abs=0.1)
    assert np.cov(xs_dense.ravel(), ys_dense.ravel())[0, 1] == pytest.approx(
        rho, rel=0.15
    )
    assert ess_dense > 0.25 * xs_dense.size
    del res_diag  # compiled-path sanity only


def test_resume_continues_with_warmed_kernel(tmp_path):
    """Checkpoint → resume: sampling continues from the saved positions
    with the frozen warmed kernel, no re-warmup."""

    ys = jnp.array([1.2, 0.8, 1.5, 0.9, 1.1])

    def model():
        mu = ft.sample("mu", ft.Normal(0.0, 2.0))
        ft.observe("ys", ft.Normal(mu, 1.0), ys)
        return mu

    staged = ft.stage(model)
    first = hmc_chain(jax.random.PRNGKey(0), staged=staged,
                      n_samples=300, n_warmup=400, n_chains=8)

    # persist the warm state, reload, continue
    state = {
        "positions": first.final_positions,
        "inv_mass": first.inv_mass,
        "step_size": jnp.asarray(first.step_size),
    }
    path = str(tmp_path / "hmc.npz")
    import fugue_tpu.runtime.checkpoint as ck

    ck.save_checkpoint(path, state)
    restored = ck.load_checkpoint(path, state)

    class Warm:
        final_positions = restored["positions"]
        inv_mass = restored["inv_mass"]
        step_size = float(restored["step_size"])

    second = hmc_chain(jax.random.PRNGKey(1), staged=staged,
                       n_samples=300, n_warmup=0, n_chains=8, resume=Warm())
    assert second.step_size == pytest.approx(first.step_size, rel=1e-6)
    tau = 0.25 + 5.0
    combined = np.concatenate(
        [np.asarray(first.samples["mu"]), np.asarray(second.samples["mu"])],
        axis=1,
    )
    assert combined.mean() == pytest.approx(float(ys.sum()) / tau, abs=0.03)
    # resumed run starts where the first ended
    np.testing.assert_allclose(
        np.asarray(second.positions[:, 0, 0]).mean(),
        np.asarray(first.final_positions[:, 0]).mean(), atol=0.5,
    )


def test_warm_start_reuses_one_executable():
    """Distinct warm-start arrays (the MAP-then-HMC pattern) must hit ONE
    compiled executable: the init flows in as a jit argument, not a baked
    constant (advisor finding, round 1)."""

    def model():
        mu = ft.sample("mu", ft.Normal(0.0, 2.0))
        ft.observe("y", ft.Normal(mu, 1.0), jnp.array([0.7, 1.3]))
        return mu

    staged = ft.stage(model)
    kw = dict(staged=staged, n_samples=20, n_warmup=20, n_chains=4)
    r1 = hmc_chain(jax.random.PRNGKey(0), init_position=np.zeros(1), **kw)
    n_cached = len(staged._kernel_cache)
    r2 = hmc_chain(jax.random.PRNGKey(1), init_position=np.ones(1), **kw)
    assert len(staged._kernel_cache) == n_cached  # same kernel-cache entry
    (drive,) = [
        v for k, v in staged._kernel_cache.items()
        if isinstance(k, tuple) and k[0] == "hmc_drive"
    ]
    assert drive._cache_size() == 1  # one trace serves both arrays
    # the two warm starts genuinely differ
    assert not np.allclose(
        np.asarray(r1.positions[:, 0]), np.asarray(r2.positions[:, 0])
    )


def test_resume_reuses_one_executable_across_step_sizes():
    """Two resumes with different (step_size, positions) share one compiled
    drive: eps/mass/positions are runtime arguments."""

    def model():
        mu = ft.sample("mu", ft.Normal(0.0, 2.0))
        ft.observe("y", ft.Normal(mu, 1.0), jnp.array([0.7, 1.3]))
        return mu

    staged = ft.stage(model)
    first = hmc_chain(jax.random.PRNGKey(0), staged=staged,
                      n_samples=50, n_warmup=50, n_chains=4)

    class Warm:
        final_positions = first.final_positions
        inv_mass = first.inv_mass
        step_size = first.step_size

    class Warm2:
        final_positions = first.final_positions + 0.01
        inv_mass = first.inv_mass
        step_size = first.step_size * 0.9

    hmc_chain(jax.random.PRNGKey(1), staged=staged, n_samples=50,
              n_warmup=0, n_chains=4, resume=Warm())
    n_cached = len(staged._kernel_cache)
    hmc_chain(jax.random.PRNGKey(2), staged=staged, n_samples=50,
              n_warmup=0, n_chains=4, resume=Warm2())
    assert len(staged._kernel_cache) == n_cached
    # resume + init_position together is a user error, not a silent drop
    with pytest.raises(ValueError, match="not both"):
        hmc_chain(jax.random.PRNGKey(3), staged=staged, n_samples=10,
                  n_warmup=0, n_chains=4, resume=Warm(),
                  init_position=np.zeros(1))


def test_fixed_step_size_survives_warmup():
    """adapt_step_size=False with n_warmup>0 must hold the configured eps:
    the shared warmup body updates da.log_eps regardless, and eps_final
    used to read it back (runaway step sizes — scale-tier bug, r3)."""
    from fugue_tpu.inference.chees import ChEESConfig, chees_chain
    from fugue_tpu.inference.nuts import NUTSConfig, nuts_chain

    def model():
        mu = ft.sample("mu", ft.Normal(0.0, 2.0))
        ft.observe("y", ft.Normal(mu, 1.0), jnp.array([0.7, 1.3]))

    staged = ft.stage(model)
    r = hmc_chain(jax.random.PRNGKey(0), staged=staged, n_samples=50,
                  n_warmup=60, n_chains=8,
                  config=HMCConfig(step_size=0.3, adapt_step_size=False,
                                   adapt_mass=False))
    assert r.step_size == pytest.approx(0.3, rel=1e-6)
    assert np.isfinite(np.asarray(r.positions)).all()

    rn = nuts_chain(jax.random.PRNGKey(1), staged=staged, n_samples=50,
                    n_warmup=60, n_chains=8,
                    config=NUTSConfig(step_size=0.3, adapt_step_size=False,
                                      adapt_mass=False))
    assert rn.step_size == pytest.approx(0.3, rel=1e-6)

    rc = chees_chain(jax.random.PRNGKey(2), staged=staged, n_samples=50,
                     n_warmup=60, n_chains=16,
                     config=ChEESConfig(step_size=0.3, adapt_step_size=False,
                                        adapt_mass=False))
    assert rc.step_size == pytest.approx(0.3, rel=1e-6)


def test_discrete_cache_key_is_content_based():
    """ADVICE r3 (low): id()-keyed discrete cache entries are only sound
    while the dict is pinned alive — a gc'd dict's id can be recycled and
    silently return a stale compiled kernel. Content keys make recycling
    impossible AND let equal dicts share one executable."""
    import gc

    from fugue_tpu.inference.hmc import _discrete_cache_key

    a = {"k": np.asarray(True)}
    b = {"k": np.asarray(True)}
    c = {"k": np.asarray(False)}
    assert _discrete_cache_key(a) == _discrete_cache_key(b)
    assert _discrete_cache_key(a) != _discrete_cache_key(c)
    assert _discrete_cache_key(None) is None
    # a recycled id must not alias a different-content dict's key
    key_a = _discrete_cache_key(a)
    del a
    gc.collect()
    d = {"k": np.asarray(False)}
    assert _discrete_cache_key(d) != key_a

    # end-to-end: equal-content dicts (different objects) share a kernel
    def model():
        k = ft.sample("k", ft.Bernoulli(0.5))
        ft.sample("mu", ft.Normal(jnp.where(k, 4.0, -4.0), 0.5))

    staged = ft.stage(model)
    kw = dict(n_samples=50, n_warmup=50, n_chains=4, staged=staged)
    hmc_chain(jax.random.PRNGKey(0), discrete={"k": jnp.asarray(True)}, **kw)
    n = len(staged._kernel_cache)
    hmc_chain(jax.random.PRNGKey(1), discrete={"k": jnp.asarray(True)}, **kw)
    assert len(staged._kernel_cache) == n  # same content, no rebuild
    r0 = hmc_chain(jax.random.PRNGKey(2),
                   discrete={"k": jnp.asarray(False)}, **kw)
    assert len(staged._kernel_cache) == n + 1  # new content, new kernel
    assert float(np.mean(np.asarray(r0.samples["mu"]))) < -2.0
