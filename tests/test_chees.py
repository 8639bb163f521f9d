"""ChEES-HMC (inference/chees.py): cross-chain learned trajectory lengths.

No reference counterpart (fugue's HMC has fixed user-chosen L,
src/inference/hmc.rs:105-135); validation is against closed forms and the
structural claims of Hoffman, Radul & Sountsov 2021.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fugue_tpu as ft
from fugue_tpu.inference.chees import (
    ChEESConfig,
    chees_chain,
    halton_sequence,
    preconditioned_anisotropy,
)
from fugue_tpu.inference.mcmc_utils import ess_multichain, split_r_hat


def test_preconditioned_anisotropy_known_spectrum():
    """criterion_advice's measurement primitive on a known covariance:
    N(0, diag(4, 1, 1)) draws with unit mass read (leading, median) sd
    (2, 1); the mass that preconditions the target exactly reads
    isotropic (ratio -> 1)."""
    rng = np.random.default_rng(0)
    P = rng.normal(size=(8, 500, 3)) * np.array([2.0, 1.0, 1.0])
    lead, med = preconditioned_anisotropy(P, np.ones(3))
    assert abs(lead - 2.0) < 0.1, lead
    assert abs(med - 1.0) < 0.05, med
    lead2, med2 = preconditioned_anisotropy(P, np.array([4.0, 1.0, 1.0]))
    assert lead2 / med2 < 1.1, (lead2, med2)


def test_halton_sequence_low_discrepancy():
    h = halton_sequence(256)
    assert h.shape == (256,)
    assert np.all((h > 0) & (h < 1))
    # van der Corput base 2: first points are 1/2, 1/4, 3/4, 1/8...
    np.testing.assert_allclose(h[:4], [0.5, 0.25, 0.75, 0.125])
    # every dyadic bin of width 1/16 gets exactly 16 of 256 points
    counts = np.histogram(h, bins=16, range=(0, 1))[0]
    assert counts.min() == counts.max() == 16


def test_conjugate_normal_posterior():
    # prior N(0,1), 5 obs at sigma=1 → posterior N(sum_y/6, 1/6)
    y = jnp.array([0.8, 1.2, 1.0, 0.6, 1.4])

    def model():
        mu = ft.sample("mu", ft.Normal(0.0, 1.0))
        ft.observe("y", ft.Normal(mu, 1.0), y)

    res = chees_chain(
        jax.random.PRNGKey(0), model, n_samples=1500, n_warmup=1000,
        n_chains=32,
    )
    mu = np.asarray(res.samples["mu"]).reshape(-1)
    post_mean = float(jnp.sum(y)) / 6.0
    post_var = 1.0 / 6.0
    se = np.sqrt(post_var / 2000.0)
    assert abs(mu.mean() - post_mean) < 4 * se + 0.005
    assert abs(mu.var() - post_var) < 0.15 * post_var
    assert float(np.mean(res.accept_prob)) > 0.5
    assert float(np.mean(res.divergences)) < 0.01
    # well-preconditioned target: no criterion switch advised (measured
    # anisotropy ~1.0)
    advice = res.criterion_advice()
    assert advice["recommendation"] is None
    assert advice["ratio"] < 1.3, advice


def test_correlated_gaussian_covariance_recovery():
    rho = 0.9
    cov = jnp.array([[1.0, rho], [rho, 1.0]])

    def model():
        ft.sample("x", ft.MultivariateNormal(jnp.zeros(2), cov))

    res = chees_chain(
        jax.random.PRNGKey(1), model, n_samples=1000, n_warmup=1000,
        n_chains=64,
    )
    x = np.asarray(res.samples["x"]).reshape(-1, 2)
    c = np.cov(x.T)
    np.testing.assert_allclose(x.mean(0), [0.0, 0.0], atol=0.06)
    np.testing.assert_allclose(c, np.asarray(cov), atol=0.12)


def test_trajectory_length_adapts_to_widest_scale():
    """Anisotropic Gaussian with mass adaptation OFF: the only way to reach
    target ESS on the sigma=8 axis is a long trajectory — ChEES must grow T
    well past the small-step regime (the quantity NUTS finds by tree
    doubling, learned here by cross-chain gradients)."""

    def model():
        ft.sample("a", ft.Normal(0.0, 1.0))
        ft.sample("b", ft.Normal(0.0, 8.0))

    res = chees_chain(
        jax.random.PRNGKey(2), model, n_samples=500, n_warmup=1500,
        n_chains=64, config=ChEESConfig(adapt_mass=False),
    )
    # optimal tau ~ (pi/2)*sigma_max ≈ 12.6; adapted MAX length T should be
    # of that order, and far above the step size
    assert res.trajectory_length > 4.0
    assert res.mean_leapfrog > 3.0
    b = np.asarray(res.samples["b"]).reshape(-1)
    assert abs(b.std() - 8.0) < 1.2


def test_eight_schools_quality():
    y = jnp.array([28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0])
    sigma = jnp.array([15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0])

    def model():
        mu = ft.sample("mu", ft.Normal(0.0, 5.0))
        tau = ft.sample("tau", ft.LogNormal(0.0, 1.0))
        theta_raw = ft.sample("theta_raw", ft.Normal(0.0, 1.0), sample_shape=(8,))
        ft.observe("y", ft.Normal(mu + tau * theta_raw, sigma), y)

    # funnel-ish geometry: target 0.8 (as HMC/NUTS default) keeps the step
    # size conservative enough; the paper's 0.651 is tuned for smooth targets
    res = chees_chain(
        jax.random.PRNGKey(3), model, n_samples=1000, n_warmup=1000,
        n_chains=32, config=ChEESConfig(target_accept=0.8),
    )
    mu = np.asarray(res.samples["mu"])  # (chains, samples)
    rh = float(ft.split_r_hat(mu))
    assert rh < 1.02, rh
    assert float(np.mean(res.divergences)) < 0.03
    assert abs(mu.mean() - 4.4) < 1.5  # posterior mean of mu ≈ 4.4
    # the regime where plain "chees" is the measured best (1.45x snaper
    # ESS/grad): the advice must NOT steer the user away from it
    assert res.criterion_advice()["recommendation"] is None


def test_seed_reproducibility():
    def model():
        mu = ft.sample("mu", ft.Normal(0.0, 1.0))
        ft.observe("y", ft.Normal(mu, 1.0), jnp.array(0.5))

    r1 = chees_chain(jax.random.PRNGKey(7), model, n_samples=50,
                     n_warmup=50, n_chains=8)
    r2 = chees_chain(jax.random.PRNGKey(7), model, n_samples=50,
                     n_warmup=50, n_chains=8)
    np.testing.assert_array_equal(
        np.asarray(r1.positions), np.asarray(r2.positions)
    )


def test_no_continuous_sites_raises():
    def m():
        ft.sample("b", ft.Bernoulli(0.5))

    with pytest.raises(ValueError, match="no continuous"):
        chees_chain(jax.random.PRNGKey(0), m, n_samples=10, n_warmup=10)


def test_works_on_marginalized_model():
    def switch():
        z = ft.sample("z", ft.Bernoulli(0.3))
        th = ft.sample("theta", ft.Normal(0.0, 1.0))
        ft.observe("y", ft.Normal(th + jnp.where(z, 2.0, -2.0), 1.0),
                   jnp.array(1.5))

    marg = ft.marginalize(switch)
    res = chees_chain(jax.random.PRNGKey(5), staged=marg, n_samples=500,
                      n_warmup=500, n_chains=16)
    th = np.asarray(res.samples["theta"]).reshape(-1)
    assert abs(th.mean() - (-0.042)) < 0.1  # quadrature truth


def test_chees_gradient_f32_overflow_and_inf_guard():
    """Regression: the first on-chip run NaN'd the trajectory length because
    a finite-but-huge f32 proposal overflowed inside the weighted branch and
    poisoned Adam's second moment. The gradient must stay finite for any
    input."""
    from fugue_tpu.inference.chees import chees_gradient

    cm = lambda x, axis=0: jnp.mean(x, axis=axis)
    n, d = 8, 4
    Q = jnp.zeros((n, d), jnp.float32)
    ap = jnp.ones((n,), jnp.float32)
    h = jnp.float32(0.5)

    # finite-but-huge: squared norm overflows f32 to inf
    Qp = jnp.full((n, d), 1e20, jnp.float32)
    V = jnp.full((n, d), 1e20, jnp.float32)
    assert np.isfinite(float(chees_gradient(Q, Qp, V, ap, h, cm)))

    # outright inf/nan rows are masked, the rest still contribute
    Qp2 = jnp.ones((n, d), jnp.float32).at[0].set(jnp.inf).at[1].set(jnp.nan)
    V2 = jnp.ones((n, d), jnp.float32)
    assert np.isfinite(float(chees_gradient(Q, Qp2, V2, ap, h, cm)))

    # all-divergent batch (w == 0 everywhere) degrades to zero, not NaN
    assert float(chees_gradient(Q, Qp2, V2, jnp.zeros((n,), jnp.float32), h, cm)) == 0.0


def test_chees_gradient_matches_direct_formula():
    from fugue_tpu.inference.chees import chees_gradient

    rng = np.random.default_rng(0)
    n, d = 16, 3
    Q = jnp.asarray(rng.normal(size=(n, d)))
    Qp = jnp.asarray(rng.normal(size=(n, d)))
    V = jnp.asarray(rng.normal(size=(n, d)))
    ap = jnp.asarray(rng.uniform(0.2, 1.0, n))
    h = 0.7
    cm = lambda x, axis=0: jnp.mean(x, axis=axis)
    got = float(chees_gradient(Q, Qp, V, ap, h, cm))

    w = np.asarray(ap)
    qb = (np.asarray(Q) * w[:, None]).mean(0) / w.mean()
    qpb = (np.asarray(Qp) * w[:, None]).mean(0) / w.mean()
    Qc, Qpc = np.asarray(Q) - qb, np.asarray(Qp) - qpb
    dsq = (Qpc**2).sum(1) - (Qc**2).sum(1)
    inner = (Qpc * np.asarray(V)).sum(1)
    expect = (w * h * dsq * inner).mean() / w.mean()
    assert got == pytest.approx(expect, rel=1e-6)


def test_map_warm_start():
    """MAP-then-ChEES: a (d,) warm start is jittered per chain and passed as
    a traced argument (no retrace across distinct warm-start arrays)."""
    def model():
        mu = ft.sample("mu", ft.Normal(0.0, 1.0))
        ft.observe("y", ft.Normal(mu, 1.0), jnp.array([0.8, 1.2]))

    staged = ft.stage(model)
    m = ft.map_estimate(jax.random.PRNGKey(0), staged=staged)
    r1 = chees_chain(jax.random.PRNGKey(1), staged=staged, n_samples=300,
                     n_warmup=300, n_chains=16, init_position=m.z)
    mu = np.asarray(r1.samples["mu"]).reshape(-1)
    assert abs(mu.mean() - 2.0 / 3.0) < 0.05
    # distinct warm-start arrays reuse the cached executable
    n_kernels = len(staged._kernel_cache)
    chees_chain(jax.random.PRNGKey(2), staged=staged, n_samples=300,
                n_warmup=300, n_chains=16, init_position=m.z + 0.01)
    assert len(staged._kernel_cache) == n_kernels


def test_discrete_values_not_stale_in_kernel_cache():
    """ADVICE r2 (high): the drive cache keyed discrete conditioning on site
    NAMES only while the values were baked into the jitted closure, so a
    second call on the same staged model with different values silently
    reused the first call's kernel (stale conditioning)."""
    def model():
        k = ft.sample("k", ft.Bernoulli(0.5))
        ft.sample("mu", ft.Normal(jnp.where(k, 4.0, -4.0), 0.5))

    staged = ft.stage(model)
    kw = dict(n_samples=300, n_warmup=300, n_chains=16, staged=staged)
    r1 = chees_chain(jax.random.PRNGKey(3),
                     discrete={"k": jnp.asarray(True)}, **kw)
    r0 = chees_chain(jax.random.PRNGKey(3),
                     discrete={"k": jnp.asarray(False)}, **kw)
    assert float(np.mean(np.asarray(r1.samples["mu"]))) > 2.0
    assert float(np.mean(np.asarray(r0.samples["mu"]))) < -2.0


def test_n_warmup_one_runs_exactly_one_warmup_transition():
    """ADVICE r2 (low): n_warmup=1 used to force both warmup scans to one
    iteration each (two transitions), consuming halton[0] twice and
    misaligning the sampling phase's jitter offset."""
    def model():
        ft.sample("mu", ft.Normal(0.0, 1.0))

    for nw in (0, 1, 2, 3):
        r = chees_chain(jax.random.PRNGKey(5), model, n_samples=16,
                        n_warmup=nw, n_chains=8)
        assert r.samples["mu"].shape == (8, 16)
        assert np.all(np.isfinite(np.asarray(r.log_joint)))


def test_resume_continues_with_warmed_kernel():
    """VERDICT r2 item 8: resume= parity — (positions, step size, learned
    trajectory length, mass) persist through a value; split 2x500 matches
    the conjugate posterior; repeated resumes share one executable."""
    ys = jnp.array([1.2, 0.8, 1.5, 0.9, 1.1])

    def model():
        mu = ft.sample("mu", ft.Normal(0.0, 2.0))
        ft.observe("ys", ft.Normal(mu, 1.0), ys)

    staged = ft.stage(model)
    first = chees_chain(jax.random.PRNGKey(0), staged=staged,
                        n_samples=500, n_warmup=500, n_chains=16)
    second = chees_chain(jax.random.PRNGKey(1), staged=staged,
                         n_samples=500, n_warmup=0, n_chains=16,
                         resume=first)
    assert second.step_size == pytest.approx(first.step_size, rel=1e-6)
    assert second.trajectory_length == pytest.approx(
        first.trajectory_length, rel=1e-5)
    np.testing.assert_allclose(
        np.asarray(second.positions[:, 0, 0]).mean(),
        np.asarray(first.final_positions[:, 0]).mean(), atol=0.5,
    )
    tau = 0.25 + 5.0
    combined = np.concatenate(
        [np.asarray(first.samples["mu"]), np.asarray(second.samples["mu"])],
        axis=1,
    )
    assert combined.mean() == pytest.approx(float(ys.sum()) / tau, abs=0.03)
    assert combined.var() == pytest.approx(1.0 / tau, rel=0.2)
    n_cached = len(staged._kernel_cache)

    class Warm2:
        final_positions = first.final_positions + 0.01
        inv_mass = first.inv_mass
        step_size = first.step_size * 0.9
        trajectory_length = first.trajectory_length

    chees_chain(jax.random.PRNGKey(2), staged=staged, n_samples=500,
                n_warmup=0, n_chains=16, resume=Warm2())
    assert len(staged._kernel_cache) == n_cached
    with pytest.raises(ValueError, match="not both"):
        chees_chain(jax.random.PRNGKey(3), staged=staged, n_samples=10,
                    n_warmup=0, n_chains=16, resume=first,
                    init_position=np.zeros(1))


def test_trajectory_cap_bounds_learned_T():
    """The ChEES criterion has spurious maxima at period MULTIPLES (T ~=
    k*2pi leaves q' ~= q); after mass adaptation the learned T must stay
    within max_trajectory_periods preconditioned periods (r3 bench caught a
    seed riding T to ~5 periods with 4x the divergence rate)."""
    def model():
        ft.sample("x", ft.Normal(0.0, 1.0), sample_shape=(4,))

    r = chees_chain(jax.random.PRNGKey(0), model, n_samples=100,
                    n_warmup=400, n_chains=32)
    assert r.trajectory_length <= 2 * np.pi + 1e-3

    r2 = chees_chain(jax.random.PRNGKey(0), model, n_samples=100,
                     n_warmup=400, n_chains=32,
                     config=ChEESConfig(max_trajectory_periods=0.25))
    assert r2.trajectory_length <= 0.5 * np.pi + 1e-3


def test_snaper_gradient_matches_direct_formula():
    """criterion='snaper': the surrogate applies the ChEES update to the
    squared projection onto `proj` — d(x'.u)^2/dT = 2(x'.u)(v'.u)."""
    from fugue_tpu.inference.chees import chees_gradient

    rng = np.random.default_rng(1)
    n, d = 16, 3
    Q = jnp.asarray(rng.normal(size=(n, d)))
    Qp = jnp.asarray(rng.normal(size=(n, d)))
    V = jnp.asarray(rng.normal(size=(n, d)))
    ap = jnp.asarray(rng.uniform(0.2, 1.0, n))
    u = rng.normal(size=d)
    u = u / np.linalg.norm(u)
    h = 0.7
    cm = lambda x, axis=0: jnp.mean(x, axis=axis)
    got = float(chees_gradient(Q, Qp, V, ap, h, cm, proj=jnp.asarray(u)))

    w = np.asarray(ap)
    qb = (np.asarray(Q) * w[:, None]).mean(0) / w.mean()
    qpb = (np.asarray(Qp) * w[:, None]).mean(0) / w.mean()
    pq = (np.asarray(Q) - qb) @ u
    pqp = (np.asarray(Qp) - qpb) @ u
    pv = np.asarray(V) @ u
    expect = (w * h * (pqp**2 - pq**2) * pqp * pv).mean() / w.mean()
    assert got == pytest.approx(expect, rel=1e-6)


def test_snaper_fixes_flat_criterion_on_correlated_glm():
    """The r4 measured limitation (VERDICT r4 weak #1): on N >> d targets
    with a rotated, ill-conditioned spectrum — which diagonal mass cannot
    equalize — the full-state ChEES criterion dephases (near-flat in T) and
    the learned T collapses toward the short shoulder; SNAPER projects onto
    the online-estimated leading principal direction and keeps a sharp
    optimum. Pinned seed; measured at d=64/N=8192 the gap is 1.85x
    ESS/leapfrog (probe_snaper_glm), asserted here at a CI-sized replica
    (measured margins at this seed: T ratio 1.40, ESS/leapfrog ratio
    1.36)."""
    d, N = 64, 4096
    rng = np.random.default_rng(3)
    Z = rng.normal(size=(N, d)) / np.sqrt(d)
    Qr, _ = np.linalg.qr(rng.normal(size=(d, d)))
    A = Qr @ np.diag(np.exp(np.linspace(np.log(0.2), np.log(3.0), d))) @ Qr.T
    X = jnp.asarray(Z @ A)
    beta_true = rng.normal(size=d)
    y = jnp.asarray(rng.random(N) < 1 / (1 + np.exp(-(Z @ A) @ beta_true)))

    def model(X, y):
        b = ft.sample("b", ft.Normal(jnp.zeros(d), 1.0))
        ft.observe("y", ft.Bernoulli(jax.nn.sigmoid(X @ b)), y)

    staged = ft.stage(model, X, y)
    out = {}
    advice = {}
    for crit in ("chees", "snaper"):
        res = chees_chain(
            jax.random.PRNGKey(0), staged=staged, n_samples=250,
            n_warmup=400, n_chains=32, config=ChEESConfig(criterion=crit),
        )
        xs = np.asarray(res.samples["b"])
        ess = min(float(ess_multichain(xs[..., j])) for j in range(d))
        out[crit] = (res.trajectory_length, res.mean_leapfrog, ess,
                     max(float(split_r_hat(xs[..., j])) for j in range(d)))
        advice[crit] = res.criterion_advice()
    # the post-run advisory detects this exact regime from the chees run's
    # own samples (measured residual anisotropy 2.34x) and recommends the
    # fix; the snaper run never advises a switch
    assert advice["chees"]["recommendation"] == "snaper", advice
    assert advice["chees"]["ratio"] > 1.8, advice
    assert advice["snaper"]["recommendation"] is None
    t_c, L_c, ess_c, _rh_c = out["chees"]
    t_s, L_s, ess_s, rh_s = out["snaper"]
    # snaper resists the collapse: longer learned trajectories...
    assert t_s > 1.2 * t_c, out
    # ...that buy MORE effective samples per leapfrog, not fewer
    assert ess_s / L_s > 1.15 * (ess_c / L_c), out
    assert rh_s < 1.03, out


def test_snaper_matches_conjugate_posterior():
    """criterion='snaper' stays exact: conjugate normal-normal check (the
    adaptation criterion must not bias the invariant distribution)."""
    ys = jnp.asarray([1.2, 0.8, 1.0, 1.4])

    def model():
        mu = ft.sample("mu", ft.Normal(0.0, 2.0))
        ft.observe("ys", ft.Normal(mu, 1.0), ys)
        return mu

    res = chees_chain(jax.random.PRNGKey(0), model, n_samples=800,
                      n_warmup=500, n_chains=64,
                      config=ChEESConfig(criterion="snaper"))
    mus = np.asarray(res.samples["mu"])
    tau = 0.25 + 4.0
    assert mus.mean() == pytest.approx(4.4 / tau, abs=0.03)
    assert mus.std() == pytest.approx(1 / np.sqrt(tau), abs=0.03)


def test_oja_update_f32_inf_rows_masked():
    """CLAUDE.md f32 discipline: the chip runs f32 while CPU tests run x64,
    so every adaptation recursion that can see a diverged (inf) position
    needs explicit masking. One inf row must not poison the principal
    direction, and an all-inf batch keeps the previous direction."""
    from fugue_tpu.inference.chees import oja_update

    rng = np.random.default_rng(0)
    d = 8
    Q = rng.normal(size=(16, d)).astype(np.float32)
    Q_dirty = Q.copy()
    Q_dirty[3] = np.inf  # an f32 overflow (e.g. 1e20**2) lands here
    u = np.full(d, 1 / np.sqrt(d), np.float32)
    cm = lambda x, axis=0: jnp.mean(x, axis=axis)
    im = jnp.ones(d, jnp.float32)
    u1, z1 = oja_update(jnp.asarray(Q_dirty), jnp.asarray(u),
                        jnp.asarray(u), im, cm, 0.9, jnp.float32)
    assert np.isfinite(np.asarray(u1)).all()
    assert np.isfinite(np.asarray(z1)).all()
    assert np.linalg.norm(np.asarray(u1)) == pytest.approx(1.0, abs=1e-5)

    u2, z2 = oja_update(jnp.full((16, d), np.inf, jnp.float32),
                        jnp.asarray(u), jnp.asarray(u), im, cm, 0.9,
                        jnp.float32)
    assert np.allclose(np.asarray(u2), u, atol=1e-6)
    assert np.isfinite(np.asarray(z2)).all()


def test_chees_n_leapfrogs_counted():
    """ChEESResult.n_leapfrogs: exact in-kernel warmup+sampling count,
    summed over chains (same discipline as NUTSResult.n_leapfrogs)."""
    def model():
        ft.sample("x", ft.Normal(0.0, 1.0), sample_shape=(3,))

    res = chees_chain(jax.random.PRNGKey(0), model, n_samples=80,
                      n_warmup=60, n_chains=8)
    total_tr = 8 * 140
    assert res.n_leapfrogs >= total_tr  # >= 1 leapfrog per transition
    # sampling-phase portion must be consistent with the recorded mean
    assert res.n_leapfrogs >= int(8 * 80 * res.mean_leapfrog) - 1
