"""Diagnostics ground-truth regressions.

Reference parity (SURVEY.md §4 item 2): AR(1) ESS/n → (1-phi)/(1+phi) within
15% (mcmc_utils.rs:502-528), scale invariance of ESS (:472-500), Geweke
stationary-vs-drift (:534-570), split-R-hat behavior (diagnostics.rs:218-259).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fugue_tpu.inference import mcmc_utils as mu
from fugue_tpu.inference.diagnostics import print_diagnostics


def ar1(rng, phi, n, sigma=1.0):
    innov = rng.normal(size=n) * sigma
    x = np.empty(n)
    x[0] = innov[0] / np.sqrt(1 - phi**2)
    for i in range(1, n):
        x[i] = phi * x[i - 1] + innov[i]
    return x


@pytest.mark.parametrize("phi", [0.0, 0.5, 0.9])
def test_ess_ar1_ground_truth(phi):
    """ESS/n for AR(1) → (1-phi)/(1+phi) within 15% (reference:
    mcmc_utils.rs:502-528)."""
    rng = np.random.default_rng(42)
    n = 20000
    x = ar1(rng, phi, n)
    est = float(mu.ess(x)) / n
    truth = (1 - phi) / (1 + phi)
    assert abs(est - truth) < 0.15 * max(truth, 0.1), f"phi={phi}: {est} vs {truth}"


def test_ess_scale_invariance():
    """ESS invariant under affine scaling (reference: mcmc_utils.rs:472-500)."""
    rng = np.random.default_rng(7)
    x = ar1(rng, 0.7, 5000)
    e1 = float(mu.ess(x))
    e2 = float(mu.ess(1000.0 * x + 5.0))
    assert e1 == pytest.approx(e2, rel=1e-6)


def test_ess_iid_near_n():
    rng = np.random.default_rng(3)
    x = rng.normal(size=10000)
    e = float(mu.ess(x))
    assert 0.8 * 10000 <= e <= 10000


def test_ess_constant_is_zero():
    x = np.ones(1000)
    assert float(mu.ess(x)) == 0.0


def test_ess_batched():
    rng = np.random.default_rng(11)
    xs = np.stack([ar1(rng, 0.0, 4000), ar1(rng, 0.9, 4000)])
    es = np.asarray(mu.ess(xs))
    assert es.shape == (2,)
    assert es[0] > 3 * es[1]  # iid chain far more efficient


def test_multichain_ess_pools_chains():
    """m chains of iid noise → ESS ≈ m*n (reference: Vehtari multichain,
    mcmc_utils.rs:253-339)."""
    rng = np.random.default_rng(5)
    chains = rng.normal(size=(4, 2000))
    e = float(mu.ess_multichain(chains))
    assert 0.7 * 8000 <= e <= 8000


def test_multichain_ess_detects_disagreement():
    """Chains stuck at different means → tiny ESS."""
    rng = np.random.default_rng(6)
    chains = rng.normal(size=(4, 2000)) * 0.1 + np.arange(4)[:, None]
    e = float(mu.ess_multichain(chains))
    assert e < 100


def test_split_rhat_converged_near_one():
    rng = np.random.default_rng(0)
    chains = rng.normal(size=(4, 4000))
    rh = float(mu.split_r_hat(chains))
    assert rh == pytest.approx(1.0, abs=0.01)


def test_split_rhat_detects_divergent_means():
    rng = np.random.default_rng(1)
    chains = rng.normal(size=(4, 1000)) + np.array([0.0, 0.0, 0.0, 3.0])[:, None]
    assert float(mu.split_r_hat(chains)) > 1.1


def test_split_rhat_detects_trend_classic_misses():
    """A within-chain trend: split-R-hat flags it even with equal chain means
    (the point of splitting — FG-36)."""
    n = 2000
    trend = np.linspace(-2, 2, n)
    rng = np.random.default_rng(2)
    chains = np.stack([trend + 0.1 * rng.normal(size=n) for _ in range(4)])
    assert float(mu.split_r_hat(chains)) > 1.1


def test_geweke_stationary_vs_drift():
    """|z| small for stationary, large for drifting series (reference:
    mcmc_utils.rs:534-570)."""
    rng = np.random.default_rng(9)
    stationary = rng.normal(size=8000)
    z_stat = float(mu.geweke(stationary))
    assert abs(z_stat) < 3.0
    drift = rng.normal(size=8000) + np.linspace(0, 3, 8000)
    z_drift = float(mu.geweke(drift))
    assert abs(z_drift) > 4.0


def test_adaptation_moves_toward_target():
    """Diminishing adaptation: scale grows when acceptance > target, shrinks
    when below (reference: mcmc_utils.rs:88-150)."""
    st = mu.AdaptationState.init(3, initial_scale=1.0)
    mask = jnp.array([1.0, 0.0, 0.0])
    for _ in range(50):
        st = mu.adapt_update(st, mask, jnp.array(1.0))  # always accept
    assert float(st.scale()[0]) > 1.5
    assert float(st.scale()[1]) == pytest.approx(1.0)

    st2 = mu.AdaptationState.init(3, initial_scale=1.0)
    for _ in range(50):
        st2 = mu.adapt_update(st2, mask, jnp.array(0.0))  # always reject
    assert float(st2.scale()[0]) < 0.7


def test_adaptation_frozen_post_warmup():
    """Frozen kernel after warmup (reference FG-57, mh.rs:1208-1290)."""
    st = mu.AdaptationState.init(2, initial_scale=1.0)
    mask = jnp.array([1.0, 1.0])
    st = mu.adapt_update(st, mask, jnp.array(1.0))
    before = np.asarray(st.log_scale)
    st_frozen = mu.adapt_update(st, mask, jnp.array(1.0), frozen=True)
    np.testing.assert_array_equal(np.asarray(st_frozen.log_scale), before)


def test_summaries_and_print(capsys):
    rng = np.random.default_rng(4)
    samples = {
        "mu": rng.normal(loc=1.0, size=(4, 1000)),
        "theta": rng.normal(size=(4, 1000, 3)),
    }
    summaries = print_diagnostics(samples)
    names = [s.name for s in summaries]
    assert names == ["mu", "theta[0]", "theta[1]", "theta[2]"]
    mu_s = summaries[0]
    assert mu_s.mean == pytest.approx(1.0, abs=0.1)
    assert mu_s.verdict in ("excellent", "good")
    out = capsys.readouterr().out
    assert "R-hat" in out and "convergence:" in out


def test_geyer_truncation_on_negative_pairs():
    """Alternating series: pair sums go non-positive immediately; tau stays
    tiny rather than accumulating noise (FG-35/37)."""
    x = np.tile([1.0, -1.0], 2000) + 1e-3 * np.random.default_rng(0).normal(size=4000)
    e = float(mu.ess(x))
    # anti-correlated chain is super-efficient; capped at n
    assert e > 3500


# ---------------------------------------------------------------------------
# rank-normalized split-R-hat (Vehtari et al. 2021; beyond-parity)
# ---------------------------------------------------------------------------


def test_rank_rhat_converged_chains_near_one():
    from fugue_tpu.inference.mcmc_utils import rank_normalized_split_r_hat

    rng = np.random.default_rng(0)
    chains = jnp.asarray(rng.normal(0.0, 1.0, (8, 2000)))
    r = float(rank_normalized_split_r_hat(chains))
    assert 0.99 < r < 1.01


def test_rank_rhat_catches_location_shift():
    from fugue_tpu.inference.mcmc_utils import rank_normalized_split_r_hat

    rng = np.random.default_rng(1)
    chains = np.asarray(rng.normal(0.0, 1.0, (8, 1000)))
    chains[:4] += 1.5
    r = float(rank_normalized_split_r_hat(jnp.asarray(chains)))
    assert r > 1.1


def test_rank_rhat_catches_scale_mismatch_where_classic_is_blind():
    """Chains with the same mean but different variances: classic split-R-hat
    stays near 1 (between-chain MEAN variance is zero) while the folded
    tail-R-hat flags the failure (the 2021 paper's motivating case)."""
    from fugue_tpu.inference.mcmc_utils import (
        rank_normalized_split_r_hat,
        split_r_hat,
    )

    rng = np.random.default_rng(2)
    chains = np.empty((8, 2000))
    chains[:4] = rng.normal(0.0, 1.0, (4, 2000))
    chains[4:] = rng.normal(0.0, 4.0, (4, 2000))
    classic = float(split_r_hat(jnp.asarray(chains)))
    ranked = float(rank_normalized_split_r_hat(jnp.asarray(chains)))
    assert classic < 1.05  # blind
    assert ranked > 1.15  # caught by the folded tail statistic


def test_rank_rhat_robust_to_heavy_tails():
    """Cauchy draws: the classic statistic is dominated by single extreme
    draws and becomes noise; the rank statistic stays calibrated near 1
    for genuinely mixed chains."""
    from fugue_tpu.inference.mcmc_utils import rank_normalized_split_r_hat

    rng = np.random.default_rng(3)
    chains = jnp.asarray(rng.standard_cauchy((8, 2000)))
    r = float(rank_normalized_split_r_hat(chains))
    assert 0.99 < r < 1.02


# -- coverage holes (VERDICT r3 weak #4: diagnostics.py 74.5%) ---------------


def test_print_diagnostics_table_and_verdicts():
    import io

    from fugue_tpu.inference.diagnostics import (
        ParameterSummary, print_diagnostics, summarize_samples,
    )

    rng = np.random.default_rng(0)
    # well-mixed site + a 2-vector site (pseudo-param expansion)
    samples = {
        "mu": rng.normal(size=(4, 500)),
        "w": rng.normal(size=(4, 500, 2)),
    }
    buf = io.StringIO()
    out = print_diagnostics(samples, file=buf)
    text = buf.getvalue()
    assert [s.name for s in out] == ["mu", "w[0]", "w[1]"]
    assert "convergence: EXCELLENT" in text
    assert "R-hat" in text and "ESS" in text
    for s in out:
        assert s.converged and s.verdict == "excellent"
        assert s.n_chains == 4 and s.n_samples == 500

    # a deliberately unconverged pair of chains → POOR verdict
    bad = {"mu": np.stack([rng.normal(size=300), rng.normal(size=300) + 10])}
    buf = io.StringIO()
    out = print_diagnostics(bad, file=buf)
    assert "convergence: POOR" in buf.getvalue()
    assert out[0].verdict == "poor" and not out[0].converged

    # the 1.01 <= r_hat < 1.1 band
    s = ParameterSummary("x", 0.0, 1.0, {}, 1.05, 100.0, 4, 100)
    assert s.verdict == "good" and s.converged

    with pytest.raises(ValueError, match="expected"):
        summarize_samples({"mu": np.zeros(7)})


def test_trace_extractors():
    import jax

    import fugue_tpu as ft
    from fugue_tpu.inference.diagnostics import (
        extract_bool, extract_int, extract_real,
    )
    from fugue_tpu.runtime.handler import run
    from fugue_tpu.runtime.interpreters import PriorHandler

    def model():
        x = ft.sample("x", ft.Normal(0.0, 1.0))
        b = ft.sample("b", ft.Bernoulli(0.5))
        k = ft.sample("k", ft.Poisson(3.0))
        return x, b, k

    traces = []
    for i in range(5):
        _, tr = run(PriorHandler(jax.random.PRNGKey(i)), model)
        traces.append(tr)

    xs = extract_real(traces, "x")
    bs = extract_bool(traces, "b")
    ks = extract_int(traces, "k")
    assert xs.shape == (5,) and xs.dtype == np.float64
    assert bs.shape == (5,) and bs.dtype == np.bool_
    assert ks.shape == (5,) and np.issubdtype(ks.dtype, np.integer)
    # absent address → empty
    assert extract_real(traces, "nope").size == 0
