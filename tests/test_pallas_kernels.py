"""Pallas kernel correctness vs XLA reference paths.

On the CPU test backend the kernels run through pallas interpret mode when
forced on; every kernel is checked against its XLA fallback.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fugue_tpu.ops import pallas_kernels as pk


@pytest.fixture(autouse=True)
def _force_pallas_interpret(monkeypatch):
    """Force the pallas paths on CPU via interpret mode."""
    from jax.experimental.pallas import tpu as pltpu

    pk.enable_pallas(True)
    try:
        with pltpu.force_tpu_interpret_mode():
            yield
    finally:
        pk.enable_pallas(None)


def test_logsumexp_matches_xla():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=3 * pk._BLOCK + 17) * 10)
    got = float(pk.plogsumexp(x))
    want = float(pk.logsumexp_xla(x))
    assert got == pytest.approx(want, rel=1e-6)


def test_logsumexp_small_fallback():
    x = jnp.asarray([0.0, 1.0, 2.0])
    assert float(pk.plogsumexp(x)) == pytest.approx(
        float(pk.logsumexp_xla(x)), rel=1e-6
    )


def test_logsumexp_neg_inf_blocks():
    x = jnp.full((2 * pk._BLOCK,), -jnp.inf).at[5].set(3.0)
    assert float(pk.plogsumexp(x)) == pytest.approx(3.0, rel=1e-6)


def test_systematic_resample_matches_xla(monkeypatch):
    monkeypatch.setenv("FUGUE_TPU_PALLAS_RESAMPLE", "1")
    rng = np.random.default_rng(1)
    n = 2 * pk._BLOCK
    logits = jnp.asarray(rng.normal(size=n))
    lw = logits - pk.logsumexp_xla(logits)
    key = jax.random.PRNGKey(3)
    got = np.asarray(pk.psystematic_resample(key, lw))
    from fugue_tpu.ops.resampling import normalize_log_weights

    w, _ = normalize_log_weights(lw)
    u0 = jax.random.uniform(key, (), w.dtype)
    want = np.asarray(pk.systematic_resample_xla(u0, w))
    np.testing.assert_array_equal(got, want)


def test_systematic_resample_f32_large_vs_f64_reference(monkeypatch):
    """Regression for the on-hardware f32 failure: with a plain-f32 carry the
    ancestor indices drifted by thousands at 10^6 particles; the split
    integer/fraction carry bounds the error to boundary jitter. Checked here
    at 2^17 particles in f32 against an exact float64 reference. (The kernel
    is opt-in — on v5e the XLA path measured faster and more accurate — but
    its correctness contract is still enforced here in interpret mode.)"""
    monkeypatch.setenv("FUGUE_TPU_PALLAS_RESAMPLE", "1")
    rng = np.random.default_rng(7)
    n = 16 * pk._BLOCK  # 131072
    logits = rng.normal(size=n) * 4.0
    key = jax.random.PRNGKey(11)
    got = np.asarray(pk.psystematic_resample(key, jnp.asarray(logits, jnp.float32)))

    # exact f64 systematic resampling with the same comb offset
    u0 = float(jax.random.uniform(key, (), jnp.float32))
    w = np.exp(logits - np.max(logits))
    cdf = np.cumsum(w / np.sum(w))
    us = (np.arange(n) + u0) / n
    ref = np.clip(np.searchsorted(cdf, us, side="left"), 0, n - 1)

    # noise floor: the plain XLA cumsum path at f32 vs the same f64 reference
    # (deviation there comes from f32 weight representation, not the kernel)
    from fugue_tpu.ops.resampling import normalize_log_weights

    w32, _ = normalize_log_weights(jnp.asarray(logits, jnp.float32))
    xla32 = np.asarray(pk.systematic_resample_xla(jnp.float32(u0), w32))
    floor = np.abs(xla32.astype(np.int64) - ref.astype(np.int64)).max()

    dev = np.abs(got.astype(np.int64) - ref.astype(np.int64))
    assert dev.max() <= max(4, 2 * floor), (
        f"max ancestor deviation {dev.max()} vs f32 noise floor {floor}"
    )
    assert (dev > 0).mean() < 0.02, f"mismatch fraction {(dev > 0).mean():.4f}"


def test_systematic_resample_routes_through_pallas(monkeypatch):
    """ops.resampling.systematic_resample uses the fused kernel for large
    1-D inputs and agrees with the plain XLA comb inversion."""
    from fugue_tpu.ops import resampling as rs

    rng = np.random.default_rng(9)
    n = 2 * pk._BLOCK
    lw = jnp.asarray(rng.normal(size=n))
    key = jax.random.PRNGKey(5)
    got = np.asarray(rs.systematic_resample(key, lw))
    w, _ = rs.normalize_log_weights(lw)
    u0 = jax.random.uniform(key, (), w.dtype)
    want = np.asarray(pk.systematic_resample_xla(u0, w))
    dev = np.abs(got.astype(np.int64) - want.astype(np.int64))
    assert dev.max() <= 1
    assert (dev > 0).mean() < 1e-3


def test_normal_loglik_sum_matches_xla():
    rng = np.random.default_rng(2)
    y = jnp.asarray(rng.normal(1.0, 2.0, 2 * pk._BLOCK + 100))
    got = float(pk.pnormal_loglik_sum(y, 0.7, 1.3))
    want = float(pk.normal_loglik_sum_xla(jnp.ravel(y), 0.7, 1.3))
    assert got == pytest.approx(want, rel=1e-6)


def test_normal_loglik_grad_matches_xla():
    rng = np.random.default_rng(3)
    y = jnp.asarray(rng.normal(0.5, 1.0, 2 * pk._BLOCK))

    g_pallas = jax.grad(
        lambda mu, sig: pk.pnormal_loglik_sum(y, mu, sig), argnums=(0, 1)
    )(0.2, 0.9)
    g_xla = jax.grad(
        lambda mu, sig: pk.normal_loglik_sum_xla(y, mu, sig), argnums=(0, 1)
    )(0.2, 0.9)
    assert float(g_pallas[0]) == pytest.approx(float(g_xla[0]), rel=1e-5)
    assert float(g_pallas[1]) == pytest.approx(float(g_xla[1]), rel=1e-5)
