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
