"""Compensated f32 accumulation for huge plates (SURVEY.md §7 hard part 5;
VERDICT r1 item 5). The tolerance derivations are in the assertions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fugue_tpu as ft
from fugue_tpu.core.numerics import compensated_sum


def test_compensated_sum_matches_f64_on_large_plate():
    """10^6 f32 log-prob-like values: compensated f32 sum must sit within
    ~100·eps·|S| of the f64 ground truth of the SAME f32 inputs (theory:
    ~2·eps·|S| ≈ 0.17 at |S| ≈ 1.4e6; slack for in-block accumulation)."""
    rng = np.random.default_rng(0)
    x32 = rng.normal(-1.42, 1.0, 10**6).astype(np.float32)
    truth = float(np.sum(x32.astype(np.float64)))
    got = float(jax.jit(compensated_sum)(jnp.asarray(x32)))
    assert abs(got - truth) < 100 * np.finfo(np.float32).eps * abs(truth)


def test_compensated_sum_beats_naive_adversarial():
    """Adversary on the LONG (cross-block) dimension — the one the Kahan
    scan compensates: block sums alternate huge/tiny/−huge/tiny, so a naive
    f32 accumulation over blocks loses every tiny block, while the
    compensated pass keeps them. (In-block error is bounded by the running
    in-block magnitude, which for homogeneous log-prob plates stays ~block
    × |lp| — the policy documented in settings.py.) Also a tripwire that
    XLA has not reassociated the compensation away."""
    block = 4096
    n_blocks = 64
    a = np.zeros(n_blocks, np.float32)
    a[0::4] = 1e8
    a[1::4] = 1.0
    a[2::4] = -1e8
    a[3::4] = 1.0
    x = np.repeat(a / block, block).astype(np.float32)
    truth = float(np.sum(x.astype(np.float64)))  # ≈ n_blocks / 2
    comp = float(jax.jit(compensated_sum)(jnp.asarray(x)))
    assert comp == pytest.approx(truth, rel=1e-4)
    # the naive single-reduce loses the tiny blocks entirely on this input
    naive = float(jnp.sum(jnp.asarray(x).astype(jnp.float32).reshape(
        n_blocks, block).sum(axis=1)))
    assert abs(naive - truth) > abs(comp - truth)


def test_compensated_sum_small_and_padded_sizes():
    for n in (1, 7, 4096, 4097, 10000):
        x = np.linspace(-1.0, 1.0, n).astype(np.float32)
        got = float(compensated_sum(jnp.asarray(x)))
        assert got == pytest.approx(float(np.sum(x.astype(np.float64))), abs=1e-3)


def test_compensated_sum_gradient_is_ones():
    x = jnp.asarray(np.random.default_rng(1).normal(size=9000), jnp.float32)
    g = jax.grad(lambda v: compensated_sum(v))(x)
    np.testing.assert_allclose(np.asarray(g), 1.0, rtol=0, atol=0)


def test_million_observation_plate_f32_log_density_parity():
    """End-to-end (VERDICT done-criterion): a 10^6-observation Normal plate
    staged and scored on the f32 path agrees with the x64 ground truth.

    Tolerance: the summation error is ~2·eps32·|S| ≈ 0.2 nats; the dominant
    term is the POINTWISE f32 log-prob rounding (~eps32·|lp_i|·c per element,
    random-signed), which random-walks to ~c·eps32·sqrt(n)·|lp| ≈ 0.5 nats.
    1.5 nats absolute on a |S| ≈ 1.4e6 log-density (relative ~1e-6) is the
    justified bound; a NAIVE f32 sequential sum would sit at O(10-100)."""
    n = 10**6
    rng = np.random.default_rng(2)
    y64 = rng.normal(0.3, 1.0, n)
    y32 = jnp.asarray(y64, jnp.float32)

    def model():
        mu = ft.sample("mu", ft.Normal(0.0, 1.0))
        ft.observe("y", ft.Normal(mu, 1.0), y32)
        return mu

    staged = ft.stage(model)
    # f32 path: latents + data f32 (accumulators follow the input dtypes)
    ld32 = staged.log_density_parts({"mu": jnp.asarray(0.25, jnp.float32)})
    got = float(np.asarray(ld32.log_likelihood))
    truth = float(
        np.sum(
            -0.5 * ((y64 - 0.25) ** 2) - 0.5 * np.log(2 * np.pi)
        )
    )
    assert got == pytest.approx(truth, abs=1.5)
