"""Pallas TPU kernels for the framework's hot array ops.

The reference's hot loops are Rust scalar loops; their TPU-native analog is
mostly XLA fusion of the staged array programs. These Pallas kernels cover
the places where explicit VMEM control beats relying on fusion:

- ``plogsumexp``: single-pass streaming log-sum-exp over large weight
  vectors (SMC reweighting/ESS at 10^6+ particles) — one HBM read total,
  running-max renormalization in VMEM instead of XLA's two-pass max+sum.
- ``psystematic_resample``: normalized-cumsum + comb inversion fused into
  one kernel: the weight vector is read once, the ancestor indices stream
  out, no intermediate (N,) CDF array ever hits HBM.
- ``pnormal_loglik_sum``: fused big-plate Gaussian log-likelihood
  Σ log N(y_i; mu, sigma) with a custom VJP (gradients also single-pass) —
  the hot op of large-data models (SURVEY.md §2.3 SP row).

All kernels carry an XLA fallback (``*_xla``) used automatically on
non-TPU backends; correctness tests compare the two paths bit-for-bit
within float tolerance. Use ``enable_pallas(True/False)`` or the
FUGUE_TPU_PALLAS env var to override.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp

_FORCED: Optional[bool] = None
_LANE = 128
_BLOCK = 8 * 1024  # elements per streamed tile (fits VMEM comfortably)


def enable_pallas(on: Optional[bool]) -> None:
    """Force Pallas kernels on/off (None → auto: TPU only)."""
    global _FORCED
    _FORCED = on


def pallas_active() -> bool:
    """Default OFF — keep-or-kill by measurement went to XLA.

    On-chip probes (benchmarks/PALLAS_PROBE.json, 2026-08-20, v5e;
    scripts/probe_pallas_kernels.py + probe_pallas_resample.py) measured
    every kernel at or below XLA: plogsumexp 0.70-0.97x, pnormal_loglik_sum
    fwd 0.73-1.05x / grad 0.65-0.87x (with worse f32 drift at 2^24:
    |err| 92 vs XLA's reduction), systematic resample 0.75x. The reference's
    bench discipline (f_perf.rs:56-66) deletes what measurement doesn't
    justify; the kernels stay available behind FUGUE_TPU_PALLAS=1 /
    enable_pallas(True) with interpret-mode correctness tests, as the
    VMEM-control option for future regimes XLA handles poorly."""
    if _FORCED is not None:
        return _FORCED
    env = os.environ.get("FUGUE_TPU_PALLAS")
    if env is not None:
        return env not in ("0", "false", "off")
    return False


def _pad_to(x, multiple, fill):
    n = x.shape[-1]
    pad = (-n) % multiple
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)], constant_values=fill)
    return x, n


# ---------------------------------------------------------------------------
# log-sum-exp
# ---------------------------------------------------------------------------


def logsumexp_xla(x):
    m = jnp.max(x)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    out = m_safe + jnp.log(jnp.sum(jnp.exp(x - m_safe)))
    return jnp.where(jnp.isfinite(m), out, m)


def _plogsumexp_kernel(x_ref, out_ref, acc_ref):
    """Streaming LSE with running-max renormalization.

    Grid walks the padded vector in (8, 128)-tiled blocks; acc holds
    (running_max, running_sum) in SMEM.
    """
    from jax.experimental import pallas as pl

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[0] = -jnp.inf  # running max
        acc_ref[1] = 0.0  # running sum of exp(x - max)

    blk = x_ref[:]
    m_blk = jnp.max(blk)
    m_old = acc_ref[0]
    m_new = jnp.maximum(m_old, m_blk)
    m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
    s_old = acc_ref[1] * jnp.exp(jnp.where(jnp.isfinite(m_old), m_old, 0.0) - m_safe)
    s_old = jnp.where(jnp.isfinite(m_old), s_old, 0.0)
    s_blk = jnp.sum(jnp.exp(blk - m_safe))
    acc_ref[0] = m_new
    acc_ref[1] = s_old + s_blk

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        m = acc_ref[0]
        out_ref[0] = jnp.where(
            jnp.isfinite(m), m + jnp.log(acc_ref[1]), m
        )


def plogsumexp(x):
    """Pallas log-sum-exp over a 1-D vector (auto-fallback to XLA)."""
    x = jnp.ravel(x)
    if not pallas_active() or x.size < _BLOCK:
        return logsumexp_xla(x)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    xp, n = _pad_to(x, _BLOCK, -jnp.inf)
    rows = _BLOCK // _LANE
    x2 = xp.reshape(-1, rows, _LANE)
    grid = (x2.shape[0],)

    out = pl.pallas_call(
        _plogsumexp_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rows, _LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), x.dtype),
        scratch_shapes=[pltpu.SMEM((2,), x.dtype)],
    )(x2)
    return out[0]


# ---------------------------------------------------------------------------
# systematic resampling
# ---------------------------------------------------------------------------


def systematic_resample_xla(u0, weights):
    """Reference path: cumsum + searchsorted (ops/resampling.py)."""
    n = weights.shape[-1]
    cdf = jnp.cumsum(weights)
    cdf = cdf / cdf[-1]
    us = (jnp.arange(n) + u0) / n
    return jnp.clip(jnp.searchsorted(cdf, us, side="left"), 0, n - 1)


def _tile_prefix_sum(mat):
    """Inclusive prefix sum over a (rows, LANE) tile in row-major order,
    built from log-step roll+mask shifts (Pallas TPU has no cumsum
    primitive). O(log LANE + log rows) vector ops, all VPU-friendly."""
    from jax.experimental.pallas import tpu as pltpu

    rows, lanes = mat.shape
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
    x = mat
    s = 1
    while s < lanes:  # Hillis-Steele along the lane axis
        shifted = pltpu.roll(x, s, 1)
        x = x + jnp.where(col_ids >= s, shifted, 0.0)
        s *= 2
    row_sums = x[:, lanes - 1 : lanes]  # (rows, 1) per-row totals
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0)
    r = row_sums
    s = 1
    while s < rows:  # prefix over rows (sublane axis)
        shifted = pltpu.roll(r, s, 0)
        r = r + jnp.where(row_ids >= s, shifted, 0.0)
        s *= 2
    # exclusive row offsets = inclusive prefix shifted down one row
    offs = pltpu.roll(r, 1, 0)
    offs = jnp.where(row_ids >= 1, offs, 0.0)
    return x + offs


def _presample_kernel(w_ref, u0_ref, out_ref, carry_ref):
    """One fused pass: running weight-prefix in SMEM; each tile emits the
    comb positions falling inside its CDF span via a masked count.

    Precision design (the on-hardware f32 failure mode was carry drift):
    the host pre-scales weights by N, so the running prefix P = N·cdf grows
    to N (~2^20). A plain f32 carry then loses ~eps(N) per tile and ancestor
    indices drift by thousands; two-sum compensation is unreliable here
    because the kernel compiler may reassociate/contract the error-free
    transform. Instead the carry is split as (hi = exact nonnegative
    INTEGER part, lo = fractional part < ~2): integer adds below 2^24 are
    exact in f32, and since hi is an exact integer,
    floor(hi + x) == hi + floor(x), so the count computation never rounds
    at magnitude N. Worst case is ±1 boundary jitter on counts, never
    drift — independent of compiler FMA/reassociation choices."""
    from jax.experimental import pallas as pl

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry_ref[0] = 0.0  # integer part of the running prefix (exact)
        carry_ref[1] = 0.0  # fractional part (stays small)

    w_blk = w_ref[0]  # (rows, LANE) weights pre-scaled by N
    prefix = _tile_prefix_sum(w_blk)  # inclusive, row-major, ≤ tile_sum ≪ 2^24
    hi = carry_ref[0]
    lo = carry_ref[1]
    local = prefix + lo  # small-magnitude, f32-precise

    # shed the integer part into hi (exact while hi + ti < 2^24)
    tile_total = local[w_blk.shape[0] - 1, w_blk.shape[1] - 1]
    ti = jnp.floor(tile_total)
    carry_ref[0] = hi + ti
    carry_ref[1] = tile_total - ti

    # The comb u_k = (k + u0)/N falls to element j iff cdf_{j-1} <= u_k < cdf_j.
    # Count of comb points strictly below cdf_j is floor(N·cdf_j − u0) + 1;
    # with hi an exact integer this is hi + floor(local − u0) + 1, every
    # term exact or small-magnitude. Counts up to N < 2^24 are exact in f32.
    # The host converts counts→indices with one searchsorted.
    n_total = u0_ref[1]
    u0 = u0_ref[0]
    counts = hi + (jnp.floor(local - u0) + 1.0)
    counts = jnp.clip(counts, 0.0, n_total)
    out_ref[0] = counts


def psystematic_resample(key, log_weights):
    """Systematic resampling: Pallas fused pass producing cumulative comb
    counts, finished with one XLA searchsorted over the counts.

    The weight vector is read from HBM exactly once and no (N,) CDF array is
    materialized. The inter-tile running prefix is carried in split
    integer/fraction form, which bounds the f32 error to small boundary
    jitter instead of unbounded drift.

    OPT-IN (FUGUE_TPU_PALLAS_RESAMPLE=1): measured on a v5e chip
    (2026-08-19, scripts/probe_pallas_resample.py, 2^20 particles, f32) the
    fused kernel deviates from the f64 reference by up to 127 ancestor
    indices where the plain XLA-f32 path's noise floor is 43, and is ~1.3×
    slower (212 µs vs 159 µs per resample amortized) — XLA's native cumsum
    beats the roll-based Hillis-Steele prefix sum on this hardware. The
    default is therefore the XLA path; the kernel stays available for
    future TPU generations and as the no-materialized-CDF variant."""
    from ..ops.resampling import normalize_log_weights

    n = log_weights.shape[-1]
    w, _ = normalize_log_weights(log_weights)
    u0 = jax.random.uniform(key, (), w.dtype)
    opted_in = os.environ.get("FUGUE_TPU_PALLAS_RESAMPLE") == "1"
    if not pallas_active() or not opted_in or n < _BLOCK or n % _LANE:
        return systematic_resample_xla(u0, w)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # Pre-scale by N/sum(w) so the kernel's prefix IS the comb count scale
    # (counts < 2^24, exact in f32). The explicit renormalization matters:
    # normalize_log_weights leaves sum(w) = 1 ± ~3e-5 at f32 (logsumexp
    # rounding), and without it the count drift N·3e-5 ≈ 36 maps to
    # hundreds of ancestor-index positions in sparse-weight regions — the
    # XLA path absorbs the same error via cdf/cdf[-1].
    scale = jnp.asarray(float(n), w.dtype) / jnp.sum(w)
    wp, _ = _pad_to(w * scale, _BLOCK, 0.0)
    rows = _BLOCK // _LANE
    w2 = wp.reshape(-1, rows, _LANE)
    grid = (w2.shape[0],)
    params = jnp.stack([u0, jnp.asarray(float(n), w.dtype)])

    counts = pl.pallas_call(
        _presample_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rows, _LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, _LANE), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(w2.shape, w.dtype),
        scratch_shapes=[pltpu.SMEM((2,), w.dtype)],
    )(w2, params)

    cum = counts.reshape(-1)[:n].astype(jnp.int32)  # cumulative comb counts
    # rounding can make counts locally non-monotone by 1; searchsorted
    # requires sorted input, so repair with a running max (cheap, fused)
    cum = jax.lax.cummax(cum)
    # ancestor index for output position k = #elements whose cumulative
    # count <= k  == searchsorted(cum, k, 'right')
    ks = jnp.arange(n, dtype=jnp.int32)
    idx = jnp.searchsorted(cum, ks, side="right")
    return jnp.clip(idx, 0, n - 1)


# ---------------------------------------------------------------------------
# fused big-plate Gaussian log-likelihood with custom VJP
# ---------------------------------------------------------------------------


def normal_loglik_sum_xla(y, mu, sigma):
    z = (y - mu) / sigma
    return jnp.sum(-0.5 * z * z - jnp.log(sigma) - 0.5 * math.log(2 * math.pi))


def _nll_fwd_kernel(y_ref, p_ref, out_ref, acc_ref):
    from jax.experimental import pallas as pl

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[0] = 0.0

    mu = p_ref[0]
    sigma = p_ref[1]
    z = (y_ref[:] - mu) / sigma
    acc_ref[0] = acc_ref[0] + jnp.sum(-0.5 * z * z)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        n = p_ref[2]
        out_ref[0] = acc_ref[0] - n * (
            jnp.log(sigma) + 0.5 * math.log(2 * math.pi)
        )


def _nll_bwd_kernel(y_ref, p_ref, dmu_ref, dsig_ref, acc_ref):
    from jax.experimental import pallas as pl

    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[0] = 0.0
        acc_ref[1] = 0.0

    mu = p_ref[0]
    sigma = p_ref[1]
    z = (y_ref[:] - mu) / sigma
    acc_ref[0] = acc_ref[0] + jnp.sum(z) / sigma  # d/dmu
    acc_ref[1] = acc_ref[1] + jnp.sum(z * z) / sigma  # part of d/dsigma

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        n = p_ref[2]
        dmu_ref[0] = acc_ref[0]
        dsig_ref[0] = acc_ref[1] - n / sigma


def _nll_pallas_fwd(y2, params):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows = _BLOCK // _LANE
    grid = (y2.shape[0],)
    out = pl.pallas_call(
        _nll_fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rows, _LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), y2.dtype),
        scratch_shapes=[pltpu.SMEM((1,), y2.dtype)],
    )(y2, params)
    return out[0]


@jax.custom_vjp
def pnormal_loglik_sum(y, mu, sigma):
    """Σ_i log N(y_i; mu, sigma) in one streamed pass (scalar mu/sigma —
    the sharded-plate partial-sum primitive)."""
    return _pnormal_impl(y, mu, sigma)


def _pnormal_impl(y, mu, sigma):
    y = jnp.ravel(y)
    if not pallas_active() or y.size < _BLOCK:
        return normal_loglik_sum_xla(y, mu, sigma)
    yp, n = _pad_to(y, _BLOCK, 0.0)
    rows = _BLOCK // _LANE
    y2 = yp.reshape(-1, rows, _LANE)
    mu = jnp.asarray(mu, y.dtype)
    # padding correction: padded zeros contribute -0.5*((0-mu)/sigma)^2 each
    pad = yp.size - n
    params = jnp.stack([mu, jnp.asarray(sigma, y.dtype),
                        jnp.asarray(float(n), y.dtype)])
    raw = _nll_pallas_fwd(y2, params)
    pad_term = pad * (-0.5 * (mu / sigma) ** 2)
    return raw - pad_term


def _pnormal_fwd(y, mu, sigma):
    return _pnormal_impl(y, mu, sigma), (y, mu, sigma)


def _pnormal_bwd(res, g):
    y, mu, sigma = res
    yr = jnp.ravel(y)
    if not pallas_active() or yr.size < _BLOCK:
        z = (yr - mu) / sigma
        dmu = jnp.sum(z) / sigma
        dsig = jnp.sum(z * z) / sigma - yr.size / sigma
        dy = -z / sigma
        return (g * dy).reshape(jnp.shape(y)), g * dmu, g * dsig
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    yp, n = _pad_to(yr, _BLOCK, 0.0)
    rows = _BLOCK // _LANE
    y2 = yp.reshape(-1, rows, _LANE)
    mu_a = jnp.asarray(mu, yr.dtype)
    sig_a = jnp.asarray(sigma, yr.dtype)
    params = jnp.stack([mu_a, sig_a, jnp.asarray(float(n), yr.dtype)])
    grid = (y2.shape[0],)
    dmu_raw, dsig_raw = pl.pallas_call(
        _nll_bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rows, _LANE), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1,), yr.dtype),
            jax.ShapeDtypeStruct((1,), yr.dtype),
        ),
        scratch_shapes=[pltpu.SMEM((2,), yr.dtype)],
    )(y2, params)
    # padding corrections (zeros at y contribute z_pad = -mu/sigma each)
    pad = yp.size - n
    z_pad = (0.0 - mu_a) / sig_a
    dmu = dmu_raw[0] - pad * z_pad / sig_a
    dsig = dsig_raw[0] - pad * (z_pad * z_pad) / sig_a
    dy = -((yr - mu_a) / sig_a) / sig_a
    return (g * dy).reshape(jnp.shape(y)), g * dmu, g * dsig


pnormal_loglik_sum.defvjp(_pnormal_fwd, _pnormal_bwd)
