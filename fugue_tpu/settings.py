"""Global dtype / precision policy.

The reference is f64 end-to-end (Rust ``f64``). TPUs natively prefer f32 (and
bf16 on the MXU); f64 is emulated and slow. Policy (SURVEY.md §7 hard part 5):

- positions / samples: ``real_dtype`` (default float32)
- log-weight accumulators: ``accum_dtype`` (default float32; promote to
  float64 only when x64 is enabled, e.g. for CPU-based statistical parity
  tests)
- integers: int32 by default (int64 requires x64)

These are functions, not constants, so that flipping ``jax_enable_x64`` in a
test conftest is respected.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import config as _jax_config


def x64_enabled() -> bool:
    return bool(_jax_config.jax_enable_x64)


def real_dtype():
    return jnp.float64 if x64_enabled() else jnp.float32


def accum_dtype():
    """Dtype for log-weight accumulators (log_prior/log_likelihood/log_factors)."""
    return jnp.float64 if x64_enabled() else jnp.float32


def int_dtype():
    return jnp.int64 if x64_enabled() else jnp.int32


def counting_dtype():
    """Dtype for unbounded counts (reference u64/i64 sites)."""
    return jnp.int64 if x64_enabled() else jnp.int32
