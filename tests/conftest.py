"""Test configuration.

Tests run on a virtual 8-device CPU mesh so chain/particle-sharding logic and
collectives are exercised without a pod (SURVEY.md §4 item 8). x64 is enabled
for statistical parity with the f64 Rust reference; the library itself is
dtype-polymorphic and runs f32 on real TPUs.

NOTE: the interpreter's sitecustomize pre-imports jax with the TPU backend
selected via JAX_PLATFORMS=axon, so we must override the *config* (not just
the env var) before any backend is initialized.
"""

import os

# Must be set before the first backend initialization.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
