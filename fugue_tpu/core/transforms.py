"""Unconstraining bijectors for gradient-based kernels.

The reference's HMC runs on *constrained* values and relies on -inf rejection
at support boundaries, explicitly leaving reparameterization to the user
(reference: src/inference/hmc.rs:62-66). The TPU build adds the transforms the
reference punts on (SURVEY.md §7 step 4): each continuous support maps to a
bijector z ∈ R ↔ x ∈ support with a log-|Jacobian| term, so HMC/NUTS/VI
operate on unconstrained R^d with exact densities.

Each transform provides ``forward(z) -> x``, ``inverse(x) -> z`` and
``log_det_jacobian(z) -> log|dx/dz|`` (summed over the site's shape by the
caller). All are elementwise, jit/vmap/grad-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .distributions import Support


class Transform:
    name = "identity"

    def forward(self, z):
        return z

    def inverse(self, x):
        return x

    def log_det_jacobian(self, z):
        return jnp.zeros_like(z)


class Identity(Transform):
    pass


class Exp(Transform):
    """R → (0, ∞): x = exp(z); log|dx/dz| = z."""

    name = "exp"

    def forward(self, z):
        return jnp.exp(z)

    def inverse(self, x):
        return jnp.log(x)

    def log_det_jacobian(self, z):
        return z


class Sigmoid(Transform):
    """R → (0, 1): x = σ(z); log|dx/dz| = -softplus(z) - softplus(-z)."""

    name = "sigmoid"

    def forward(self, z):
        return jax.nn.sigmoid(z)

    def inverse(self, x):
        return jnp.log(x) - jnp.log1p(-x)

    def log_det_jacobian(self, z):
        return -jax.nn.softplus(z) - jax.nn.softplus(-z)


class AffineSigmoid(Transform):
    """R → (low, high): x = low + (high-low)·σ(z)."""

    name = "affine_sigmoid"

    def __init__(self, low: float, high: float):
        self.low = low
        self.high = high

    def forward(self, z):
        return self.low + (self.high - self.low) * jax.nn.sigmoid(z)

    def inverse(self, x):
        u = (x - self.low) / (self.high - self.low)
        return jnp.log(u) - jnp.log1p(-u)

    def log_det_jacobian(self, z):
        return (
            jnp.log(self.high - self.low)
            - jax.nn.softplus(z)
            - jax.nn.softplus(-z)
        )


def transform_for_support(support: Support) -> Transform:
    """Pick the unconstraining transform for a continuous support.

    Interval supports with bounds unknown at staging time (traced parameters)
    fall back to Identity — the reference-compatible mode where the kernel
    relies on -inf rejection at the boundary (hmc.rs:62-66).
    """
    if support.kind == "real":
        return Identity()
    if support.kind == "positive":
        return Exp()
    if support.kind == "unit":
        return Sigmoid()
    if support.kind == "interval":
        if support.low is not None and support.high is not None:
            return AffineSigmoid(support.low, support.high)
        return Identity()
    return Identity()
