"""MXU-friendly linear-algebra helpers for model code.

Large-d GLM likelihoods are matmuls; the MXU wants them in bfloat16 with
f32 accumulation (the v5e systolic array natively multiplies bf16 and
accumulates f32 — f32-input matmuls decompose into multiple passes). These
helpers are the supported way to write the design-matrix product inside a
model so the staged potential keeps one clean matmul island:

    logits = matmul_bf16(X, w)          # (N,) — inside a model function
    ft.observe("y", ft.BernoulliLogits(logits), y)

No reference counterpart (the reference is scalar Rust, SURVEY.md §2.3
"Tensor parallel: no tensors"); this is the TPU-native realization of its
"hot loops in the fast language" discipline.
"""

from __future__ import annotations

import jax.numpy as jnp


def matmul_bf16(a, b):
    """``a @ b`` with bf16 inputs and f32 accumulation — one MXU pass.

    Relative error per output element is ~bf16 eps (7.8e-3) on the INPUTS
    only; the contraction itself accumulates in f32, so the result does not
    degrade with the contraction length. Appropriate for GLM
    linear predictors (the likelihood is smooth in the logits); use plain
    f32 ``@`` when the workload gates on closed-form moment recovery
    tighter than ~1e-2 relative.
    """
    return jnp.matmul(
        a.astype(jnp.bfloat16),
        b.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )


def matvec_bf16(a, x):
    """``a @ x`` for a matrix and vector (vmap-friendly alias)."""
    return matmul_bf16(a, x)
