"""TPU array-program building blocks: resampling, linalg, Pallas probes."""

from .linalg import (
    matmul_bf16,
    matmul_bf16x2,
    matmul_bf16x2_fastgrad,
    matvec_bf16,
)

__all__ = ["matmul_bf16", "matmul_bf16x2", "matmul_bf16x2_fastgrad",
           "matvec_bf16"]
