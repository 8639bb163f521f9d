"""Micro-bench: TPU scatter cost vs update-row count and batching.

Decides the async-NUTS sample-recording strategy: is a scatter's cost
dominated by a fixed overhead (→ batch 4 buffers into 1, or flush a ring
buffer once per chunk) or by per-row work (→ avoid scatter entirely)?
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

C, N, D = 1024, 1000, 13
ITERS = 2048


def bench(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    dt = time.perf_counter() - t0
    print(f"{name}: {dt / ITERS * 1e6:.1f} us/iter ({dt:.3f}s total)", flush=True)


@jax.jit
def loop_scatter(buf, idx, val):
    rows = jnp.arange(C)

    def body(carry, _):
        buf, idx = carry
        b2 = buf.at[idx, rows].set(val, mode="drop")
        return (b2, (idx + 1) % N), None

    (buf, _), _ = jax.lax.scan(body, (buf, idx), None, length=ITERS)
    return buf


@jax.jit
def loop_scatter_unique(buf, idx, val):
    rows = jnp.arange(C)

    def body(carry, _):
        buf, idx = carry
        b2 = buf.at[idx, rows].set(val, mode="drop", unique_indices=True)
        return (b2, (idx + 1) % N), None

    (buf, _), _ = jax.lax.scan(body, (buf, idx), None, length=ITERS)
    return buf


@jax.jit
def loop_scatter_flat(buf, idx, val):
    # flatten to 1-D scatter of C rows into (N*C, D)
    rows = jnp.arange(C)

    def body(carry, _):
        buf, idx = carry
        flat_idx = idx * C + rows
        b2 = buf.at[flat_idx].set(val, mode="drop", unique_indices=True)
        return (b2, (idx + 1) % N), None

    (buf, _), _ = jax.lax.scan(body, (buf, idx), None, length=ITERS)
    return buf


@jax.jit
def loop_ring_flush(buf, idx, val):
    # 16-slot ring: one-hot writes per iteration + one scatter per 16
    K = 16
    rows = jnp.arange(C)

    def inner(carry, k):
        ring, ridx = carry
        onehot = (jnp.arange(K) == k)[None, :, None]
        ring = jnp.where(onehot, val[:, None, :], ring)
        return (ring, ridx), None

    def body(carry, _):
        buf, idx = carry
        ring = jnp.zeros((C, K, D), buf.dtype)
        (ring, _), _ = jax.lax.scan(inner, (ring, idx), jnp.arange(K))
        tgt = (idx + jnp.arange(K))[None, :].repeat(C, 0) % N  # (C, K)
        b2 = buf.at[tgt.reshape(-1), jnp.tile(rows[:, None], (1, K)).reshape(-1)].set(
            ring.reshape(-1, D), mode="drop"
        )
        return (b2, (idx + K) % N), None

    (buf, _), _ = jax.lax.scan(body, (buf, idx), None, length=ITERS // 16)
    return buf


@jax.jit
def loop_dus(buf, idx, val):
    # contiguous dynamic_update_slice (one row, all chains) — lower bound
    def body(carry, _):
        buf, idx = carry
        b2 = jax.lax.dynamic_update_slice(buf, val[None], (idx, 0, 0))
        return (b2, (idx + 1) % N), None

    (buf, _), _ = jax.lax.scan(body, (buf, idx), None, length=ITERS)
    return buf


if __name__ == "__main__":
    buf = jnp.zeros((N, C, D), jnp.float32)
    val = jnp.ones((C, D), jnp.float32)
    idx = jnp.asarray(0, jnp.int32)
    bench("scatter (C rows, 2-D idx)", loop_scatter, buf, idx, val)
    bench("scatter unique", loop_scatter_unique, buf, idx, val)
    bench("scatter flat 1-D idx", loop_scatter_flat, buf.reshape(N * C, D), idx, val)
    bench("ring16 + flush scatter", loop_ring_flush, buf, idx, val)
    bench("dynamic_update_slice row", loop_dus, buf, idx, val)
