"""On-hardware validation of the fused Pallas systematic-resample kernel.

Runs psystematic_resample on the real TPU chip at 2^20 particles (f32) —
the configuration where the pre-fix kernel drifted by up to 2154 ancestor
indices — and reports deviations against (a) an exact f64 numpy reference
and (b) the f32 XLA cumsum path (the f32 noise floor).

Run exclusively (no other TPU process): timeout 550 python scripts/probe_pallas_resample.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from fugue_tpu.ops import pallas_kernels as pk


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    rng = np.random.default_rng(7)
    n = 1 << 20
    logits = rng.normal(size=n) * 4.0
    key = jax.random.PRNGKey(11)
    u0 = float(jax.random.uniform(key, (), jnp.float32))

    # exact f64 reference
    w = np.exp(logits - np.max(logits))
    cdf = np.cumsum(w / np.sum(w))
    us = (np.arange(n) + u0) / n
    ref = np.clip(np.searchsorted(cdf, us, side="left"), 0, n - 1)

    lw32 = jnp.asarray(logits, jnp.float32)

    t0 = time.perf_counter()
    got = np.asarray(jax.jit(pk.psystematic_resample)(key, lw32))
    t_compile = time.perf_counter() - t0

    # f32 noise floor via the XLA path
    from fugue_tpu.ops.resampling import normalize_log_weights

    w32, _ = normalize_log_weights(lw32)
    xla32 = np.asarray(jax.jit(pk.systematic_resample_xla)(jnp.float32(u0), w32))

    d_kernel = np.abs(got.astype(np.int64) - ref)
    d_floor = np.abs(xla32.astype(np.int64) - ref)
    print(f"compile+run: {t_compile:.1f}s")
    print(f"kernel vs f64: max={d_kernel.max()} frac={(d_kernel > 0).mean():.5f}")
    print(f"xla-f32 vs f64 (floor): max={d_floor.max()} frac={(d_floor > 0).mean():.5f}")

    # timing: kernel vs XLA path, steady state
    f_k = jax.jit(pk.psystematic_resample)
    f_x = jax.jit(lambda k, lw: pk.systematic_resample_xla(
        jax.random.uniform(k, (), jnp.float32), normalize_log_weights(lw)[0]))
    f_k(key, lw32).block_until_ready()
    f_x(key, lw32).block_until_ready()
    for name, f in [("pallas", f_k), ("xla", f_x)]:
        t0 = time.perf_counter()
        for i in range(20):
            out = f(jax.random.fold_in(key, i), lw32)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / 20
        print(f"{name}: {dt * 1e6:.0f} us/resample at n=2^20")

    ok = d_kernel.max() <= max(4, 2 * d_floor.max())
    print("VERDICT:", "PASS" if ok else "FAIL")


if __name__ == "__main__":
    main()
