"""On-chip probe: async vs chunked NUTS at 1024 chains on eight-schools.

VERDICT round-1 item 1: the lock-step (chunked) tree build was ~74x slower
than HMC at 1024 chains because every vmapped lane pays the per-transition
max tree size. This measures the transition-pipelined async drive against it
on the real chip. Run exclusively (no other TPU process).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import fugue_tpu as ft
from fugue_tpu.inference.nuts import NUTSConfig, nuts_chain
from fugue_tpu.runtime.staging import stage

y = jnp.array([28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0])
sigma = jnp.array([15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0])


def eight_schools():
    mu = ft.sample("mu", ft.Normal(0.0, 5.0))
    tau = ft.sample("tau", ft.LogNormal(0.5, 1.0))
    theta_raw = ft.sample("theta_raw", ft.Normal(0.0, 1.0), sample_shape=(8,))
    ft.observe("y", ft.Normal(mu + tau * theta_raw, sigma), y)
    return mu


N_CHAINS = 1024
N_SAMPLES = 1000
N_WARMUP = 1000


def run(mode, seed=0):
    staged = stage(eight_schools)
    cfg = NUTSConfig(loop=mode)
    t0 = time.perf_counter()
    res = nuts_chain(
        jax.random.PRNGKey(seed), staged=staged, n_samples=N_SAMPLES,
        n_warmup=N_WARMUP, n_chains=N_CHAINS, config=cfg,
    )
    jax.block_until_ready(res.positions)
    compile_and_run = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = nuts_chain(
        jax.random.PRNGKey(seed + 1), staged=staged, n_samples=N_SAMPLES,
        n_warmup=N_WARMUP, n_chains=N_CHAINS, config=cfg,
    )
    jax.block_until_ready(res.positions)
    steady = time.perf_counter() - t0
    import numpy as np
    from fugue_tpu.inference.mcmc_utils import ess_multichain, split_r_hat
    mus = np.asarray(res.samples["mu"])
    rhat = float(split_r_hat(mus))
    ess = float(ess_multichain(mus))
    depth = float(np.asarray(res.tree_depths).mean())
    print(
        f"{mode}: first={compile_and_run:.1f}s steady={steady:.3f}s "
        f"rhat={rhat:.4f} ess={ess:.0f} mean_depth={depth:.2f} "
        f"mu_mean={mus.mean():.2f} div={np.asarray(res.divergences).mean():.4f}",
        flush=True,
    )
    return steady


if __name__ == "__main__":
    t_async = run("async")
    t_chunked = run("chunked")
    print(f"speedup async vs chunked: {t_chunked / t_async:.2f}x", flush=True)
