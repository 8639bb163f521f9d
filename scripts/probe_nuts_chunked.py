"""TPU probe: chunked NUTS tree-build vs the scan baseline.

Eight-schools (non-centered), 1024 chains, 1000+1000 — the north-star NUTS
configuration from docs/performance.md. Measures compile time and
steady-state wall time for the requested loop mode.

Usage: timeout 1800 python scripts/probe_nuts_chunked.py chunked
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import fugue_tpu as ft
from fugue_tpu.inference.nuts import NUTSConfig, nuts_chain
from fugue_tpu.inference.mcmc_utils import ess_multichain, split_r_hat


def eight_schools():
    y = jnp.array([28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0])
    sigma = jnp.array([15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0])
    mu = ft.sample("mu", ft.Normal(0.0, 5.0))
    tau = ft.sample("tau", ft.LogNormal(0.5, 1.0))
    theta_raw = ft.sample("theta_raw", ft.Normal(0.0, 1.0), sample_shape=(8,))
    ft.observe("y", ft.Normal(mu + tau * theta_raw, sigma), y)
    return mu


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "chunked"
    n_chains = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    print(
        f"platform={jax.devices()[0].platform} mode={mode} chains={n_chains}",
        flush=True,
    )
    staged = ft.stage(eight_schools)
    cfg = NUTSConfig(max_depth=8, loop=mode)

    t0 = time.perf_counter()
    res = nuts_chain(
        jax.random.PRNGKey(0), staged=staged, n_samples=1000, n_warmup=1000,
        config=cfg, n_chains=n_chains,
    )
    jax.block_until_ready(res.positions)
    t_first = time.perf_counter() - t0
    print(f"first run (compile+exec): {t_first:.1f} s", flush=True)

    t0 = time.perf_counter()
    res = nuts_chain(
        jax.random.PRNGKey(1), staged=staged, n_samples=1000, n_warmup=1000,
        config=cfg, n_chains=n_chains,
    )
    jax.block_until_ready(res.positions)
    t_steady = time.perf_counter() - t0
    mus = np.asarray(res.samples["mu"])
    rhat = float(split_r_hat(mus))
    ess = float(ess_multichain(mus))
    depths = np.asarray(res.tree_depths)
    print(
        f"steady-state: {t_steady:.2f} s | R-hat(mu)={rhat:.4f} "
        f"ESS={ess:.0f} ({ess / t_steady:.0f}/s) "
        f"mean depth={depths.mean():.2f} div%={np.asarray(res.divergences).mean() * 100:.2f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
