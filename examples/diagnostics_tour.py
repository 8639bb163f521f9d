"""Convergence diagnostics: R-hat, ESS, Geweke, summaries.

Reference: src/inference/diagnostics.rs + mcmc_utils.rs. All estimators are
batched jit-compiled array programs here, so diagnosing 1000 parameters
costs one kernel, not 1000 loops.
"""

import jax
import jax.numpy as jnp
import numpy as np

import fugue_tpu as ft


def main():
    rng = np.random.default_rng(0)

    # well-mixed chains
    good = rng.normal(size=(4, 2000))
    print(f"iid chains: split-R-hat={float(ft.split_r_hat(good)):.4f}, "
          f"multichain ESS={float(ft.ess_multichain(good)):.0f}/8000")

    # a stuck chain
    bad = good.copy()
    bad[3] = 0.01 * rng.normal(size=2000) + 3.0
    print(f"one stuck chain: split-R-hat={float(ft.split_r_hat(bad)):.3f} (should be >> 1.1)")
    assert float(ft.split_r_hat(bad)) > 1.1

    # autocorrelated chain: ESS reflects the AR(1) ground truth
    phi = 0.9
    x = np.empty(20000)
    innov = rng.normal(size=20000)
    x[0] = innov[0]
    for i in range(1, 20000):
        x[i] = phi * x[i - 1] + innov[i]
    e = float(ft.ess(x))
    truth = 20000 * (1 - phi) / (1 + phi)
    print(f"AR(0.9) ESS: {e:.0f} (theory {truth:.0f})")

    # Geweke: early-vs-late stationarity z-score
    z_ok = float(ft.geweke(good[0]))
    z_drift = float(ft.geweke(good[0] + np.linspace(0, 3, 2000)))
    print(f"geweke stationary z={z_ok:.2f}; drifting z={z_drift:.2f}")
    assert abs(z_ok) < 3 and abs(z_drift) > 4

    # end-to-end: sampler → formatted table with verdict
    def model():
        mu = ft.sample("mu", ft.Normal(0.0, 2.0))
        sd = ft.sample("sd", ft.LogNormal(0.0, 0.5))
        ft.observe("y", ft.Normal(mu, sd), jnp.array([1.0, 0.8, 1.2, 1.1]))
        return mu

    res = ft.hmc_chain(jax.random.PRNGKey(0), model, n_samples=800,
                       n_warmup=500, n_chains=8)
    ft.print_diagnostics(res.samples)


if __name__ == "__main__":
    main()
