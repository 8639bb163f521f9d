"""Likelihood-free inference with ABC rejection + weighted ABC-SMC.

Reference: examples/abc_inference.rs. The simulator is the model's prior
execution; the ABC posterior on the mean summary is checked against the
conjugate posterior it approximates.
"""

import jax
import jax.numpy as jnp
import numpy as np

import fugue_tpu as ft

N_OBS = 20
rng = np.random.default_rng(123)
OBSERVED = jnp.asarray(rng.normal(1.0, 1.0, N_OBS))


def simulator():
    mu = ft.sample("mu", ft.Normal(0.0, 2.0))
    return ft.sample("ys", ft.Normal(mu, 1.0), sample_shape=(N_OBS,))


def main():
    dist = ft.SummaryStatsDistance(summary=jnp.mean)

    rej = ft.abc_rejection(
        jax.random.PRNGKey(0), simulator, OBSERVED, dist,
        epsilon=0.1, n_samples=300,
    )
    smc = ft.abc_smc_weighted(
        jax.random.PRNGKey(1), simulator, OBSERVED, dist,
        ft.ABCSMCConfig(epsilons=(1.0, 0.4, 0.15), n_particles=400,
                        batch_size=2048),
        param_addresses=["mu"],
    )
    ybar = float(jnp.mean(OBSERVED))
    tau = 0.25 + N_OBS
    post_mean = N_OBS * ybar / tau
    mu_rej = float(rej.posterior_mean("mu"))
    mu_smc = float(smc.posterior_mean("mu"))
    assert abs(mu_rej - post_mean) < 0.15, mu_rej
    assert abs(mu_smc - post_mean) < 0.12, mu_smc
    print(
        f"rejection mu={mu_rej:.3f} ({rej.n_attempts} sims); "
        f"ABC-SMC mu={mu_smc:.3f} ({smc.n_attempts} sims); "
        f"conjugate target {post_mean:.3f} -- OK"
    )


if __name__ == "__main__":
    main()
