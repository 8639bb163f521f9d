"""Gaussian mixture with marginalized memberships + tempered SMC.

Reference: examples/mixture_models.rs:77-111 + smc_inference.rs (BASELINE
config 4). Component memberships are enumerated out with logsumexp
(SURVEY.md §7 hard part 2) so the target is smooth; particles are tempered
through the sharp mixture likelihood.
"""

import jax
import jax.numpy as jnp
import numpy as np

import fugue_tpu as ft

rng = np.random.default_rng(0)
DATA = jnp.asarray(
    np.concatenate([rng.normal(-2.0, 0.5, 40), rng.normal(2.0, 0.5, 60)])
)


def gmm():
    mu0 = ft.sample("mu0", ft.Normal(0.0, 5.0))
    mu1 = ft.sample("mu1", ft.Normal(0.0, 5.0))
    ft.guard(mu0 < mu1)  # ordering breaks label switching
    w = ft.sample("w", ft.Beta(2.0, 2.0))
    lp0 = jnp.log(w) + ft.Normal(mu0, 0.5).log_prob(DATA)
    lp1 = jnp.log1p(-w) + ft.Normal(mu1, 0.5).log_prob(DATA)
    ft.factor(jnp.sum(jnp.logaddexp(lp0, lp1)))
    return mu0, mu1


def main():
    res = ft.adaptive_smc(
        jax.random.PRNGKey(0), 2048, gmm,
        ft.SMCConfig(rejuvenation_steps=5),
    )
    mu0 = float(res.posterior_mean("mu0"))
    mu1 = float(res.posterior_mean("mu1"))
    w = float(res.posterior_mean("w"))
    assert abs(mu0 + 2.0) < 0.2, mu0
    assert abs(mu1 - 2.0) < 0.2, mu1
    assert abs(w - 0.4) < 0.1, w
    print(
        f"mu0={mu0:.3f} mu1={mu1:.3f} w={w:.3f} "
        f"logZ={res.log_evidence:.2f} stages={res.n_stages} -- OK"
    )


if __name__ == "__main__":
    main()
