"""Trans-dimensional inference: RJMCMC over structure-varying models.

Reference: the reference's birth/death MH corrections (mh.rs:637-744).
Models whose SITE SET depends on sampled values cannot be staged into one
XLA program; the dynamic trace-based chain runs them with birth-from-prior
proposals and the site-count dimension term. The posterior over the
structure flag is checked against the analytic evidence ratio.
"""

import jax

# these asserts are tuned for f64 (the documented way to run the
# examples); self-configure so `python examples/...` works anywhere
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
import scipy.stats as st

import fugue_tpu as ft


def main():
    y_obs = 2.4

    def model():
        use_b = ft.sample("use_b", ft.Bernoulli(0.3))
        a = ft.sample("a", ft.Normal(0.0, 1.0))
        if bool(np.asarray(use_b)):  # structure depends on a sampled value!
            b = ft.sample("b", ft.Normal(0.0, 1.0))
            mean = a + b
        else:
            mean = a
        ft.observe("y", ft.Normal(mean, 0.5), jnp.asarray(y_obs))
        return mean

    res = ft.adaptive_mcmc_chain_dynamic(
        jax.random.PRNGKey(0), model, n_samples=6000, n_warmup=1000
    )

    z0 = st.norm(0, np.sqrt(1.25)).pdf(y_obs)
    z1 = st.norm(0, np.sqrt(2.25)).pdf(y_obs)
    exact = 0.3 * z1 / (0.3 * z1 + 0.7 * z0)
    freq = res.presence("b").mean()
    assert abs(freq - exact) < 0.05, (freq, exact)
    print(
        f"P(two-component | y) = {freq:.3f} (analytic {exact:.3f}); "
        f"{res.birth_count} births / {res.death_count} deaths, "
        f"accept rate {res.accept_rate:.2f} -- OK"
    )


if __name__ == "__main__":
    main()
