"""Hierarchical partial pooling (eight schools) with NUTS.

Reference: examples/hierarchical_models.rs:7-34 (BASELINE config 3). The
funnel geometry is handled by the non-centered parameterization + NUTS's
dynamic trajectory lengths; convergence gate: split-R-hat < 1.01.
"""

import jax
import jax.numpy as jnp
import numpy as np

import fugue_tpu as ft

Y = jnp.array([28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0])
SIGMA = jnp.array([15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0])


def eight_schools():
    mu = ft.sample("mu", ft.Normal(0.0, 5.0))
    tau = ft.sample("tau", ft.LogNormal(0.5, 1.0))
    theta_raw = ft.sample("theta_raw", ft.Normal(0.0, 1.0), sample_shape=(8,))
    theta = mu + tau * theta_raw
    ft.observe("y", ft.Normal(theta, SIGMA), Y)
    return theta


def main():
    res = ft.nuts_chain(
        jax.random.PRNGKey(0), eight_schools,
        n_samples=1000, n_warmup=1000, n_chains=16,
    )
    summaries = ft.print_diagnostics(
        {k: res.samples[k] for k in ("mu", "tau")}
    )
    mus = np.asarray(res.samples["mu"])
    assert float(ft.split_r_hat(mus)) < 1.01
    assert 2.5 < mus.mean() < 6.5  # Stan reference ~4.4
    div = float(np.asarray(res.divergences).mean())
    print(f"mu={mus.mean():.3f}, divergences={div:.3%}, "
          f"mean tree depth={float(np.asarray(res.tree_depths).mean()):.1f} -- OK")


if __name__ == "__main__":
    main()
