"""Bayesian linear regression via HMC with dual-averaging.

Reference: examples/linear_regression.rs (BASELINE config 2). Gradient-based
HMC over (slope, intercept, noise scale); the noise scale rides the log
transform automatically (positive support).
"""

import jax
import jax.numpy as jnp
import numpy as np

import fugue_tpu as ft

rng = np.random.default_rng(0)
TRUE_W, TRUE_B, TRUE_S = 1.5, -0.7, 0.5
X = jnp.asarray(rng.uniform(-2, 2, 50))
Y = jnp.asarray(TRUE_W * np.asarray(X) + TRUE_B + rng.normal(0, TRUE_S, 50))


def model():
    w = ft.sample("w", ft.Normal(0.0, 5.0))
    b = ft.sample("b", ft.Normal(0.0, 5.0))
    sigma = ft.sample("sigma", ft.LogNormal(-1.0, 1.0))
    ft.observe("y", ft.Normal(w * X + b, sigma), Y)
    return w, b


def main():
    res = ft.hmc_chain(
        jax.random.PRNGKey(0), model,
        n_samples=1000, n_warmup=1000,
        config=ft.HMCConfig(n_leapfrog=16),
        n_chains=16,
    )
    ft.print_diagnostics(res.samples)
    w = float(np.asarray(res.samples["w"]).mean())
    b = float(np.asarray(res.samples["b"]).mean())
    s = float(np.asarray(res.samples["sigma"]).mean())
    assert abs(w - TRUE_W) < 0.15, w
    assert abs(b - TRUE_B) < 0.15, b
    assert abs(s - TRUE_S) < 0.15, s
    print(f"w={w:.3f} b={b:.3f} sigma={s:.3f} -- OK")

    # posterior predictive: replay every (chain, draw) through the model
    # with the observations redrawn; predictive residuals should center on
    # zero with scale ~ sigma (plus parameter uncertainty)
    pred = ft.posterior_predictive(
        jax.random.PRNGKey(1), model, res.samples
    )
    y_rep = np.asarray(pred["y"])  # (chains, draws, 50)
    resid = y_rep - np.asarray(Y)
    assert abs(resid.mean()) < 0.05, resid.mean()
    assert 0.4 < y_rep.std(axis=(0, 1)).mean() < 0.8
    print(f"posterior predictive: mean residual {resid.mean():+.4f} -- OK")


if __name__ == "__main__":
    main()
