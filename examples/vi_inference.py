"""Mean-field VI with pathwise gradients.

Reference: examples/vi_inference.rs:85-100. The Normal family on a conjugate
Normal posterior is exact, so VI recovers the closed form.
"""

import jax
import jax.numpy as jnp
import numpy as np

import fugue_tpu as ft

YS = jnp.array([1.2, 0.8, 1.5, 0.9, 1.1])


def model():
    mu = ft.sample("mu", ft.Normal(0.0, 2.0))
    ft.observe("ys", ft.Normal(mu, 1.0), YS)
    return mu


def main():
    res = ft.optimize_meanfield_vi(
        jax.random.PRNGKey(0), model,
        ft.VIConfig(n_iterations=2000, n_samples=32, learning_rate=0.05),
    )
    tau = 0.25 + 5.0
    post_mean = float(YS.sum()) / tau
    post_sd = 1 / np.sqrt(tau)
    loc = float(res.params["mu"]["loc"])
    scale = float(jax.nn.softplus(res.params["mu"]["raw_scale"]))
    assert abs(loc - post_mean) < 0.05, loc
    assert abs(scale - post_sd) / post_sd < 0.2, scale
    print(
        f"q(mu) = N({loc:.4f}, {scale:.4f}); exact posterior "
        f"N({post_mean:.4f}, {post_sd:.4f}); final ELBO {res.final_elbo():.3f}; "
        f"converged={res.converged} after {res.n_iterations_run} iters -- OK"
    )


if __name__ == "__main__":
    main()
