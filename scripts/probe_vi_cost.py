"""Where does the VI iteration's 1.26 ms go? (VERDICT r2 weak #2)

Isolates, on the real chip, the per-iteration cost of:
  a) grad of the vmapped 128-sample E_q[log p] alone (scan x500)
  b) a + Adam on the per-site params pytree (40 scalar leaves)
  c) a + Adam on a single raveled flat vector
  d) the production optimize_meanfield_vi path (one compiled program)

Run EXCLUSIVELY (no other TPU process): timeout 550 python scripts/probe_vi_cost.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.flatten_util import ravel_pytree

import fugue_tpu as ft
from fugue_tpu.inference.vi import (
    VIConfig, MeanFieldGuide, elbo_analytic_entropy, optimize_meanfield_vi,
)

N_GROUPS = 17
N_ITER, N_MC = 500, 128


def hierarchical_model():
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.normal(0.5, 1.0, (N_GROUPS, 5)))
    mu = ft.sample("mu", ft.Normal(0.0, 2.0))
    tau = ft.sample("tau", ft.LogNormal(0.0, 0.5))
    sigma = ft.sample("sigma", ft.LogNormal(0.0, 0.5))
    for i in range(N_GROUPS):
        th = ft.sample(ft.addr("theta", i), ft.Normal(mu, tau))
        ft.observe(ft.addr("y", i), ft.Normal(th, sigma), data[i])


def timed(f, *args):
    out = jax.block_until_ready(f(*args))  # compile
    t0 = time.perf_counter()
    out = jax.block_until_ready(f(*args))
    return time.perf_counter() - t0, out


def main():
    staged = ft.stage(hierarchical_model)
    guide = MeanFieldGuide(staged)
    params0 = guide.init_params()
    loss_fn = lambda p, k: -elbo_analytic_entropy(k, guide, p, N_MC)
    key = jax.random.PRNGKey(0)
    results = {}

    # a) grad only
    @jax.jit
    def run_a(params, key):
        def body(p, k):
            _, g = jax.value_and_grad(loss_fn)(p, k)
            return jax.tree.map(lambda x, gg: x - 1e-6 * gg, p, g), ()
        p, _ = jax.lax.scan(body, params, jax.random.split(key, N_ITER))
        return p

    dt, _ = timed(run_a, params0, key)
    results["a_grad_only_us_per_iter"] = dt / N_ITER * 1e6

    # b) + pytree Adam + clamp (current structure)
    tx = optax.adam(0.05)

    @jax.jit
    def run_b(params, key):
        def body(carry, k):
            p, s = carry
            _, g = jax.value_and_grad(loss_fn)(p, k)
            up, s = tx.update(g, s, p)
            p = guide.clamp(optax.apply_updates(p, up))
            return (p, s), ()
        (p, _), _ = jax.lax.scan(
            body, (params, tx.init(params)), jax.random.split(key, N_ITER))
        return p

    dt, _ = timed(run_b, params0, key)
    results["b_pytree_adam_us_per_iter"] = dt / N_ITER * 1e6

    # c) + flat-vector Adam (ravel once per iteration boundary)
    flat0, unravel = ravel_pytree(params0)

    @jax.jit
    def run_c(theta, key):
        def body(carry, k):
            th, s = carry
            _, g = jax.value_and_grad(
                lambda t, kk: loss_fn(unravel(t), kk))(th, k)
            up, s = tx.update(g, s, th)
            th = optax.apply_updates(th, up)
            th = ravel_pytree(guide.clamp(unravel(th)))[0]
            return (th, s), ()
        (th, _), _ = jax.lax.scan(
            body, (theta, tx.init(theta)), jax.random.split(key, N_ITER))
        return th

    dt, _ = timed(run_c, flat0, key)
    results["c_flat_adam_us_per_iter"] = dt / N_ITER * 1e6

    # d) production path
    cfg = VIConfig(n_iterations=N_ITER, n_samples=N_MC,
                   plateau_window=10**9, check_every=N_ITER)
    r = optimize_meanfield_vi(jax.random.PRNGKey(4), staged=staged, config=cfg)
    t0 = time.perf_counter()
    r = optimize_meanfield_vi(jax.random.PRNGKey(4), staged=staged, config=cfg)
    dt = time.perf_counter() - t0
    results["d_production_us_per_iter"] = dt / N_ITER * 1e6
    results["d_final_elbo"] = float(r.elbo_history[-1])

    # e) MC-sample scaling: is the cost op-count-bound or FLOP-bound?
    loss8 = lambda p, k: -elbo_analytic_entropy(k, guide, p, 8)

    @jax.jit
    def run_e(params, key):
        def body(p, k):
            _, g = jax.value_and_grad(loss8)(p, k)
            return jax.tree.map(lambda x, gg: x - 1e-6 * gg, p, g), ()
        p, _ = jax.lax.scan(body, params, jax.random.split(key, N_ITER))
        return p

    dt, _ = timed(run_e, params0, key)
    results["e_grad_only_8mc_us_per_iter"] = dt / N_ITER * 1e6

    print(json.dumps({k: round(v, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
