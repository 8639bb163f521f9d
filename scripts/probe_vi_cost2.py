"""Bisect the production VI program's 15x overhead vs the handwritten
equivalent (probe_vi_cost.py: b=96us/iter, production=1425us/iter).

Variants:
  f1) scan body + optax.adam(power schedule) + clamp  (no while_loop)
  f2) f1 wrapped in the production while_loop + history dynamic_update_slice
  f3) the actual _make_vi_program run fn, timed around `run` only

Run EXCLUSIVELY: timeout 550 python scripts/probe_vi_cost2.py
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

import fugue_tpu as ft
from fugue_tpu.inference.vi import (
    VIConfig, MeanFieldGuide, elbo_analytic_entropy, _make_vi_program,
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
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(f(*args))
    return time.perf_counter() - t0


def main():
    staged = ft.stage(hierarchical_model)
    guide = MeanFieldGuide(staged)
    params0 = guide.init_params()
    loss_fn = lambda p, k: -elbo_analytic_entropy(k, guide, p, N_MC)
    key = jax.random.PRNGKey(0)
    results = {}

    t0c = max(N_ITER / 10.0, 1.0)
    schedule = lambda t: 0.05 * jnp.power(1.0 + t / t0c, -0.6)
    tx = optax.adam(schedule)

    def body(carry, k):
        p, s = carry
        loss, g = jax.value_and_grad(loss_fn)(p, k)
        up, s = tx.update(g, s, p)
        p = guide.clamp(optax.apply_updates(p, up))
        return (p, s), -loss

    @jax.jit
    def run_f1(params, opt_state, key):
        keys = jax.random.split(jax.random.fold_in(key, 0), N_ITER)
        (p, s), elbos = jax.lax.scan(body, (params, opt_state), keys)
        return p, elbos

    s0 = tx.init(params0)
    results["f1_scan_sched_adam"] = timed(run_f1, params0, s0, key) / N_ITER * 1e6

    @jax.jit
    def run_f2(params, opt_state, key):
        hist0 = jnp.zeros((N_ITER,), jnp.float32)

        def cond(c):
            return (c[3] < 1) & (~c[4])

        def step(c):
            p, s, hist, i, _ = c
            keys = jax.random.split(jax.random.fold_in(key, i), N_ITER)
            (p, s), elbos = jax.lax.scan(body, (p, s), keys)
            hist = jax.lax.dynamic_update_slice(hist, elbos, (i * N_ITER,))
            return p, s, hist, i + 1, jnp.asarray(False)

        p, s, hist, i, cv = jax.lax.while_loop(
            cond, step,
            (params, opt_state, hist0, jnp.asarray(0, jnp.int32),
             jnp.asarray(False)))
        return p, hist

    results["f2_whileloop"] = timed(run_f2, params0, s0, key) / N_ITER * 1e6

    cfg = VIConfig(n_iterations=N_ITER, n_samples=N_MC,
                   plateau_window=10**9, check_every=N_ITER)
    run_f3 = _make_vi_program(guide, tx, loss_fn, cfg)
    results["f3_make_vi_program"] = timed(run_f3, params0, s0, key) / N_ITER * 1e6

    print(json.dumps({k: round(v, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
