"""Isolate async-NUTS phase costs on the real chip (warmup vs sampling)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import fugue_tpu as ft
from fugue_tpu.inference.nuts import NUTSConfig, nuts_chain
from fugue_tpu.runtime.staging import stage

y = jnp.array([28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0])
sigma = jnp.array([15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0])


def eight_schools():
    mu = ft.sample("mu", ft.Normal(0.0, 5.0))
    tau = ft.sample("tau", ft.LogNormal(0.5, 1.0))
    theta_raw = ft.sample("theta_raw", ft.Normal(0.0, 1.0), sample_shape=(8,))
    ft.observe("y", ft.Normal(mu + tau * theta_raw, sigma), y)
    return mu


def run(mode, w, s, n_chains=1024, seed=0):
    staged = stage(eight_schools)
    cfg = NUTSConfig(loop=mode)
    for i in range(2):
        t0 = time.perf_counter()
        res = nuts_chain(
            jax.random.PRNGKey(seed + i), staged=staged, n_samples=s,
            n_warmup=w, n_chains=n_chains, config=cfg,
        )
        jax.block_until_ready(res.positions)
        dt = time.perf_counter() - t0
    print(f"{mode} w={w} s={s}: steady={dt:.3f}s", flush=True)
    return dt


if __name__ == "__main__":
    run("async", 1000, 1)
    run("async", 0, 1000)
    run("async", 1000, 1000)
    run("chunked", 0, 1000)
