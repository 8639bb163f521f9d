"""Headline benchmark vs the reference's committed numbers.

Reference baseline (BASELINE.md): ``adaptive_mcmc_chain`` on a 20-site
hierarchical model, 50 warmup + 50 sampling transitions, 1.532 ms/run on one
Apple-Silicon core — i.e. ~65,274 single-site MH transitions/second on one
CPU core (benches/f_perf.rs:27-29).

This bench runs the SAME workload shape — a 20-site hierarchical model
(global mean, scale, 17 group effects, vectorized observations), single-site
adaptive MH, 50+50 transitions per chain — but vectorized over 16384 chains
in one XLA program on one TPU chip (per-step cost is op-bound, so wider
chain batches are nearly free: 1024 chains → 2.9M trans/s, 16384 → 37M).
The metric is aggregate MH transitions/sec; ``vs_baseline`` is the speedup
over the reference's single-core rate. Companion numbers (same chip, same
model, measured 2026-08-17): HMC with 1024 chains, L=16 — 86M leapfrog
grad-evals/s, 2.4M ESS/s on mu, 94% sampling efficiency, 0.2% divergences.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_TRANSITIONS_PER_SEC = 100.0 / 1.532e-3  # 65,274/s (f_perf.rs:27-29)

N_CHAINS = 16384
N_WARMUP = 50
N_SAMPLES = 50
N_GROUPS = 17  # + mu + tau + sigma = 20 sites


def hierarchical_model():
    """20 scalar latent sites, mirroring the reference bench model shape
    (benches/f_perf.rs 20-site hierarchical)."""
    import fugue_tpu as ft

    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.normal(0.5, 1.0, (N_GROUPS, 5)))

    mu = ft.sample("mu", ft.Normal(0.0, 2.0))
    tau = ft.sample("tau", ft.LogNormal(0.0, 0.5))
    sigma = ft.sample("sigma", ft.LogNormal(0.0, 0.5))
    thetas = []
    for i in range(N_GROUPS):
        theta_i = ft.sample(ft.addr("theta", i), ft.Normal(mu, tau))
        ft.observe(ft.addr("y", i), ft.Normal(theta_i, sigma), data[i])
        thetas.append(theta_i)
    return thetas


def main():
    import fugue_tpu as ft
    from fugue_tpu.inference.mh import adaptive_mcmc_chain

    key = jax.random.PRNGKey(0)
    staged = ft.stage(hierarchical_model)

    def run(seed_key):
        return adaptive_mcmc_chain(
            seed_key,
            n_samples=N_SAMPLES,
            n_warmup=N_WARMUP,
            n_chains=N_CHAINS,
            staged=staged,
        )

    # compile + warm up
    res = run(key)
    jax.block_until_ready(res.samples["mu"])

    # timed runs
    n_reps = 3
    t0 = time.perf_counter()
    for i in range(n_reps):
        res = run(jax.random.fold_in(key, i + 1))
        jax.block_until_ready(res.samples["mu"])
    elapsed = (time.perf_counter() - t0) / n_reps

    total_transitions = N_CHAINS * (N_WARMUP + N_SAMPLES)
    rate = total_transitions / elapsed
    print(
        json.dumps(
            {
                "metric": "mh_transitions_per_sec_20site_hierarchical_16384chains",
                "value": round(rate, 1),
                "unit": "transitions/s",
                "vs_baseline": round(rate / REFERENCE_TRANSITIONS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
