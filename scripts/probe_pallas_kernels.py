"""On-chip keep-or-kill measurement for the Pallas kernels vs their XLA
equivalents (the reference's bench discipline: keep a subsystem only if the
measurement justifies it, benches/f_perf.rs:56-66).

Measures, per size: plogsumexp vs jax.scipy.special.logsumexp, and
pnormal_loglik_sum (fused Gaussian-plate log-likelihood, custom VJP) vs the
naive XLA formulation — forward and grad. Prints one JSON line per case and
writes benchmarks/PALLAS_PROBE.json.

Run EXCLUSIVELY on the chip (no other TPU process):
    timeout 550 python scripts/probe_pallas_kernels.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from fugue_tpu.ops import pallas_kernels as pk


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    results = {}
    rng = np.random.default_rng(0)

    for n in (1 << 16, 1 << 20, 1 << 24):
        x = jnp.asarray(rng.normal(-1.0, 2.0, n).astype(np.float32))

        f_pallas = jax.jit(lambda v: pk.plogsumexp(v))
        f_xla = jax.jit(lambda v: jax.scipy.special.logsumexp(v))
        with_pallas = timeit(f_pallas, x)
        with_xla = timeit(f_xla, x)
        err = abs(float(f_pallas(x)) - float(f_xla(x)))
        rec = {
            "kernel": "plogsumexp",
            "n": n,
            "pallas_us": round(with_pallas * 1e6, 1),
            "xla_us": round(with_xla * 1e6, 1),
            "speedup": round(with_xla / with_pallas, 3),
            "abs_err": err,
        }
        results[f"plogsumexp_{n}"] = rec
        print(json.dumps(rec), flush=True)

        y = jnp.asarray(rng.normal(0.5, 1.0, n).astype(np.float32))
        mu = jnp.float32(0.3)
        sigma = jnp.float32(1.1)

        def xla_loglik(mu, sigma, y):
            z = (y - mu) / sigma
            return jnp.sum(
                -0.5 * z * z - jnp.log(sigma) - 0.5 * np.log(2 * np.pi)
            )

        g_pallas = jax.jit(jax.grad(
            lambda m: pk.pnormal_loglik_sum(y, m, sigma)))
        g_xla = jax.jit(jax.grad(lambda m: xla_loglik(m, sigma, y)))
        f_pl = jax.jit(lambda m: pk.pnormal_loglik_sum(y, m, sigma))
        f_xl = jax.jit(lambda m: xla_loglik(m, sigma, y))
        rec = {
            "kernel": "pnormal_loglik_sum",
            "n": n,
            "pallas_fwd_us": round(timeit(f_pl, mu) * 1e6, 1),
            "xla_fwd_us": round(timeit(f_xl, mu) * 1e6, 1),
            "pallas_grad_us": round(timeit(g_pallas, mu) * 1e6, 1),
            "xla_grad_us": round(timeit(g_xla, mu) * 1e6, 1),
            "fwd_abs_err": abs(float(f_pl(mu)) - float(f_xl(mu))),
            "grad_abs_err": abs(float(g_pallas(mu)) - float(g_xla(mu))),
        }
        rec["fwd_speedup"] = round(rec["xla_fwd_us"] / rec["pallas_fwd_us"], 3)
        rec["grad_speedup"] = round(
            rec["xla_grad_us"] / rec["pallas_grad_us"], 3
        )
        results[f"pnormal_{n}"] = rec
        print(json.dumps(rec), flush=True)

    results["meta"] = {"device": str(jax.devices()[0])}
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks")
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, "PALLAS_PROBE.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
