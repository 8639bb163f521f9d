"""Round-4 probe 3: dense-mass schedule search (r3 row R-hat 1.012-1.02)
and VI at scale (VERDICT r3 item 9). Exclusive chip.

Usage: nohup python scripts/probe_scale_adapt3.py C3 C4 V > /tmp/probe3.log &
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def fetch(x):
    return float(np.asarray(x))


def build_densemass():
    import fugue_tpu as ft

    DD, DN = 256, 8192
    ii = np.arange(DD)
    Sigma = np.exp(-np.abs(ii[:, None] - ii[None, :]) / 32.0)
    Lj = jnp.asarray(np.linalg.cholesky(Sigma), jnp.float32)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(98), 3)

    @jax.jit
    def gen():
        X = jax.random.normal(k1, (DN, DD)) / np.float32(np.sqrt(DD))
        w_true = Lj @ jax.random.normal(k2, (DD,))
        yv = X @ w_true + jax.random.normal(k3, (DN,))
        Lam = (jnp.linalg.inv(Sigma.astype(np.float32)) + X.T @ X)
        Pcov = jnp.linalg.inv(Lam)
        pmean = Pcov @ (X.T @ yv)
        return X, yv, pmean, jnp.sqrt(jnp.diag(Pcov))

    Xj, yj, pmean, psd = gen()

    def model(Xd, yd):
        w = ft.sample(
            "w", ft.MultivariateNormal(jnp.zeros(DD), scale_tril=Lj))
        ft.observe("y", ft.Normal(Xd @ w, 1.0), yd)

    return ft.stage(model, Xj, yj), pmean, psd, DD


def run_densemass(tag, L, target, NW, NS, DC=128, jitter=None):
    from fugue_tpu.inference.hmc import HMCConfig, hmc_chain
    from fugue_tpu.inference.mcmc_utils import split_r_hat

    staged, pmean, psd, DD = build_densemass()
    kw = {} if jitter is None else {"jitter": jitter}
    cfg = HMCConfig(n_leapfrog=L, mass="dense", target_accept=target, **kw)
    stats = jax.jit(lambda ws, divs: (
        jnp.max(jnp.abs(jnp.mean(ws, axis=(0, 1)) - pmean) / psd),
        jnp.max(jax.vmap(split_r_hat, in_axes=2)(ws[:, :, ::8])),
        jnp.mean(divs.astype(jnp.float32)),
    ))

    def run(i):
        t0 = time.perf_counter()
        r = hmc_chain(jax.random.fold_in(jax.random.PRNGKey(22), i),
                      n_samples=NS, n_warmup=NW, n_chains=DC,
                      config=cfg, staged=staged)
        return [fetch(x) for x in stats(r.samples["w"], r.divergences)], (
            time.perf_counter() - t0)

    _, t_compile = run(0)
    (err, rhat, div), t_run = run(1)
    print(json.dumps({
        "exp": tag, "L": L, "target": target, "NW": NW, "NS": NS,
        "rhat": round(rhat, 4), "mean_err_sd": round(err, 3),
        "div": round(div, 5), "wall_s": round(t_run, 2),
        "compile_s": round(t_compile, 1),
        "grad_evals_per_sec": round(DC * (NW + NS) * (L + 1) / t_run, 1),
    }), flush=True)


def exp_V():
    """VI at scale: d=512 correlated-posterior linear model with an exact
    closed-form posterior; mean-field (marginal means exact, variances
    under) + full-rank (both) — iterations/s + moment gates."""
    import fugue_tpu as ft
    from fugue_tpu.inference.vi import (
        VIConfig, optimize_fullrank_vi, optimize_meanfield_vi,
    )

    DD, DN = 512, 16384
    ii = np.arange(DD)
    Sigma = np.exp(-np.abs(ii[:, None] - ii[None, :]) / 16.0)
    Lj = jnp.asarray(np.linalg.cholesky(Sigma), jnp.float32)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(96), 3)

    @jax.jit
    def gen():
        X = jax.random.normal(k1, (DN, DD)) / np.float32(np.sqrt(DD))
        w_true = Lj @ jax.random.normal(k2, (DD,))
        yv = X @ w_true + jax.random.normal(k3, (DN,))
        Lam = (jnp.linalg.inv(Sigma.astype(np.float32)) + X.T @ X)
        Pcov = jnp.linalg.inv(Lam)
        pmean = Pcov @ (X.T @ yv)
        return X, yv, pmean, jnp.sqrt(jnp.diag(Pcov))

    Xj, yj, pmean, psd = gen()

    def model(Xd, yd):
        w = ft.sample(
            "w", ft.MultivariateNormal(jnp.zeros(DD), scale_tril=Lj))
        ft.observe("y", ft.Normal(Xd @ w, 1.0), yd)

    staged = ft.stage(model, Xj, yj)
    assert staged.data_leaves(), "X must flow as a data argument"

    for name, fn, n_iter, n_mc in (
        ("meanfield", optimize_meanfield_vi, 3000, 8),
        ("fullrank", optimize_fullrank_vi, 3000, 8),
    ):
        cfg = VIConfig(n_iterations=n_iter, n_samples=n_mc,
                       plateau_window=10**9, check_every=n_iter,
                       learning_rate=0.02)

        def run(i):
            t0 = time.perf_counter()
            r = fn(jax.random.fold_in(jax.random.PRNGKey(40), i),
                   staged=staged, config=cfg)
            return r, time.perf_counter() - t0

        _, t_compile = run(0)
        r, t_run = run(1)
        loc = np.asarray(r.params["w"]["loc"]
                         if name == "meanfield" else r.params["loc"])
        mean_err = float(np.max(np.abs(loc - np.asarray(pmean))
                                / np.asarray(psd)))
        out = {
            "exp": f"V_{name}_d512", "iters_per_sec": round(n_iter / t_run, 1),
            "wall_s": round(t_run, 2), "compile_s": round(t_compile, 1),
            "max_mean_err_in_sd": round(mean_err, 3),
            "final_elbo": round(float(r.elbo_history[-1]), 2),
        }
        if name == "fullrank":
            # marginal sds from the learned covariance LL^T
            cov = np.asarray(r.guide.covariance(r.params))
            ratio = np.sqrt(np.diag(cov)) / np.asarray(psd)
            out["sd_ratio_minmax"] = [round(float(ratio.min()), 3),
                                      round(float(ratio.max()), 3)]
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    which = set(sys.argv[1:]) or {"C3", "C4", "V"}
    print(f"# devices: {jax.devices()}", flush=True)
    if "C3" in which:
        run_densemass("C3_L32_t085_nw600_ns512", L=32, target=0.85,
                      NW=600, NS=512)
    if "C4" in which:
        run_densemass("C4_L24_t090_jitter_nw800_ns768", L=24, target=0.9,
                      NW=800, NS=768)
    if "V" in which:
        exp_V()
    print("# probe3 done", flush=True)
