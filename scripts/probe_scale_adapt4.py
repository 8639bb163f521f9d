"""Round-4 probe 4: densemass with longer sampling (C3 was R-hat 1.0113)
and a longer full-rank VI run (3000 iters left sd_ratio at 2.8)."""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from probe_scale_adapt3 import build_densemass, fetch  # noqa: E402


def run_densemass(tag, L, target, NW, NS, DC=128):
    from fugue_tpu.inference.hmc import HMCConfig, hmc_chain
    from fugue_tpu.inference.mcmc_utils import split_r_hat

    staged, pmean, psd, DD = build_densemass()
    cfg = HMCConfig(n_leapfrog=L, mass="dense", target_accept=target)
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


def exp_F(n_iter, lr):
    import fugue_tpu as ft
    from fugue_tpu.inference.vi import VIConfig, optimize_fullrank_vi

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
    cfg = VIConfig(n_iterations=n_iter, n_samples=8,
                   plateau_window=10**9, check_every=n_iter,
                   learning_rate=lr)

    def run(i):
        t0 = time.perf_counter()
        r = optimize_fullrank_vi(
            jax.random.fold_in(jax.random.PRNGKey(41), i),
            staged=staged, config=cfg)
        return r, time.perf_counter() - t0

    _, t_compile = run(0)
    r, t_run = run(1)
    loc = np.asarray(r.params["loc"])
    mean_err = float(np.max(np.abs(loc - np.asarray(pmean))
                            / np.asarray(psd)))
    cov = np.asarray(r.guide.covariance(r.params))
    ratio = np.sqrt(np.diag(cov)) / np.asarray(psd)
    print(json.dumps({
        "exp": f"F_fullrank_{n_iter}_{lr}",
        "iters_per_sec": round(n_iter / t_run, 1),
        "wall_s": round(t_run, 2), "compile_s": round(t_compile, 1),
        "max_mean_err_in_sd": round(mean_err, 3),
        "final_elbo": round(float(r.elbo_history[-1]), 2),
        "sd_ratio_minmax": [round(float(ratio.min()), 3),
                            round(float(ratio.max()), 3)],
    }), flush=True)


if __name__ == "__main__":
    which = set(sys.argv[1:]) or {"C5", "F"}
    print(f"# devices: {jax.devices()}", flush=True)
    if "C5" in which:
        run_densemass("C5_L32_t085_nw600_ns1024", L=32, target=0.85,
                      NW=600, NS=1024)
    if "F" in which:
        exp_F(12000, 0.01)
    print("# probe4 done", flush=True)
