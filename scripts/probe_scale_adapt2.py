"""Round-4 probe 2: NUTS at d=1024 (VERDICT r3 item 2), densemass with a
longer schedule, ChEES warmup diagnosis. Exclusive chip."""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from probe_scale_adapt import build_logistic, map_start, stats_fn, fetch  # noqa: E402


def exp_N(staged, w_true, m):
    from fugue_tpu.inference.nuts import NUTSConfig, nuts_chain

    C, NW, NS = 256, 300, 128
    cfg = NUTSConfig(max_depth=6)
    stats = stats_fn(w_true)

    def run(i):
        t0 = time.perf_counter()
        r = nuts_chain(jax.random.fold_in(jax.random.PRNGKey(41), i),
                       n_samples=NS, n_warmup=NW, n_chains=C,
                       config=cfg, staged=staged,
                       init_position=m.z, init_jitter=0.05)
        vals = [fetch(x) for x in stats(
            jnp.asarray(r.samples["w"]), jnp.asarray(r.divergences))]
        depth = float(np.asarray(r.tree_depths).mean())
        return vals + [r.step_size, depth], time.perf_counter() - t0

    _, t_compile = run(0)
    (rhat, err, div, eps, depth), t_run = run(1)
    n_leaps = (NW + NS) * (2 ** depth)  # rough mean leapfrogs/transition
    print(json.dumps({
        "exp": "N_nuts_logistic", "rhat": round(rhat, 4),
        "coef_err": round(err, 4), "div": round(div, 5),
        "eps": eps, "mean_depth": round(depth, 2),
        "wall_s": round(t_run, 2), "compile_s": round(t_compile, 1),
        "approx_grad_evals_per_sec": round(C * n_leaps / t_run, 1),
    }), flush=True)


def exp_C2():
    import fugue_tpu as ft
    from fugue_tpu.inference.hmc import HMCConfig, hmc_chain
    from fugue_tpu.inference.mcmc_utils import split_r_hat

    DD, DN, DC, L = 256, 8192, 128, 24
    NW, NS = 800, 384
    ii = np.arange(DD)
    Sigma = np.exp(-np.abs(ii[:, None] - ii[None, :]) / 32.0)
    Ls = np.linalg.cholesky(Sigma)
    Lj = jnp.asarray(Ls, jnp.float32)
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

    staged = ft.stage(model, Xj, yj)
    cfg = HMCConfig(n_leapfrog=L, mass="dense", target_accept=0.9)
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
        "exp": "C2_densemass_nw800_ns384", "rhat": round(rhat, 4),
        "mean_err_sd": round(err, 3), "div": round(div, 5),
        "wall_s": round(t_run, 2), "compile_s": round(t_compile, 1),
        "grad_evals_per_sec": round(DC * (NW + NS) * (L + 1) / t_run, 1),
    }), flush=True)


def exp_B2(staged, w_true, m):
    from fugue_tpu.inference.chees import ChEESConfig, chees_chain

    C, NW, NS = 256, 600, 128
    cfg = ChEESConfig(adapt_rate=0.05)
    stats = stats_fn(w_true)

    def run(i):
        t0 = time.perf_counter()
        r = chees_chain(jax.random.fold_in(jax.random.PRNGKey(51), i),
                        n_samples=NS, n_warmup=NW, n_chains=C,
                        config=cfg, staged=staged,
                        init_position=m.z, init_jitter=0.05)
        vals = [fetch(x) for x in stats(
            jnp.asarray(r.samples["w"]), jnp.asarray(r.divergences))]
        return vals + [r.step_size, r.trajectory_length,
                       r.mean_leapfrog], time.perf_counter() - t0

    _, t_compile = run(0)
    (rhat, err, div, eps, T, mean_L), t_run = run(1)
    print(json.dumps({
        "exp": "B2_chees_nw600_rate05", "rhat": round(rhat, 4),
        "coef_err": round(err, 4), "div": round(div, 5),
        "eps": eps, "T": T, "mean_leapfrog": mean_L,
        "wall_s": round(t_run, 2), "compile_s": round(t_compile, 1),
    }), flush=True)


if __name__ == "__main__":
    which = set(sys.argv[1:]) or {"N", "C2", "B2"}
    print(f"# devices: {jax.devices()}", flush=True)
    if which & {"N", "B2"}:
        staged, w_true, _ = build_logistic()
        m = map_start(staged)
        if "N" in which:
            exp_N(staged, w_true, m)
        if "B2" in which:
            exp_B2(staged, w_true, m)
    if "C2" in which:
        exp_C2()
    print("# probe2 done", flush=True)
