"""Round-4 probe: can the warmup machinery (dual averaging + mass
adaptation) carry the scale tier to R-hat < 1.01? (VERDICT r3 items 1-2.)

Runs on the REAL chip (exclusive). Prints one JSON line per experiment:

  A. logistic d=1024 N=1e5, 256 chains, HMC with adaptation ON
  B. same target, ChEES (adaptive engine at scale)
  C. dense-mass MVN d=256 with a longer warmup (r3 row was R-hat 1.02)

Usage: nohup python scripts/probe_scale_adapt.py [A B C] > /tmp/probe.log &
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


def build_logistic():
    import fugue_tpu as ft
    from fugue_tpu.ops import matmul_bf16x2

    D, N = 1024, 100_000
    kx, kw, ky = jax.random.split(jax.random.PRNGKey(99), 3)

    @jax.jit
    def gen():
        X = (jax.random.normal(kx, (N, D), jnp.bfloat16)
             / np.float32(np.sqrt(D)))
        w_true = jax.random.normal(kw, (D,), jnp.float32)
        logits = jnp.matmul(X, w_true.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
        yv = jax.random.uniform(ky, (N,)) < jax.nn.sigmoid(logits)
        return X, w_true, yv

    X, w_true, y = gen()

    def model(Xd, yd):
        w = ft.sample("w", ft.Normal(0.0, 1.0), sample_shape=(D,))
        ft.observe("y", ft.BernoulliLogits(matmul_bf16x2(Xd, w)), yd)

    staged = ft.stage(model, X, y)
    return staged, w_true, D


def map_start(staged):
    from fugue_tpu.inference.map_laplace import MAPConfig, map_estimate

    t0 = time.perf_counter()
    m = map_estimate(
        jax.random.PRNGKey(20), staged=staged,
        config=MAPConfig(n_iterations=120, optimizer="lbfgs", n_restarts=1),
    )
    print(f"# MAP done in {time.perf_counter()-t0:.1f}s", flush=True)
    return m


def stats_fn(w_true):
    from fugue_tpu.inference.mcmc_utils import split_r_hat

    return jax.jit(lambda ws, divs: (
        jnp.max(jax.vmap(split_r_hat, in_axes=2)(ws[:, :, ::16])),
        jnp.mean(jnp.abs(jnp.mean(ws, axis=(0, 1)) - w_true)),
        jnp.mean(divs.astype(jnp.float32)),
    ))


def exp_A(staged, w_true, m):
    from fugue_tpu.inference.hmc import HMCConfig, hmc_chain

    C, L, NW, NS = 256, 16, 300, 128
    cfg = HMCConfig(n_leapfrog=L, target_accept=0.8)
    stats = stats_fn(w_true)

    def run(i):
        t0 = time.perf_counter()
        r = hmc_chain(jax.random.fold_in(jax.random.PRNGKey(21), i),
                      n_samples=NS, n_warmup=NW, n_chains=C,
                      config=cfg, staged=staged,
                      init_position=m.z, init_jitter=0.05)
        vals = [fetch(x) for x in stats(r.samples["w"], r.divergences)]
        return vals + [r.step_size], time.perf_counter() - t0

    _, t_compile = run(0)
    (rhat, err, div, eps), t_run = run(1)
    print(json.dumps({
        "exp": "A_hmc_adaptive_logistic", "rhat": round(rhat, 4),
        "coef_err": round(err, 4), "div": round(div, 5),
        "eps": eps, "wall_s": round(t_run, 2),
        "compile_s": round(t_compile, 1),
        "grad_evals_per_sec": round(C * (NW + NS) * (L + 1) / t_run, 1),
    }), flush=True)


def exp_B(staged, w_true, m):
    from fugue_tpu.inference.chees import ChEESConfig, chees_chain

    C, NW, NS = 256, 300, 128
    cfg = ChEESConfig()
    stats = stats_fn(w_true)

    def run(i):
        t0 = time.perf_counter()
        r = chees_chain(jax.random.fold_in(jax.random.PRNGKey(31), i),
                        n_samples=NS, n_warmup=NW, n_chains=C,
                        config=cfg, staged=staged,
                        init_position=m.z, init_jitter=0.05)
        vals = [fetch(x) for x in stats(
            jnp.asarray(r.samples["w"]), jnp.asarray(r.divergences))]
        return vals + [r.step_size, r.trajectory_length,
                       r.mean_leapfrog,
                       r.trajectory_cap_reached], time.perf_counter() - t0

    _, t_compile = run(0)
    (rhat, err, div, eps, T, mean_L, capped), t_run = run(1)
    print(json.dumps({
        "exp": "B_chees_logistic", "rhat": round(rhat, 4),
        "coef_err": round(err, 4), "div": round(div, 5),
        "eps": eps, "T": T, "mean_leapfrog": mean_L, "capped": capped,
        "wall_s": round(t_run, 2), "compile_s": round(t_compile, 1),
        "grad_evals_per_sec": round(
            C * (NW + NS) * (mean_L + 1) / t_run, 1),
    }), flush=True)


def exp_C():
    import fugue_tpu as ft
    from fugue_tpu.inference.hmc import HMCConfig, hmc_chain
    from fugue_tpu.inference.mcmc_utils import split_r_hat

    DD, DN, DC, L = 256, 8192, 128, 24
    NW, NS = 600, 256
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
        "exp": "C_densemass_long_warmup", "rhat": round(rhat, 4),
        "mean_err_sd": round(err, 3), "div": round(div, 5),
        "wall_s": round(t_run, 2), "compile_s": round(t_compile, 1),
        "grad_evals_per_sec": round(DC * (NW + NS) * (L + 1) / t_run, 1),
    }), flush=True)


if __name__ == "__main__":
    which = set(sys.argv[1:]) or {"A", "B", "C"}
    print(f"# devices: {jax.devices()}", flush=True)
    if which & {"A", "B"}:
        staged, w_true, _ = build_logistic()
        m = map_start(staged)
        if "A" in which:
            exp_A(staged, w_true, m)
        if "B" in which:
            exp_B(staged, w_true, m)
    if "C" in which:
        exp_C()
    print("# probe done", flush=True)
