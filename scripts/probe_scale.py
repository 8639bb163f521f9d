"""Scale-tier probe: large-d / large-N workloads driven toward the roofline
(VERDICT r2 item 1). Run one row at a time on the exclusive chip:

    timeout 550 python scripts/probe_scale.py logistic
    timeout 550 python scripts/probe_scale.py densemass
    timeout 550 python scripts/probe_scale.py plate
    timeout 550 python scripts/probe_scale.py raw        # empirical rooflines

Each row reports wall time, analytic + XLA-cost-model FLOP/s, and the
fraction of (i) the v5e bf16 MXU peak and (ii) an EMPIRICAL same-shape
speed-of-light kernel measured on this chip (raw matmul / raw fused
reduction) — the honest per-workload roofline.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

V5E_PEAK_BF16 = 197e12


def force(out):
    """Fetch-based completion barrier: block_until_ready under-reports on
    the relayed axon backend (see bench.py _force); a host fetch of a
    data-dependent scalar cannot lie."""
    leaves = [x for x in jax.tree_util.tree_leaves(out)
              if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)]
    return float(sum(jnp.sum(x.astype(jnp.float32)) for x in leaves))


def timed(f, *args, n=1):
    force(f(*args))  # compile + settle
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
        force(out)
    return (time.perf_counter() - t0) / n, out


# ---------------------------------------------------------------- logistic
D, N, C, L = 1024, 100_000, 256, 16
NW, NS = 200, 128


def make_logistic():
    import fugue_tpu as ft
    from fugue_tpu.ops import matmul_bf16x2

    # dataset generated ON DEVICE: uploading a 400 MB design matrix over
    # the relayed TPU link takes many minutes (~1 MB/s measured); one
    # jax.random program generates it in milliseconds where it lives
    kx, kw, ky = jax.random.split(jax.random.PRNGKey(99), 3)

    @jax.jit
    def gen():
        X = (jax.random.normal(kx, (N, D), jnp.bfloat16)
             / np.sqrt(D).astype(np.float32))
        w_true = jax.random.normal(kw, (D,), jnp.float32)
        logits = jnp.matmul(X, w_true.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
        y = jax.random.uniform(ky, (N,)) < jax.nn.sigmoid(logits)
        return X, w_true, y

    X, w_true, y = gen()

    def model(Xd, yd):
        # data passed as stage() ARGUMENTS: large leaves become traced jit
        # inputs of the drive (never compile-payload constants)
        w = ft.sample("w", ft.Normal(0.0, 1.0), sample_shape=(D,))
        ft.observe("y", ft.BernoulliLogits(matmul_bf16x2(Xd, w)), yd)

    return ft.stage(model, X, y), w_true


def run_logistic():
    import fugue_tpu as ft
    from fugue_tpu.inference.hmc import HMCConfig, hmc_chain
    from fugue_tpu.inference.mcmc_utils import split_r_hat

    from fugue_tpu.inference.map_laplace import MAPConfig, map_estimate

    t0 = time.perf_counter()
    staged, w_true = make_logistic()
    print(f"staged {time.perf_counter()-t0:.1f}s", file=sys.stderr, flush=True)
    # fixed kernel chosen from the measured acceptance curve (accept 0.87
    # at eps=0.01, L=16 covers ~0.7 posterior sd per trajectory): warmup
    # adaptation on this workload mis-estimates the mass from the first
    # 100 barely-mixed draws and collapses eps (probe_accept session r3)
    cfg = HMCConfig(step_size=0.01, n_leapfrog=L,
                    adapt_step_size=False, adapt_mass=False)

    # MAP-then-HMC (the documented at-scale workflow): a U(-2,2)^1024 or
    # prior init is thousands of nats from the N=1e5 posterior's typical
    # set — dual averaging collapses before chains arrive. LBFGS rides the
    # same matmul gradients to the mode in ~100 steps.
    t0 = time.perf_counter()
    m = map_estimate(
        jax.random.PRNGKey(0), staged=staged,
        config=MAPConfig(n_iterations=120, optimizer="lbfgs", n_restarts=1),
    )
    print(f"map {time.perf_counter()-t0:.1f}s converged={m.converged}",
          file=sys.stderr, flush=True)

    def run(i):
        return hmc_chain(jax.random.fold_in(jax.random.PRNGKey(1), i),
                         n_samples=NS, n_warmup=NW, n_chains=C,
                         config=cfg, staged=staged,
                         init_position=m.z, init_jitter=0.05)

    t0 = time.perf_counter()
    r0 = run(0)
    # quality/flops stats computed ON DEVICE — a (C,NS,D) fetch over the
    # relay takes minutes; only scalars cross the wire
    stats = jax.jit(lambda ws, divs: (
        jnp.max(jax.vmap(split_r_hat, in_axes=2)(ws[:, :, ::128])),
        jnp.mean(jnp.abs(jnp.mean(ws, axis=(0, 1)) - w_true)),
        jnp.mean(divs.astype(jnp.float32)),
    ))
    rhat0, err0, div0 = [float(x) for x in stats(r0.samples["w"],
                                                 r0.divergences)]
    print(f"first run+stats {time.perf_counter()-t0:.1f}s",
          file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    res = run(1)
    rhat, err, div = [float(x) for x in stats(res.samples["w"],
                                              res.divergences)]
    elapsed = time.perf_counter() - t0
    grad_evals = C * (NW + NS) * (L + 1)
    # analytic matmul FLOPs per batched grad eval: fwd (C,D)@(D,N) + bwd
    # (C,N)@(N,D), 2*C*N*D each
    achieved = 4 * C * N * D * (NW + NS) * (L + 1) / elapsed
    print(json.dumps({
        "row": "logistic_d1024_N1e5",
        "wall_s": round(elapsed, 3),
        "grad_evals_per_sec": round(grad_evals / elapsed, 1),
        "analytic_flops_per_sec": round(achieved, 1),
        "pct_v5e_bf16_peak": round(100 * achieved / V5E_PEAK_BF16, 2),
        "max_rhat_sampled": round(rhat, 4),
        "divergence_rate": round(div, 5),
        "mean_abs_err_vs_true": round(err, 4),
        "step_size": res.step_size,
    }))


def run_raw():
    """Empirical speed-of-light: K dependent same-shape matmul pairs (the
    fwd/bwd pair of the logistic gradient), chained so no layer of the
    stack can skip or memoize work; timing ends in a scalar fetch."""
    rng = np.random.default_rng(0)
    Xb = jnp.asarray(rng.normal(0, 1, (N, D)), jnp.bfloat16)
    K = 16

    @jax.jit
    def chain(Wb):
        def body(w, _):
            lo = jnp.matmul(w, Xb.T, preferred_element_type=jnp.float32)
            g = jnp.matmul(
                jax.nn.sigmoid(lo).astype(jnp.bfloat16), Xb,
                preferred_element_type=jnp.float32)
            w = (g / jnp.max(jnp.abs(g))).astype(jnp.bfloat16)
            return w, ()
        w, _ = jax.lax.scan(body, Wb, None, length=K)
        return jnp.sum(w.astype(jnp.float32))

    Wb = jnp.asarray(rng.normal(0, 1, (C, D)), jnp.bfloat16)
    dt_chain, _ = timed(chain, Wb, n=2)
    dt_pair = dt_chain / K
    fl = 4 * C * N * D
    print(json.dumps({
        "row": "raw_matmul_pair",
        "wall_s": round(dt_pair, 5),
        "flops_per_sec": round(fl / dt_pair, 1),
        "pct_v5e_bf16_peak": round(100 * fl / dt_pair / V5E_PEAK_BF16, 2),
    }))


# --------------------------------------------------------------- densemass
DD, DN, DC = 256, 8192, 128


def run_densemass():
    import fugue_tpu as ft
    from fugue_tpu.inference.hmc import HMCConfig, hmc_chain
    from fugue_tpu.inference.mcmc_utils import split_r_hat

    rng = np.random.default_rng(1)
    ii = np.arange(DD)
    Sigma = np.exp(-np.abs(ii[:, None] - ii[None, :]) / 32.0)
    Ls = np.linalg.cholesky(Sigma)
    X = rng.normal(0, 1, (DN, DD)) / np.sqrt(DD)
    w_true = Ls @ rng.normal(0, 1, DD)
    sig = 1.0
    y = X @ w_true + sig * rng.normal(0, 1, DN)
    # closed-form posterior
    Lam = np.linalg.inv(Sigma) + X.T @ X / sig**2
    Pcov = np.linalg.inv(Lam)
    pmean = Pcov @ (X.T @ y / sig**2)

    Xj = jnp.asarray(X, jnp.float32)
    yj = jnp.asarray(y, jnp.float32)
    Lj = jnp.asarray(Ls, jnp.float32)

    def model():
        w = ft.sample("w", ft.MultivariateNormal(jnp.zeros(DD), scale_tril=Lj))
        ft.observe("y", ft.Normal(Xj @ w, sig), yj)

    staged = ft.stage(model)
    cfg = HMCConfig(n_leapfrog=24, mass="dense", target_accept=0.9)

    def run(i):
        return hmc_chain(jax.random.fold_in(jax.random.PRNGKey(2), i),
                         n_samples=128, n_warmup=300, n_chains=DC,
                         config=cfg, staged=staged)

    elapsed, res = timed(run, 0)
    ws = np.asarray(res.samples["w"])
    err = np.abs(ws.mean((0, 1)) - pmean) / np.sqrt(np.diag(Pcov))
    sd_ratio = ws.reshape(-1, DD).std(0) / np.sqrt(np.diag(Pcov))
    rhats = [float(split_r_hat(ws[:, :, j])) for j in range(0, DD, 32)]
    ge = DC * (300 + 128) * 25
    print(json.dumps({
        "row": "densemass_mvn_d256",
        "wall_s": round(elapsed, 3),
        "grad_evals_per_sec": round(ge / elapsed, 1),
        "max_norm_mean_err_in_sd": round(float(err.max()), 3),
        "sd_ratio_minmax": [round(float(sd_ratio.min()), 3),
                            round(float(sd_ratio.max()), 3)],
        "max_rhat_sampled": round(max(rhats), 4),
        "divergence_rate": round(float(np.asarray(res.divergences).mean()), 5),
    }))


# ------------------------------------------------------------------- plate
PG, PNB, PC = 128, 8192, 64  # 128 groups x 8192 rows = 1,048,576 obs


def run_plate():
    import fugue_tpu as ft
    from fugue_tpu.inference.hmc import HMCConfig, hmc_chain
    from fugue_tpu.inference.mcmc_utils import split_r_hat

    rng = np.random.default_rng(2)
    theta_true = rng.normal(0.0, 1.0, PG)
    Y = jnp.asarray(
        theta_true[:, None] + rng.normal(0, 1.0, (PG, PNB)), jnp.float32
    )

    def model(Yd):
        mu = ft.sample("mu", ft.Normal(0.0, 1.0))
        theta = ft.sample("theta", ft.Normal(mu, 1.0), sample_shape=(PG,))
        ft.observe("Y", ft.Normal(theta[:, None], 1.0), Yd)

    staged = ft.stage(model, Y)
    cfg = HMCConfig(n_leapfrog=16)

    def run(i):
        return hmc_chain(jax.random.fold_in(jax.random.PRNGKey(3), i),
                         n_samples=64, n_warmup=100, n_chains=PC,
                         config=cfg, staged=staged)

    elapsed, res = timed(run, 0)
    th = np.asarray(res.samples["theta"])
    # per-group posterior ~= N(ybar_g * n/(n+1), 1/(n+1)) — mu's prior is weak
    ybar = np.asarray(Y.mean(axis=1))
    exp_mean = ybar * PNB / (PNB + 1.0)
    err = np.abs(th.mean((0, 1)) - exp_mean) * np.sqrt(PNB + 1.0)
    rhat = float(split_r_hat(th[:, :, 0]))
    n_evals = PC * (100 + 64) * 17
    rows_per_sec = n_evals * PG * PNB / elapsed
    print(json.dumps({
        "row": "plate_1e6_rows",
        "wall_s": round(elapsed, 3),
        "obs_grad_rows_per_sec": round(rows_per_sec, 1),
        "max_norm_err_in_sd": round(float(err.max()), 3),
        "r_hat_theta0": round(rhat, 4),
        "divergence_rate": round(float(np.asarray(res.divergences).mean()), 5),
    }))


def run_rawplate():
    """Empirical roofline for the plate row: same-shape fused residual
    reduction + broadcast-back gradient."""
    rng = np.random.default_rng(2)
    Y = jnp.asarray(rng.normal(0, 1, (PG, PNB)), jnp.float32)
    th = jnp.asarray(rng.normal(0, 1, (PC, PG)), jnp.float32)

    @jax.jit
    def pot_and_grad(th):
        def pot(t):
            r = Y[None, :, :] - t[:, :, None]
            return -0.5 * jnp.sum(r * r)
        return jax.value_and_grad(pot)(th)

    dt, _ = timed(pot_and_grad, th, n=4)
    rows = PC * PG * PNB
    print(json.dumps({
        "row": "raw_plate_grad",
        "wall_s": round(dt, 5),
        "rows_per_sec": round(rows / dt, 1),
    }))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "logistic"
    {"logistic": run_logistic, "raw": run_raw, "densemass": run_densemass,
     "plate": run_plate, "rawplate": run_rawplate}[which]()
