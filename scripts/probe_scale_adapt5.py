"""Round-4 probe 5: full-rank VI segment schedules (4x3000 @ lr 0.01 left
marginal sds up to 1.83x the exact posterior's)."""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def main():
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

    def schedule_run(lrs, seg_iter, n_mc):
        r = None
        t0 = time.perf_counter()
        for si, lr in enumerate(lrs):
            cfg = VIConfig(n_iterations=seg_iter, n_samples=n_mc,
                           plateau_window=10**9, check_every=seg_iter,
                           learning_rate=lr)
            r = optimize_fullrank_vi(
                jax.random.fold_in(jax.random.PRNGKey(50), si),
                staged=staged, config=cfg, resume=r)
        wall = time.perf_counter() - t0
        loc = np.asarray(r.params["loc"])
        mean_err = float(np.max(np.abs(loc - np.asarray(pmean))
                                / np.asarray(psd)))
        cov = np.asarray(r.guide.covariance(r.params))
        ratio = np.sqrt(np.diag(cov)) / np.asarray(psd)
        print(json.dumps({
            "lrs": lrs, "seg_iter": seg_iter, "n_mc": n_mc,
            "wall_s_incl_compile": round(wall, 1),
            "max_mean_err_in_sd": round(mean_err, 3),
            "sd_ratio_minmax": [round(float(ratio.min()), 3),
                                round(float(ratio.max()), 3)],
            "final_elbo": round(float(r.elbo_history[-1]), 2),
        }), flush=True)

    schedule_run([0.02, 0.01, 0.005, 0.0025], 3000, 8)
    schedule_run([0.02, 0.01, 0.005, 0.0025, 0.00125, 0.00125], 3000, 16)


if __name__ == "__main__":
    print(f"# devices: {jax.devices()}", flush=True)
    main()
    print("# probe5 done", flush=True)
