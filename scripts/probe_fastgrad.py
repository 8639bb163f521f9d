"""Keep-or-kill probe: matmul_bf16x2_fastgrad on the d=1024 logistic row.

PROFILE_SCALE.json (r5) shows the at-scale HMC drive's cost IS the gradient
kernel (L1 ~= L3), and the kernel pays 4 MXU passes per value+grad for the
split-precision weights. The fastgrad op keeps the split forward (smooth
potential) and drops the cotangent split in the backward: 3 passes. This
probe measures (a) the raw grad-eval rate of both kernels, (b) a short HMC
drive with each: step size, acceptance, R-hat, coefficient error — the
accept/quality cost of the rougher force.

Run exclusively:  timeout 2400 python scripts/probe_fastgrad.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass


def main():
    from bench import _force

    import fugue_tpu as ft
    from fugue_tpu.inference.hmc import HMCConfig, hmc_chain
    from fugue_tpu.inference.map_laplace import MAPConfig, map_estimate
    from fugue_tpu.ops import matmul_bf16x2, matmul_bf16x2_fastgrad

    D, N, C = 1024, 100_000, 256
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
    out = {}

    def make_staged(op):
        def model(Xd, yd):
            w = ft.sample("w", ft.Normal(0.0, 1.0), sample_shape=(D,))
            ft.observe("y", ft.BernoulliLogits(op(Xd, w)), yd)
        return ft.stage(model, X, y)

    for name, op in (("bf16x2", matmul_bf16x2),
                     ("fastgrad", matmul_bf16x2_fastgrad)):
        staged = make_staged(op)
        K = 128

        @jax.jit
        def grad_ladder(W, *dl):
            with staged.bind_data(dl, 0):
                vg = jax.vmap(jax.value_and_grad(
                    lambda z: staged.potential(z, None)))

                def body(Wc, _):
                    _, g = vg(Wc)
                    return Wc - 1e-6 * g, ()

                Wf, _ = jax.lax.scan(body, W, None, length=K)
                return jnp.sum(Wf)

        W0 = jnp.zeros((C, D), jnp.float32)
        _force(grad_ladder(W0, X, y))
        t0 = time.perf_counter()
        for _ in range(3):
            _force(grad_ladder(W0, X, y))
        t = (time.perf_counter() - t0) / 3
        rate = C * K / t
        row = {"grad_evals_per_sec": round(rate, 1)}

        # short drive quality check
        m = map_estimate(jax.random.PRNGKey(20), staged=staged,
                         config=MAPConfig(n_iterations=120,
                                          optimizer="lbfgs", n_restarts=1))
        from fugue_tpu.inference.mcmc_utils import split_r_hat

        stats = jax.jit(lambda ws, aps, divs: (
            jnp.max(jax.vmap(split_r_hat, in_axes=2)(ws[:, :, ::16])),
            jnp.mean(aps),
            jnp.mean(divs.astype(jnp.float32)),
            jnp.mean(jnp.abs(jnp.mean(ws, axis=(0, 1)) - w_true)
                     / jnp.std(ws.reshape(-1, D), axis=0)),
        ))

        def drive(i):
            r = hmc_chain(jax.random.fold_in(jax.random.PRNGKey(21), i),
                          n_samples=128, n_warmup=300, n_chains=C,
                          config=HMCConfig(n_leapfrog=16, target_accept=0.8),
                          staged=staged, init_position=m.z,
                          init_jitter=0.05)
            return [float(x) for x in stats(
                r.samples["w"], r.accept_prob, r.divergences)] + [
                r.step_size]

        drive(0)
        t0 = time.perf_counter()
        rhat, acc, div, err, eps = drive(1)
        row.update({
            "drive_wall_s": round(time.perf_counter() - t0, 2),
            "max_rhat": round(rhat, 4),
            "mean_accept": round(acc, 4),
            "divergence_rate": round(div, 5),
            "coef_err_in_sd": round(err, 4),
            "step_size": round(eps, 5),
        })
        out[name] = row
        print(name, json.dumps(row), flush=True)

    out["speedup"] = round(
        out["fastgrad"]["grad_evals_per_sec"]
        / out["bf16x2"]["grad_evals_per_sec"], 3)
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks", "FASTGRAD_PROBE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("speedup", out["speedup"], "->", path)


if __name__ == "__main__":
    main()
