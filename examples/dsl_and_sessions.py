"""The runtime DSL + incremental sessions (the browser-facing surface).

Reference: crates/fugue-wasm — the DSL compiler (dsl.rs), incremental
MH/HMC sessions, bootstrap particle filter, one-shot SMC, and posterior
log-joint grids.
"""

import jax
import jax.numpy as jnp
import numpy as np

import fugue_tpu as ft
from fugue_tpu.dsl.compiler import compile_model
from fugue_tpu.dsl.sessions import (
    HmcSession,
    MhSession,
    ParticleFilter,
    log_joint_grid,
    smc_run,
)


def main():
    # 1. compile a textual model
    src = """
    let p <- sample("p", beta(2.0, 2.0));
    for i in 0..n {
        observe(("y", i), bernoulli(p), ys[i]);
    }
    return p
    """
    cm = compile_model(src)
    model = cm.build({"n": 10, "ys": [1, 0, 1, 1, 0, 1, 1, 1, 0, 1]})
    res = ft.adaptive_mcmc_chain(jax.random.PRNGKey(0), model,
                                 n_samples=800, n_warmup=400, n_chains=32)
    p_mean = float(np.asarray(res.samples["p"]).mean())
    assert abs(p_mean - 9 / 14) < 0.02, p_mean
    print(f"DSL coin model posterior mean {p_mean:.4f} (exact {9/14:.4f}) -- OK")

    # 2. incremental MH session (the WasmMh workflow)
    sess = MhSession(jax.random.PRNGKey(1), model, n_chains=8)
    sess.step(300)
    print(f"MhSession accept rate {sess.accept_rate:.2f}; "
          f"last p values {sess.history[-1]['p'][:3]}")

    # 3. incremental HMC session with recorded trajectories (WasmHmc)
    def gauss():
        x = ft.sample("x", ft.Normal(0.0, 1.0))
        ft.observe("y", ft.Normal(x, 0.5), jnp.array(0.8))
        return x

    hsess = HmcSession(jax.random.PRNGKey(2), gauss)
    hsess.warmup(50)
    rec = hsess.step_recorded()
    print(f"HmcSession trajectory of {rec['trajectory'].shape[0]} leapfrog "
          f"steps, accepted={rec['accepted']}")

    # 4. bootstrap particle filter (wasm pf.rs)
    rng = np.random.default_rng(0)
    truth = np.cumsum(rng.normal(0, 0.3, 20))
    pf = ParticleFilter(jax.random.PRNGKey(3), n_particles=512)
    for y in truth + rng.normal(0, 0.5, 20):
        est = pf.observe(y)
    print(f"PF final estimate {est['mean']:.3f} vs truth {truth[-1]:.3f}")

    # 5. one-shot SMC (wasm smc.rs)
    out = smc_run(jax.random.PRNGKey(4), model, n_particles=512)
    print(f"smc_run: logZ={out['log_evidence']:.3f}, stages={out['n_stages']}")

    # 6. 2-D posterior heatmap (wasm grid.rs)
    def two_site():
        a = ft.sample("a", ft.Normal(0.0, 1.0))
        b = ft.sample("b", ft.Normal(0.0, 1.0))
        ft.observe("y", ft.Normal(a + b, 0.5), jnp.array(1.0))
        return a, b

    grid = log_joint_grid(two_site, "a", "b", (-2, 2), (-2, 2), resolution=48)
    print(f"log-joint grid {grid['log_joint'].shape}, "
          f"max={grid['log_joint'].max():.3f} -- OK")


if __name__ == "__main__":
    main()
