"""Debugging probabilistic models: trace inspection, safe handlers, diagnostics.

Reference: examples/debugging_models.rs (trace inspection, SafeReplayHandler /
SafeScoreGivenTrace degradation, manual trace construction, R-hat/ESS health
checks). Same workflow here: the Trace *is* the execution record, safe
scorers degrade structural mismatch to ``-inf`` instead of raising, strict
scorers raise typed errors, and batched diagnostics flag non-mixing chains.

Run: PYTHONPATH=. python examples/debugging_models.py
"""

import jax
import jax.numpy as jnp
import numpy as np

import fugue_tpu as ft


def diagnostic_model():
    mu = ft.sample("mu", ft.Normal(0.0, 2.0))
    sigma = ft.sample("sigma", ft.Gamma(2.0, 1.0))
    ft.observe("obs1", ft.Normal(mu, sigma), 1.5)
    ft.observe("obs2", ft.Normal(mu, sigma), 1.2)
    ft.factor(jnp.where(jnp.abs(mu) < 3.0, 0.0, -jnp.inf))
    return mu, sigma


def main():
    key = jax.random.PRNGKey(0)

    print("=== 1. Trace inspection ===")
    (mu, sigma), trace = ft.run(ft.PriorHandler(key), diagnostic_model)
    print(f"result: mu={float(mu):.3f} sigma={float(sigma):.3f}")
    print(f"choices recorded: {len(trace)} -> {sorted(trace.addresses())}")
    print(f"log_prior={float(trace.log_prior):.3f} "
          f"log_likelihood={float(trace.log_likelihood):.3f} "
          f"log_factors={float(trace.log_factors):.3f} "
          f"total={float(trace.total_log_weight()):.3f}")
    assert len(trace) == 4  # observed sites are recorded alongside latents

    print("\n=== 2. Replaying a hand-edited trace ===")
    pinned = {"mu": jnp.array(1.3), "sigma": jnp.array(0.8)}
    staged = ft.stage(diagnostic_model)
    replayed = staged.replay_trace(pinned)
    print(f"pinned (mu=1.3, sigma=0.8): total log-weight "
          f"{float(replayed.total_log_weight()):.3f}")
    assert np.isfinite(float(replayed.total_log_weight()))

    print("\n=== 3. Safe vs strict scoring of a mismatched trace ===")

    def changed_model():  # 'sigma' renamed -> structure mismatch vs `pinned`
        mu = ft.sample("mu", ft.Normal(0.0, 2.0))
        scale = ft.sample("scale", ft.Gamma(2.0, 1.0))
        ft.observe("obs1", ft.Normal(mu, scale), 1.5)
        return mu

    base = ft.Trace()
    base.insert_choice("mu", ft.Choice(value=jnp.array(1.3), log_prob=0.0))
    base.insert_choice("sigma", ft.Choice(value=jnp.array(0.8), log_prob=0.0))
    _, safe_tr = ft.score_given_trace_safe(changed_model, base)
    print(f"safe scorer degrades to log-weight "
          f"{float(safe_tr.total_log_weight())} (no crash)")
    assert np.isneginf(float(safe_tr.total_log_weight()))
    try:
        ft.score_given_trace_strict(changed_model, base)
        raise AssertionError("should have raised")
    except ft.ModelStructureError as e:
        print(f"strict scorer raises {e.code.name}: {e}")

    print("\n=== 4. Reconciling scorer reports structure drift (RJMCMC) ===")
    _, rec_tr, report = ft.score_given_trace_reconciled(
        jax.random.PRNGKey(2), changed_model, base)
    print(f"birthed from prior: {report.birthed}; vanished: {report.vanished}")
    assert "scale" in report.birthed and "sigma" in report.vanished

    print("\n=== 5. Convergence health checks catch a stuck chain ===")
    good = np.asarray(jax.random.normal(jax.random.PRNGKey(3), (4, 500)))
    stuck = good.copy()
    stuck[0] += 10.0  # one chain stuck in a different mode
    rh_good = float(ft.split_r_hat(jnp.asarray(good)))
    rh_bad = float(ft.split_r_hat(jnp.asarray(stuck)))
    print(f"healthy chains R-hat {rh_good:.4f}; stuck chain R-hat {rh_bad:.2f}")
    assert rh_good < 1.01 and rh_bad > 1.5
    ar1 = np.empty(2000)
    ar1[0] = 0.0
    noise = np.asarray(jax.random.normal(jax.random.PRNGKey(4), (2000,)))
    for t in range(1, 2000):
        ar1[t] = 0.9 * ar1[t - 1] + noise[t]
    frac = float(ft.ess(jnp.asarray(ar1))) / 2000
    print(f"AR(0.9) ESS fraction {frac:.3f} (theory (1-phi)/(1+phi) = 0.053)")
    assert abs(frac - 0.0526) < 0.03
    print("OK")


if __name__ == "__main__":
    main()
