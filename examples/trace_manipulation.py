"""Working with traces: replay, scoring, safe handlers, typed getters.

Reference: examples/trace_manipulation.rs (incl. the DebugHandler pattern
:175). Shows the handler zoo — Replay / ScoreGivenTrace / Safe* / Strict /
Reconciling — and the staged equivalents.
"""

import jax
import jax.numpy as jnp
import numpy as np

import fugue_tpu as ft


def model(obs_sd=1.0):
    mu = ft.sample("mu", ft.Normal(0.0, 2.0))
    ft.observe("y", ft.Normal(mu, obs_sd), jnp.array([1.0, 1.2, 0.8]))
    return mu


def main():
    key = jax.random.PRNGKey(0)

    # 1. run the prior, inspect the trace
    result, trace = ft.run(ft.PriorHandler(key), model)
    print("addresses:", list(trace.addresses()))
    print("mu =", float(trace.get_real("mu")))
    print("total log weight =", float(trace.total_log_weight()))
    assert trace.get_bool("mu") is None  # typed getters are type-safe

    # 2. replay the same latents under DIFFERENT model parameters → the
    #    density is re-scored (ReplayHandler semantics)
    _, rescored = ft.run(ft.ReplayHandler(key, trace), model, 2.0)
    assert float(rescored.get_real("mu")) == float(trace.get_real("mu"))
    assert float(rescored.log_likelihood) != float(trace.log_likelihood)

    # 3. score-only (no sampling allowed)
    _, scored = ft.score_given_trace(model, trace)
    assert float(scored.log_prior) == float(trace.log_prior)

    # 4. safe scoring degrades a structure mismatch to -inf, not a crash
    def bigger_model():
        mu = ft.sample("mu", ft.Normal(0.0, 2.0))
        extra = ft.sample("extra", ft.Normal(0.0, 1.0))
        ft.observe("y", ft.Normal(mu + extra, 1.0), jnp.array([1.0, 1.2, 0.8]))
        return mu

    import warnings as w

    with w.catch_warnings():
        w.simplefilter("ignore")
        _, safe = ft.score_given_trace_safe(bigger_model, trace)
    assert float(safe.total_log_weight()) == -np.inf

    # 5. strict scoring raises a typed error instead
    try:
        ft.score_given_trace_strict(lambda: ft.sample("other", ft.Normal(0, 1)), trace)
        raise AssertionError("should have raised")
    except ft.ModelStructureError as e:
        print("strict error:", e)

    # 6. reconciling scoring births fresh addresses and reports structure
    _, rec_trace, report = ft.score_given_trace_reconciled(
        jax.random.PRNGKey(1), bigger_model, trace
    )
    assert report.birthed == ["extra"]
    print("reconcile report: birthed:", report.birthed, "vanished:", report.vanished)

    # 7. the staged view: the trace IS a position dict
    staged = ft.stage(model)
    lp = staged.log_joint(trace.latents())
    assert abs(float(lp) - float(trace.total_log_weight())) < 1e-6
    print("staged log-joint matches handler trace -- OK")


if __name__ == "__main__":
    main()
