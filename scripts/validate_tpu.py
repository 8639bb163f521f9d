"""On-chip f32 statistical validation (VERDICT r2 item 3).

The CPU suite runs x64; the chip runs f32. The ChEES trajectory-NaN bug
(ROUND2_NOTES) shipped past 500 green x64 tests and was only caught on the
chip — this artifact closes that gap: one exclusive TPU run executing the
conjugate harnesses (inference/validation.py, reference validation.rs
parity) plus posterior-moment gates for EVERY gradient/particle engine on
the production f32 path, writing benchmarks/VALIDATE_TPU.json.

Run exclusively (no other python process may touch the chip):
    timeout 900 python scripts/validate_tpu.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# honor an explicit CPU request (logic check off-chip; the committed
# artifact comes from the axon TPU run) — the sitecustomize pre-import pins
# the platform, so the config must be updated too
if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

import jax.numpy as jnp
import numpy as np


def main():
    import fugue_tpu as ft
    from fugue_tpu.inference.validation import (
        validate_beta_bernoulli, validate_conjugate_normal,
    )

    t_start = time.perf_counter()
    results = {}
    dev = str(jax.devices()[0])
    assert jnp.asarray(1.0).dtype == jnp.float32, "expected the f32 chip path"

    # 1) reference-parity conjugate harnesses (2-SE gates, ESS-based)
    for sampler in ("hmc", "mh"):
        r = validate_conjugate_normal(jax.random.PRNGKey(11), sampler)
        results[f"conjugate_normal_{sampler}"] = {
            "passed": bool(r.passed), "checks": {k: bool(v) for k, v in r.checks.items()},
            "observed_mean": float(r.observed_mean),
            "expected_mean": float(r.expected_mean),
        }
        r = validate_beta_bernoulli(jax.random.PRNGKey(12), sampler)
        results[f"beta_bernoulli_{sampler}"] = {
            "passed": bool(r.passed), "checks": {k: bool(v) for k, v in r.checks.items()},
            "observed_mean": float(r.observed_mean),
            "expected_mean": float(r.expected_mean),
        }

    # 2) per-engine posterior-moment gates on one conjugate Normal target:
    #    posterior N(sum(y)/(tau0+n), 1/(tau0+n)) with tau0=0.25, n=5
    ys = jnp.array([1.2, 0.8, 1.5, 0.9, 1.1])
    tau = 0.25 + 5.0
    post_mean, post_var = float(ys.sum()) / tau, 1.0 / tau

    def model():
        mu = ft.sample("mu", ft.Normal(0.0, 2.0))
        ft.observe("ys", ft.Normal(mu, 1.0), ys)

    staged = ft.stage(model)

    def gate(name, draws, mean_tol_sd=0.15, var_tol=0.25, extra=None):
        x = np.asarray(draws).reshape(-1).astype(np.float64)
        mean_err = abs(x.mean() - post_mean) / np.sqrt(post_var)
        var_err = abs(x.var() - post_var) / post_var
        ok = bool(np.isfinite(x).all() and mean_err < mean_tol_sd
                  and var_err < var_tol)
        results[name] = {
            "passed": ok,
            "mean_err_in_posterior_sd": round(float(mean_err), 4),
            "var_rel_err": round(float(var_err), 4),
            **(extra or {}),
        }

    from fugue_tpu.inference.nuts import nuts_chain
    r = nuts_chain(jax.random.PRNGKey(1), staged=staged, n_samples=1000,
                   n_warmup=500, n_chains=64)
    gate("nuts_f32", r.samples["mu"],
         extra={"divergence_rate": round(float(np.asarray(r.divergences).mean()), 5)})

    from fugue_tpu.inference.chees import chees_chain
    r = chees_chain(jax.random.PRNGKey(2), staged=staged, n_samples=1000,
                    n_warmup=500, n_chains=64)
    gate("chees_f32", r.samples["mu"],
         extra={"divergence_rate": round(float(np.asarray(r.divergences).mean()), 5),
                "trajectory_length": round(r.trajectory_length, 4)})

    from fugue_tpu.inference.ess import ess_chain
    r = ess_chain(jax.random.PRNGKey(3), staged=staged, n_samples=1000,
                  n_warmup=200, n_chains=64)
    gate("elliptical_slice_f32", r.samples["mu"])

    from fugue_tpu.inference.tempering import PTConfig, pt_chain
    r = pt_chain(jax.random.PRNGKey(4), staged=staged, n_samples=800,
                 n_warmup=400, config=PTConfig(n_temps=4, beta_min=0.1),
                 n_chains=16)
    gate("parallel_tempering_f32", r.samples["mu"])

    from fugue_tpu.inference.smc import adaptive_smc
    r = adaptive_smc(jax.random.PRNGKey(5), 8192, staged=staged)
    w = np.exp(np.asarray(r.log_weights, np.float64))
    w = w / w.sum()
    x = np.asarray(r.particles["mu"], np.float64)
    sm, sv = float((w * x).sum()), float((w * (x - (w * x).sum()) ** 2).sum())
    # closed-form evidence for the conjugate model
    from scipy import stats as st
    y64 = np.asarray(ys, np.float64)
    logz = float(st.multivariate_normal(
        mean=np.zeros(5), cov=np.eye(5) + 4.0).logpdf(y64))
    results["smc_f32"] = {
        "passed": bool(abs(sm - post_mean) / np.sqrt(post_var) < 0.2
                       and abs(float(r.log_evidence) - logz) < 0.1),
        "weighted_mean_err_in_sd": round(abs(sm - post_mean) / np.sqrt(post_var), 4),
        "logZ_abs_err": round(abs(float(r.log_evidence) - logz), 4),
    }

    from fugue_tpu.inference.vi import VIConfig, optimize_meanfield_vi
    r = optimize_meanfield_vi(
        jax.random.PRNGKey(6), staged=staged,
        config=VIConfig(n_iterations=1500, n_samples=64))
    loc = float(np.asarray(r.params["mu"]["loc"]))
    results["vi_f32"] = {
        "passed": bool(abs(loc - post_mean) < 3 * np.sqrt(post_var / 64)
                       + 0.02 and np.isfinite(r.elbo_history).all()),
        "loc_err": round(abs(loc - post_mean), 4),
        "final_elbo": round(float(r.elbo_history[-1]), 3),
    }

    # 3) exact discrete marginalization on-chip (f32 logsumexp path)
    def mix_model():
        k = ft.sample("k", ft.Bernoulli(0.3))
        mu = ft.sample("mu", ft.Normal(jnp.where(k, 2.0, -2.0), 1.0))
        ft.observe("y", ft.Normal(mu, 0.5), jnp.array(1.5))

    from fugue_tpu.inference.marginalize import marginalize
    marg = marginalize(staged=ft.stage(mix_model))
    r = nuts_chain(jax.random.PRNGKey(7), staged=marg, n_samples=800,
                   n_warmup=400, n_chains=32)
    mu_draws = np.asarray(r.samples["mu"]).reshape(-1)
    # quadrature ground truth over the 2-component posterior
    grid = np.linspace(-8, 8, 4001)
    dens = (0.3 * st.norm(2, 1).pdf(grid) + 0.7 * st.norm(-2, 1).pdf(grid)) \
        * st.norm(grid, 0.5).pdf(1.5)
    dens /= np.trapezoid(dens, grid)
    qm = float(np.trapezoid(grid * dens, grid))
    results["marginalize_f32"] = {
        "passed": bool(abs(mu_draws.mean() - qm) < 0.05),
        "mean_err": round(abs(float(mu_draws.mean()) - qm), 4),
    }

    # 3b) ABC on the f32 chip path (VERDICT r3 weak #3): exact-match
    #     rejection on the sufficient statistic = exact conjugate posterior
    #     Beta(2+s, 2+f); and weighted ABC-SMC on a Gaussian-mean target
    from fugue_tpu.inference.abc import (
        ABCSMCConfig, abc_rejection, abc_smc_weighted,
    )

    flips = jnp.array([1, 1, 1, 0, 1, 0, 1, 1, 0, 1], dtype=bool)

    def coin():
        p = ft.sample("p", ft.Beta(2.0, 2.0))
        return ft.sample("flips", ft.Bernoulli(p), sample_shape=(10,))

    r = abc_rejection(
        jax.random.PRNGKey(9), coin, observed=flips,
        distance=lambda a, b: jnp.abs(
            jnp.sum(a.astype(jnp.float32)) - jnp.sum(b.astype(jnp.float32))),
        epsilon=0.5, n_samples=512, batch_size=8192,
        max_attempts=1 << 22,
    )
    ps = np.asarray(r.particles["p"], np.float64)
    # Beta(9, 5): mean 9/14, sd ~0.123; MC err ~ sd/sqrt(512)
    results["abc_rejection_f32"] = {
        "passed": bool(abs(ps.mean() - 9.0 / 14.0) < 0.03
                       and abs(ps.std() - 0.12323) < 0.03),
        "mean_err": round(abs(float(ps.mean()) - 9.0 / 14.0), 4),
        "n_attempts": int(r.n_attempts),
    }

    def gauss_sim():
        mu = ft.sample("mu_p", ft.Normal(0.0, 2.0))
        return ft.sample("xs", ft.Normal(mu, 1.0), sample_shape=(16,))

    obs = np.asarray(st.norm(1.0, 1.0).rvs(16, random_state=7), np.float32)
    rs = abc_smc_weighted(
        jax.random.PRNGKey(10), gauss_sim,
        observed=jnp.asarray(obs),
        distance=lambda a, b: jnp.abs(jnp.mean(a) - jnp.mean(b)),
        config=ABCSMCConfig(n_particles=512,
                            epsilons=(1.0, 0.5, 0.25, 0.1)),
        param_addresses=("mu_p",),
    )
    w = np.exp(np.asarray(rs.log_weights, np.float64))
    w = w / w.sum()
    mus_abc = np.asarray(rs.particles["mu_p"], np.float64)
    wm = float((w * mus_abc).sum())
    # ABC posterior given summary xbar: N with tau = 1/4 + 16/(1+16*eps_var)
    # ~= conjugate-on-mean; gate loosely (eps=0.1 inflates variance)
    xbar = float(obs.mean())
    post_m = (16.0 * xbar / 1.0) / (0.25 + 16.0)
    results["abc_smc_f32"] = {
        "passed": bool(abs(wm - post_m) < 0.15),
        "weighted_mean_err": round(abs(wm - post_m), 4),
        "n_attempts": int(rs.n_attempts),
    }

    # 3c) the three engines that had never passed a chip gate (VERDICT r4
    #     missing #3): Gibbs (mixed discrete/continuous), dynamic-MH
    #     (RJMCMC two-model posterior odds), MAP/Laplace (curvature +
    #     evidence) — all against closed forms, on the production f32 path.
    from fugue_tpu.inference.gibbs import gibbs_chain

    def gibbs_model():
        heads = ft.sample("heads", ft.Bernoulli(0.5))
        mu = ft.sample("mu", ft.Normal(jnp.where(heads, 1.0, -1.0), 1.0))
        ft.observe("yg", ft.Normal(mu, 0.5), jnp.array([1.1, 0.9, 1.2]))

    rg = gibbs_chain(jax.random.PRNGKey(13), gibbs_model, n_samples=1500,
                     n_warmup=500, n_chains=32)
    y_g = np.array([1.1, 0.9, 1.2], np.float64)
    cov_g = 0.25 * np.eye(3) + np.ones((3, 3))
    zp = st.multivariate_normal(mean=np.ones(3), cov=cov_g).pdf(y_g)
    zm = st.multivariate_normal(mean=-np.ones(3), cov=cov_g).pdf(y_g)
    heads_post = zp / (zp + zm)
    # conditional mu posteriors: precision 1 + 3/0.25 = 13
    mu_plus = (1.0 + y_g.sum() / 0.25) / 13.0
    mu_minus = (-1.0 + y_g.sum() / 0.25) / 13.0
    mu_post = heads_post * mu_plus + (1 - heads_post) * mu_minus
    heads_hat = float(np.asarray(rg.samples["heads"], np.float64).mean())
    mu_hat = float(np.asarray(rg.samples["mu"], np.float64).mean())
    results["gibbs_f32"] = {
        "passed": bool(abs(heads_hat - heads_post) < 0.03
                       and abs(mu_hat - mu_post) < 0.05
                       and np.isfinite(mu_hat)),
        "heads_err": round(abs(heads_hat - heads_post), 4),
        "mu_err": round(abs(mu_hat - mu_post), 4),
    }

    from fugue_tpu.inference.mh_dynamic import adaptive_mcmc_chain_dynamic

    y_obs = 2.4

    def trans_model():
        use_b = ft.sample("use_b", ft.Bernoulli(0.3))
        a = ft.sample("a", ft.Normal(0.0, 1.0))
        if bool(np.asarray(use_b)):
            b = ft.sample("b", ft.Normal(0.0, 1.0))
            mean = a + b
        else:
            mean = a
        ft.observe("yt", ft.Normal(mean, 0.5), jnp.asarray(y_obs))

    z0 = st.norm(0, np.sqrt(1.25)).pdf(y_obs)
    z1 = st.norm(0, np.sqrt(2.25)).pdf(y_obs)
    post_use_b = 0.3 * z1 / (0.3 * z1 + 0.7 * z0)
    # sized for the relayed chip: this engine is a HOST loop over traces
    # (genuinely trans-dimensional structure cannot be staged), so each
    # transition costs relay round trips — measured 226 ms/transition
    # (probe_dynmh_chip, r5), i.e. 2,000 transitions ~= 7.5 min. Structure
    # mixing is slow (presence-err spread 0.00-0.09 over seeds at this
    # length, measured on CPU), so the tolerance is 0.12: this gate exists
    # to catch f32 catastrophes (NaN weights, systematically wrong odds);
    # the sharp 0.05 gate at 12k transitions runs in the x64 CPU suite
    # (tests/test_mh_dynamic.py::test_transdimensional_model_selection).
    rd = adaptive_mcmc_chain_dynamic(
        jax.random.PRNGKey(1), trans_model, n_samples=1600, n_warmup=400)
    freq = float(rd.presence("b").mean())
    results["dynamic_mh_f32"] = {
        "passed": bool(abs(freq - post_use_b) < 0.12
                       and rd.birth_count > 0 and rd.death_count > 0),
        "presence_err": round(abs(freq - post_use_b), 4),
        "births": int(rd.birth_count), "deaths": int(rd.death_count),
    }

    from scipy.special import betaln as sp_betaln

    from fugue_tpu.inference.map_laplace import (
        MAPConfig, laplace_approximation, map_estimate,
    )

    # curvature: conjugate Normal target (Gaussian — Laplace is exact)
    rm = map_estimate(jax.random.PRNGKey(15), staged=staged,
                      config=MAPConfig(n_iterations=300, optimizer="lbfgs"))
    la = laplace_approximation(rm)
    map_err = abs(float(np.asarray(rm.z)[0]) - post_mean)
    cov_err = abs(float(np.asarray(la.cov)[0, 0]) - post_var) / post_var
    # evidence: Beta-Bernoulli Laplace vs exact B(9,5)/B(2,2)
    flips_ml = [1.0] * 7 + [0.0] * 3

    def coin_ml():
        p = ft.sample("p", ft.Beta(2.0, 2.0))
        for i, yv in enumerate(flips_ml):
            ft.observe(ft.addr("flip", i), ft.Bernoulli(p), yv)

    rm2 = map_estimate(jax.random.PRNGKey(16), coin_ml,
                       MAPConfig(n_iterations=300, optimizer="lbfgs"))
    la2 = laplace_approximation(rm2)
    exact_ev = float(sp_betaln(9, 5) - sp_betaln(2, 2))
    ev_err = abs(float(la2.log_evidence) - exact_ev)
    results["map_laplace_f32"] = {
        "passed": bool(map_err < 0.02 and cov_err < 0.05 and ev_err < 0.08),
        "map_err": round(map_err, 5),
        "cov_rel_err": round(cov_err, 5),
        "log_evidence_abs_err": round(ev_err, 5),
    }

    # 4) simulation-based calibration on the f32 path: the strongest gate —
    #    uniform ranks certify the whole HMC pipeline, no closed form needed
    from fugue_tpu.inference.sbc import sbc

    def sbc_model(data):
        mu = ft.sample("mu", ft.Normal(0.0, 1.0))
        sig = ft.sample("sig", ft.LogNormal(0.0, 0.5))
        ft.observe("y", ft.Normal(mu, sig), data["y"])

    r = sbc(jax.random.PRNGKey(8), sbc_model, {"y": jnp.zeros(8)},
            n_datasets=128, n_posterior=63, n_warmup=200, thin=4)
    results["sbc_f32"] = {
        "passed": bool(r.passed),
        "min_p_value": round(float(r.p_values.min()), 4),
        "n_datasets": int(r.ranks.shape[0]),
    }

    all_passed = all(v["passed"] for v in results.values())
    artifact = {
        "device": dev,
        "dtype": "float32",
        "all_passed": all_passed,
        "wall_s": round(time.perf_counter() - t_start, 1),
        "results": results,
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks", "VALIDATE_TPU.json")
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(json.dumps({"all_passed": all_passed,
                      "n_gates": len(results),
                      "failed": [k for k, v in results.items()
                                 if not v["passed"]]}))
    sys.exit(0 if all_passed else 1)


if __name__ == "__main__":
    main()
