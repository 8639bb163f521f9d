"""Bounded-branch conditionals: ``masked`` regions and the ``cond`` combinator.

The static-shape counterpart of the reference's structure-varying models
(reference: RJMCMC reconciliation, interpreters.rs:683-799; SURVEY.md §7 hard
part 1). Semantics under test:

- observe/factor terms inside an inactive region contribute exactly 0;
- latent sites keep their prior term (Carlin-Chib pseudo-prior), so the
  extended joint is proper and active-branch posterior marginals are exact;
- ``cond`` where-selects return values and composes under jit/vmap;
- end-to-end: a two-branch model's branch posterior matches the closed form.
"""

import jax
import jax.numpy as jnp
import numpy as np

import fugue_tpu as ft


def _norm_logpdf(x, mu, sd):
    return -0.5 * np.log(2 * np.pi) - np.log(sd) - 0.5 * ((x - mu) / sd) ** 2


# ---------------------------------------------------------------------------
# log-density semantics
# ---------------------------------------------------------------------------


def test_inactive_observe_contributes_zero():
    y = 0.8

    def model():
        b = ft.sample("b", ft.Bernoulli(0.5))
        with ft.masked(b):
            ft.observe("y_t", ft.Normal(1.0, 1.0), y)
        with ft.masked(jnp.logical_not(b)):
            ft.observe("y_f", ft.Normal(-1.0, 1.0), y)
        return b

    staged = ft.stage(model)
    ll_true = float(staged.log_density_parts({"b": jnp.array(True)}).log_likelihood)
    ll_false = float(staged.log_density_parts({"b": jnp.array(False)}).log_likelihood)
    assert abs(ll_true - _norm_logpdf(y, 1.0, 1.0)) < 1e-6
    assert abs(ll_false - _norm_logpdf(y, -1.0, 1.0)) < 1e-6


def test_pseudo_prior_keeps_joint_proper():
    # The inactive branch's latent keeps its prior term: the joint must
    # depend on the inactive coordinate exactly through its prior.
    def model():
        b = ft.sample("b", ft.Bernoulli(0.5))
        with ft.masked(b):
            x = ft.sample("x", ft.Normal(0.0, 1.0))
            ft.observe("y", ft.Normal(x, 0.5), 2.0)
        return b

    staged = ft.stage(model)
    lp1 = float(staged.log_joint({"b": jnp.array(False), "x": jnp.array(0.0)}))
    lp2 = float(staged.log_joint({"b": jnp.array(False), "x": jnp.array(3.0)}))
    # b=False: likelihood masked, difference is purely the Normal(0,1) prior
    assert abs((lp1 - lp2) - (_norm_logpdf(0, 0, 1) - _norm_logpdf(3, 0, 1))) < 1e-6


def test_masked_factor_and_guard_inert_when_inactive():
    def model():
        x = ft.sample("x", ft.Normal(0.0, 1.0))
        with ft.masked(x > 100.0):  # inactive for any reasonable x
            ft.factor(-jnp.inf)
            ft.guard(x > 200.0)
        return x

    staged = ft.stage(model)
    lf = float(staged.log_density_parts({"x": jnp.array(0.0)}).log_factors)
    assert lf == 0.0  # masked -inf must contribute 0, not NaN/-inf


def test_nested_masks_and_together():
    def model():
        a = ft.sample("a", ft.Bernoulli(0.5))
        b = ft.sample("b", ft.Bernoulli(0.5))
        with ft.masked(a):
            with ft.masked(b):
                ft.factor(-1.0)
        return a

    staged = ft.stage(model)

    def lf(a, b):
        return float(
            staged.log_density_parts(
                {"a": jnp.array(a), "b": jnp.array(b)}
            ).log_factors
        )

    assert lf(True, True) == -1.0
    assert lf(True, False) == 0.0
    assert lf(False, True) == 0.0


# ---------------------------------------------------------------------------
# cond combinator
# ---------------------------------------------------------------------------


def test_cond_selects_value_and_masks_likelihood():
    y = 0.3

    def model():
        b = ft.sample("b", ft.Bernoulli(0.5))
        loc = ft.cond(
            b,
            lambda: ft.sample("mu_t", ft.Normal(2.0, 0.1)),
            lambda: ft.sample("mu_f", ft.Normal(-2.0, 0.1)),
        )
        ft.observe("y", ft.Normal(loc, 1.0), y)
        return loc

    staged = ft.stage(model)
    assert {s.address for s in staged.sites} == {"b", "mu_t", "mu_f"}
    lats = {"b": jnp.array(True), "mu_t": jnp.array(2.0), "mu_f": jnp.array(-2.0)}
    val, _ = staged.replay(lats)
    assert float(val) == 2.0
    lats["b"] = jnp.array(False)
    assert float(staged.replay(lats)[0]) == -2.0


def test_cond_one_armed_and_jit():
    def f(pred, x):
        def model():
            z = ft.sample("z", ft.Normal(0.0, 1.0))
            return ft.cond(pred, lambda: z + x)

        staged = ft.stage(model)
        return staged.replay({"z": jnp.array(1.0)})[0]

    assert float(f(jnp.array(True), 2.0)) == 3.0

    # cond composes inside jit over a traced predicate
    def model():
        b = ft.sample("b", ft.Bernoulli(0.5))
        v = ft.cond(b, lambda: jnp.array(1.0), lambda: jnp.array(-1.0))
        ft.factor(v * 0.0)
        return v

    staged = ft.stage(model)
    g = jax.jit(lambda b: staged.replay({"b": b})[0])
    assert float(g(jnp.array(True))) == 1.0
    assert float(g(jnp.array(False))) == -1.0


# ---------------------------------------------------------------------------
# end-to-end posterior correctness
# ---------------------------------------------------------------------------


def test_branch_posterior_matches_closed_form():
    # b ~ Bernoulli(0.5); y | b=1 ~ N(1,1), y | b=0 ~ N(-1,1); y = 0.8.
    # P(b=1|y) = N(y|1,1) / (N(y|1,1) + N(y|-1,1)) exactly.
    y = 0.8

    def model():
        b = ft.sample("b", ft.Bernoulli(0.5))
        with ft.masked(b):
            ft.observe("y_t", ft.Normal(1.0, 1.0), y)
        with ft.masked(jnp.logical_not(b)):
            ft.observe("y_f", ft.Normal(-1.0, 1.0), y)
        return b

    l1, l0 = _norm_logpdf(y, 1, 1), _norm_logpdf(y, -1, 1)
    exact = np.exp(l1) / (np.exp(l1) + np.exp(l0))

    res = ft.adaptive_mcmc_chain(
        jax.random.PRNGKey(3), model, n_samples=500, n_warmup=500, n_chains=256
    )
    p_hat = float(np.asarray(res.samples["b"]).mean())
    assert abs(p_hat - exact) < 0.02, (p_hat, exact)


def test_cond_mixture_with_continuous_latents_hmc_gibbs():
    # Gibbs over the branch indicator + HMC over both branch means: the
    # active branch mean must concentrate on the data, the inactive one stays
    # on its prior (pseudo-prior semantics).
    data = jnp.asarray(np.random.default_rng(0).normal(3.0, 0.5, 40))

    def model():
        b = ft.sample("b", ft.Bernoulli(0.5))
        mu_t = ft.sample("mu_t", ft.Normal(0.0, 10.0))
        mu_f = ft.sample("mu_f", ft.Normal(0.0, 10.0))
        with ft.masked(b):
            ft.observe("y_t", ft.Normal(mu_t, 0.5), data)
        with ft.masked(jnp.logical_not(b)):
            ft.observe("y_f", ft.Normal(mu_f - 100.0, 0.5), data)
        return b

    res = ft.gibbs_chain(
        jax.random.PRNGKey(0), model, n_samples=300, n_warmup=300, n_chains=32
    )
    b = np.asarray(res.samples["b"])
    mu_t = np.asarray(res.samples["mu_t"])
    # the true-branch explanation wins overwhelmingly
    assert b.mean() > 0.99, b.mean()
    assert abs(mu_t.mean() - 3.0) < 0.2, mu_t.mean()
