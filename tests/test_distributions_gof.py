"""Goodness-of-fit over ALL 17 distributions.

Reference parity: tests/f_tests_sampler_validation.rs — KS test (n=5000,
alpha=0.001) for the continuous distributions against analytic CDFs,
chi-square for the discrete ones, and 5-sigma moment checks for all.
The reference double-derives its reference values with a stdlib-only Python
script (tests/gen_refs.py); here scipy.stats provides the analytic CDFs/PMFs,
which is strictly stronger.

Also checks: log_prob parity with the analytic log-pdf/log-pmf on a value
grid (the hand-written log-space formulas must match), -inf outside support,
and seeded determinism.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

import fugue_tpu as ft

N = 5000
ALPHA = 1e-3
KEY = jax.random.PRNGKey(20260817)


def _draw(dist, key, n=N):
    return np.asarray(dist.sample(key, (n,)))


# (name, fugue dist, scipy frozen dist, moment mean, moment var)
CONTINUOUS = [
    ("normal", ft.Normal(1.5, 2.0), st.norm(1.5, 2.0)),
    ("uniform", ft.Uniform(-2.0, 3.0), st.uniform(-2.0, 5.0)),
    ("lognormal", ft.LogNormal(0.5, 0.75), st.lognorm(0.75, scale=np.exp(0.5))),
    ("exponential", ft.Exponential(2.5), st.expon(scale=1 / 2.5)),
    ("beta", ft.Beta(2.0, 5.0), st.beta(2.0, 5.0)),
    ("gamma", ft.Gamma(3.0, 2.0), st.gamma(3.0, scale=1 / 2.0)),
    ("studentt", ft.StudentT(5.0, 1.0, 2.0), st.t(5.0, loc=1.0, scale=2.0)),
    ("cauchy", ft.Cauchy(0.5, 1.5), st.cauchy(0.5, 1.5)),
    ("laplace", ft.Laplace(-1.0, 2.0), st.laplace(-1.0, 2.0)),
    ("weibull", ft.Weibull(1.8, 2.2), st.weibull_min(1.8, scale=2.2)),
    ("chisq", ft.ChiSquared(4.0), st.chi2(4.0)),
    ("invgamma", ft.InverseGamma(3.0, 2.0), st.invgamma(3.0, scale=2.0)),
    # beyond-parity extensions
    ("halfnormal", ft.HalfNormal(1.7), st.halfnorm(scale=1.7)),
    ("halfcauchy", ft.HalfCauchy(0.8), st.halfcauchy(scale=0.8)),
]

DISCRETE = [
    ("bernoulli", ft.Bernoulli(0.3), st.bernoulli(0.3)),
    (
        "categorical",
        ft.Categorical(probs=jnp.array([0.1, 0.2, 0.3, 0.4])),
        st.rv_discrete(values=([0, 1, 2, 3], [0.1, 0.2, 0.3, 0.4])),
    ),
    ("binomial", ft.Binomial(20, 0.35), st.binom(20, 0.35)),
    ("poisson", ft.Poisson(4.5), st.poisson(4.5)),
    ("discrete_uniform", ft.DiscreteUniform(-3, 6), st.randint(-3, 7)),
    # beyond-parity extensions (failures-before-success conventions)
    ("geometric", ft.Geometric(0.35), st.nbinom(1, 0.35)),
    ("negbinomial", ft.NegativeBinomial(6, 0.4), st.nbinom(6, 0.4)),
]


@pytest.mark.parametrize("name,dist,ref", CONTINUOUS, ids=[c[0] for c in CONTINUOUS])
def test_continuous_ks(name, dist, ref):
    """KS test at alpha=0.001 (reference: f_tests_sampler_validation.rs)."""
    key = jax.random.fold_in(KEY, ft.address_seed(name))
    xs = _draw(dist, key)
    stat, pval = st.kstest(xs, ref.cdf)
    assert pval > ALPHA, f"{name}: KS p={pval:.2e} stat={stat:.4f}"


@pytest.mark.parametrize("name,dist,ref", CONTINUOUS, ids=[c[0] for c in CONTINUOUS])
def test_continuous_logprob_matches_analytic(name, dist, ref):
    """Hand-written log-space formulas vs scipy logpdf on a support grid."""
    q = np.linspace(0.01, 0.99, 41)
    grid = ref.ppf(q)
    lp = np.asarray(dist.log_prob(jnp.asarray(grid)))
    expected = ref.logpdf(grid)
    np.testing.assert_allclose(lp, expected, rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize(
    "name,dist,lo_bad,hi_bad",
    [
        ("uniform", ft.Uniform(-2.0, 3.0), -2.5, 3.5),
        ("lognormal", ft.LogNormal(0.5, 0.75), -1.0, None),
        ("exponential", ft.Exponential(2.5), -0.1, None),
        ("beta", ft.Beta(2.0, 5.0), -0.1, 1.1),
        ("gamma", ft.Gamma(3.0, 2.0), -1.0, None),
        ("weibull", ft.Weibull(1.8, 2.2), -0.5, None),
        ("chisq", ft.ChiSquared(4.0), -0.5, None),
        ("invgamma", ft.InverseGamma(3.0, 2.0), -0.5, None),
    ],
)
def test_outside_support_is_neg_inf(name, dist, lo_bad, hi_bad):
    assert float(dist.log_prob(lo_bad)) == -np.inf
    if hi_bad is not None:
        assert float(dist.log_prob(hi_bad)) == -np.inf


@pytest.mark.parametrize("name,dist,ref", DISCRETE, ids=[d[0] for d in DISCRETE])
def test_discrete_chisquare(name, dist, ref):
    """Chi-square GOF for the 5 discrete distributions (reference parity)."""
    key = jax.random.fold_in(KEY, ft.address_seed(name))
    xs = _draw(dist, key).astype(np.int64)
    lo, hi = int(xs.min()), int(xs.max())
    support = np.arange(lo, hi + 1)
    expected = np.array([ref.pmf(k) for k in support]) * N
    # merge tail bins with expected < 5 into neighbors
    mask = expected >= 5
    obs_counts = np.array([(xs == k).sum() for k in support], dtype=float)
    obs_main, exp_main = obs_counts[mask], expected[mask]
    obs_tail = obs_counts[~mask].sum() + (N - obs_counts.sum())
    exp_tail = expected[~mask].sum() + max(0.0, N - expected.sum())
    if exp_tail > 0.5:
        obs_main = np.append(obs_main, obs_tail)
        exp_main = np.append(exp_main, exp_tail)
    exp_main = exp_main * (obs_main.sum() / exp_main.sum())
    stat = ((obs_main - exp_main) ** 2 / exp_main).sum()
    dof = len(obs_main) - 1
    pval = 1 - st.chi2.cdf(stat, dof)
    assert pval > ALPHA, f"{name}: chi2 p={pval:.2e} stat={stat:.2f} dof={dof}"


@pytest.mark.parametrize("name,dist,ref", DISCRETE, ids=[d[0] for d in DISCRETE])
def test_discrete_logprob_matches_analytic(name, dist, ref):
    lo, hi = int(ref.ppf(0.001)), int(ref.ppf(0.999))
    ks = np.arange(lo, hi + 1)
    if name == "bernoulli":
        lp = np.asarray(dist.log_prob(jnp.asarray(ks, bool)))
    else:
        lp = np.asarray(dist.log_prob(jnp.asarray(ks)))
    expected = ref.logpmf(ks)
    np.testing.assert_allclose(lp, expected, rtol=1e-8, atol=1e-10)


ALL_MOMENTS = [
    (name, dist, ref) for (name, dist, ref) in CONTINUOUS + DISCRETE
    if name not in ("cauchy", "halfcauchy")  # no moments
]


@pytest.mark.parametrize("name,dist,ref", ALL_MOMENTS, ids=[m[0] for m in ALL_MOMENTS])
def test_moments_within_5_sigma(name, dist, ref):
    """5-sigma sample-mean check (reference: moment checks for all 17)."""
    key = jax.random.fold_in(KEY, ft.address_seed(name + "/moments"))
    xs = _draw(dist, key).astype(np.float64)
    mean, var = ref.stats(moments="mv")
    if name == "studentt":  # heavy tails: se of mean still valid for df=5
        pass
    se = np.sqrt(float(var) / N)
    assert abs(xs.mean() - float(mean)) < 5 * se, (
        f"{name}: mean {xs.mean():.4f} vs {float(mean):.4f} (5se={5*se:.4f})"
    )


def test_discrete_natural_dtypes():
    """Natural return types (reference: distribution.rs typed returns)."""
    k = jax.random.PRNGKey(0)
    assert ft.Bernoulli(0.5).sample(k).dtype == jnp.bool_
    assert jnp.issubdtype(ft.Categorical.uniform(3).sample(k).dtype, jnp.integer)
    assert jnp.issubdtype(ft.Binomial(10, 0.5).sample(k).dtype, jnp.integer)
    assert jnp.issubdtype(ft.Poisson(2.0).sample(k).dtype, jnp.integer)
    assert jnp.issubdtype(ft.DiscreteUniform(0, 9).sample(k).dtype, jnp.integer)


def test_infallible_shortcuts():
    """Normal.standard / Uniform.unit / Beta.uniform_prior / Categorical.uniform
    (reference: distribution.rs:165,284,873,729)."""
    assert float(ft.Normal.standard().log_prob(0.0)) == pytest.approx(
        -0.5 * np.log(2 * np.pi)
    )
    assert float(ft.Uniform.unit().log_prob(0.5)) == pytest.approx(0.0)
    assert float(ft.Beta.uniform_prior().log_prob(0.3)) == pytest.approx(0.0)
    assert float(ft.Categorical.uniform(4).log_prob(2)) == pytest.approx(np.log(0.25))


def test_parameter_validation_codes():
    """Constructor validation raises the reference's typed codes."""
    cases = [
        (lambda: ft.Normal(np.nan, 1.0), ft.ErrorCode.INVALID_MEAN),
        (lambda: ft.Normal(0.0, 0.0), ft.ErrorCode.INVALID_VARIANCE),
        (lambda: ft.Bernoulli(1.5), ft.ErrorCode.INVALID_PROBABILITY),
        (lambda: ft.Uniform(2.0, 1.0), ft.ErrorCode.INVALID_RANGE),
        (lambda: ft.Gamma(-1.0, 1.0), ft.ErrorCode.INVALID_SHAPE),
        (lambda: ft.Exponential(0.0), ft.ErrorCode.INVALID_RATE),
        (lambda: ft.Binomial(-3, 0.5), ft.ErrorCode.INVALID_COUNT),
        (lambda: ft.DiscreteUniform(5, 2), ft.ErrorCode.INVALID_RANGE),
    ]
    for ctor, code in cases:
        with pytest.raises(ft.FugueError) as ei:
            ctor()
        assert ei.value.code == code


def test_seeded_determinism():
    """Same key → identical draws for every distribution family."""
    for i, cls_args in enumerate([
        (ft.Normal, (0.0, 1.0)),
        (ft.Beta, (2.0, 3.0)),
        (ft.Poisson, (3.0,)),
        (ft.Categorical.uniform(5), None),
    ]):
        if cls_args[1] is None:
            d = cls_args[0]
        else:
            d = cls_args[0](*cls_args[1])
        k = jax.random.fold_in(KEY, i)
        a, b = _draw(d, k, 16), _draw(d, k, 16)
        np.testing.assert_array_equal(a, b)


def test_extra_distributions_in_engines():
    """Engine integration for the extras: HalfCauchy scale prior through
    the positive transform (HMC), NegativeBinomial likelihood scored in a
    posterior, Geometric as a latent under MH."""
    import fugue_tpu as ft

    def model():
        tau = ft.sample("tau", ft.HalfCauchy(2.0))
        ft.observe("y", ft.Normal(0.0, tau), jnp.array([1.2, -0.8, 1.5]))

    res = ft.hmc_chain(jax.random.PRNGKey(0), model, n_samples=1500,
                       n_warmup=500, n_chains=8)
    tau = np.asarray(res.samples["tau"]).reshape(-1)
    # quadrature ground truth
    grid = np.linspace(1e-3, 30, 40001)
    logp = (np.log(2 / np.pi) - np.log(2.0) - np.log1p((grid / 2.0) ** 2)
            + st.norm.logpdf(1.2, 0, grid) + st.norm.logpdf(-0.8, 0, grid)
            + st.norm.logpdf(1.5, 0, grid))
    w = np.exp(logp - logp.max()); w /= w.sum()
    m = float((w * grid).sum())
    assert abs(tau.mean() - m) < 0.12, (tau.mean(), m)

    def nb_model():
        r = ft.sample("r", ft.Gamma(2.0, 1.0))
        ft.observe("y", ft.NegativeBinomial(r, 0.4), jnp.array([3, 5, 2, 4]))

    res2 = ft.hmc_chain(jax.random.PRNGKey(1), nb_model, n_samples=500,
                        n_warmup=500, n_chains=8)
    assert np.isfinite(np.asarray(res2.samples["r"])).all()


def test_geometric_edge_cases():
    """ADVICE r2 (low): p=1, k=0 is a valid point with mass 1 — the
    sk*log1p(-p) term used to evaluate 0*(-inf)=NaN; and an array probs
    containing ~0 bypasses the scalar constructor check, so sample() must
    clamp rather than emit log(u)/log1p(-0) = -inf cast to int."""
    g1 = ft.Geometric(jnp.array(1.0))
    assert float(g1.log_prob(jnp.array(0))) == 0.0        # P[k=0 | p=1] = 1
    assert float(g1.log_prob(jnp.array(1))) == -np.inf    # impossible
    assert int(g1.sample(jax.random.PRNGKey(0))) == 0

    # traced/array probs containing a zero: finite non-negative samples
    ga = ft.Geometric(jnp.array([0.0, 0.5, 1.0]))
    s = np.asarray(ga.sample(jax.random.PRNGKey(1)))
    assert s.shape == (3,)
    assert np.all(s >= 0)
    assert np.all(np.isfinite(s.astype(np.float64)))
    # p=0 entry: log_prob stays -inf-free for k>=0 in the tail term sense
    lp = np.asarray(ft.Geometric(jnp.array([1.0, 0.5])).log_prob(
        jnp.array([0, 2])))
    assert lp[0] == 0.0
    assert np.isfinite(lp[1])


def test_bernoulli_logits_stability_and_parity():
    """BernoulliLogits: -softplus form matches Bernoulli(sigmoid) at
    moderate logits and never saturates at extreme ones (the stable GLM
    likelihood the scale-tier bench rides)."""
    z = jnp.array([-40.0, -3.0, 0.0, 2.5, 50.0])
    bl = ft.BernoulliLogits(z)
    lp1 = np.asarray(bl.log_prob(jnp.array([True] * 5)))
    lp0 = np.asarray(bl.log_prob(jnp.array([False] * 5)))
    p = 1 / (1 + np.exp(-np.asarray(z, np.float64)))
    np.testing.assert_allclose(lp1[1:4], np.log(p[1:4]), rtol=1e-6)
    np.testing.assert_allclose(lp0[1:4], np.log1p(-p[1:4]), rtol=1e-6)
    assert np.isfinite(lp1).all() and np.isfinite(lp0).all()
    assert lp1[0] == pytest.approx(-40.0, abs=1e-4)
    assert lp0[4] == pytest.approx(-50.0, abs=1e-4)
    s = np.asarray(ft.BernoulliLogits(0.8).sample(jax.random.PRNGKey(0),
                                                  (20000,)))
    assert abs(s.mean() - 1 / (1 + np.exp(-0.8))) < 0.012


def test_bernoulli_logits_glm_end_to_end():
    """Small Bayesian logistic regression through the bf16 matmul island +
    BernoulliLogits likelihood recovers the generating coefficients."""
    from fugue_tpu.ops import matmul_bf16

    D, N = 8, 512
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(0, 1, (N, D)) / np.sqrt(D), jnp.float32)
    w_true = rng.normal(0, 1, D)
    y = jnp.asarray(
        rng.uniform(size=N) < 1 / (1 + np.exp(-np.asarray(X, np.float64) @ w_true))
    )

    def model():
        w = ft.sample("w", ft.Normal(0.0, 1.0), sample_shape=(D,))
        ft.observe("y", ft.BernoulliLogits(matmul_bf16(X, w)), y)

    res = ft.hmc_chain(jax.random.PRNGKey(1), model, n_samples=300,
                       n_warmup=300, n_chains=16)
    w_post = np.asarray(res.samples["w"]).mean((0, 1))
    assert np.corrcoef(w_post, w_true)[0, 1] > 0.9


def test_matmul_bf16x2_precision_and_exact_vjp():
    """ops.matmul_bf16x2: split-precision parameter matmul keeps the staged
    potential SMOOTH at the thermal scale (plain bf16 w-rounding makes it
    rough and collapses HMC dual averaging — scale-tier finding, r3).
    Checks: ~3 orders less error than the bf16 cast against the bf16-stored
    data, and the custom VJP matches f64 finite differences."""
    from fugue_tpu.ops import matmul_bf16, matmul_bf16x2

    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(0, 1, (2000, 64)) / 8, jnp.float32)
    w = jnp.asarray(rng.normal(0, 1, 64), jnp.float32)
    Ab = np.asarray(A, np.float64).astype(np.float32)  # x64 CPU: emulate
    Ab = np.asarray(jnp.asarray(Ab, jnp.bfloat16).astype(jnp.float64))
    exact = Ab @ np.asarray(w, np.float64)
    e1 = np.abs(np.asarray(matmul_bf16(A, w), np.float64) - exact).max()
    e2 = np.abs(np.asarray(matmul_bf16x2(A, w), np.float64) - exact).max()
    assert e2 < e1 / 100

    def loss(w):
        return jnp.sum(jnp.tanh(matmul_bf16x2(A, w)))

    g = np.asarray(jax.grad(loss)(w), np.float64)
    eps = 1e-6
    w64 = np.asarray(w, np.float64)
    g64 = np.array([
        (np.sum(np.tanh(Ab @ (w64 + eps * np.eye(64)[j])))
         - np.sum(np.tanh(Ab @ (w64 - eps * np.eye(64)[j])))) / (2 * eps)
        for j in range(0, 64, 8)
    ])
    rel = np.abs(g[::8] - g64).max() / np.abs(g64).max()
    assert rel < 1e-4

    # vmap over a parameter batch (the chains axis)
    W = jnp.asarray(rng.normal(0, 1, (8, 64)), jnp.float32)
    out = jax.vmap(lambda ww: matmul_bf16x2(A, ww))(W)
    assert out.shape == (8, 2000)


def test_matmul_bf16x2_fastgrad_forward_exact_grad_close():
    """ops.matmul_bf16x2_fastgrad: identical split-precision FORWARD (the
    smoothness property), single-pass bf16 backward whose gradient stays
    within ~bf16-eps/sqrt(N) relative of the exact one (the cotangent
    rounding averages out over the f32-accumulated contraction)."""
    from fugue_tpu.ops import matmul_bf16x2, matmul_bf16x2_fastgrad

    rng = np.random.default_rng(1)
    N, d = 4000, 64
    A = jnp.asarray(rng.normal(0, 1, (N, d)) / 8, jnp.float32)
    w = jnp.asarray(rng.normal(0, 1, d), jnp.float32)
    # forward bit-identical to the exact-VJP op
    np.testing.assert_array_equal(
        np.asarray(matmul_bf16x2_fastgrad(A, w)),
        np.asarray(matmul_bf16x2(A, w)),
    )

    def loss(op, ww):
        return jnp.sum(jnp.tanh(op(A, ww)))

    g_fast = np.asarray(jax.grad(lambda ww: loss(
        matmul_bf16x2_fastgrad, ww))(w), np.float64)
    g_ref = np.asarray(jax.grad(lambda ww: loss(
        matmul_bf16x2, ww))(w), np.float64)
    rel = np.abs(g_fast - g_ref).max() / np.abs(g_ref).max()
    # bf16 cotangent rounding ~4e-3/element, averaged over N=4000 rows
    assert rel < 2e-3, rel
