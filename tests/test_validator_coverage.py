"""Validator-coverage meta-test.

Reference parity: tests/f_validate_coverage.rs — every distribution's
constructor must actually validate its parameters (a distribution silently
accepting garbage is a coverage hole, not a feature).
"""

import numpy as np
import pytest

import fugue_tpu as ft

# (ctor_with_bad_params, description)
BAD_CONSTRUCTIONS = [
    (lambda: ft.Normal(np.nan, 1.0), "Normal nan mean"),
    (lambda: ft.Normal(0.0, -1.0), "Normal negative std"),
    (lambda: ft.Uniform(1.0, 1.0), "Uniform empty interval"),
    (lambda: ft.LogNormal(0.0, 0.0), "LogNormal zero sigma"),
    (lambda: ft.Exponential(-2.0), "Exponential negative rate"),
    (lambda: ft.Bernoulli(-0.1), "Bernoulli negative p"),
    (lambda: ft.Bernoulli(1.1), "Bernoulli p>1"),
    (lambda: ft.Categorical(probs=[0.5, 0.2]), "Categorical non-normalized"),
    (lambda: ft.Beta(0.0, 1.0), "Beta zero alpha"),
    (lambda: ft.Gamma(1.0, 0.0), "Gamma zero rate"),
    (lambda: ft.Binomial(5.5, 0.5), "Binomial fractional n"),
    (lambda: ft.Binomial(-1, 0.5), "Binomial negative n"),
    (lambda: ft.Poisson(0.0), "Poisson zero rate"),
    (lambda: ft.StudentT(-1.0), "StudentT negative df"),
    (lambda: ft.Cauchy(0.0, 0.0), "Cauchy zero scale"),
    (lambda: ft.Laplace(0.0, -1.0), "Laplace negative scale"),
    (lambda: ft.Weibull(0.0, 1.0), "Weibull zero shape"),
    (lambda: ft.ChiSquared(-2.0), "ChiSquared negative df"),
    (lambda: ft.InverseGamma(1.0, -1.0), "InverseGamma negative scale"),
    (lambda: ft.DiscreteUniform(3, 1), "DiscreteUniform inverted range"),
    (lambda: ft.HalfNormal(-1.0), "HalfNormal negative scale"),
    (lambda: ft.HalfCauchy(0.0), "HalfCauchy zero scale"),
    (lambda: ft.Geometric(0.0), "Geometric zero p"),
    (lambda: ft.Geometric(1.2), "Geometric p>1"),
    (lambda: ft.NegativeBinomial(0.0, 0.5), "NegativeBinomial zero count"),
    (lambda: ft.NegativeBinomial(2.0, -0.1), "NegativeBinomial negative p"),
    (lambda: ft.BernoulliLogits(np.nan), "BernoulliLogits nan logits"),
    (lambda: ft.BernoulliLogits(np.inf), "BernoulliLogits inf logits"),
]


@pytest.mark.parametrize(
    "ctor,desc", BAD_CONSTRUCTIONS, ids=[b[1] for b in BAD_CONSTRUCTIONS]
)
def test_bad_params_rejected(ctor, desc):
    with pytest.raises(ft.FugueError):
        ctor()


def test_every_family_has_a_rejection_case():
    """Meta: the table above must touch all 17 families."""
    covered = set()
    for ctor, _ in BAD_CONSTRUCTIONS:
        try:
            ctor()
        except ft.FugueError:
            pass
        src = ctor.__code__.co_names
        covered.update(n for n in src if hasattr(ft, n))
    families = {cls.__name__ for cls in ft.ALL_DISTRIBUTIONS}
    missing = families - covered
    assert not missing, f"no validator coverage for: {missing}"
