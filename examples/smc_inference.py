"""Adaptive tempered SMC with evidence estimation.

Reference: examples/smc_inference.rs:96-110. The log-evidence estimate is
checked against the closed-form marginal likelihood.
"""

import jax
import jax.numpy as jnp
from scipy.special import betaln

import fugue_tpu as ft


def coin():
    obs = jnp.array([1] * 18 + [0] * 9, dtype=bool)
    p = ft.sample("p", ft.Beta(2.0, 2.0))
    ft.observe("obs", ft.Bernoulli(p), obs)
    return p


def main():
    res = ft.adaptive_smc(jax.random.PRNGKey(0), 2048, coin)
    exact_logz = betaln(20, 11) - betaln(2, 2)
    assert abs(res.log_evidence - exact_logz) < 0.1, (res.log_evidence, exact_logz)
    assert abs(float(res.posterior_mean("p")) - 20 / 31) < 0.01
    print(
        f"posterior mean {float(res.posterior_mean('p')):.4f} (exact {20/31:.4f}); "
        f"logZ {res.log_evidence:.4f} (exact {exact_logz:.4f}); "
        f"ESS {res.ess:.0f}/2048; {res.n_stages} tempering stages -- OK"
    )


if __name__ == "__main__":
    main()
