"""The monadic Model API: pure/bind/map/zip/sequence/traverse + plates.

Reference: the prob!/plate! macro layer (src/macros/mod.rs) and the Model
combinators (src/core/model.rs:447-680). In Python, do-notation is just
sequential code; the combinators exist for API parity and for building
models programmatically.
"""

import jax
import jax.numpy as jnp

import fugue_tpu as ft


def main():
    # do-notation == plain Python
    def direct():
        mu = ft.sample("mu", ft.Normal(0.0, 1.0))
        sd = ft.sample("sd", ft.LogNormal(0.0, 0.5))
        ft.observe("y", ft.Normal(mu, sd), jnp.array([0.3, 0.5]))
        return mu, sd

    # the same model via combinators
    combinator_model = ft.Model.sample("mu", ft.Normal(0.0, 1.0)).bind(
        lambda mu: ft.Model.sample("sd", ft.LogNormal(0.0, 0.5)).bind(
            lambda sd: ft.Model.observe(
                "y", ft.Normal(mu, sd), jnp.array([0.3, 0.5])
            ).map(lambda _: (mu, sd))
        )
    )

    key = jax.random.PRNGKey(0)
    r1, t1 = ft.run(ft.PriorHandler(key), direct)
    r2, t2 = ft.run(ft.PriorHandler(key), combinator_model)
    assert float(t1.total_log_weight()) == float(t2.total_log_weight())
    print("combinator model == direct model -- OK")

    # sequence_vec / traverse_vec (stack-safe for huge models)
    seq = ft.sequence_vec(
        [ft.Model.sample(ft.addr("w", i), ft.Normal(0.0, 1.0)) for i in range(100)]
    )
    ws, trace = ft.run(ft.PriorHandler(jax.random.PRNGKey(1)), seq)
    assert len(ws) == 100 and len(trace) == 100

    trav = ft.traverse_vec(
        range(5), lambda i: ft.Model.sample(ft.addr("t", i), ft.Beta(2.0, 2.0))
    )
    ts, _ = ft.run(ft.PriorHandler(jax.random.PRNGKey(2)), trav)
    assert len(ts) == 5

    # scalar plate (reference plate! semantics) vs vectorized site
    def scalar_plate():
        mu = ft.sample("mu", ft.Normal(0.0, 1.0))
        return ft.plate("x", 8, lambda i: ft.sample(ft.addr("x", i), ft.Normal(mu, 1.0)))

    def vector_plate():
        mu = ft.sample("mu", ft.Normal(0.0, 1.0))
        return ft.sample("x", ft.Normal(mu, 1.0), sample_shape=(8,))

    _, ts = ft.run(ft.PriorHandler(jax.random.PRNGKey(3)), scalar_plate)
    _, tv = ft.run(ft.PriorHandler(jax.random.PRNGKey(3)), vector_plate)
    assert len(ts) == 9 and len(tv) == 2  # 8 scalar sites vs 1 vector site
    print("plate forms: 9 scalar sites vs 1 vectorized site -- OK")

    # zip and guard
    pair = ft.Model.sample("a", ft.Uniform(0.0, 1.0)).zip(
        ft.Model.sample("b", ft.Uniform(0.0, 1.0))
    )
    (a, b), tr = ft.run(ft.PriorHandler(jax.random.PRNGKey(4)), pair)
    ft_guarded = ft.Model(lambda: (ft.guard(jnp.asarray(True)), 42)[1])
    v, _ = ft.run(ft.PriorHandler(jax.random.PRNGKey(5)), ft_guarded)
    assert v == 42
    print("zip/guard -- OK")


if __name__ == "__main__":
    main()
