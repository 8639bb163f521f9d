"""Multi-device sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4 item 8: CPU mesh simulation replaces the reference's
non-existent distributed tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import fugue_tpu as ft
from fugue_tpu.parallel.mesh import (
    CHAIN_AXIS,
    chain_sharding,
    make_chain_data_mesh,
    make_chain_mesh,
)
from fugue_tpu.parallel.sharded import sharded_hmc_chain, sharded_smc
from fugue_tpu.inference.mcmc_utils import split_r_hat


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    return make_chain_mesh()


def coin_model():
    obs = jnp.array([1] * 12 + [0] * 7, dtype=bool)
    p = ft.sample("p", ft.Beta(2.0, 3.0))
    ft.observe("obs", ft.Bernoulli(p), obs)
    return p


def test_mesh_construction(mesh):
    assert mesh.devices.size == 8
    assert mesh.axis_names == (CHAIN_AXIS,)
    m2 = make_chain_data_mesh(4, 2)
    assert m2.axis_names == (CHAIN_AXIS, "data")
    assert m2.devices.shape == (4, 2)


def test_sharded_hmc_posterior(mesh):
    res = sharded_hmc_chain(
        jax.random.PRNGKey(0), coin_model, n_samples=500, n_warmup=400,
        n_chains=64, mesh=mesh,
    )
    ps = np.asarray(res.samples["p"])
    assert ps.shape == (64, 500)
    assert ps.mean() == pytest.approx(14 / 24, abs=0.01)
    assert float(split_r_hat(ps[:8])) < 1.05
    # every shard adapted the SAME kernel (collective consensus)
    assert res.step_size > 0


def test_sharded_hmc_chain_axis_is_sharded(mesh):
    res = sharded_hmc_chain(
        jax.random.PRNGKey(1), coin_model, n_samples=50, n_warmup=50,
        n_chains=32, mesh=mesh,
    )
    shardings = res.final_positions.sharding
    # chain axis spread over 8 devices
    assert len(shardings.device_set) == 8


def test_sharded_hmc_matches_quality_of_unsharded(mesh):
    """Sharded and unsharded drivers both hit the conjugate posterior."""
    from fugue_tpu.inference.hmc import hmc_chain

    res_s = sharded_hmc_chain(
        jax.random.PRNGKey(2), coin_model, n_samples=800, n_warmup=400,
        n_chains=32, mesh=mesh,
    )
    res_u = hmc_chain(
        jax.random.PRNGKey(2), coin_model, n_samples=800, n_warmup=400,
        n_chains=32,
    )
    m_s = float(np.asarray(res_s.samples["p"]).mean())
    m_u = float(np.asarray(res_u.samples["p"]).mean())
    assert m_s == pytest.approx(14 / 24, abs=0.01)
    assert m_u == pytest.approx(14 / 24, abs=0.01)


def test_sharded_smc(mesh):
    res = sharded_smc(jax.random.PRNGKey(3), 1024, coin_model, mesh=mesh)
    assert float(res.posterior_mean("p")) == pytest.approx(14 / 24, abs=0.015)
    assert res.ess > 100


def test_sharded_data_plate_psum(mesh):
    """The context-parallel analog: a large observation plate sharded across
    devices, per-shard log-likelihood partial sums psum-reduced
    (SURVEY.md §2.3 SP row)."""
    n_obs = 64
    rng = np.random.default_rng(0)
    ys_np = rng.normal(1.0, 1.0, n_obs)
    ys = jnp.asarray(ys_np)

    staged = ft.stage(lambda: _plate_model(ys))

    def _local_loglik(mu, ys_local):
        return jnp.sum(ft.Normal(mu, 1.0).log_prob(ys_local))

    from fugue_tpu.parallel.sharded import _shard_map
    from jax.sharding import PartitionSpec as P

    def shard_fn(mu, ys_local):
        local = _local_loglik(mu[0], ys_local)
        return jax.lax.psum(local, CHAIN_AXIS)[None]

    mapped = _shard_map(
        shard_fn, mesh, in_specs=(P(), P(CHAIN_AXIS)), out_specs=P(),
    )
    mu = jnp.asarray([0.7])
    total = jax.jit(mapped)(mu, ys)
    expected = float(jnp.sum(ft.Normal(0.7, 1.0).log_prob(ys)))
    assert float(total[0]) == pytest.approx(expected, rel=1e-6)


def _plate_model(ys):
    mu = ft.sample("mu", ft.Normal(0.0, 2.0))
    ft.observe("ys", ft.Normal(mu, 1.0), ys)
    return mu


def test_sharded_mh(mesh):
    """MH under jit sharding constraints: pure chain-DP over the mesh."""
    from fugue_tpu.inference.mh import adaptive_mcmc_chain

    res = adaptive_mcmc_chain(
        jax.random.PRNGKey(9), coin_model, n_samples=400, n_warmup=200,
        n_chains=64, mesh=mesh,
    )
    ps = np.asarray(res.samples["p"])
    assert ps.shape == (64, 400)
    assert ps.mean() == pytest.approx(14 / 24, abs=0.015)
    assert len(res.final_state.log_joint.sharding.device_set) == 8


def test_sharded_nuts_posterior(mesh):
    """NUTS chains sharded over the mesh: collective warmup adaptation
    (acceptance pmean, epsilon consensus, Welford mass merge) produces one
    kernel and the conjugate posterior."""
    from fugue_tpu.parallel.sharded import sharded_nuts_chain
    from fugue_tpu.inference.nuts import NUTSConfig

    res = sharded_nuts_chain(
        jax.random.PRNGKey(4), coin_model, n_samples=400, n_warmup=300,
        n_chains=32, mesh=mesh, config=NUTSConfig(max_depth=6),
    )
    ps = np.asarray(res.samples["p"])
    assert ps.shape == (32, 400)
    assert ps.mean() == pytest.approx(14 / 24, abs=0.012)
    assert float(split_r_hat(ps[:8])) < 1.05
    # eps is a cross-shard consensus scalar; depths are sane
    assert res.step_size > 0
    assert 1 <= float(np.asarray(res.tree_depths).mean()) <= 6
    # chain axis spread over all 8 devices
    assert len(res.final_positions.sharding.device_set) == 8
