"""Sharded inference drivers: chains/particles across a device mesh.

Two complementary SPMD strategies, both idiomatic JAX:

1. **shard_map + explicit collectives** (HMC/NUTS): the chain batch is a
   named mesh axis; warmup adaptation — acceptance pmean, initial-epsilon
   consensus, Welford mass merge — runs as ICI collectives so EVERY device
   adapts the same kernel (``make_hmc_drive(chain_axis=...)``). This is the
   cross-chain adaptation structure SURVEY.md §2.3 calls for; the reference
   has nothing to port (single-threaded Rust).

2. **jit + sharding constraints** (SMC): particle arrays carry a
   ``with_sharding_constraint`` on the particle axis and XLA auto-inserts
   psum/all-gather for the ESS bisection, log-evidence reductions, and
   resampling gathers (the scaling-book recipe: annotate, let XLA place
   collectives).

Both paths compile and run identically on a virtual CPU mesh
(``--xla_force_host_platform_device_count``) and a real TPU slice.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import settings
from ..core.rng import chain_keys
from ..runtime.staging import StagedModel, stage
from .mesh import CHAIN_AXIS, chain_sharding, make_chain_mesh


def _shard_map(f, mesh, in_specs, out_specs):
    try:
        return jax.shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                             check_vma=False)
    except TypeError:
        from jax.experimental.shard_map import shard_map as _sm

        return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_rep=False)


def sharded_hmc_chain(
    key,
    model_fn: Optional[Callable] = None,
    n_samples: int = 1000,
    n_warmup: int = 1000,
    config=None,
    *,
    n_chains: int = 8,
    mesh: Optional[Mesh] = None,
    model_args: tuple = (),
    staged: Optional[StagedModel] = None,
    discrete: Optional[Dict[str, Any]] = None,
):
    """HMC with the chain batch sharded across ``mesh``'s chain axis.

    ``n_chains`` is the GLOBAL chain count (must divide evenly by the mesh
    size). Returns the same ``HMCResult`` as the single-chip driver with
    global (n_chains, ...) arrays.
    """
    from ..inference.hmc import HMCConfig, HMCResult, make_hmc_drive

    if config is None:
        config = HMCConfig()
    if staged is None:
        staged = stage(model_fn, *model_args)
    if mesh is None:
        mesh = make_chain_mesh()
    n_dev = mesh.devices.size
    if n_chains % n_dev:
        raise ValueError(f"n_chains={n_chains} not divisible by mesh size {n_dev}")
    per_shard = n_chains // n_dev
    dt = settings.real_dtype()

    from ..inference.hmc import initial_positions

    k_init, k_eps, k_run = jax.random.split(jax.random.fold_in(key, 7), 3)
    q0 = initial_positions(staged, k_init, n_chains, config.init)
    q0 = jax.device_put(q0, chain_sharding(mesh, q0.ndim))

    drive = make_hmc_drive(
        staged, config, per_shard, n_samples, n_warmup,
        discrete=discrete, chain_axis=CHAIN_AXIS,
    )

    def shard_fn(q0_local, k_eps, k_run):
        # distinct per-shard sampling streams, deterministic per layout
        idx = jax.lax.axis_index(CHAIN_AXIS)
        k_run_local = jax.random.fold_in(k_run, idx)
        return drive(q0_local, k_eps, k_run_local)

    def build_mapped():
        mapped = _shard_map(
            shard_fn,
            mesh,
            in_specs=(P(CHAIN_AXIS, None), P(), P()),
            out_specs=(
                P(CHAIN_AXIS, None),          # q_f (chains, d)
                P(None, CHAIN_AXIS, None),    # qs (n_samples, chains, d)
                P(None, CHAIN_AXIS),          # ljs
                P(None, CHAIN_AXIS),          # per-chain accept probs
                P(None, CHAIN_AXIS),          # divergences
                P(),                          # eps_final (consensus, replicated)
                P(None,) if config.mass != "dense" else P(None, None),  # inv_mass
            ),
        )
        return jax.jit(mapped)

    from ..inference.hmc import constrain_positions

    jit_mapped = staged.cached_kernel(
        ("sharded_hmc", config, n_chains, n_samples, n_warmup, id(mesh)),
        build_mapped,
    )
    q_f, qs, ljs, aps, divs, eps_final, inv_mass_f = jit_mapped(q0, k_eps, k_run)

    positions = jnp.moveaxis(qs, 0, 1)

    return HMCResult(
        samples=constrain_positions(staged, positions),
        positions=positions,
        log_joint=jnp.moveaxis(ljs, 0, 1),
        accept_prob=jnp.mean(aps, axis=-1),
        divergences=jnp.moveaxis(divs, 0, 1),
        step_size=float(np.asarray(eps_final)),
        inv_mass=inv_mass_f,
        final_positions=q_f,
    )


def sharded_nuts_chain(
    key,
    model_fn: Optional[Callable] = None,
    n_samples: int = 1000,
    n_warmup: int = 1000,
    config=None,
    *,
    n_chains: int = 8,
    mesh: Optional[Mesh] = None,
    model_args: tuple = (),
    staged: Optional[StagedModel] = None,
    discrete: Optional[Dict[str, Any]] = None,
):
    """NUTS with the chain batch sharded across ``mesh``'s chain axis.

    Same SPMD structure as ``sharded_hmc_chain``: per-shard tree building,
    cross-shard collectives for the warmup adaptation (dual-averaging
    acceptance pmean, initial-epsilon consensus, Welford mass merge), so
    every device runs the identical adapted kernel."""
    from ..inference.nuts import NUTSConfig, NUTSResult, make_nuts_drive

    if config is None:
        config = NUTSConfig()
    if staged is None:
        staged = stage(model_fn, *model_args)
    if mesh is None:
        mesh = make_chain_mesh()
    n_dev = mesh.devices.size
    if n_chains % n_dev:
        raise ValueError(f"n_chains={n_chains} not divisible by mesh size {n_dev}")
    per_shard = n_chains // n_dev

    from ..inference.hmc import constrain_positions, initial_positions

    k_init, k_eps, k_run = jax.random.split(jax.random.fold_in(key, 13), 3)
    q0 = initial_positions(staged, k_init, n_chains, config.init)
    q0 = jax.device_put(q0, chain_sharding(mesh, q0.ndim))

    drive = make_nuts_drive(
        staged, config, per_shard, n_samples, n_warmup,
        discrete=discrete, chain_axis=CHAIN_AXIS,
    )

    def shard_fn(q0_local, k_eps, k_run):
        idx = jax.lax.axis_index(CHAIN_AXIS)
        k_run_local = jax.random.fold_in(k_run, idx)
        return drive(q0_local, k_eps, k_run_local)

    def build_mapped():
        mapped = _shard_map(
            shard_fn,
            mesh,
            in_specs=(P(CHAIN_AXIS, None), P(), P()),
            out_specs=(
                P(CHAIN_AXIS, None),          # q_f (chains, d)
                P(None, CHAIN_AXIS, None),    # qs (n_samples, chains, d)
                P(None, CHAIN_AXIS),          # per-chain accept probs
                P(None, CHAIN_AXIS),          # divergences
                P(None, CHAIN_AXIS),          # tree depths
                P(),                          # eps_final (consensus, replicated)
                P(None,) if config.mass != "dense" else P(None, None),
            ),
        )
        return jax.jit(mapped)

    jit_mapped = staged.cached_kernel(
        ("sharded_nuts", config, n_chains, n_samples, n_warmup, id(mesh)),
        build_mapped,
    )
    q_f, qs, aps, divs, depths, eps_final, inv_mass_f = jit_mapped(q0, k_eps, k_run)

    positions = jnp.moveaxis(qs, 0, 1)
    return NUTSResult(
        samples=constrain_positions(staged, positions),
        positions=positions,
        accept_prob=jnp.mean(aps, axis=-1),
        divergences=jnp.moveaxis(divs, 0, 1),
        tree_depths=jnp.moveaxis(depths, 0, 1),
        step_size=float(np.asarray(eps_final)),
        inv_mass=inv_mass_f,
        final_positions=q_f,
    )


def sharded_smc(
    key,
    n_particles: int,
    model_fn: Optional[Callable] = None,
    config=None,
    *,
    mesh: Optional[Mesh] = None,
    model_args: tuple = (),
    staged: Optional[StagedModel] = None,
):
    """Tempered SMC with the particle axis sharded via jit sharding
    constraints: XLA inserts the psum/all-gather collectives for weight
    reductions, ESS bisection, and cross-shard resampling gathers
    (SURVEY.md §3.4 TPU translation)."""
    from ..inference.smc import SMCConfig, adaptive_smc

    if config is None:
        config = SMCConfig()
    if mesh is None:
        mesh = make_chain_mesh()
    return adaptive_smc(
        key, n_particles, model_fn, config,
        model_args=model_args, staged=staged, mesh=mesh,
    )
