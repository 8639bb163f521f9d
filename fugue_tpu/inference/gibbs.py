"""HMC-within-Gibbs for mixed continuous + discrete models.

The reference composes HMC with Metropolis-within-Gibbs by holding discrete
sites fixed during Hamiltonian updates (reference: src/inference/hmc.rs:69-71)
and moving them with single-site MH elsewhere. This module makes that
composition first-class and vectorized (SURVEY.md §7 hard part 2):

one sweep =
  1. an HMC transition on the unconstrained continuous block, conditioned on
     the current discrete values (autodiff forces; discrete enters the
     potential as data);
  2. a systematic scan of single-site MH updates over every discrete site
     (support-detected proposals from the MH engine), conditioned on the
     current continuous values.

Everything is one jit-compiled program vmapped over chains. For enumerable
discrete structure (small mixtures), prefer exact marginalization with
``factor(logsumexp(...))`` — see tests/test_smc.py's GMM — which is both
exact and faster; Gibbs covers the non-enumerable cases (counts, large
cardinality).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import settings
from ..core.rng import chain_keys
from ..runtime.staging import StagedModel, stage
from .hmc import (
    DualAveragingState,
    HMCConfig,
    dual_averaging_update,
    find_reasonable_epsilon,
    hmc_transition,
)
from .mh import make_site_proposal


@dataclass
class GibbsResult:
    samples: Dict[str, Any]  # all sites: (n_chains, n_samples, *shape)
    accept_prob_hmc: Any
    accept_rate_discrete: Any
    step_size: float
    # full inter-sweep state (the reference's all-state-in-a-value
    # discipline, hmc.rs:604-642): pass the result as ``resume=`` to
    # continue the run
    final_positions: Any = None  # (n_chains, d) unconstrained
    final_discrete: Optional[Dict[str, Any]] = None  # addr -> (n_chains, ...)


def make_gibbs_drive(
    staged: StagedModel,
    config: HMCConfig,
    n_chains: int,
    n_samples: int,
    n_warmup: int,
    *,
    discrete_scale: float = 1.0,
    chain_axis: Optional[str] = None,
):
    """Pure ``(k_init, k_eps, k_run) → arrays`` HMC-within-Gibbs program —
    the ``make_hmc_drive`` factory contract, so the one program jits on a
    chip OR runs inside ``shard_map`` with the chain batch sharded over
    ``chain_axis`` (the dual-averaging acceptance statistic and the
    initial-ε consensus reduce with ``pmean``)."""
    dt = settings.real_dtype()
    d = staged.dim
    disc_sites = staged.discrete_sites
    if d == 0:
        raise ValueError("no continuous sites; use adaptive_mcmc_chain")

    def cross_mean(x):
        m = jnp.mean(x)
        if chain_axis is not None:
            m = jax.lax.pmean(m, chain_axis)
        return m

    proposals = {s.address: make_site_proposal(s.support) for s in disc_sites}

    def potential(z, disc):
        return staged.potential(z, disc)

    def full_log_joint(z, disc):
        # one fused replay: transforms built from runtime dists (exact for
        # dependent bounds), density + Jacobian in a single model run
        return staged.log_joint_unconstrained(z, disc)

    def init_one(k):
        latents = staged.sample_prior(k)
        disc = {s.address: latents[s.address] for s in disc_sites}
        z = staged.unconstrain(latents)
        return z.astype(dt), disc

    def sweep(state, k, eps, adapt_placeholder):
        z, disc = state
        k_hmc, k_disc = jax.random.split(k)
        z_new, info = hmc_transition(
            lambda zz: potential(zz, disc), z, k_hmc, eps,
            config.n_leapfrog, jnp.ones((d,), dt), config.max_delta_energy,
        )

        lj = full_log_joint(z_new, disc)
        n_acc = jnp.zeros((), dt)
        for j, s in enumerate(disc_sites):
            kj, k_prop, k_acc = jax.random.split(
                jax.random.fold_in(k_disc, j), 3
            )
            cand, corr = proposals[s.address](
                k_prop, disc[s.address], jnp.asarray(discrete_scale, dt)
            )
            disc_prop = dict(disc)
            disc_prop[s.address] = cand
            lj_prop = full_log_joint(z_new, disc_prop)
            log_u = jnp.log(jax.random.uniform(k_acc, (), dt, 1e-38, 1.0))
            accept = log_u < (lj_prop - lj + corr)
            disc = {
                a: jnp.where(accept, disc_prop[a], disc[a]) for a in disc
            }
            lj = jnp.where(accept, lj_prop, lj)
            n_acc = n_acc + accept.astype(dt)
        acc_rate = n_acc / max(len(disc_sites), 1)
        return (z_new, disc), info.accept_prob, acc_rate

    def drive(k_init, k_eps, k_run, state_over=None, eps_over=None):
        # ``state_over``/``eps_over``: runtime (traced) resume overrides —
        # Gibbs's full inter-sweep state is (continuous positions, discrete
        # values, ε); as jit ARGUMENTS one executable serves every resumed
        # state (hmc drive convention)
        if state_over is not None:
            zs, discs = state_over
            zs = jnp.asarray(zs, dt)
        else:
            zs, discs = jax.vmap(init_one)(chain_keys(k_init, n_chains))
        if eps_over is not None:
            eps0 = jnp.asarray(eps_over, dt)
        elif config.step_size is not None:
            eps0 = jnp.asarray(config.step_size, dt)
        else:
            d0 = {a: v[0] for a, v in discs.items()}
            eps0 = find_reasonable_epsilon(
                lambda zz: potential(zz, d0), zs[0], k_eps, jnp.ones((d,), dt)
            )
            if chain_axis is not None:
                # consensus initial step size across shards
                eps0 = jnp.exp(jax.lax.pmean(jnp.log(eps0), chain_axis))
        da0 = DualAveragingState.init(eps0)

        vsweep = jax.vmap(sweep, in_axes=((0, 0), 0, None, None))

        def warm_body(carry, k):
            state, da = carry
            keys = jax.random.split(k, n_chains)
            new_state, ap, _ = vsweep(state, keys, jnp.exp(da.log_eps), None)
            da_new = dual_averaging_update(
                da, cross_mean(ap), config.target_accept
            )
            return (new_state, da_new), None

        carry = ((zs, discs), da0)
        if n_warmup > 0:
            wkeys = jax.random.split(jax.random.fold_in(k_run, 0), n_warmup)
            carry, _ = jax.lax.scan(warm_body, carry, wkeys)
        state, da_w = carry
        eps_f = jnp.exp(da_w.log_eps_bar) if n_warmup > 0 else eps0

        def sample_body(state, k):
            keys = jax.random.split(k, n_chains)
            new_state, ap, disc_acc = vsweep(state, keys, eps_f, None)
            z_new, disc_new = new_state
            cont = jax.vmap(lambda z: staged.constrain(z)[0])(z_new)
            return new_state, (cont, disc_new, ap, disc_acc)

        skeys = jax.random.split(jax.random.fold_in(k_run, 1), n_samples)
        state_f, (cont, disc, aps, dacc) = jax.lax.scan(
            sample_body, state, skeys
        )
        return cont, disc, aps, dacc, eps_f, state_f

    return drive


def gibbs_chain(
    key,
    model_fn: Optional[Callable] = None,
    n_samples: int = 1000,
    n_warmup: int = 500,
    config: HMCConfig = HMCConfig(n_leapfrog=16),
    *,
    n_chains: int = 1,
    model_args: tuple = (),
    staged: Optional[StagedModel] = None,
    discrete_scale: float = 1.0,
    resume: Optional["GibbsResult"] = None,
) -> GibbsResult:
    """Alternating HMC (continuous block) + single-site MH (discrete sites).

    ``resume``: a previous ``GibbsResult`` (or any object with
    ``final_positions`` (n_chains, d), ``final_discrete`` and
    ``step_size``) — sampling continues from the full sweep state with the
    warmed kernel (warmup skipped, ε adaptation frozen). State flows in as
    runtime arguments, so repeated resumes share one executable.

    Sharded variant: ``fugue_tpu.parallel.sharded_gibbs_chain``."""
    if staged is None:
        staged = stage(model_fn, *model_args)

    dt = settings.real_dtype()
    mode = "fresh"
    if resume is not None:
        n_warmup = 0
        q_resume = jnp.asarray(resume.final_positions, dt)
        if q_resume.shape != (n_chains, staged.dim):
            raise ValueError(
                f"resume positions {q_resume.shape} do not match "
                f"(n_chains={n_chains}, d={staged.dim})"
            )
        disc_resume = dict(resume.final_discrete or {})
        want = {s.address for s in staged.discrete_sites}
        if set(disc_resume) != want:
            raise ValueError(
                f"resume discrete sites {sorted(disc_resume)} do not match "
                f"the model's {sorted(want)}"
            )
        mode = "resume"

    def build():
        inner = make_gibbs_drive(
            staged, config, n_chains, n_samples, n_warmup,
            discrete_scale=discrete_scale,
        )
        if mode == "resume":
            return jax.jit(lambda ki, ke, kr, z0, d0, e0: inner(
                ki, ke, kr, state_over=(z0, d0), eps_over=e0))
        return jax.jit(inner)

    drive = staged.cached_kernel(
        ("gibbs", config, n_chains, n_samples, n_warmup, discrete_scale,
         mode),
        build,
    )
    k_init, k_eps, k_run = jax.random.split(jax.random.fold_in(key, 13), 3)
    if mode == "resume":
        cont, disc, aps, dacc, eps_f, state_f = drive(
            k_init, k_eps, k_run, q_resume, disc_resume,
            jnp.asarray(resume.step_size, dt),
        )
    else:
        cont, disc, aps, dacc, eps_f, state_f = drive(k_init, k_eps, k_run)
    z_f, disc_f = state_f
    samples = {a: jnp.moveaxis(v, 0, 1) for a, v in {**cont, **disc}.items()}
    return GibbsResult(
        samples=samples,
        accept_prob_hmc=jnp.mean(aps, axis=0),
        accept_rate_discrete=jnp.mean(dacc),
        step_size=float(np.asarray(eps_f)),
        final_positions=z_f,
        final_discrete=disc_f,
    )
