"""No-U-Turn Sampler: dynamic trajectory lengths without hand-tuned L.

The reference ships fixed-length HMC only; NUTS is the north-star extension
(BASELINE.json: "NUTS/HMC with dual-averaging and dense/diag mass
adaptation"). This is multinomial NUTS (progressive sampling over the
trajectory, biased toward the fresh subtree) with the ITERATIVE tree build:
XLA cannot recurse, so the balanced binary tree over 2^depth leapfrog leaves
is walked as a bounded loop with an O(max_depth) checkpoint stack for the
generalized U-turn checks.

Checkpoint discipline (derived from the balanced-tree structure):
- leaves are numbered n = 0..2^j-1 within a depth-j subtree;
- an EVEN leaf n starts new nested subtrees → push (momentum, running
  momentum-sum) at stack slot popcount(n);
- an ODD leaf n with t trailing one-bits completes t nested subtrees whose
  start checkpoints live at slots popcount(n)-t .. popcount(n)-1 → check the
  U-turn condition of each completed subtree: for subtree momentum sum s and
  boundary momenta r_a, r_b (mass-weighted), turning iff s·(M⁻¹ r_a) < 0 or
  s·(M⁻¹ r_b) < 0.

The outer loop doubles the tree in a random direction up to ``max_depth``
(reference precedent for bounded dynamic control flow: fixed 64-iteration
bisection, smc.rs:612-619; SURVEY.md §7 hard part 3), stopping on tree
U-turn, subtree U-turn, or divergence. All of it vmaps over chains: each
chain's while_loops are masked lock-step lanes in one compiled kernel.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import settings
from ..core.rng import chain_keys
from ..runtime.staging import StagedModel, stage
from .hmc import (
    DualAveragingState,
    WelfordState,
    dual_averaging_update,
    find_reasonable_epsilon,
    mass_draw_momentum,
    mass_kinetic,
    mass_velocity,
    welford_covariance,
    welford_push_batch,
    welford_variance,
)


@dataclass(frozen=True)
class NUTSConfig:
    step_size: Optional[float] = None
    max_depth: int = 8
    target_accept: float = 0.8
    adapt_step_size: bool = True
    adapt_mass: bool = True
    max_delta_energy: float = 1000.0
    init: str = "uniform"  # see HMCConfig.init
    mass: str = "diag"  # see HMCConfig.mass


def _popcount(n):
    return jax.lax.population_count(n.astype(jnp.uint32)).astype(jnp.int32)


def _trailing_ones(n):
    # number of trailing 1-bits of n = trailing zeros of ~n
    inv = (~n.astype(jnp.uint32)) & jnp.uint32(0xFFFFFFFF)
    return _count_trailing_zeros(inv)


def _count_trailing_zeros(x):
    x = x.astype(jnp.uint32)
    # ctz via popcount((x & -x) - 1)
    low = x & (jnp.uint32(0) - x)
    return jax.lax.population_count(low - jnp.uint32(1)).astype(jnp.int32)


def _uturn(r_sum, r_left, r_right, inv_mass):
    """Generalized U-turn: either end moving back toward the other."""
    v_left = mass_velocity(inv_mass, r_left)
    v_right = mass_velocity(inv_mass, r_right)
    return (jnp.dot(r_sum, v_left) < 0) | (jnp.dot(r_sum, v_right) < 0)


def nuts_transition(
    potential_fn: Callable,
    q,
    key,
    eps,
    inv_mass,
    max_depth: int = 8,
    max_delta_energy: float = 1000.0,
):
    """One NUTS transition for a single chain (vmap over chains).

    Returns (q_new, info_dict) where info carries the dual-averaging
    acceptance statistic (mean MH prob over the trajectory), tree depth,
    divergence flag, and leapfrog count.
    """
    dt = q.dtype
    d = q.shape[0]
    grad_fn = jax.grad(potential_fn)

    k_mom, k_loop = jax.random.split(key)
    r0 = mass_draw_momentum(k_mom, inv_mass, (d,), dt)
    u0 = potential_fn(q)
    h0 = u0 + mass_kinetic(inv_mass, r0)

    def leapfrog_one(z, r, g):
        r_half = r - 0.5 * eps * g
        z_new = z + eps * mass_velocity(inv_mass, r_half)
        g_new = grad_fn(z_new)
        r_new = r_half - 0.5 * eps * g_new
        return z_new, r_new, g_new

    g0 = grad_fn(q)

    # ---- outer doubling state ----
    # left/right tree boundaries: (z, r, g) each; candidate; weights
    OuterState = None  # documented tuple layout below

    init = dict(
        z_left=q, r_left=r0, g_left=g0,
        z_right=q, r_right=r0, g_right=g0,
        z_cand=q,
        log_w_tree=jnp.zeros((), dt),  # log sum exp(-(H - h0)) over leaves; root has H=h0 → 0
        r_sum=r0,
        depth=jnp.zeros((), jnp.int32),
        turning=jnp.zeros((), bool),
        diverging=jnp.zeros((), bool),
        sum_accept=jnp.zeros((), dt),  # sum of min(1, exp(h0-H)) over leaves
        n_leaves=jnp.ones((), dt),  # root counts as a leaf for accept-stat? no: start at 0
        key=k_loop,
    )
    init["n_leaves"] = jnp.zeros((), dt)
    init["sum_accept"] = jnp.zeros((), dt)

    def build_subtree(carry_key, z0, r0_, g0_, n_steps, going_right):
        """Walk n_steps = 2^depth leapfrog leaves from (z0, r0_) in the given
        direction, with progressive multinomial candidate selection and the
        checkpointed sub-U-turn checks. Bounded while_loop (n_steps is
        traced)."""
        eps_signed = jnp.where(going_right, eps, -eps)

        r_ckpts = jnp.zeros((max_depth + 1, d), dt)
        s_ckpts = jnp.zeros((max_depth + 1, d), dt)  # running r_sum BEFORE leaf

        def body(st):
            (i, z, r, g, log_w, z_c, r_sum, s_acc, n_lv, turn, div,
             rc, sc, kk) = st
            # push checkpoint at even leaf: slot popcount(i)
            is_even = (i % 2) == 0
            slot = _popcount(i)
            rc = jnp.where(is_even, rc.at[slot].set(r), rc)
            sc = jnp.where(is_even, sc.at[slot].set(r_sum), sc)

            # one leapfrog (signed step)
            r_half = r - 0.5 * eps_signed * g
            z_new = z + eps_signed * mass_velocity(inv_mass, r_half)
            g_new = grad_fn(z_new)
            r_new = r_half - 0.5 * eps_signed * g_new

            u_new = potential_fn(z_new)
            h_new = u_new + mass_kinetic(inv_mass, r_new)
            delta = h0 - h_new  # log weight of leaf relative to root
            leaf_div = (~jnp.isfinite(delta)) | (-delta > max_delta_energy)
            log_w_leaf = jnp.where(leaf_div, -jnp.inf, delta)

            # progressive multinomial candidate update
            new_log_w = jnp.logaddexp(log_w, log_w_leaf)
            kk, k_sel = jax.random.split(kk)
            take = jnp.log(
                jax.random.uniform(k_sel, (), dt, 1e-38, 1.0)
            ) < (log_w_leaf - new_log_w)
            z_c = jnp.where(take, z_new, z_c)

            # acceptance statistic — divergent/NaN leaves contribute 0, never
            # NaN (an unguarded NaN here poisons the cross-chain pmean and
            # with it the shared dual-averaging step size)
            leaf_accept = jnp.where(
                leaf_div, 0.0, jnp.minimum(1.0, jnp.exp(jnp.minimum(delta, 50.0)))
            )
            s_acc = s_acc + jnp.where(jnp.isfinite(leaf_accept), leaf_accept, 0.0)
            n_lv = n_lv + 1.0

            r_sum_new = r_sum + r_new

            # sub-U-turn checks at odd leaves — vectorized over all stack
            # slots at once (a per-slot fori_loop here made the compiled
            # program an order of magnitude larger)
            t_ones = _trailing_ones(i)
            pc = _popcount(i)
            slot_ids = jnp.arange(max_depth + 1, dtype=jnp.int32)
            in_range = (slot_ids >= pc - t_ones) & (slot_ids <= pc - 1)
            sub_sums = r_sum_new[None, :] - sc  # (slots, d)
            v_starts = jax.vmap(lambda r: mass_velocity(inv_mass, r))(rc)
            v_new = mass_velocity(inv_mass, r_new)
            bad = (jnp.sum(sub_sums * v_starts, axis=-1) < 0) | (
                sub_sums @ v_new < 0
            )
            is_odd = (i % 2) == 1
            sub_turn = is_odd & jnp.any(in_range & bad)

            turn = turn | sub_turn
            div = div | leaf_div
            return (i + 1, z_new, r_new, g_new, new_log_w, z_c, r_sum_new,
                    s_acc, n_lv, turn, div, rc, sc, kk)

        def cond(st):
            i = st[0]
            turn, div = st[9], st[10]
            return (i < n_steps) & (~turn) & (~div)

        st0 = (
            jnp.zeros((), jnp.int32), z0, r0_, g0_,
            -jnp.inf * jnp.ones((), dt),  # subtree log weight
            z0,  # candidate placeholder (replaced at first leaf w.p. 1)
            jnp.zeros((d,), dt),  # momentum sum within subtree
            jnp.zeros((), dt), jnp.zeros((), dt),
            jnp.zeros((), bool), jnp.zeros((), bool),
            r_ckpts, s_ckpts, carry_key,
        )
        (i, z_end, r_end, g_end, log_w_sub, z_c, r_sum_sub, s_acc, n_lv,
         turn, div, _, _, kk) = jax.lax.while_loop(cond, body, st0)
        return dict(
            z_end=z_end, r_end=r_end, g_end=g_end,
            log_w=log_w_sub, z_cand=z_c, r_sum=r_sum_sub,
            sum_accept=s_acc, n_leaves=n_lv,
            turning=turn, diverging=div, key=kk,
        )

    def outer_cond(s):
        return (s["depth"] < max_depth) & (~s["turning"]) & (~s["diverging"])

    def outer_body(s):
        key = s["key"]
        key, k_dir, k_bias = jax.random.split(key, 3)
        going_right = jax.random.bernoulli(k_dir, 0.5)
        n_steps = jnp.int32(1) << s["depth"]

        z0 = jnp.where(going_right, s["z_right"], s["z_left"])
        r0_ = jnp.where(going_right, s["r_right"], s["r_left"])
        g0_ = jnp.where(going_right, s["g_right"], s["g_left"])

        sub = build_subtree(key, z0, r0_, g0_, n_steps, going_right)

        # update the extending boundary
        z_left = jnp.where(going_right, s["z_left"], sub["z_end"])
        r_left = jnp.where(going_right, s["r_left"], sub["r_end"])
        g_left = jnp.where(going_right, s["g_left"], sub["g_end"])
        z_right = jnp.where(going_right, sub["z_end"], s["z_right"])
        r_right = jnp.where(going_right, sub["r_end"], s["r_right"])
        g_right = jnp.where(going_right, sub["g_end"], s["g_right"])

        ok = (~sub["turning"]) & (~sub["diverging"])

        # biased progressive sampling toward the new subtree
        accept_new = jnp.log(
            jax.random.uniform(k_bias, (), q.dtype, 1e-38, 1.0)
        ) < (sub["log_w"] - s["log_w_tree"])
        z_cand = jnp.where(ok & accept_new, sub["z_cand"], s["z_cand"])

        log_w_tree = jnp.where(
            ok, jnp.logaddexp(s["log_w_tree"], sub["log_w"]), s["log_w_tree"]
        )
        r_sum = jnp.where(ok, s["r_sum"] + sub["r_sum"], s["r_sum"])

        # whole-tree U-turn after a successful doubling
        tree_turn = ok & _uturn(r_sum, r_left, r_right, inv_mass)

        return dict(
            z_left=z_left, r_left=r_left, g_left=g_left,
            z_right=z_right, r_right=r_right, g_right=g_right,
            z_cand=z_cand,
            log_w_tree=log_w_tree,
            r_sum=r_sum,
            depth=s["depth"] + 1,
            turning=s["turning"] | sub["turning"] | tree_turn,
            diverging=s["diverging"] | sub["diverging"],
            sum_accept=s["sum_accept"] + sub["sum_accept"],
            n_leaves=s["n_leaves"] + sub["n_leaves"],
            key=sub["key"],
        )

    final = jax.lax.while_loop(outer_cond, outer_body, init)

    accept_stat = jnp.where(
        final["n_leaves"] > 0, final["sum_accept"] / final["n_leaves"], 0.0
    )
    info = dict(
        accept_prob=accept_stat,
        depth=final["depth"],
        diverging=final["diverging"],
        n_leapfrog=final["n_leaves"],
    )
    return final["z_cand"], info


@dataclass
class NUTSResult:
    samples: Dict[str, Any]
    positions: Any
    accept_prob: Any
    divergences: Any
    tree_depths: Any
    step_size: float
    inv_mass: Any
    final_positions: Any


def nuts_chain(
    key,
    model_fn: Optional[Callable] = None,
    n_samples: int = 1000,
    n_warmup: int = 1000,
    config: NUTSConfig = NUTSConfig(),
    *,
    n_chains: int = 1,
    model_args: tuple = (),
    staged: Optional[StagedModel] = None,
    discrete: Optional[Dict[str, Any]] = None,
    chain_axis: Optional[str] = None,
) -> NUTSResult:
    """NUTS with the same cross-chain warmup schedule as ``hmc_chain``
    (dual averaging on the trajectory-averaged acceptance statistic; Welford
    diagonal mass with midpoint reset)."""
    if staged is None:
        staged = stage(model_fn, *model_args)
    dt = settings.real_dtype()
    d = staged.dim
    if d == 0:
        raise ValueError("model has no continuous latent sites; use MH")

    def potential(z):
        return staged.potential(z, discrete)

    def cross_mean(x):
        if chain_axis is not None:
            return jax.lax.pmean(jnp.mean(x), chain_axis)
        return jnp.mean(x)

    dense = config.mass == "dense"
    inv_mass0 = jnp.eye(d, dtype=dt) if dense else jnp.ones((d,), dt)

    def drive(q0, k_eps, k_run):
        if config.step_size is not None:
            eps0 = jnp.asarray(config.step_size, dt)
        else:
            eps0 = find_reasonable_epsilon(potential, q0[0], k_eps, inv_mass0)
        da0 = DualAveragingState.init(eps0)

        vstep = jax.vmap(
            lambda q, k, eps, im: nuts_transition(
                potential, q, k, eps, im, config.max_depth,
                config.max_delta_energy,
            ),
            in_axes=(0, 0, None, None),
        )

        def warm_body(carry, k):
            q, da, welford, inv_mass, ema = carry
            eps = jnp.exp(da.log_eps)
            keys = jax.random.split(k, n_chains)
            q_new, info = vstep(q, keys, eps, inv_mass)
            a_mean = cross_mean(info["accept_prob"])
            da_new = dual_averaging_update(da, a_mean, config.target_accept)
            welford_new = welford_push_batch(welford, q_new)
            ema_new = 0.9 * ema + 0.1 * info["accept_prob"]
            return (q_new, da_new, welford_new, inv_mass, ema_new), None

        def rescue_stuck(q, ema, k):
            # warmup-only cross-chain rescue (see hmc.make_hmc_drive)
            donors = jax.random.categorical(
                k, jnp.log(ema + 1e-6), shape=(n_chains,)
            )
            stuck = ema < 0.1
            return jnp.where(stuck[:, None], q[donors], q)

        n_half = n_warmup // 2
        carry = (q0, da0, WelfordState.init(d, dense), inv_mass0,
                 jnp.full((n_chains,), 0.5, dt))
        if n_warmup > 0:
            keys1 = jax.random.split(jax.random.fold_in(k_run, 0), max(n_half, 1))
            carry, _ = jax.lax.scan(warm_body, carry, keys1)
            q1, da1, w1, _, ema1 = carry
            q1 = rescue_stuck(q1, ema1, jax.random.fold_in(k_run, 91))
            if config.adapt_mass:
                inv_mass1 = (welford_covariance(w1) if dense
                             else welford_variance(w1))
                da1 = DualAveragingState.init(jnp.exp(da1.log_eps_bar))
            else:
                inv_mass1 = inv_mass0
            carry = (q1, da1, WelfordState.init(d, dense), inv_mass1,
                     jnp.full((n_chains,), 0.5, dt))
            keys2 = jax.random.split(
                jax.random.fold_in(k_run, 1), max(n_warmup - n_half, 1)
            )
            carry, _ = jax.lax.scan(warm_body, carry, keys2)
            q2, da2, w2, im2, ema2 = carry
            q2 = rescue_stuck(q2, ema2, jax.random.fold_in(k_run, 92))
            carry = (q2, da2, w2, im2, ema2)

        q_w, da_w, _, inv_mass_f, _ = carry
        eps_final = (
            jnp.exp(da_w.log_eps_bar)
            if (config.adapt_step_size and n_warmup > 0)
            else jnp.exp(da_w.log_eps)
        )

        def sample_body(q, k):
            keys = jax.random.split(k, n_chains)
            q_new, info = vstep(q, keys, eps_final, inv_mass_f)
            return q_new, (q_new, info["accept_prob"], info["diverging"],
                           info["depth"])

        keys = jax.random.split(jax.random.fold_in(k_run, 2), n_samples)
        q_f, (qs, aps, divs, depths) = jax.lax.scan(sample_body, q_w, keys)
        return q_f, qs, aps, divs, depths, eps_final, inv_mass_f

    from .hmc import _discrete_cache_key, constrain_positions, initial_positions

    def build_full():
        def full(k):
            k_init, k_eps, k_run = jax.random.split(jax.random.fold_in(k, 11), 3)
            q0 = initial_positions(staged, k_init, n_chains, config.init)
            return drive(q0, k_eps, k_run)

        return jax.jit(full)

    full_drive = staged.cached_kernel(
        ("nuts_drive", config, n_chains, n_samples, n_warmup, chain_axis,
         _discrete_cache_key(discrete)),
        build_full,
    )
    q_f, qs, aps, divs, depths, eps_final, inv_mass_f = full_drive(key)
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
