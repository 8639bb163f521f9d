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
    welford_merge_across,
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
    if loop is not None:
        return loop
    try:
        return "chunked" if jax.devices()[0].platform == "tpu" else "while"
    except Exception:
        return "while"


def nuts_transition(
    potential_fn: Callable,
    q,
    key,
    eps,
    inv_mass,
    max_depth: int = 8,
    max_delta_energy: float = 1000.0,
    loop: str = "while",
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
        # store its (post-step) momentum and the subtree r_sum BEFORE it
        is_even = (i % 2) == 0
        slot = _popcount(i)
        rc = jnp.where(is_even, s["rc"].at[slot].set(r_new), s["rc"])
        sc = jnp.where(is_even, s["sc"].at[slot].set(s["r_sum_sub"]), s["sc"])

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

        return dict(
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

    def drive(q0, k_eps, k_run):
        if config.step_size is not None:
            eps0 = jnp.asarray(config.step_size, dt)
        else:
            eps0 = find_reasonable_epsilon(potential, q0[0], k_eps, inv_mass0)
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
                # sharded: merge shard moments first so every device adopts
                # the same mass matrix (hmc.rs:885-908 midpoint analog)
                if chain_axis is not None:
                    w1 = welford_merge_across(w1, chain_axis)
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
    init_position: Optional[Any] = None,
    init_jitter: float = 0.05,
) -> NUTSResult:
    """NUTS with the same cross-chain warmup schedule as ``hmc_chain``
    (dual averaging on the trajectory-averaged acceptance statistic; Welford
    diagonal mass with midpoint reset).

    ``init_position``: warm-start unconstrained position(s) — a ``(d,)``
    point (e.g. ``MAPResult.z``) broadcast with per-chain jitter, or an
    explicit ``(n_chains, d)`` batch (see ``hmc_chain``)."""
    if staged is None:
        staged = stage(model_fn, *model_args)
    if staged.dim == 0:
        raise ValueError("model has no continuous latent sites; use MH")

    drive = make_nuts_drive(
        staged, config, n_chains, n_samples, n_warmup,
        discrete=discrete, chain_axis=chain_axis,
    )

    from .hmc import (
        _discrete_cache_key,
        _warm_start_batch,
        constrain_positions,
        initial_positions,
    )

    if init_position is not None:
        init_q = jnp.asarray(init_position, settings.real_dtype())
        mode = ("warm", init_q.ndim, float(init_jitter))
    else:
        mode = "fresh"

    def build_full():
        if mode == "fresh":
            def full(k):
                k_init, k_eps, k_run = jax.random.split(
                    jax.random.fold_in(k, 11), 3
                )
                q0 = initial_positions(staged, k_init, n_chains, config.init)
                return drive(q0, k_eps, k_run)
        else:
            # warm start flows in as a runtime argument: repeated
            # MAP-then-NUTS calls with fresh MAPResult.z arrays reuse ONE
            # compiled executable instead of retracing per array identity
            def full(k, q_init):
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
    if mode == "fresh":
        out = full_drive(key)
    else:
        out = full_drive(key, init_q)
    q_f, qs, aps, divs, depths, eps_final, inv_mass_f = out
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
