"""Dynamic (open-universe) adaptive MH for structure-varying models.

Capability parity with the reference's RJMCMC support (reference:
src/inference/mh.rs — birth/death of sites + site-count dimension term for
structure-varying models, FG-20/21 :637-744; the Reconciling score handler
:683-799). Static-shape XLA cannot express traces whose address set depends
on sampled values (SURVEY.md §7 hard part 1), so this engine runs the
reference's algorithm *eagerly* on the handler runtime: one model execution
per transition, O(#sites) cost — the same complexity class as the reference
itself. Use it for genuinely trans-dimensional models; every fixed-structure
model belongs on the staged engines (orders of magnitude faster).

Correctness notes (mirroring the reference's scheme):
- the proposal resamples ONE existing site (support-detected kernel with its
  Hastings term);
- fresh addresses appearing in the proposed execution are BIRTHED from the
  prior — their prior density cancels against the birth proposal density;
- vanished addresses die by dropping — their prior density cancels against
  the reverse birth;
- what remains is the site-count dimension term
  ln|sites_cur| − ln|sites_prop| from the uniform site-selection kernel
  (reference: mh.rs:723-733).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Callable, Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..runtime.handler import run
from ..runtime.interpreters import PriorHandler, ReconcilingScoreGivenTrace
from ..runtime.trace import Trace
from .mh import make_site_proposal


@dataclass
class DynamicMHResult:
    traces: List[Trace]
    accept_rate: float
    birth_count: int
    death_count: int

    def values(self, address: str) -> np.ndarray:
        out = []
        for t in self.traces:
            c = t.get_choice(address)
            if c is not None:
                out.append(np.asarray(c.value))
        return np.asarray(out)

    def presence(self, address: str) -> np.ndarray:
        return np.asarray([address in t for t in self.traces])


def adaptive_mcmc_chain_dynamic(
    key,
    model_fn: Callable,
    n_samples: int,
    n_warmup: int = 0,
    *,
    model_args: tuple = (),
    initial_scale: float = 0.5,
    target_accept: float = 0.44,
    thin: int = 1,
) -> DynamicMHResult:
    """Single-site random-scan MH over traces with RJMCMC reconciliation."""
    key_iter = [key]

    def next_key():
        key_iter[0], k = jax.random.split(key_iter[0])
        return k

    _, current = run(PriorHandler(next_key()), model_fn, *model_args)
    current_lw = float(np.asarray(current.total_log_weight()))

    # per-address diminishing adaptation (host dict; reference
    # DiminishingAdaptation, mcmc_utils.rs:30-175)
    log_scales: Dict[str, float] = {}
    counts: Dict[str, int] = {}

    def scale_of(addr: str) -> float:
        return math.exp(log_scales.get(addr, math.log(initial_scale)))

    def adapt(addr: str, accepted: bool, adapting: bool):
        if not adapting:
            return
        c = counts.get(addr, 0) + 1
        counts[addr] = c
        step = min(1.0, c ** -0.6)
        log_scales[addr] = log_scales.get(addr, math.log(initial_scale)) + (
            step * ((1.0 if accepted else 0.0) - target_accept)
        )

    traces: List[Trace] = []
    n_accept = 0
    births = 0
    deaths = 0
    total = n_warmup + n_samples

    latent_addrs = [
        a for a, c in current.choices.items() if not c.is_observed
    ]

    for it in range(total):
        adapting = it < n_warmup
        k_pick, k_prop, k_acc, k_rec = jax.random.split(next_key(), 4)

        n_cur = len(latent_addrs)
        pick = int(jax.random.randint(k_pick, (), 0, n_cur))
        addr = latent_addrs[pick]
        choice = current.choices[addr]

        prop_fn = make_site_proposal(choice.support)
        cand, corr = prop_fn(
            k_prop, jnp.asarray(choice.value), jnp.asarray(scale_of(addr))
        )

        # proposed base: current latents with the picked site replaced
        base = current.copy()
        base.choices = dict(current.choices)
        from ..runtime.trace import Choice

        base.choices[addr] = Choice(
            value=cand, log_prob=choice.log_prob,
            support=choice.support, is_observed=False,
        )

        handler = ReconcilingScoreGivenTrace(k_rec, base)
        _, prop_trace = run(handler, model_fn, *model_args)
        report = handler.report

        prop_lw = float(np.asarray(prop_trace.total_log_weight()))
        prop_latents = [
            a for a, c in prop_trace.choices.items() if not c.is_observed
        ]
        n_prop = len(prop_latents)

        # birth-from-prior + death-by-dropping cancel their prior terms;
        # what remains: Hastings term of the site kernel + dimension term
        log_alpha = (
            prop_lw - current_lw
            + float(np.asarray(corr))
            + math.log(n_cur) - math.log(n_prop)
        )
        # birthed sites' prior logp cancels: subtract from target side
        for a in report.birthed:
            log_alpha -= float(np.asarray(prop_trace.choices[a].log_prob))
        # vanished sites' prior logp cancels on the reverse side
        for a in report.vanished:
            log_alpha += float(np.asarray(current.choices[a].log_prob))

        u = float(jax.random.uniform(k_acc, ()))
        accepted = math.log(max(u, 1e-300)) < log_alpha
        if accepted:
            current = prop_trace
            current_lw = prop_lw
            latent_addrs = prop_latents
            n_accept += 1
            births += len(report.birthed)
            deaths += len(report.vanished)
        adapt(addr, accepted, adapting)

        if it >= n_warmup and (it - n_warmup) % thin == 0:
            traces.append(current)

    return DynamicMHResult(
        traces=traces,
        accept_rate=n_accept / max(total, 1),
        birth_count=births,
        death_count=deaths,
    )
