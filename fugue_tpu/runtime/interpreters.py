"""The concrete handler zoo.

Capability parity with the reference interpreters (reference:
src/runtime/interpreters.rs — PriorHandler:355-372, ReplayHandler:408-427,
ScoreGivenTrace:461-478 (fresh-logp semantics, FG-48),
SafeReplayHandler/SafeScoreGivenTrace:514-589, StrictScoreGivenTrace:606-679,
ReconcilingScoreGivenTrace:683-799, duplicate-address detection:23-45 FG-47).

All structural decisions (address present? dtype matches? duplicate?) happen
at Python trace time, so they work identically outside and inside ``jit``;
only *values* are traced arrays. "Safe" variants degrade mismatches to
``-inf`` log-weight plus a warning instead of raising — the compiled-code
analog of the reference's recoverable handlers.

Keys: handlers that draw randomness derive a per-site key via
``fold_in(run_key, crc32(address))`` (core/rng.py), giving order- and
layout-independent reproducibility.
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass, field
from typing import Any, Dict, List, Set

import jax
import jax.numpy as jnp

from ..core.rng import site_key
from ..errors import (
    address_conflict,
    trace_address_not_found,
    type_mismatch,
    unexpected_structure,
)
from .handler import Handler
from .trace import Choice, Trace


def _accum_sum(log_prob):
    """Per-site log-prob reduction under the plate accumulation policy:
    plain XLA reduce below settings.COMPENSATED_SUM_THRESHOLD, blocked-Kahan
    compensated summation for huge plates (SURVEY.md §7 hard part 5)."""
    from .. import settings
    from ..core.numerics import compensated_sum

    if jnp.ndim(log_prob) and jnp.size(log_prob) >= settings.compensated_sum_threshold():
        return compensated_sum(log_prob)
    return jnp.sum(log_prob)


def _dist_kind(dist) -> str:
    if dist.support.kind == "boolean":
        return "bool"
    if dist.support.is_discrete:
        return "int"
    return "real"


class _RecordingHandler(Handler):
    """Shared bookkeeping: accumulator trace + duplicate detection (FG-47)."""

    def __init__(self):
        self.trace = Trace()
        self._seen: Set[str] = set()

    def _check_duplicate(self, addr: str) -> None:
        if addr in self._seen:
            raise address_conflict(addr)
        self._seen.add(addr)

    def _record(self, addr, value, log_prob, support, observed):
        lp_sum = _accum_sum(log_prob)
        self.trace.insert_choice(
            addr, Choice(value=value, log_prob=lp_sum, support=support, is_observed=observed)
        )
        return lp_sum

    def on_observe(self, addr, dist, value):
        self._check_duplicate(addr)
        lp = self._record(addr, value, dist.log_prob(value), dist.support, True)
        self.trace.log_likelihood = self.trace.log_likelihood + lp
        return value

    def on_factor(self, log_weight):
        self.trace.log_factors = self.trace.log_factors + _accum_sum(log_weight)

    def finish(self) -> Trace:
        return self.trace


class PriorHandler(_RecordingHandler):
    """Sample fresh from the prior, score, record.

    Reference: interpreters.rs:355-372.
    """

    def __init__(self, key):
        super().__init__()
        self.key = key

    def on_sample(self, addr, dist, sample_shape):
        self._check_duplicate(addr)
        value = dist.sample(site_key(self.key, addr), sample_shape)
        lp = self._record(addr, value, dist.log_prob(value), dist.support, False)
        self.trace.log_prior = self.trace.log_prior + lp
        return value


class ReplayHandler(_RecordingHandler):
    """Reuse values from a base trace where present, else sample fresh;
    re-score everything under the current model's parameters.

    Reference: interpreters.rs:408-427.
    """

    def __init__(self, key, base: Trace):
        super().__init__()
        self.key = key
        self.base = base

    def _base_value(self, addr, dist):
        c = self.base.get_choice(addr)
        if c is None:
            return None
        if c.kind != _dist_kind(dist):
            raise type_mismatch(addr, _dist_kind(dist), c.kind)
        return c.value

    def on_sample(self, addr, dist, sample_shape):
        self._check_duplicate(addr)
        value = self._base_value(addr, dist)
        if value is None:
            value = dist.sample(site_key(self.key, addr), sample_shape)
        lp = self._record(addr, value, dist.log_prob(value), dist.support, False)
        self.trace.log_prior = self.trace.log_prior + lp
        return value


class ValuesHandler(_RecordingHandler):
    """Replay from a plain ``{address: value}`` dict (no Choice wrappers).

    This is the staging workhorse: ``log_density(positions)`` replays the
    model with latent values substituted from a flat dict — the array-program
    collapse of the reference's Replay/Score handlers (SURVEY.md §7).
    Missing addresses raise (strict) — staged models have a fixed site set.
    """

    def __init__(self, values: Dict[str, Any]):
        super().__init__()
        self.values = values

    def on_sample(self, addr, dist, sample_shape):
        self._check_duplicate(addr)
        if addr not in self.values:
            raise trace_address_not_found(addr)
        value = self.values[addr]
        lp = self._record(addr, value, dist.log_prob(value), dist.support, False)
        self.trace.log_prior = self.trace.log_prior + lp
        return value


class ConstrainHandler(_RecordingHandler):
    """Replay with continuous latents given in UNCONSTRAINED space.

    Each continuous sample site's z-array maps through the transform built
    from the RUNTIME distribution instance (``unconstraining_transform``),
    so supports that depend on traced parameters — ``Uniform(0, a)`` with
    ``a`` an earlier site — use the CURRENT bounds and the exact Jacobian,
    never values baked at staging discovery (VERDICT r1 item 6). The summed
    log|J| accumulates on ``self.logdet``; the trace records constrained
    values as usual, so one run yields density parts AND constrained
    latents."""

    def __init__(self, z_values: Dict[str, Any], other_values: Dict[str, Any]):
        super().__init__()
        self.z_values = z_values
        self.other_values = other_values
        self.logdet = 0.0

    def on_sample(self, addr, dist, sample_shape):
        self._check_duplicate(addr)
        if addr in self.z_values:
            t = dist.unconstraining_transform()
            z = self.z_values[addr]
            value = t.forward(z)
            self.logdet = self.logdet + jnp.sum(t.log_det_jacobian(z))
        elif addr in self.other_values:
            value = self.other_values[addr]
        else:
            raise trace_address_not_found(addr)
        lp = self._record(addr, value, dist.log_prob(value), dist.support, False)
        self.trace.log_prior = self.trace.log_prior + lp
        return value


class UnconstrainHandler(ValuesHandler):
    """Replay with CONSTRAINED latents, collecting each continuous site's
    inverse image under the runtime transform (the exact inverse of
    ``ConstrainHandler``, including dependent bounds)."""

    def __init__(self, values: Dict[str, Any]):
        super().__init__(values)
        self.z_out: Dict[str, Any] = {}

    def on_sample(self, addr, dist, sample_shape):
        value = super().on_sample(addr, dist, sample_shape)
        if dist.support.is_continuous:
            from .. import settings

            t = dist.unconstraining_transform()
            self.z_out[addr] = t.inverse(
                jnp.asarray(value, settings.real_dtype())
            )
        return value


class PartialValuesHandler(_RecordingHandler):
    """Replay from a plain value dict where present, sample fresh otherwise
    — the dict-based analog of ReplayHandler (used by ABC-SMC to pin
    parameter sites while redrawing simulator noise sites)."""

    def __init__(self, key, values: Dict[str, Any]):
        super().__init__()
        self.key = key
        self.values = values

    def on_sample(self, addr, dist, sample_shape):
        self._check_duplicate(addr)
        if addr in self.values:
            value = self.values[addr]
        else:
            value = dist.sample(site_key(self.key, addr), sample_shape)
        lp = self._record(addr, value, dist.log_prob(value), dist.support, False)
        self.trace.log_prior = self.trace.log_prior + lp
        return value


class PredictiveHandler(PartialValuesHandler):
    """Posterior/prior predictive execution: latent sites replay from a
    value dict (sampling fresh where absent, like PartialValuesHandler);
    ``observe`` sites DRAW a fresh value from the observation distribution
    instead of scoring the dataset — the recorded choice is the predictive
    draw.

    Reference capability: predictive simulation is done there by composing
    ReplayHandler over a posterior trace with a model whose observations are
    rewritten as samples (docs how-to); here it is a first-class handler so
    one model definition serves both inference and prediction.
    """

    def on_observe(self, addr, dist, value):
        self._check_duplicate(addr)
        batch = dist._batch_shape()
        vshape = jnp.shape(value)
        lead = vshape[: len(vshape) - len(batch)] if len(batch) else vshape
        draw = dist.sample(site_key(self.key, addr), lead)
        lp = self._record(addr, draw, dist.log_prob(draw), dist.support, True)
        self.trace.log_likelihood = self.trace.log_likelihood + lp
        return draw


class ScoreGivenTrace(_RecordingHandler):
    """Score a model against a fixed trace: no sampling; every latent must
    exist in the base trace; fresh log-probs are stored (FG-48).

    Reference: interpreters.rs:461-478 (panics on missing address — here a
    typed ``TraceAccessError`` raised at trace time).
    """

    def __init__(self, base: Trace):
        super().__init__()
        self.base = base

    def on_sample(self, addr, dist, sample_shape):
        self._check_duplicate(addr)
        c = self.base.get_choice(addr)
        if c is None:
            raise trace_address_not_found(addr)
        if c.kind != _dist_kind(dist):
            raise type_mismatch(addr, _dist_kind(dist), c.kind)
        value = c.value
        lp = self._record(addr, value, dist.log_prob(value), dist.support, False)
        self.trace.log_prior = self.trace.log_prior + lp
        return value


class SafeScoreGivenTrace(_RecordingHandler):
    """Like ScoreGivenTrace but degrades structure mismatches to a warning +
    ``-inf`` total weight instead of raising.

    Reference: interpreters.rs:514-589. A placeholder prior draw (from a fixed
    key) keeps the model executable past the mismatch; the -inf factor makes
    the trace's weight unusable, which is the point.
    """

    def __init__(self, base: Trace, warn: bool = True):
        super().__init__()
        self.base = base
        self.warn = warn
        self._poisoned = False

    def _poison(self, msg: str):
        if self.warn:
            warnings.warn(f"SafeScoreGivenTrace: {msg}; trace weight set to -inf")
        if not self._poisoned:
            self.trace.log_factors = self.trace.log_factors + (-jnp.inf)
            self._poisoned = True

    def on_sample(self, addr, dist, sample_shape):
        self._check_duplicate(addr)
        c = self.base.get_choice(addr)
        if c is None or c.kind != _dist_kind(dist):
            self._poison(
                f"missing address {addr!r}" if c is None
                else f"type mismatch at {addr!r}"
            )
            value = dist.sample(site_key(jax.random.PRNGKey(0), addr), sample_shape)
        else:
            value = c.value
        lp = self._record(addr, value, dist.log_prob(value), dist.support, False)
        self.trace.log_prior = self.trace.log_prior + lp
        return value


class SafeReplayHandler(ReplayHandler):
    """Replay that recovers from type mismatches by sampling fresh + warning.

    Reference: interpreters.rs:514-589.
    """

    def _base_value(self, addr, dist):
        c = self.base.get_choice(addr)
        if c is None:
            return None
        if c.kind != _dist_kind(dist):
            warnings.warn(
                f"SafeReplayHandler: type mismatch at {addr!r} "
                f"(trace has {c.kind}, model wants {_dist_kind(dist)}); resampling"
            )
            return None
        return c.value


class StrictScoreGivenTrace(ScoreGivenTrace):
    """ScoreGivenTrace that requires EXACT structure agreement: every model
    address must be in the trace (fresh address → typed
    ``UnexpectedModelStructure``) and every trace latent must be visited.

    Reference: interpreters.rs:606-679.
    """

    def on_sample(self, addr, dist, sample_shape):
        if self.base.get_choice(addr) is None:
            raise unexpected_structure(
                f"model sampled fresh address {addr!r} not present in trace",
                address=addr,
            )
        return super().on_sample(addr, dist, sample_shape)

    def finish(self) -> Trace:
        visited = set(self.trace.choices.keys())
        base_latents = {
            a for a, c in self.base.choices.items() if not c.is_observed
        }
        vanished = base_latents - visited
        if vanished:
            raise unexpected_structure(
                "model did not visit all trace addresses",
                vanished=sorted(vanished),
            )
        return self.trace


@dataclass
class ReconcileReport:
    """Structure-mismatch report (reference: interpreters.rs:683-799)."""

    birthed: List[str] = field(default_factory=list)
    vanished: List[str] = field(default_factory=list)

    @property
    def clean(self) -> bool:
        return not self.birthed and not self.vanished


class ReconcilingScoreGivenTrace(_RecordingHandler):
    """RJMCMC-flavored scoring: fresh addresses are birthed from the prior,
    vanished addresses are reported — supporting structure-varying proposals.

    Reference: interpreters.rs:683-799 (``score_given_trace_reconciled``).
    """

    def __init__(self, key, base: Trace):
        super().__init__()
        self.key = key
        self.base = base
        self.report = ReconcileReport()

    def on_sample(self, addr, dist, sample_shape):
        self._check_duplicate(addr)
        c = self.base.get_choice(addr)
        if c is not None and c.kind == _dist_kind(dist):
            value = c.value
        else:
            value = dist.sample(site_key(self.key, addr), sample_shape)
            self.report.birthed.append(addr)
        lp = self._record(addr, value, dist.log_prob(value), dist.support, False)
        self.trace.log_prior = self.trace.log_prior + lp
        return value

    def finish(self) -> Trace:
        visited = set(self.trace.choices.keys())
        for a, c in self.base.choices.items():
            if not c.is_observed and a not in visited:
                self.report.vanished.append(a)
        return self.trace


# ---------------------------------------------------------------------------
# Convenience entry points matching the reference free functions
# ---------------------------------------------------------------------------


def score_given_trace(model, base: Trace, *args, **kwargs):
    from .handler import run

    return run(ScoreGivenTrace(base), model, *args, **kwargs)


def score_given_trace_safe(model, base: Trace, *args, **kwargs):
    from .handler import run

    return run(SafeScoreGivenTrace(base), model, *args, **kwargs)


def score_given_trace_strict(model, base: Trace, *args, **kwargs):
    """Reference: interpreters.rs:606-679."""
    from .handler import run

    return run(StrictScoreGivenTrace(base), model, *args, **kwargs)


def score_given_trace_reconciled(key, model, base: Trace, *args, **kwargs):
    """Reference: interpreters.rs:683-799. Returns (result, trace, report)."""
    from .handler import run

    handler = ReconcilingScoreGivenTrace(key, base)
    result, trace = run(handler, model, *args, **kwargs)
    return result, trace, handler.report
