"""Execution traces.

Capability parity with the reference trace layer (reference:
src/runtime/trace.rs — ``Trace``:31-43, ``Choice``:123-131,
``ChoiceValue``:167-177, ``total_log_weight``:198-200, typed getters), rebuilt
as an array-program trace: choices hold JAX arrays (possibly with leading
chain/particle batch dimensions), and the three log-weight accumulators are
JAX scalars (or batched vectors), so a whole batch of traces is ONE pytree
that jit/vmap/shard_map operate on directly.

Insertion order of choices is preserved (Python dicts are ordered); the
canonical *site order* used by staging is sorted-by-address, matching the
reference's BTreeMap ordering guarantee (FG-05).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Iterator, Optional

import jax
import jax.numpy as jnp

from ..core.distributions import Support
from ..errors import trace_address_not_found, type_mismatch

# The five reference value kinds (trace.rs:167-177: F64/Bool/U64/Usize/I64)
# map onto three array dtype families.
KIND_REAL = "real"
KIND_BOOL = "bool"
KIND_INT = "int"


def kind_of(value) -> str:
    dt = jnp.asarray(value).dtype
    if dt == jnp.bool_:
        return KIND_BOOL
    if jnp.issubdtype(dt, jnp.integer):
        return KIND_INT
    return KIND_REAL


@jax.tree_util.register_dataclass
@dataclass
class Choice:
    """One recorded random choice (reference: trace.rs:123-131).

    Invariant: under ``FUGUE_TPU_SITE_FUSION=1`` a handler may insert a
    Choice with ``log_prob=None`` and fill it in at ``finish()`` when the
    pending fusion groups flush — ``log_prob`` is only guaranteed non-None
    on traces returned from a completed handler run. Handler subclasses
    reading ``trace.choices[addr].log_prob`` mid-run must tolerate None.
    """

    value: Any
    log_prob: Any  # summed log-prob; None pre-finish under site fusion
    support: Support = field(metadata=dict(static=True), default=None)
    is_observed: bool = field(metadata=dict(static=True), default=False)

    @property
    def kind(self) -> str:
        return kind_of(self.value)


@jax.tree_util.register_dataclass
@dataclass
class Trace:
    """A complete execution record (reference: trace.rs:31-43).

    ``choices`` maps address → Choice; the three accumulators follow the
    reference's split (log_prior + log_likelihood + log_factors =
    total_log_weight, trace.rs:198-200). As a pytree, a ``Trace`` whose leaves
    carry a leading batch axis *is* a batch of traces.
    """

    choices: Dict[str, Choice] = field(default_factory=dict)
    log_prior: Any = 0.0
    log_likelihood: Any = 0.0
    log_factors: Any = 0.0

    # -- accumulator API ----------------------------------------------------

    def total_log_weight(self):
        return (
            jnp.asarray(self.log_prior)
            + jnp.asarray(self.log_likelihood)
            + jnp.asarray(self.log_factors)
        )

    # -- structural API -----------------------------------------------------

    def insert_choice(self, addr: str, choice: Choice) -> None:
        """Record a choice (reference: trace.rs:335). Duplicate detection is
        the *handler's* job (interpreters raise AddressConflict)."""
        self.choices[str(addr)] = choice

    def __contains__(self, addr) -> bool:
        return str(addr) in self.choices

    def __len__(self) -> int:
        return len(self.choices)

    def addresses(self) -> Iterator[str]:
        return iter(self.choices.keys())

    def sorted_addresses(self):
        return sorted(self.choices.keys())

    def get_choice(self, addr) -> Optional[Choice]:
        return self.choices.get(str(addr))

    # -- typed getters (Option flavor → None; Result flavor → typed error) --
    # Reference: trace.rs typed getters (get_f64 / get_bool / get_u64 / ...).

    def _get_kind(self, addr, kind: str):
        c = self.choices.get(str(addr))
        if c is None:
            return None
        if c.kind != kind:
            return None
        return c.value

    def get_real(self, addr):
        return self._get_kind(addr, KIND_REAL)

    def get_bool(self, addr):
        return self._get_kind(addr, KIND_BOOL)

    def get_int(self, addr):
        return self._get_kind(addr, KIND_INT)

    # alias matching the reference naming
    get_f64 = get_real

    def _get_kind_result(self, addr, kind: str):
        c = self.choices.get(str(addr))
        if c is None:
            raise trace_address_not_found(str(addr))
        if c.kind != kind:
            raise type_mismatch(str(addr), kind, c.kind)
        return c.value

    def get_real_result(self, addr):
        return self._get_kind_result(addr, KIND_REAL)

    def get_bool_result(self, addr):
        return self._get_kind_result(addr, KIND_BOOL)

    def get_int_result(self, addr):
        return self._get_kind_result(addr, KIND_INT)

    # -- convenience --------------------------------------------------------

    def values(self) -> Dict[str, Any]:
        """Plain address → value dict (latent + observed)."""
        return {a: c.value for a, c in self.choices.items()}

    def latents(self) -> Dict[str, Any]:
        return {
            a: c.value for a, c in self.choices.items() if not c.is_observed
        }

    def copy(self) -> "Trace":
        return Trace(
            dict(self.choices),
            self.log_prior,
            self.log_likelihood,
            self.log_factors,
        )
