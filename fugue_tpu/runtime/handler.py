"""Handler protocol + the universal interpreter ``run``.

Capability parity with the reference runtime (reference:
src/runtime/handler.rs — ``Handler`` trait :29-96, trampoline ``run`` :124-209).

Design shift: the reference needs per-value-type hooks
(``on_sample_f64``/``_bool``/``_u64``/``_usize``/``_i64``) because Rust is
monomorphic; here one ``on_sample(addr, dist, sample_shape)`` covers all value
kinds via the distribution's declared dtype, and values may be arrays. The
reference's iterative trampoline (O(1) stack for 100k-site models, FG-19) is
unnecessary: models are ordinary Python control flow, and the stack depth of
``run`` is O(1) in the number of sites because sites are loop iterations, not
recursion.

``run`` executes the model under the handler and returns ``(result, trace)``
— exactly the reference signature. Under ``jax.jit`` the same ``run`` call
stages the whole execution into one XLA program.
"""

from __future__ import annotations

from typing import Any, Tuple

from ..core.model import Model, _HandlerScope
from ..runtime.trace import Trace


class Handler:
    """Effect interpreter interface (reference: handler.rs:29-96)."""

    def on_sample(self, addr: str, dist, sample_shape) -> Any:
        raise NotImplementedError

    def on_observe(self, addr: str, dist, value) -> Any:
        raise NotImplementedError

    def on_factor(self, log_weight) -> None:
        raise NotImplementedError

    def finish(self) -> Trace:
        raise NotImplementedError


def run(handler: Handler, model, *args, **kwargs) -> Tuple[Any, Trace]:
    """Execute ``model`` under ``handler`` → ``(result, trace)``.

    Reference: ``run(handler, model)`` (handler.rs:124-209). ``model`` may be
    a ``Model`` value, a zero-arg thunk, or a model function taking
    ``*args``/``**kwargs``.
    """
    with _HandlerScope(handler):
        if isinstance(model, Model):
            result = model()
        else:
            result = model(*args, **kwargs)
    trace = handler.finish()
    return result, trace
