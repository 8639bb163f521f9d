"""Custom handlers via the decorator pattern.

Reference: examples/custom_handlers.rs:113,217,422 — LoggingHandler,
StatisticsHandler, PerformanceHandler wrap an inner handler and observe the
effect stream. The same pattern works here: a handler that delegates to an
inner handler adds cross-cutting behavior without touching the model.
"""

import time

import jax
import numpy as np

import fugue_tpu as ft


class LoggingHandler(ft.Handler):
    """Print every effect as it happens (reference: custom_handlers.rs:113)."""

    def __init__(self, inner: ft.Handler):
        self.inner = inner

    def on_sample(self, addr, dist, sample_shape):
        value = self.inner.on_sample(addr, dist, sample_shape)
        print(f"  sample  {addr:<12} ~ {type(dist).__name__:<12} -> {np.asarray(value)!s:.40}")
        return value

    def on_observe(self, addr, dist, value):
        print(f"  observe {addr:<12} ~ {type(dist).__name__}")
        return self.inner.on_observe(addr, dist, value)

    def on_factor(self, log_weight):
        print(f"  factor  {np.asarray(log_weight)}")
        self.inner.on_factor(log_weight)

    def finish(self):
        return self.inner.finish()


class StatisticsHandler(ft.Handler):
    """Count effects by kind (reference: custom_handlers.rs:217)."""

    def __init__(self, inner: ft.Handler):
        self.inner = inner
        self.counts = {"sample": 0, "observe": 0, "factor": 0}

    def on_sample(self, addr, dist, sample_shape):
        self.counts["sample"] += 1
        return self.inner.on_sample(addr, dist, sample_shape)

    def on_observe(self, addr, dist, value):
        self.counts["observe"] += 1
        return self.inner.on_observe(addr, dist, value)

    def on_factor(self, log_weight):
        self.counts["factor"] += 1
        self.inner.on_factor(log_weight)

    def finish(self):
        return self.inner.finish()


class PerformanceHandler(ft.Handler):
    """Wall-clock per effect kind (reference: custom_handlers.rs:422).
    Only meaningful for eager (non-jit) execution — under jit the handler
    runs once at trace time."""

    def __init__(self, inner: ft.Handler):
        self.inner = inner
        self.elapsed = 0.0

    def _timed(self, f, *a):
        t0 = time.perf_counter()
        out = f(*a)
        self.elapsed += time.perf_counter() - t0
        return out

    def on_sample(self, addr, dist, sample_shape):
        return self._timed(self.inner.on_sample, addr, dist, sample_shape)

    def on_observe(self, addr, dist, value):
        return self._timed(self.inner.on_observe, addr, dist, value)

    def on_factor(self, log_weight):
        self._timed(self.inner.on_factor, log_weight)

    def finish(self):
        return self.inner.finish()


def model():
    import jax.numpy as jnp

    mu = ft.sample("mu", ft.Normal(0.0, 1.0))
    sigma = ft.sample("sigma", ft.LogNormal(0.0, 0.5))
    ft.observe("y", ft.Normal(mu, sigma), jnp.array([0.5, 0.7]))
    ft.factor(-0.1)
    return mu


def main():
    print("logging run:")
    inner = ft.PriorHandler(jax.random.PRNGKey(0))
    stats = StatisticsHandler(LoggingHandler(inner))
    _, trace = ft.run(stats, model)
    assert stats.counts == {"sample": 2, "observe": 1, "factor": 1}
    assert len(trace) == 3
    print(f"effect counts: {stats.counts} -- OK")


if __name__ == "__main__":
    main()
