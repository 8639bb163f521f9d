"""Test configuration.

Tests run on a virtual 8-device CPU mesh so chain/particle-sharding logic and
collectives are exercised without a pod (SURVEY.md §4 item 8). x64 is enabled
for statistical parity with the f64 Rust reference; the library itself is
dtype-polymorphic and runs f32 on real TPUs.

NOTE: the interpreter's sitecustomize pre-imports jax with the TPU backend
selected via JAX_PLATFORMS=axon, so we must override the *config* (not just
the env var) before any backend is initialized.
"""

import os

# Must be set before the first backend initialization.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


# -- stdlib coverage hook (scripts/coverage_tool.py) -------------------------
# PEP 669 LINE events with per-location DISABLE: a line costs one callback
# the first time it runs and nothing afterwards, so the hook works at full
# suite speed, per xdist worker. Enabled only under FUGUE_COVERAGE=1.
if os.environ.get("FUGUE_COVERAGE") == "1":  # pragma: no cover
    import atexit
    import json
    import sys

    _PKG = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "fugue_tpu")
    _HITS: dict = {}
    _MON = sys.monitoring
    _TOOL = _MON.COVERAGE_ID
    _MON.use_tool_id(_TOOL, "fugue-cov")

    def _on_line(code, line):
        fn = code.co_filename
        if fn.startswith(_PKG):
            _HITS.setdefault(fn, set()).add(line)
        return _MON.DISABLE

    _MON.register_callback(_TOOL, _MON.events.LINE, _on_line)
    _MON.set_events(_TOOL, _MON.events.LINE)

    @atexit.register
    def _dump_hits():
        out_dir = os.path.join(os.path.dirname(_PKG), ".coverage_fugue")
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, f"hits-{os.getpid()}.json")
        with open(path, "w") as f:
            json.dump({k: sorted(v) for k, v in _HITS.items()}, f)


# -- suite wall-time watchlist (VERDICT r3 weak #6) ---------------------------
# The suite crept from 682 s (r2) to 844 s (r3) at -n 2 with no monitoring.
# This prints the slowest tests at session end and WARNS (never fails — the
# 2-CPU box has high timing variance) when the per-worker wall time exceeds
# the budget, so creep is visible in every run instead of discovered when a
# timeout fires. Budget override: FUGUE_SUITE_BUDGET_S (0 disables).
import time as _time

_SESSION_T0 = _time.perf_counter()
_DURATIONS: list = []


def pytest_runtest_logreport(report):
    if report.when == "call":
        _DURATIONS.append((report.duration, report.nodeid))


def pytest_terminal_summary(terminalreporter):
    budget = float(os.environ.get("FUGUE_SUITE_BUDGET_S", 1200))
    wall = _time.perf_counter() - _SESSION_T0
    slow = sorted(_DURATIONS, reverse=True)[:10]
    if not slow:
        return
    tw = terminalreporter
    tw.section("fugue_tpu slow-test watchlist")
    for dur, nodeid in slow:
        tw.write_line(f"  {dur:7.1f}s  {nodeid}")
    if budget and wall > budget:
        tw.write_line(
            f"  WARNING: worker wall {wall:.0f}s exceeds the "
            f"{budget:.0f}s budget (FUGUE_SUITE_BUDGET_S) - trim the "
            f"watchlist above before adding more tests"
        )
