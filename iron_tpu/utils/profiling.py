"""Profiling & numerical-debug switches.

The reference has no profiler hooks (SURVEY.md §5: icecream prints + tqdm
only).  TPU-native replacements:
  * `trace(...)` — jax.profiler trace context writing TensorBoard-viewable
    traces;
  * `timed_section` — wall-clock phase timing with block_until_ready;
  * `debug_nans` / `checkify_fn` — jax-native NaN tracking and bounds
    checking (the reference relies on clamps + bare try/except,
    renderer_ggx.py:98,134).
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view with tensorboard or xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Accumulating per-phase wall-clock timer."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def section(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        return {k: self.totals[k] / max(self.counts[k], 1) for k in self.totals}


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    old = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old)


def checkify_fn(fn):
    """Wrap fn with checkify index/NaN checks; returns (err, out) fn."""
    from jax.experimental import checkify
    return checkify.checkify(fn, errors=checkify.all_checks)
