# -*- coding: utf-8 -*-
"""Tracing / profiling / numerical-safety helpers.

The reference has no tracing beyond wall-clock logging (SURVEY §5:
mcsas/mcsas.py:215,249-262,415-418).  Here:

* :func:`trace` wraps ``jax.profiler`` so a fit can be captured for
  tensorboard/xprof analysis;
* :func:`annotate` marks host-side phases inside a trace;
* :func:`debug_guards` enables jax nan-debugging for a scope — the
  functional-purity analogue of a race/sanitizer pass (the reference's
  only concurrency note is the potential activeValues race documented at
  utils/parameter.py:666-676, which keyed RNG + pure state removes by
  construction).
"""
from __future__ import annotations

import contextlib
import logging
import time

import jax

log = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(log_dir: str):
    """Captures a jax profiler trace of the enclosed scope."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("profiler trace written to %s", log_dir)


def annotate(name: str):
    """Named sub-span inside a profiler trace (usable as context)."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def debug_guards(nans: bool = True, infs: bool = False):
    """Scope with jax nan/inf debugging enabled (CI numerical sanitizer)."""
    prev_nan = jax.config.jax_debug_nans
    prev_inf = jax.config.jax_debug_infs
    jax.config.update("jax_debug_nans", nans)
    jax.config.update("jax_debug_infs", infs)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev_nan)
        jax.config.update("jax_debug_infs", prev_inf)


class Stopwatch:
    """Wall-clock phase timing with a report, the structured replacement
    for the reference's ad-hoc per-rep ETA logging (mcsas.py:249-262)."""

    def __init__(self):
        self.phases = {}
        self._current = None
        self._t0 = None

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.phases[name] = (self.phases.get(name, 0.0)
                                 + time.perf_counter() - t0)

    def report(self) -> str:
        total = sum(self.phases.values())
        lines = [f"{k:>20s}: {v:8.3f}s ({100 * v / total:4.1f}%)"
                 for k, v in sorted(self.phases.items(),
                                    key=lambda kv: -kv[1])]
        return "\n".join(lines + [f"{'total':>20s}: {total:8.3f}s"])
