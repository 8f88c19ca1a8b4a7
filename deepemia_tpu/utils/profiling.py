"""Profiling / tracing hooks.

The reference has no profiler integration — only ad-hoc wall-clock timers
feeding the ETA store (SURVEY.md §5: inference.py:737,922,2369... and
main.py:403-531). Here both layers exist:

  * stage timers (host wall clock, hierarchical, with per-image counters) —
    the ETA-facing telemetry, queryable as a dict;
  * ``jax.profiler`` trace capture behind one context manager — produces a
    TensorBoard-loadable trace of the XLA programs when ``--profile`` is
    passed to the CLI.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

log = logging.getLogger("deepemia_tpu.profiling")


class StageTimers:
    """Accumulating named wall-clock timers (thread-compatible enough for
    the pipeline's sequential stages)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def time(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "total_s": round(self.totals[k], 4),
                "count": self.counts[k],
                "mean_s": round(self.totals[k] / max(self.counts[k], 1), 4),
            }
            for k in sorted(self.totals)
        }

    def log_summary(self, prefix: str = "profile") -> None:
        for name, s in self.summary().items():
            log.info(
                "%s: %-28s %8.3fs total / %4d calls / %7.4fs mean",
                prefix,
                name,
                s["total_s"],
                s["count"],
                s["mean_s"],
            )


@contextlib.contextmanager
def trace(trace_dir: Optional[str]) -> Iterator[None]:
    """``jax.profiler`` trace context; no-op when ``trace_dir`` is None."""
    if not trace_dir:
        yield
        return
    import jax

    path = os.path.expanduser(trace_dir)
    log.info("Capturing jax profiler trace to %s", path)
    # only guard the profiler's own setup/start/stop — a failure in the
    # traced BODY must propagate unchanged (a second yield after gen.throw
    # would mask it with a RuntimeError)
    try:
        os.makedirs(path, exist_ok=True)
        jax.profiler.start_trace(path)
        started = True
    except Exception as e:  # noqa: BLE001 - profiling must never kill a run
        log.warning("Profiler start failed (%s); continuing unprofiled", e)
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception as e:  # noqa: BLE001
                log.warning("Profiler stop failed: %s", e)
