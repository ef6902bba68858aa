"""Tracing / profiling / observability.

The reference has none of this (SURVEY.md §5.1: tqdm bars and stray prints
only). Here:

- ``Timer``: lightweight wall-clock scopes with a report.
- ``SolverTrace``: per-iteration records every solver can emit through its
  ``callback`` kwarg (lambda, residual, relative error, iteration time).
- ``profile()``: context manager around ``jax.profiler.trace`` for device
  traces viewable in TensorBoard/XProf.
"""
from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict


class Timer:
    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def scope(self, name):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self):
        return {
            k: {"total_s": round(v, 4), "count": self.counts[k]}
            for k, v in sorted(self.totals.items(), key=lambda kv: -kv[1])
        }


class SolverTrace:
    """Collects per-iteration solver telemetry; usable as solver callback."""

    def __init__(self, log_every=0, name="solver"):
        self.name = name
        self.log_every = log_every
        self.records = []
        self._t_last = time.perf_counter()

    def __call__(self, iteration, **fields):
        now = time.perf_counter()
        rec = {"it": iteration, "dt_s": round(now - self._t_last, 6), **fields}
        self._t_last = now
        self.records.append(rec)
        if self.log_every and iteration % self.log_every == 0:
            print(f"[{self.name}] {json.dumps(rec)}", flush=True)

    def summary(self):
        if not self.records:
            return {}
        total = sum(r["dt_s"] for r in self.records)
        return {
            "iterations": len(self.records),
            "total_s": round(total, 4),
            "mean_iter_s": round(total / len(self.records), 6),
            "last": self.records[-1],
        }


@contextlib.contextmanager
def profile(logdir="/tmp/trips_tpu_trace"):
    """Device-level trace around a region (view with TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
