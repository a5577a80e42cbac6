"""Tracing/profiling utilities (new work — the reference has none,
SURVEY.md §5).

- `trace(logdir)`: capture a TPU profile viewable in TensorBoard/XProf.
- `annotate(name)`: named region visible in the trace timeline.
- `StepTimer`: lightweight wall-clock step statistics (p50/p90/mean) with
  proper device synchronization.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Profile the enclosed region: jax.profiler trace -> logdir."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region (shows up on the XProf timeline)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    def __init__(self):
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    def block_on(self, tree) -> None:
        """Synchronize on a pytree of device arrays before stopping."""
        for leaf in jax.tree.leaves(tree):
            if hasattr(leaf, "block_until_ready"):
                leaf.block_until_ready()

    def stats(self, skip_first: int = 1) -> Dict[str, float]:
        t = np.asarray(self.times[skip_first:] or self.times)
        return {"mean_s": float(t.mean()), "p50_s": float(np.percentile(t, 50)),
                "p90_s": float(np.percentile(t, 90)), "n": int(len(t))}
