"""Profiling / tracing — a first-class upgrade over the reference, which
only ships the ``eval_time`` wall-clock decorator (reference
``utils/utils.py:153-165``; SURVEY.md §5.1 calls for ``jax.profiler`` traces
+ per-stage timing in the TPU build).

``trace(logdir)`` wraps ``jax.profiler.trace`` (view in TensorBoard or
xprof). ``StageTimer`` accumulates named wall-clock stages and emits them as
metrics rows (host-side; device work is async so pair it with
``block_until_ready`` at stage ends for true device time).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def trace(logdir: Optional[str]) -> Iterator[None]:
    """Capture a jax profiler trace under ``logdir`` (no-op when None)."""
    if not logdir:
        yield
        return
    import jax

    with jax.profiler.trace(logdir):
        yield


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in the profiler timeline (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class StageTimer:
    """Accumulate wall-clock per named stage; ``metrics()`` returns
    ``profile/{stage}_s`` rows suitable for the CSV logger."""

    def __init__(self) -> None:
        self._acc: Dict[str, float] = defaultdict(float)
        self._count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._acc[name] += time.perf_counter() - t0
            self._count[name] += 1

    def metrics(self, reset: bool = True) -> Dict[str, float]:
        out = {f"profile/{k}_s": v for k, v in self._acc.items()}
        out.update(
            {f"profile/{k}_mean_s": self._acc[k] / max(1, self._count[k])
             for k in self._acc}
        )
        if reset:
            self._acc.clear()
            self._count.clear()
        return out
