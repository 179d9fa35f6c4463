"""Profiling/tracing hooks (reference: configs/debug/profiler.yaml,
Lightning profilers + Rust Instant timing).

* ``trace(dir)`` — context manager around ``jax.profiler`` (XLA trace viewer
  compatible; open in TensorBoard or Perfetto).
* ``timed`` — wall-clock section timing with ``block_until_ready`` so device
  async dispatch doesn't hide work.
* ``StageTimer`` — per-stage reads/s counters for pipeline stages.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(trace_dir: str):
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("jax profiler trace written to %s", trace_dir)


@contextlib.contextmanager
def timed(name: str, result: object | None = None):
    """Time a section; blocks on ``result`` (a jax array/pytree) if given."""
    start = time.perf_counter()
    yield
    if result is not None:
        import jax

        jax.block_until_ready(result)
    logger.info("%s: %.3fs", name, time.perf_counter() - start)


class StageTimer:
    """Accumulates wall time + item counts per pipeline stage."""

    def __init__(self):
        self.seconds = defaultdict(float)
        self.items = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, n_items: int = 0):
        start = time.perf_counter()
        yield
        self.seconds[name] += time.perf_counter() - start
        self.items[name] += n_items

    def report(self) -> dict[str, dict[str, float]]:
        out = {}
        for name, secs in self.seconds.items():
            out[name] = {
                "seconds": round(secs, 4),
                "items": self.items[name],
                "items_per_s": round(self.items[name] / secs, 2) if secs else 0.0,
            }
        return out
