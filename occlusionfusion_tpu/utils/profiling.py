"""Timing / profiling harness.

Replaces the reference's scattered timing (``TimeStatistics``
``utils/time_statistics.py:4-12``, per-phase gn_print_timings spans
``model/model.py:1381-1505``, Lepard tic/toc): a phase-timer that
accounts device work correctly (``block_until_ready`` at span exits) and
a hook into ``jax.profiler`` for full TPU traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Any


class PhaseTimer:
    """Accumulating per-phase wall timer with device synchronization."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def span(self, name: str, sync: Any = None):
        """Time a phase; pass a jax array (or pytree) as ``sync`` to block
        on device completion before closing the span."""
        t0 = time.perf_counter()
        box = {}
        try:
            yield box
        finally:
            target = box.get("sync", sync)
            if target is not None:
                import jax

                jax.tree.map(
                    lambda x: x.block_until_ready()
                    if hasattr(x, "block_until_ready")
                    else x,
                    target,
                )
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> str:
        rows = []
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            total = self.totals[name]
            n = self.counts[name]
            rows.append(
                f"{name:30s} total {total * 1e3:9.1f} ms  "
                f"mean {total / n * 1e3:8.2f} ms  n={n}"
            )
        return "\n".join(rows)

    def reset(self):
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (inspect with TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
