"""Stage timing + metrics (≡ TicToc + the printf timing culture).

The reference peppers every stage with wall timers and soft real-time alarms
at 100 ms (``include/aloam_velodyne/tic_toc.h:10-32``,
``scanRegistration.cpp:456-458``, ``laserOdometry.cpp:665-667``). This module
keeps the same budget discipline with structured records instead of printf:
``StageTimer`` accumulates per-stage wall times, flags budget violations, and
dumps a summary dict for the metrics log.

For device-side timing remember JAX dispatch is asynchronous: wrap the timed
region so it ends with ``jax.block_until_ready`` (or use ``time_blocked``),
otherwise you measure dispatch, not compute.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from dataclasses import dataclass, field

logger = logging.getLogger("lvo_tpu")


@dataclass
class StageTimer:
    budget_ms: float = 100.0
    totals: dict = field(default_factory=lambda: defaultdict(float))
    counts: dict = field(default_factory=lambda: defaultdict(int))
    violations: dict = field(default_factory=lambda: defaultdict(int))

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = (time.perf_counter() - t0) * 1e3
            self.totals[name] += dt
            self.counts[name] += 1
            if dt > self.budget_ms:
                self.violations[name] += 1
                logger.warning("%s over %.0f ms budget: %.1f ms", name, self.budget_ms, dt)

    def time_blocked(self, name: str, fn, *args, **kw):
        """Run fn and block on its device outputs inside the timed region."""
        import jax

        with self.stage(name):
            out = fn(*args, **kw)
            jax.block_until_ready(out)
        return out

    def summary(self) -> dict:
        return {
            name: {
                "mean_ms": self.totals[name] / max(self.counts[name], 1),
                "count": self.counts[name],
                "over_budget": self.violations[name],
            }
            for name in self.totals
        }

    def report(self) -> str:
        lines = []
        for name, s in sorted(self.summary().items()):
            lines.append(
                f"{name:30s} {s['mean_ms']:8.2f} ms × {s['count']:<5d}"
                f"  over-budget: {s['over_budget']}"
            )
        return "\n".join(lines)
