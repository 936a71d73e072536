"""
Tracing / profiling: per-stage wall timers and jax.profiler hooks.

The reference has no in-product timing (SURVEY §5 — operational `date`
stamps around SLURM runs only).  Here every pipeline stage records into a
process-global StageTimer; `report()` prints a table and `save()` emits
JSON next to the cohort outputs.  `deviceTrace()` wraps jax.profiler for
TensorBoard-compatible device traces.
"""
from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Iterator

from .utils import logger


class StageTimer:
    def __init__(self) -> None:
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.time()
        try:
            yield
        finally:
            dt = time.time() - t0
            self.totals[name] += dt
            self.counts[name] += 1
            logger.debug(f"[Trace] {name}: {dt:.3f}s")

    def report(self) -> str:
        lines = [f"{'stage':<32} {'calls':>6} {'total_s':>10} {'mean_s':>10}"]
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            t, c = self.totals[name], self.counts[name]
            lines.append(f"{name:<32} {c:>6} {t:>10.3f} {t / c:>10.3f}")
        return "\n".join(lines)

    def save(self, filename: str) -> None:
        with open(filename, "w") as f:
            json.dump(
                {
                    name: {"total_s": self.totals[name], "calls": self.counts[name]}
                    for name in self.totals
                },
                f,
                indent=2,
            )

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()


TIMER = StageTimer()


@contextlib.contextmanager
def deviceTrace(log_dir: str) -> Iterator[None]:
    """TensorBoard device trace around a block (no-op if profiler fails,
    e.g. on tunneled backends)."""
    import jax

    started = False
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:  # pragma: no cover
        logger.warning(f"[Trace] jax profiler unavailable: {e}")
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
                logger.info(f"[Trace] device trace written to {log_dir}")
            except Exception:
                pass
