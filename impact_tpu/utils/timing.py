"""Host-side timing instrumentation.

TPU-native analog of the reference's ``TaskTimer`` label → duration aggregation
(ref: impact_profiling/src/instrumentation/timing.rs:49-66) and
``EngineMetrics`` smoothed frame durations (ref: engine/src/instrumentation.rs:15-75).
Device work is timed by blocking on the returned arrays (``block_until_ready``),
so a label measures one dispatched XLA program, the analog of one GPU pass
timestamp query (ref: impact_gpu/src/timestamp_query.rs).
"""

from __future__ import annotations

import time
from collections import defaultdict, deque
from contextlib import contextmanager

import jax


class TaskTimer:
    """Aggregates wall-clock durations by label."""

    def __init__(self):
        self._totals: dict[str, float] = defaultdict(float)
        self._counts: dict[str, int] = defaultdict(int)

    @contextmanager
    def time(self, label: str, block_on=None):
        start = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            self._totals[label] += time.perf_counter() - start
            self._counts[label] += 1

    def drain(self) -> dict[str, tuple[float, int]]:
        """Return {label: (total_seconds, count)} and reset."""
        out = {k: (self._totals[k], self._counts[k]) for k in self._totals}
        self._totals.clear()
        self._counts.clear()
        return out


class EngineMetrics:
    """Smoothed frame-duration tracking over a ring buffer of recent frames."""

    def __init__(self, window: int = 10):
        self._durations = deque(maxlen=window)
        self.last_task_execution_times: dict[str, tuple[float, int]] = {}

    def record_frame(self, duration_s: float):
        self._durations.append(duration_s)

    @property
    def current_smooth_frame_duration(self) -> float:
        if not self._durations:
            return 0.0
        return sum(self._durations) / len(self._durations)

    @property
    def fps(self) -> float:
        d = self.current_smooth_frame_duration
        return 1.0 / d if d > 0 else 0.0
