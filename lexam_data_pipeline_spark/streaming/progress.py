"""Streaming progress telemetry (SURVEY §2.9 ST2; ref
backend/app/progress.py:17-72).

The reference keeps an in-memory progress store updated row-by-row under a
lock and derives rate = (completed+failed)/elapsed and ETA =
remaining/rate on every poll.  Spark's native signal is
``StreamingQueryListener.onQueryProgress`` per micro-batch; this module
adapts it to the reference's reporting shape (completed/failed/rate/ETA).

For the batch LLM pipeline the same shape is fed by accumulators
(:mod:`lexam_data_pipeline_spark.pipeline.progress`).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class ProgressSnapshot:
    """The reference's progress dict (progress.py:50-65)."""

    total: int
    completed: int
    failed: int
    elapsed_s: float

    @property
    def rate(self) -> float:
        done = self.completed + self.failed
        return done / self.elapsed_s if self.elapsed_s > 0 else 0.0

    @property
    def eta_s(self) -> float | None:
        remaining = self.total - self.completed - self.failed
        return remaining / self.rate if self.rate > 0 and remaining >= 0 else None


@dataclass
class StreamProgressTracker(StreamingQueryListener):
    """Collects per-micro-batch progress; thread-safe by virtue of the
    listener bus delivering events serially."""

    total: int = 0
    batches: list = field(default_factory=list)
    started_at: float = field(default_factory=time.time)
    _completed: int = 0

    def onQueryStarted(self, event) -> None:
        self.started_at = time.time()

    def onQueryProgress(self, event) -> None:
        p = event.progress
        rows = int(p.numInputRows)
        self._completed += rows
        self.batches.append(
            {
                "batch_id": int(p.batchId),
                "rows": rows,
                "input_rows_per_second": float(p.inputRowsPerSecond or 0.0),
                "processed_rows_per_second": float(p.processedRowsPerSecond or 0.0),
            }
        )

    def onQueryTerminated(self, event) -> None:
        pass

    def onQueryIdle(self, event) -> None:
        pass

    def snapshot(self) -> ProgressSnapshot:
        return ProgressSnapshot(
            total=self.total,
            completed=self._completed,
            failed=0,
            elapsed_s=time.time() - self.started_at,
        )
