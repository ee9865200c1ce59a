"""Progress telemetry (SURVEY §2.9 ST2; ref backend/app/progress.py).

The reference polls an in-memory store updated row-by-row under a lock;
the Spark analog is a pair of accumulators updated inside the LLM map
stage — executors increment, the driver derives rate/ETA with the same
math as the reference (`progress.py:50-55`: rate = done/elapsed,
eta = remaining/rate).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

from pyspark import SparkContext


@dataclass
class JobProgress:
    key: str
    total: int
    completed_acc: Any
    failed_acc: Any
    started_at: float = field(default_factory=time.time)
    finished_at: float | None = None
    error: str | None = None

    def snapshot(self) -> dict:
        completed = int(self.completed_acc.value)
        failed = int(self.failed_acc.value)
        done = completed + failed
        elapsed = (self.finished_at or time.time()) - self.started_at
        rate = done / elapsed if elapsed > 0 else 0.0
        remaining = max(self.total - done, 0)
        eta = remaining / rate if rate > 0 else None
        return {
            "key": self.key,
            "total": self.total,
            "completed": completed,
            "failed": failed,
            "elapsed_seconds": round(elapsed, 3),
            "rate_per_second": round(rate, 4),
            "eta_seconds": round(eta, 3) if eta is not None else None,
            "running": self.finished_at is None,
            "error": self.error,
        }

    def finish(self, error: str | None = None) -> None:
        self.finished_at = time.time()
        self.error = error


class ProgressStore:
    """Driver-side registry of job progress (one per generate/judge run)."""

    def __init__(self, sc: SparkContext):
        self._sc = sc
        self._jobs: dict[str, JobProgress] = {}

    def create(self, key: str, total: int) -> JobProgress:
        job = JobProgress(
            key=key,
            total=total,
            completed_acc=self._sc.accumulator(0),
            failed_acc=self._sc.accumulator(0),
        )
        self._jobs[key] = job
        return job

    def get(self, key: str) -> JobProgress | None:
        return self._jobs.get(key)

    def snapshot(self, key: str) -> dict | None:
        job = self._jobs.get(key)
        return job.snapshot() if job else None
