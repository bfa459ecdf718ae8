"""Streaming observability: a StreamingQueryListener that collects
per-micro-batch metrics (input rows, processing rate, trigger
latency, state-store size) into a bounded in-memory buffer — the
engine-side hook a production deployment points at its metrics
backend (CloudWatch/Prometheus), mirroring the reference's reliance
on the managed service's Flink dashboard for the same numbers.

Spark-first: Structured Streaming already emits a full progress
object per micro-batch; the listener just taps the event bus — no
instrumentation inside operators, no overhead on the hot path, and it
observes EVERY query on the session (attach once per app).

The buffer keeps the last ``max_batches`` progress snapshots per
query (bounded memory for long-running jobs); ``summary()`` folds
them into the numbers an operator dashboard wants: total rows, mean
rows/sec, p-ish max trigger latency, and the latest state row count
(watermark health — unbounded growth here is the W5 idle-source /
state-leak smell the reference pins parallelism=1 to avoid).
"""

from __future__ import annotations

from collections import defaultdict, deque
from threading import Lock

from pyspark.sql.streaming import StreamingQueryListener


class BatchMetricsListener(StreamingQueryListener):
    """Collects per-batch progress for every streaming query."""

    def __init__(self, max_batches: int = 256):
        self._max = max_batches
        self._lock = Lock()
        self._by_query: dict[str, deque] = defaultdict(
            lambda: deque(maxlen=self._max)
        )

    # -- listener callbacks (event-bus thread) -------------------------
    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = event.progress
        snap = {
            "batch_id": p.batchId,
            "num_input_rows": p.numInputRows,
            "processed_rows_per_second": p.processedRowsPerSecond,
            "trigger_ms": (p.durationMs or {}).get("triggerExecution"),
            "state_rows": sum(
                s.numRowsTotal for s in (p.stateOperators or [])
            ),
            # late-data health: rows the watermark dropped this batch
            "late_rows_dropped": sum(
                s.numRowsDroppedByWatermark for s in (p.stateOperators or [])
            ),
        }
        with self._lock:
            self._by_query[p.name or p.id].append(snap)

    def onQueryTerminated(self, event):
        pass

    def onQueryIdle(self, event):
        pass

    # -- consumer side --------------------------------------------------
    def batches(self, query_name: str) -> list[dict]:
        with self._lock:
            return list(self._by_query.get(query_name, ()))

    def summary(self, query_name: str) -> dict:
        rows = self.batches(query_name)
        done = [r for r in rows if r["num_input_rows"] is not None]
        rates = [
            r["processed_rows_per_second"]
            for r in done
            if r["processed_rows_per_second"]
        ]
        lat = [r["trigger_ms"] for r in done if r["trigger_ms"] is not None]
        return {
            "n_batches": len(done),
            "total_input_rows": sum(r["num_input_rows"] for r in done),
            "mean_rows_per_second": (sum(rates) / len(rates)) if rates else 0.0,
            "max_trigger_ms": max(lat) if lat else None,
            "latest_state_rows": done[-1]["state_rows"] if done else 0,
            "total_late_rows_dropped": sum(
                r.get("late_rows_dropped", 0) for r in done
            ),
        }


def attach_metrics(spark, max_batches: int = 256) -> BatchMetricsListener:
    """Create, register, and return a listener for this session."""
    listener = BatchMetricsListener(max_batches=max_batches)
    spark.streams.addListener(listener)
    return listener


def detach_metrics(spark, listener: BatchMetricsListener) -> None:
    spark.streams.removeListener(listener)
