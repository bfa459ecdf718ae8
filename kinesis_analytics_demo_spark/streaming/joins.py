"""Stream-stream joins — the streaming analog of the batch temporal
joins (operators/temporal.py).

Structured Streaming supports inner/outer stream-stream equi-joins
when BOTH sides carry watermarks and the join condition bounds how
long a row must be buffered (a time-interval constraint). State per
side is then bounded by `watermark + interval`, independent of stream
length — the property that makes this safe on an unbounded 100 TB/day
feed. Without the interval bound Spark would have to buffer both
streams forever.

The reference never joins streams (its two jobs are single-input
window aggregations), but its keyed event-time model (reference
flink/tumbling_window.py:115-121) is exactly the input shape this
operator consumes; enrichment-by-recent-context is the first query
users ask of that model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lookback: str = "10 minutes",
    watermark: str = "1 minute",
    how: str = "inner",
) -> DataFrame:
    """Join each left row to right rows of the same `on` key whose
    timestamp falls in ``[left.ts - lookback, left.ts]``.

    Right columns (other than the join key) are prefixed ``r_`` in the
    output. Both inputs get watermarks; the two-sided time bound keeps
    join state finite (eviction once the watermark passes
    ``left.ts`` / ``right.ts + lookback``).
    """
    from kinesis_analytics_demo_spark.streaming.windows import ensure_event_time

    if left.isStreaming:
        left = ensure_event_time(left, left_ts)
    if right.isStreaming:
        right = ensure_event_time(right, right_ts)
    l_wm = left.withWatermark(left_ts, watermark)
    r_cols = [c for c in right.columns if c != on]
    r_wm = right.select(
        F.col(on).alias(f"__r_{on}"),
        *[F.col(c).alias(f"r_{c}") for c in r_cols],
    ).withWatermark(f"r_{right_ts}", watermark)

    cond = (
        (F.col(on) == F.col(f"__r_{on}"))
        & (F.col(f"r_{right_ts}") <= F.col(left_ts))
        & (F.col(f"r_{right_ts}") >= F.col(left_ts) - F.expr(f"INTERVAL {lookback}"))
    )
    return l_wm.join(r_wm, cond, how).drop(f"__r_{on}")
