"""Structured Streaming pipelines mirroring the reference's two Flink
jobs (tumbling candlestick, sliding min) plus their batch-mode twins.

Reference: flink/tumbling_window.py (SQL front-end) and
flink/sliding_window.py (Table API front-end).
"""

from kinesis_analytics_demo_spark.streaming.windows import (
    sliding_window_agg,
    tumbling_candlestick,
)

__all__ = ["tumbling_candlestick", "sliding_window_agg"]
