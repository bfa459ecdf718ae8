"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference Kinesis Analytics demo
(jeff1evesque/kinesis-analytics-demo), re-expressed Spark-first.

The reference is a PyFlink 1.13 streaming app (tumbling-window
candlestick + sliding-window min over a Kinesis JSON stream). This
package provides:

- ``session``     — SparkSession factory tuned for the target scale
                    (AQE on, UTC, Arrow-enabled).
- ``config``      — property-group JSON configuration loader matching
                    the reference's ``application_properties.json``
                    shape (reference flink/tumbling_window.py:62-94).
- ``sources``     — source factories: file/parquet, rate, socket,
                    kafka, kinesis (config-selected; reference
                    flink/tumbling_window.py:96-138).
- ``sinks``       — sink factories: console, noop (blackhole), memory,
                    partitioned files, kinesis-via-foreachBatch
                    (reference flink/tumbling_window.py:141-161,248-256).
- ``streaming``   — the reference's two jobs as Structured Streaming
                    pipelines: tumbling candlestick and sliding min,
                    plus their batch-mode equivalents.
- ``operators``   — the extended batch relational surface (TPC-H-ish
                    analytics) and LLM-data-pipeline operators
                    (dedup, similarity search, text analysis,
                    multimodal plumbing).
- ``functions``   — reusable column expressions (hashing, shingling,
                    vector math, text quality).
"""

from kinesis_analytics_demo_spark.session import get_spark, load_tables

__all__ = ["get_spark", "load_tables"]
