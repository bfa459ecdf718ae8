"""Batch-mode equivalents of the reference's query surface, expressed
on the driver's ``events`` table (schema: event_id BIGINT, ts
TIMESTAMP, user_id BIGINT, event_type VARCHAR, value DOUBLE, props
JSON-VARCHAR).

Mapping to the reference (events.ts = utc, events.event_type = ticker,
events.value = price):

- ``candlestick_tumbling``   — flink/tumbling_window.py:179-198
  (TUMBLE + FIRST/LAST/MIN/MAX + TUMBLE_START/END).
- ``sliding_window_min``     — flink/sliding_window.py:154-183
  (Slide.over.every + min + window-end rename).
- ``projection_rename``      — flink/sliding_window.py:176-181
  (Table-API select with aliases).
- ``select_star``            — flink/tumbling_window.py:286-291
  (INSERT INTO ... SELECT *).
- ``json_ingest_projection`` — the JSON source format + implicit
  column pruning (flink/tumbling_window.py:129-130; producer emits 8
  fields, table declares 3 — datagen/stock.py:24-33).

The same operators run in true streaming mode via
``kinesis_analytics_demo_spark.streaming`` — tested for
streaming/batch equivalence in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kinesis_analytics_demo_spark.plans.registry import register
from kinesis_analytics_demo_spark.session import read_table as tbl
from kinesis_analytics_demo_spark.streaming.windows import (
    sliding_window_agg,
    sliding_window_agg_twolevel,
    tumbling_candlestick,
)


_CANDLE_ORACLE_FAST = """
SELECT
    event_type,
    date_trunc('minute', ts) AS window_start,
    date_trunc('minute', ts) + INTERVAL 1 MINUTE AS window_end,
    arg_min(value, ts) AS first_value,
    arg_max(value, ts) AS last_value,
    min(value) AS min_value,
    max(value) AS max_value
FROM events
GROUP BY 1, 2, 3
"""

_CANDLE_ORACLE_TIES = """
SELECT
    event_type,
    date_trunc('minute', ts) AS window_start,
    date_trunc('minute', ts) + INTERVAL 1 MINUTE AS window_end,
    (min({'ts': ts, 'id': event_id, 'v': value})).v AS first_value,
    (max({'ts': ts, 'id': event_id, 'v': value})).v AS last_value,
    min(value) AS min_value,
    max(value) AS max_value
FROM events
GROUP BY 1, 2, 3
"""


@register(
    "candlestick_tumbling",
    oracle=_CANDLE_ORACLE_FAST,
    doc="Tumbling-window candlestick (reference flink/tumbling_window.py:179-198): "
    "per event_type, 1-minute tumble, open/close/low/high of value. "
    "min_by/max_by fast path (HashAggregate) — (key, ts) is unique in "
    "this data at every SF, so picks are well-defined.",
)
def candlestick_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = tbl(spark, sf_dir, "events")
    return tumbling_candlestick(
        events,
        ts_col="ts",
        key_col="event_type",
        value_col="value",
        window_duration="1 minute",
    )


@register(
    "candlestick_tumbling_tiebroken",
    oracle=_CANDLE_ORACLE_TIES,
    doc="Candlestick with explicit (ts, event_id) lexicographic tie-"
    "break: deterministic even under duplicate timestamps (struct-"
    "ordered min/max — SortAggregate tradeoff documented in "
    "streaming/windows.py).",
)
def candlestick_tumbling_tiebroken(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = tbl(spark, sf_dir, "events")
    return tumbling_candlestick(
        events,
        ts_col="ts",
        key_col="event_type",
        value_col="value",
        window_duration="1 minute",
        tiebreak_cols=["event_id"],
    )


_SLIDING_ORACLE = """
SELECT event_type, min(value) AS p, window_start + INTERVAL 2 MINUTE AS t
FROM (
    SELECT date_trunc('minute', ts) AS window_start, event_type, value FROM events
    UNION ALL
    SELECT date_trunc('minute', ts) - INTERVAL 1 MINUTE AS window_start, event_type, value
    FROM events
)
GROUP BY event_type, window_start
"""


@register(
    "sliding_window_min",
    oracle=_SLIDING_ORACLE,
    doc="Sliding(hopping)-window min (reference flink/sliding_window.py:154-183): "
    "per event_type, 2min-over/1min-every (README.md:122-123 run values), "
    "projected as (key, p, t=window.end).",
)
def sliding_window_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = tbl(spark, sf_dir, "events")
    return sliding_window_agg(
        events,
        ts_col="ts",
        key_col="event_type",
        value_col="value",
        over="2 minutes",
        every="1 minute",
        agg="min",
    )


@register(
    "sliding_window_min_fluent",
    oracle=_SLIDING_ORACLE,
    doc="The SAME sliding-min query built through the fluent Table-API "
    "front-end (reference flink/sliding_window.py:167-180: "
    "Slide.over().every().on().alias() + string expression DSL) — "
    "must produce results identical to the DataFrame/SQL forms, "
    "proving the two front-ends share one plan (SURVEY.md §3.3).",
)
def sliding_window_min_fluent(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_analytics_demo_spark.plans.fluent import Slide, TableEnv

    env = TableEnv(spark)
    env.create_temporary_view("events_fluent", tbl(spark, sf_dir, "events"))
    return (
        env.from_path("events_fluent")
        .window(Slide.over("2.minutes").every("1.minutes").on("ts").alias("w"))
        .group_by("event_type, w")
        .select("event_type, value.min as p, w.end as t")
    )


def _replay_events_stream(
    spark: SparkSession, sf_dir: str, prefix: str, build_job
) -> DataFrame:
    """Replay the events table as a file micro-batch stream through
    ``build_job(stream, name)``, complete mode into a memory sink;
    returns the sink table. The staging dir (checkpoint + symlink) is
    removed once the query terminates — the returned DataFrame reads
    the in-memory sink, not the files (ADVICE r2 item 5: the mkdtemp
    dirs used to leak on every registered-query iteration)."""
    import os
    import shutil
    import tempfile
    import uuid

    from kinesis_analytics_demo_spark.sinks.factory import write_stream
    from kinesis_analytics_demo_spark.sources.factory import create_stream_source

    name = f"{prefix}_{uuid.uuid4().hex[:8]}"
    tmp = tempfile.mkdtemp(prefix=f"kads_{prefix}_")
    try:
        stage = os.path.join(tmp, "events_stream")
        os.makedirs(stage)
        # file streams take a directory; stage the single-file table
        os.symlink(
            os.path.join(sf_dir, "events.parquet"),
            os.path.join(stage, "events.parquet"),
        )
        stream = create_stream_source(
            spark, "file-parquet", path=stage, max_files_per_trigger=1000
        )
        result = build_job(stream, name)
        q = write_stream(
            result,
            "memory",
            query_name=name,
            checkpoint=os.path.join(tmp, "ck"),
            output_mode="complete",
            trigger_available_now=True,
        )
        q.awaitTermination(600)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return spark.table(name)


@register(
    "streaming_candlestick_replay",
    oracle=_CANDLE_ORACLE_FAST,
    doc="The tumbling candlestick run as a TRUE STRUCTURED-STREAMING "
    "job: the events table replayed as a file micro-batch stream "
    "through the SQL front-end, complete-output mode into a memory "
    "sink. Complete mode emits the full aggregate at stream end, so "
    "the result equals the batch candlestick exactly — giving the "
    "streaming execution path a value-checked CORRECTNESS row, not "
    "just pytest equivalence (VERDICT round-1 item 6).",
)
def streaming_candlestick_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_analytics_demo_spark.streaming.jobs import tumbling_window_job

    return _replay_events_stream(
        spark,
        sf_dir,
        "replay",
        lambda stream, name: tumbling_window_job(
            spark,
            stream,
            ts_col="ts",
            key_col="event_type",
            value_col="value",
            view_name=f"view_{name}",
        ),
    )


@register(
    "streaming_sliding_replay",
    oracle=_SLIDING_ORACLE,
    doc="The sliding(2m/1m)-min job as a true streaming replay "
    "(complete mode -> memory sink == the batch result exactly): the "
    "reference's SECOND job (flink/sliding_window.py) value-checked "
    "on the streaming execution path.",
)
def streaming_sliding_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_analytics_demo_spark.streaming.jobs import sliding_window_job

    return _replay_events_stream(
        spark,
        sf_dir,
        "sreplay",
        lambda stream, name: sliding_window_job(
            spark,
            stream,
            ts_col="ts",
            key_col="event_type",
            value_col="value",
            over="2 minutes",
            every="1 minute",
        ),
    )


@register(
    "sliding_window_min_twolevel",
    oracle=_SLIDING_ORACLE,
    doc="The SAME sliding-min via two-level hop decomposition "
    "(aggregate per 1-minute hop, then merge hop aggregates per "
    "window) — no over/every pane explosion on raw rows, both "
    "aggregations codegen'd. Must equal sliding_window_min exactly; "
    "the scale fix for the reference's 8h/1m configuration (480 "
    "panes/event otherwise).",
)
def sliding_window_min_twolevel(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = tbl(spark, sf_dir, "events")
    return sliding_window_agg_twolevel(
        events,
        ts_col="ts",
        key_col="event_type",
        value_col="value",
        over="2 minutes",
        every="1 minute",
        agg="min",
    )


@register(
    "projection_rename",
    oracle="SELECT event_type AS ticker, value AS p, ts AS t FROM events",
    doc="Projection + rename via expression DSL (reference "
    "flink/sliding_window.py:176-181).",
)
def projection_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = tbl(spark, sf_dir, "events")
    return events.select(
        F.col("event_type").alias("ticker"),
        F.col("value").alias("p"),
        F.col("ts").alias("t"),
    )


@register(
    "select_star",
    oracle="SELECT * FROM events",
    doc="Full-width SELECT * passthrough (reference "
    "flink/tumbling_window.py:286-291).",
)
def select_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tbl(spark, sf_dir, "events").select("*")


@register(
    "json_ingest_projection",
    oracle="""
    SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
    doc="JSON deserialization with schema-driven column pruning "
    "(reference flink/tumbling_window.py:129-130 'format'='json'; the "
    "producer emits more fields than the table declares, "
    "datagen/stock.py:24-33 — undeclared fields are dropped).",
)
def json_ingest_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = tbl(spark, sf_dir, "events")
    # Narrow schema: any JSON keys beyond 'k' would be silently pruned,
    # matching the reference's implicit source-side projection.
    schema = T.StructType([T.StructField("k", T.LongType())])
    return events.select(
        "event_id", F.from_json(F.col("props"), schema).getField("k").alias("k")
    )
