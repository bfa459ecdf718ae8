"""The reference's two applications, end-to-end.

- ``tumbling_window_job`` — flink/tumbling_window.py ``main()``:
  Kinesis JSON source table -> SQL tumbling candlestick -> sink.
  Front-end: SQL text (the reference builds a SQL string,
  :164-198 — we do too, against Spark SQL's ``window()`` TVF).
- ``sliding_window_job`` — flink/sliding_window.py ``main()``:
  source -> fluent sliding-min -> sink. Front-end: DataFrame API
  (the reference uses the fluent Table API, :154-183).

Both front-ends build the same Catalyst plan — mirroring the
reference's two entry points over one Blink plan (SURVEY.md §3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kinesis_analytics_demo_spark.config import AppConfig
from kinesis_analytics_demo_spark.sinks.factory import write_stream
from kinesis_analytics_demo_spark.sources.factory import create_stream_source
from kinesis_analytics_demo_spark.streaming.windows import (
    ensure_event_time,
    sliding_window_agg,
)


def build_tumbling_candlestick_sql(
    table_name: str = "input_table",
    ts_col: str = "utc",
    key_col: str = "ticker",
    value_col: str = "price",
    window_duration: str = "1 minute",
) -> str:
    """SQL front-end for the candlestick query — the Spark analog of
    the reference's SQL string builder (flink/tumbling_window.py:
    164-198). ``min(named_struct(...))`` replaces FIRST_VALUE with a
    deterministic event-time-ordered open (SURVEY.md §2 A3/A4)."""
    return f"""
    SELECT
        {key_col},
        window.start AS window_start,
        window.end   AS window_end,
        min_by({value_col}, {ts_col}) AS first_{value_col},
        max_by({value_col}, {ts_col}) AS last_{value_col},
        min({value_col}) AS min_{value_col},
        max({value_col}) AS max_{value_col}
    FROM {table_name}
    GROUP BY window({ts_col}, '{window_duration}'), {key_col}
    """


def tumbling_window_job(
    spark: SparkSession,
    source: DataFrame,
    ts_col: str = "utc",
    key_col: str = "ticker",
    value_col: str = "price",
    window_duration: str = "1 minute",
    watermark: str = "20 seconds",
    view_name: str = "input_table",
) -> DataFrame:
    """Candlestick over a (streaming or batch) source via the SQL
    front-end. Watermark = the reference's 20s bounded out-of-orderness
    (flink/tumbling_window.py:119)."""
    if source.isStreaming:
        source = ensure_event_time(source, ts_col).withWatermark(
            ts_col, watermark
        )
    source.createOrReplaceTempView(view_name)
    return spark.sql(
        build_tumbling_candlestick_sql(
            view_name, ts_col, key_col, value_col, window_duration
        )
    )


def sliding_window_job(
    spark: SparkSession,
    source: DataFrame,
    cfg: AppConfig | None = None,
    ts_col: str | None = None,
    key_col: str = "ticker",
    value_col: str = "price",
    over: str | None = None,
    every: str | None = None,
    watermark: str = "5 seconds",
) -> DataFrame:
    """Sliding-min over a (streaming or batch) source via the fluent
    front-end, parameterized the reference's way (config keys
    flink.sliding_window.over/every/on — application_properties
    .json.replace:14-17). Watermark = the reference's 5s
    (flink/sliding_window.py:119)."""
    if cfg is not None:
        ts_col = ts_col or cfg.window_on
        over = over or cfg.window_over
        every = every or cfg.window_every
    ts_col = ts_col or "utc"
    over = over or "2 minutes"
    every = every or "1 minute"
    return sliding_window_agg(
        source,
        ts_col=ts_col,
        key_col=key_col,
        value_col=value_col,
        over=over,
        every=every,
        watermark=watermark if source.isStreaming else None,
        agg="min",
    )


def run_reference_pipeline(
    spark: SparkSession,
    job: str,
    source_kind: str,
    sink_kind: str,
    cfg: AppConfig | None = None,
    source_path: str | None = None,
    query_name: str = "kads",
    checkpoint: str | None = None,
    trigger_available_now: bool = False,
    source_options: dict | None = None,
    foreach_batch=None,
):
    """Config-driven wiring: source factory -> window job -> sink
    factory — the whole of the reference's ``main()`` in one call
    (flink/tumbling_window.py:226-296)."""
    source = create_stream_source(
        spark, source_kind, path=source_path, options=source_options
    )
    if job == "tumbling":
        result = tumbling_window_job(spark, source)
    elif job == "sliding":
        result = sliding_window_job(spark, source, cfg=cfg)
    else:
        raise ValueError(f"unknown job: {job!r}")
    return write_stream(
        result,
        sink_kind,
        query_name=query_name,
        checkpoint=checkpoint,
        trigger_available_now=trigger_available_now,
        foreach_batch=foreach_batch,
    )
