"""Event-time window aggregations — the reference's core query surface.

Two operators, each usable on BOTH a batch DataFrame and a streaming
DataFrame (same Catalyst plan; streaming adds a watermark and emits in
append mode):

- ``tumbling_candlestick`` — the reference's tumbling job
  (flink/tumbling_window.py:179-198): per-key, per-tumbling-window
  ``FIRST_VALUE/LAST_VALUE/MIN/MAX`` of a price column, with window
  start/end projected (``TUMBLE_START``/``TUMBLE_END``,
  flink/tumbling_window.py:182-183).

- ``sliding_window_agg`` — the reference's sliding job
  (flink/sliding_window.py:154-183): per-key min over a hopping window
  (``Slide.over(...).every(...)``), window end projected and renamed
  (``'ticker, price.min as p, w.end as t'``).

Determinism note (deliberate tightening vs the reference): Flink's
``FIRST_VALUE``/``LAST_VALUE`` in a streaming group-agg are
arrival-order "first/last"; Spark's ``first()/last()`` are likewise
non-deterministic. We define open/close by *event time* with an
explicit tie-break column, computed as ``min(struct(ts, tiebreak,
value))`` — lexicographic struct ordering makes the result a pure
function of the data. This is fully deterministic, parallelizable
(partial aggregation / map-side combine still applies), and stays in
whole-stage codegen — no UDFs.

Scale notes:
- The aggregation shuffles once on (window, key) — unavoidable and
  optimal; partial aggregates are computed map-side before the
  exchange, so shuffle volume is O(keys x windows), not O(rows).
- Sliding windows multiply state by over/every (the reference's
  configured 8h/1m ratio = 480 panes per event —
  application_properties.json.replace:14-15). Spark's ``window()``
  explodes panes *before* the partial aggregate, so the map-side
  combine still collapses them; state is keys x windows-in-flight.
  Keep the ratio configurable and prefer coarse hops at scale.
  Observed at 480 panes/event: the generated pane-expansion code
  exceeds janino's method-size limit and Spark silently falls back to
  interpreted execution (correct, slower) — another reason to cap the
  over/every ratio in production configs.
- Idle-source watermark hazard (reference W5, flink/tumbling_window
  .py:50-60: the reference pins parallelism=1 because idle Kinesis
  consumers stall Flink's watermark): Spark computes the global
  watermark as the MIN across source partitions, so an idle shard
  stalls window emission the same way. Mitigations on Spark: keep
  source partitions fed (rate-limited test sources), or relax with
  ``spark.sql.streaming.multipleWatermarkPolicy=max`` when combining
  multiple watermarked inputs. Both halves are TESTED: tests/
  test_streaming.py::test_idle_input_watermark_stall_and_max_policy_
  mitigation proves the min-policy stall (stale union input => zero
  emission) and that policy=max emits the closed window with the
  stale input's rows merged in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ensure_event_time(df: DataFrame, ts_col: str) -> DataFrame:
    """Normalize ``ts_col`` to TIMESTAMP (with local-tz semantics).

    Structured Streaming watermarks reject TIMESTAMP_NTZ
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE), and parquet written without
    a timezone loads as NTZ. The session timezone is pinned to UTC
    (session.py), so the cast is a pure re-tag — wall-clock values are
    unchanged on any engine.
    """
    from pyspark.sql.types import TimestampNTZType

    if isinstance(df.schema[ts_col].dataType, TimestampNTZType):
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return df


def _event_ordered(value_col: str, ts_col: str, tiebreak_cols: list[str]):
    """Struct whose lexicographic min/max is the event-time first/last
    value (deterministic replacement for FIRST_VALUE/LAST_VALUE,
    reference flink/tumbling_window.py:184-185)."""
    return F.struct(
        F.col(ts_col), *[F.col(c) for c in tiebreak_cols], F.col(value_col).alias("__v")
    )


def tumbling_candlestick(
    df: DataFrame,
    ts_col: str = "utc",
    key_col: str = "ticker",
    value_col: str = "price",
    window_duration: str = "1 minute",
    watermark: str | None = None,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Per-(key, tumbling window) candlestick: open/close/low/high.

    Batch or streaming. Output columns (aliases fixed):
    ``(key_col, window_start, window_end, first_<v>, last_<v>,
    min_<v>, max_<v>)`` — matching the reference sink schema
    (flink/tumbling_window.py:151-159).

    When ``watermark`` is given (e.g. ``"20 seconds"``, the reference's
    tumbling delay, flink/tumbling_window.py:119) and ``df`` is
    streaming, late rows beyond the watermark are dropped and windows
    emit once finalized (append mode) — the Spark analog of Flink's
    on-watermark window firing.
    """
    if df.isStreaming:
        df = ensure_event_time(df, ts_col)
        if watermark is not None:
            df = df.withWatermark(ts_col, watermark)
    if tiebreak_cols:
        # Deterministic under (key, ts) ties: lexicographic struct
        # ordering. Costs a SortAggregate (struct buffers aren't
        # hash-mutable) — partial aggregation still bounds the shuffle.
        ordered = _event_ordered(value_col, ts_col, tiebreak_cols)
        first = F.min(ordered).getField("__v")
        last = F.max(ordered).getField("__v")
    else:
        # Fast path: min_by/max_by keep the aggregate in a codegen'd
        # HashAggregate (~1.7x faster at sf0.1). Picks are unique
        # whenever (key, ts) has no duplicates; pass tiebreak_cols when
        # the data can tie.
        first = F.min_by(value_col, ts_col)
        last = F.max_by(value_col, ts_col)
    return (
        df.groupBy(F.window(F.col(ts_col), window_duration), F.col(key_col))
        .agg(
            first.alias(f"first_{value_col}"),
            last.alias(f"last_{value_col}"),
            F.min(value_col).alias(f"min_{value_col}"),
            F.max(value_col).alias(f"max_{value_col}"),
        )
        .select(
            key_col,
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            f"first_{value_col}",
            f"last_{value_col}",
            f"min_{value_col}",
            f"max_{value_col}",
        )
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str = "utc",
    key_col: str = "ticker",
    value_col: str = "price",
    over: str = "2 minutes",
    every: str = "1 minute",
    watermark: str | None = None,
    agg: str = "min",
) -> DataFrame:
    """Per-key sliding(hopping)-window aggregate — the reference's
    sliding job (flink/sliding_window.py:154-183).

    Output columns mirror the reference's projection
    ``'ticker, price.min as p, eight_hour_window.end as t'``
    (flink/sliding_window.py:176-179): ``(key_col, p, t)`` where ``p``
    is the aggregate and ``t`` the window end. Default over/every is
    the README run-log configuration (2 minutes / 1 minute,
    reference README.md:122-123).
    """
    if df.isStreaming:
        df = ensure_event_time(df, ts_col)
        if watermark is not None:
            df = df.withWatermark(ts_col, watermark)
    agg_fn = getattr(F, agg)
    return (
        df.groupBy(F.window(F.col(ts_col), over, every), F.col(key_col))
        .agg(agg_fn(value_col).alias("p"))
        .select(key_col, "p", F.col("window.end").alias("t"))
    )


#: merge function per decomposable aggregate: how per-hop partials
#: combine into the full-window value.
_HOP_MERGE = {"min": "min", "max": "max", "sum": "sum", "count": "sum"}


def sliding_window_agg_twolevel(
    df: DataFrame,
    ts_col: str = "utc",
    key_col: str = "ticker",
    value_col: str = "price",
    over: str = "2 minutes",
    every: str = "1 minute",
    watermark: str | None = None,
    agg: str = "min",
) -> DataFrame:
    """``sliding_window_agg`` without the pane explosion: aggregate
    per HOP first (a tumbling window of ``every`` — one window per
    row), then merge each hop aggregate into the ``over/every``
    sliding windows it feeds.

    Why: Spark's ``window(ts, over, every)`` expands every input row
    into over/every panes BEFORE the partial aggregate. At the
    reference's configured 8h/1m ratio that is 480 output rows per
    event — 480x pre-shuffle row amplification, and the generated
    expansion code blows janino's method-size limit, silently dropping
    the stage to interpreted execution (module docstring, scale note
    2). Two-level decomposition sends each raw row into exactly ONE
    hop; the 480-way fan-out happens on hop AGGREGATES — O(keys x
    hops) rows — and both aggregations stay in codegen'd
    HashAggregates.

    Exact-equivalence argument (pinned by tests/test_twolevel.py):
    hop and window boundaries share the ``every`` grid, so a row at
    ``ts`` (hop ``h = floor(ts/every)*every``) lies in sliding window
    ``[s, s+over)`` iff the whole hop does — the window sets coincide,
    and min/max/sum/count are associative over the hop partition.
    Restricted to decomposable aggregates (``_HOP_MERGE``); avg needs
    a sum+count pair, percentiles need the full pane — use
    ``sliding_window_agg`` for those.

    Streaming: supported via chained stateful window aggregations —
    the hop aggregate watermarks on the event time, the merge phase
    re-windows ``window_time(hop_window)`` (the hop's event-time
    representative) into the over/every hopping windows. Same
    480x-state reduction as batch: per-key state is hops + emitted
    windows, not panes x rows. Verified against the single-level
    streaming job in tests/test_twolevel.py.
    """
    if agg not in _HOP_MERGE:
        raise ValueError(
            f"two-level decomposition needs a decomposable aggregate "
            f"(one of {sorted(_HOP_MERGE)}), got {agg!r}"
        )
    from kinesis_analytics_demo_spark.config import duration_millis

    over_ms, every_ms = duration_millis(over), duration_millis(every)
    if over_ms % every_ms:
        raise ValueError(
            f"over ({over}) must be a multiple of every ({every}) "
            "for hop decomposition"
        )
    n = over_ms // every_ms
    agg_fn = getattr(F, agg)
    merge_fn = getattr(F, _HOP_MERGE[agg])
    if df.isStreaming:
        df = ensure_event_time(df, ts_col)
        if watermark is not None:
            df = df.withWatermark(ts_col, watermark)
        hops = df.groupBy(F.window(F.col(ts_col), every), F.col(key_col)).agg(
            agg_fn(value_col).alias("hp")
        )
        return (
            hops.groupBy(
                F.window(F.window_time("window"), over, every), F.col(key_col)
            )
            .agg(merge_fn("hp").alias("p"))
            .select(key_col, "p", F.col("window.end").alias("t"))
        )
    hops = (
        df.groupBy(F.window(F.col(ts_col), every), F.col(key_col))
        .agg(agg_fn(value_col).alias("hp"))
        .select(F.col("window.start").alias("hop_start"), key_col, "hp")
    )
    # every hop feeds the n windows ending at hop_start + i*every,
    # i in 1..n (window starts walk back along the every-grid)
    ends = F.array(
        *[
            F.col("hop_start")
            + F.expr(f"INTERVAL {i * every_ms} MILLISECOND")
            for i in range(1, n + 1)
        ]
    )
    return (
        hops.select(key_col, "hp", F.explode(ends).alias("t"))
        .groupBy(key_col, "t")
        .agg(merge_fn("hp").alias("p"))
        .select(key_col, "p", "t")
    )


def cumulate_window_agg(
    df: DataFrame,
    ts_col: str = "utc",
    key_col: str = "ticker",
    value_col: str = "price",
    max_size: str = "1 day",
    step: str = "6 hours",
    watermark: str | None = None,
    agg: str = "sum",
) -> DataFrame:
    """CUMULATE windows — the third of Flink's windowing TVFs
    (TUMBLE / HOP / CUMULATE), the one window kind of the reference's
    engine family not yet covered by ``tumbling_candlestick`` /
    ``sliding_window_agg``.

    Semantics (Flink docs, "Windowing TVF / CUMULATE"): fix a base
    grid of width ``max_size``; within each base period ``[b, b +
    max_size)`` emit one window per ``step`` — ``[b, b+step)``,
    ``[b, b+2*step)``, …, ``[b, b+max_size)`` — an expanding prefix
    aggregate that resets at every base boundary. The classic use is
    "cumulative daily total, updated every hour".

    Spark has no native cumulate window; the BATCH path mirrors
    ``sliding_window_agg_twolevel``: aggregate per STEP first (each
    raw row lands in exactly one tumbling step window), then fan each
    step aggregate out to the cumulate windows whose prefix contains
    it — windows ending at ``b + k*step`` for ``k`` in ``i+1 .. n``,
    ``i`` the step's index inside its base period, ``n =
    max_size/step``. The fan-out multiplies O(keys x steps) aggregate
    rows, never raw rows, and both aggregations are codegen'd
    HashAggregates — the same 100-TB shape as the two-level hop.

    The STREAMING path cannot chain a second, non-window aggregation
    (Structured Streaming supports chained stateful aggs only for
    window-on-window_time), so it explodes each RAW row into its <= n
    prefix windows and aggregates once — run it in update/complete
    mode (the replay harness uses complete). At scale prefer
    streaming the per-step partials (append mode, watermark-bounded
    state) and folding the prefix downstream — exactly what the batch
    decomposition does.

    Output: ``(key_col, window_start, window_end, p)`` where
    ``window_start`` is the base-period start ``b`` and ``p`` the
    aggregate over ``[window_start, window_end)``.

    Restricted to decomposable aggregates (``_HOP_MERGE``); DECIMAL
    sums stay exact through both levels (decimal addition is
    associative), so oracle-grade determinism needs only casting the
    input.
    """
    if agg not in _HOP_MERGE:
        raise ValueError(
            f"cumulate decomposition needs a decomposable aggregate "
            f"(one of {sorted(_HOP_MERGE)}), got {agg!r}"
        )
    from kinesis_analytics_demo_spark.config import duration_millis

    size_ms, step_ms = duration_millis(max_size), duration_millis(step)
    if size_ms % step_ms:
        raise ValueError(
            f"max_size ({max_size}) must be a multiple of step ({step})"
        )
    if size_ms % 1000 or step_ms % 1000:
        raise ValueError("max_size/step must be whole seconds")
    size_s, step_s = size_ms // 1000, step_ms // 1000
    n = size_ms // step_ms
    agg_fn = getattr(F, agg)

    def _expand(rows: DataFrame, sec_col, payload_cols: list[str]) -> DataFrame:
        """Explode rows at epoch-second ``sec_col`` into their
        (window_start, window_end) prefix windows."""
        base_s = F.floor(sec_col / size_s) * size_s
        idx = F.floor((sec_col - base_s) / step_s).cast("long")
        ends = F.transform(
            F.sequence(idx + 1, F.lit(n).cast("long")),
            lambda k: F.timestamp_seconds(base_s + k * step_s),
        )
        return rows.select(
            *payload_cols,
            F.timestamp_seconds(base_s).alias("window_start"),
            F.explode(ends).alias("window_end"),
        )

    if df.isStreaming:
        df = ensure_event_time(df, ts_col)
        if watermark is not None:
            df = df.withWatermark(ts_col, watermark)
        # NTZ-safe epoch seconds (session tz pinned to UTC)
        expanded = _expand(
            df,
            F.col(ts_col).cast("timestamp").cast("long"),
            [key_col, value_col],
        )
        return expanded.groupBy(key_col, "window_start", "window_end").agg(
            agg_fn(value_col).alias("p")
        )
    steps = (
        df.groupBy(F.window(F.col(ts_col), step), F.col(key_col))
        .agg(agg_fn(value_col).alias("sp"))
        .select(F.col("window.start").alias("step_start"), key_col, "sp")
    )
    merge_fn = getattr(F, _HOP_MERGE[agg])
    # window() of an NTZ event time yields NTZ bounds — same NTZ-safe
    # epoch extraction as the streaming branch
    expanded = _expand(
        steps,
        F.col("step_start").cast("timestamp").cast("long"),
        [key_col, "sp"],
    )
    return (
        expanded.groupBy(key_col, "window_start", "window_end")
        .agg(merge_fn("sp").alias("p"))
    )
