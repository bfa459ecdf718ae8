"""Temporal join operators: as-of join and range (interval) join.

Neither exists as a built-in Spark join type; both are staples of the
event-analytics surface the reference's streaming jobs serve (keyed
event-time processing over the stock-tick stream, reference
flink/tumbling_window.py:115-121). Implemented here as compositions
of shuffles Spark already optimizes well:

- **As-of join** (most recent left-ward match per key): the naive
  formulation is an inequality join — a cross product per key, O(n*m)
  and un-shuffleable. Instead we UNION both sides with a side marker
  and take ``last(value, ignorenulls=True)`` over a per-key window
  ordered by (ts, side): ONE hash shuffle on the key, one sort within
  partitions — the same cost as a groupBy, scales linearly at 100 TB.
- **Range join** (point-in-interval): the naive form is again an
  inequality join that Catalyst can only express as
  BroadcastNestedLoopJoin. We bucketize time into interval-width
  epochs, explode each interval to the (at most 2) buckets it
  overlaps, equi-join on (key, bucket) — hash-joinable, partition-
  prunable — then re-apply the exact range predicate. Candidate
  pairs per click are O(1), not O(intervals).

Both are verified against DuckDB's native ASOF JOIN / inequality
join — a genuinely different execution strategy, so parity checks
semantics rather than implementation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.plans.registry import register
from kinesis_analytics_demo_spark.session import read_table as _t


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    value_cols: list[str],
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Generic as-of join: for every left row, attach the `value_cols`
    of the most recent right row with right.ts <= left.ts, per `on`
    key. Returns the left rows plus matched columns (null when no
    prior right row exists). One shuffle on `on`.

    When the right side can contain duplicate (key, ts) rows, pass
    ``right_tiebreak`` (a right-side column name): among equal-ts
    right rows the one with the LARGEST tiebreak value wins,
    deterministically. Without it, duplicate (key, ts) right rows make
    the pick partition-order-dependent — the right side must then be
    unique on (key, ts) (the property test generates exactly that).
    """
    struct_t = F.struct(*[F.col(c) for c in value_cols])
    l_marked = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(None).cast(
            right.select(struct_t.alias("s")).schema["s"].dataType
        ).alias("__r"),
        F.lit(1).alias("__side"),
        F.lit(None)
        .cast(right.schema[right_tiebreak].dataType if right_tiebreak else "int")
        .alias("__tb"),
    )
    r_marked = right.select(
        *[
            F.col(c) if c in (on, ts) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
        ],
        struct_t.alias("__r"),
        F.lit(0).alias("__side"),
        (F.col(right_tiebreak) if right_tiebreak else F.lit(None).cast("int")).alias(
            "__tb"
        ),
    )
    unioned = l_marked.unionByName(r_marked)
    # Right rows (side 0) sort before left rows (side 1) at equal ts;
    # among equal-ts right rows the tiebreak orders ascending, so
    # last() picks the max-tiebreak row. Left rows' null __tb sorts
    # first within side 1 — irrelevant, they carry no __r.
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts), F.col("__side"), F.col("__tb").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # last(struct, ignorenulls) is atomic: all matched columns come
    # from the SAME most-recent right row, even if some are null.
    filled = unioned.withColumn("__m", F.last("__r", ignorenulls=True).over(w))
    return filled.filter(F.col("__side") == 1).select(
        *[F.col(c) for c in left.columns],
        *[F.col(f"__m.{c}").alias(f"asof_{c}") for c in value_cols],
    )


@register(
    "asof_join_events",
    oracle="""
    SELECT c.event_id AS click_id,
           c.user_id,
           c.value AS click_value,
           v.value AS view_value,
           v.ts AS view_ts
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON c.user_id = v.user_id AND c.ts >= v.ts
    """,
    doc="As-of join: each click event joined to the most recent "
    "prior-or-equal view event of the same user. Spark side uses the "
    "union + per-key ordered window formulation (one shuffle, linear "
    "scale); oracle uses DuckDB's native ASOF JOIN.",
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        "ts",
        F.col("value").alias("click_value"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("value").alias("value")
    )
    joined = asof_join(
        clicks, views.withColumn("view_ts", F.col("ts")), on="user_id", ts="ts",
        value_cols=["value", "view_ts"],
    )
    return joined.select(
        "click_id",
        "user_id",
        "click_value",
        F.col("asof_value").alias("view_value"),
        F.col("asof_view_ts").alias("view_ts"),
    )


@register(
    "resample_ffill_events",
    oracle="""
    WITH bounds AS (
        SELECT event_type,
               date_trunc('minute', min(ts)) AS t0,
               date_trunc('minute', max(ts)) AS t1
        FROM events GROUP BY event_type
    ),
    grid AS (
        SELECT event_type,
               unnest(generate_series(t0, t1, INTERVAL 1 MINUTE)) AS minute
        FROM bounds
    ),
    lastv AS (
        SELECT event_type, date_trunc('minute', ts) AS minute,
               arg_max(value, ts) AS v
        FROM events GROUP BY 1, 2
    ),
    j AS (
        SELECT g.event_type, g.minute, l.v
        FROM grid g LEFT JOIN lastv l
          ON g.event_type = l.event_type AND g.minute = l.minute
    )
    SELECT event_type, minute,
           last_value(v IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY minute
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS price
    FROM j
    """,
    doc="Time-series resampling with forward fill (gap filling): a "
    "dense per-key 1-minute grid, each minute carrying the last "
    "observed value at-or-before it. Grid generation is keys x "
    "minutes rows (sequence + explode, no shuffle beyond the "
    "per-key bounds agg); the fill is one per-key ordered window — "
    "partition-parallel across keys, linear within. (key, ts) is "
    "unique in this data, so arg_max(value, ts) picks are "
    "well-defined on both engines.",
)
def resample_ffill_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    minute = F.date_trunc("minute", F.col("ts"))
    bounds = ev.groupBy("event_type").agg(
        F.date_trunc("minute", F.min("ts")).alias("t0"),
        F.date_trunc("minute", F.max("ts")).alias("t1"),
    )
    grid = bounds.select(
        "event_type",
        F.explode(
            F.sequence("t0", "t1", F.expr("INTERVAL 1 MINUTE"))
        ).alias("minute"),
    )
    lastv = ev.groupBy("event_type", minute.alias("minute")).agg(
        F.max_by("value", "ts").alias("v")
    )
    j = grid.join(lastv, ["event_type", "minute"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("minute")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "event_type",
        "minute",
        F.last("v", ignorenulls=True).over(w).alias("price"),
    )


@register(
    "funnel_view_click_purchase",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS v_ts FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS c_ts
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.v_ts
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS p_ts
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
        GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM v) AS n_viewed,
           (SELECT count(*) FROM c) AS n_clicked_after_view,
           (SELECT count(*) FROM p) AS n_purchased_after_click
    """,
    doc="Staged funnel: users whose first view precedes a click that "
    "precedes a purchase (strict event-time ordering at each stage). "
    "Three hash-keyed per-user aggregations, each stage joining only "
    "the survivors of the previous one — no sessionization scan, no "
    "per-user sorting.",
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # NOT persisted (r11 measured revert): caching the per-user stage
    # frames for their two consumers each (next stage's join + the
    # final union) measured +35% plain and +60% with right-sized cache
    # partitioning (min-of-5, same-window alternations) — the pushed
    # per-stage filters make the duplicate lineages cheap parallel
    # branches, while each cache adds a barrier into the sequential
    # funnel chain. At scale the per-stage scans are selective pushed
    # reads of the SAME corpus, not extra full passes.
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    # one declarative plan: stage-tagged union -> single global agg
    # (no driver-side counts, no 1-row cross joins)
    stages = (
        v.select(F.lit(1).alias("viewed"), F.lit(0).alias("clicked"), F.lit(0).alias("purchased"))
        .unionByName(
            c.select(F.lit(0).alias("viewed"), F.lit(1).alias("clicked"), F.lit(0).alias("purchased"))
        )
        .unionByName(
            p.select(F.lit(0).alias("viewed"), F.lit(0).alias("clicked"), F.lit(1).alias("purchased"))
        )
    )
    return stages.agg(
        F.sum("viewed").alias("n_viewed"),
        F.sum("clicked").alias("n_clicked_after_view"),
        F.sum("purchased").alias("n_purchased_after_click"),
    )


#: Incident window length; also the time-bucket width for the range
#: join (bucket width == max interval length -> each interval overlaps
#: at most 2 buckets).
INCIDENT_WINDOW_SEC = 300


def interval_join(
    intervals: DataFrame,
    points: DataFrame,
    left_key: str,
    right_key: str,
    start_col: str,
    ts_col: str,
    window_sec: int,
    how: str = "left",
) -> DataFrame:
    """Generic range join: attach every `points` row whose `ts_col`
    falls in ``[start_col, start_col + window_sec)`` of an `intervals`
    row with matching key. Time is bucketized to window-width epochs
    so the match is a hash equi-join on (key, bucket) plus the exact
    range re-check — never a nested loop; candidate pairs per point
    are O(1). The explode is on the POINT side (each point covers its
    own bucket and the preceding one, the only two buckets an
    enclosing interval's start can land in), so the interval side
    stays one-row-per-interval and ``how="left"`` emits exactly one
    null-extended row per unmatched interval; a matched pair appears
    exactly once because the two exploded copies of a point sit in
    distinct buckets and an interval joins in exactly one. Column
    names of the two inputs must be disjoint apart from the internal
    bucket columns (pre-alias on the caller side). Property-checked
    against a naive model in tests/test_properties.py.
    """
    # NTZ-safe epoch seconds: parquet timestamps may load as
    # TIMESTAMP_NTZ (no direct bigint cast); go via TIMESTAMP with the
    # session tz pinned to UTC (session.py) so both types bucket alike.
    bucket = lambda c: F.floor(c.cast("timestamp").cast("long") / window_sec)  # noqa: E731
    iv = intervals.withColumn("__ib", bucket(F.col(start_col)))
    pts = points.withColumn(
        "__pb",
        F.explode(F.array(bucket(F.col(ts_col)) - 1, bucket(F.col(ts_col)))),
    )
    joined = iv.join(
        pts,
        on=[
            F.col(left_key) == F.col(right_key),
            F.col("__ib") == F.col("__pb"),
            F.col(ts_col) >= F.col(start_col),
            F.col(ts_col) < F.col(start_col) + F.expr(f"INTERVAL {int(window_sec)} SECOND"),
        ],
        how=how,
    )
    return joined.drop("__ib", "__pb")


@register(
    "range_join_events",
    oracle=f"""
    SELECT e.event_id AS incident_id,
           e.user_id,
           count(c.event_id) AS n_clicks,
           CAST(ROUND(COALESCE(SUM(CAST(c.value AS DECIMAL(18,6))), 0), 2) AS DOUBLE)
               AS click_value_sum
    FROM (SELECT * FROM events WHERE event_type = 'error') e
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = e.user_id
     AND c.ts >= e.ts
     AND c.ts < e.ts + INTERVAL {INCIDENT_WINDOW_SEC} SECOND
    GROUP BY e.event_id, e.user_id
    """,
    doc="Range (interval) join: every error event opens a 5-minute "
    "incident window; clicks by the same user inside the window are "
    "counted/summed. Spark side bucketizes time to window-width "
    "epochs and equi-joins on (user_id, bucket) — a hash join with "
    "<=2 candidate buckets per interval — then re-applies the exact "
    "range predicate; oracle is DuckDB's inequality join.",
)
def range_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"),
    )
    joined = interval_join(
        errors, clicks, "e_user", "c_user", "e_ts", "c_ts", INCIDENT_WINDOW_SEC
    )
    return (
        joined.groupBy(F.col("incident_id"), F.col("e_user").alias("user_id"))
        .agg(
            F.count("click_id").alias("n_clicks"),
            F.round(
                F.coalesce(
                    F.sum(F.col("c_value").cast("decimal(18,6)")), F.lit(0)
                ),
                2,
            )
            .cast("double")
            .alias("click_value_sum"),
        )
    )


#: activity-interval width for the concurrency sweep: each event opens
#: a [ts, ts + 300s) activity window (closed-open, so a window ending
#: exactly when another starts does NOT overlap it)
CONCURRENCY_WINDOW_SEC = 300
#: coarse bucket width for the two-level sweep (1 hour)
CONCURRENCY_BUCKET_SEC = 3600


def _boundaries(ev: DataFrame) -> DataFrame:
    """(event_type, t, d) sweep-line boundary stream from ONE pass over
    the events projection: each event row explodes into its +1 start
    and -1 end (ts + activity window) boundary — semantically the
    UNION ALL of the two per-arm projections, but with a single scan
    (and, under the local single-file fixture, a single round-robin
    spread) instead of one per arm."""
    end_t = F.col("ts") + F.expr(f"INTERVAL {CONCURRENCY_WINDOW_SEC} SECONDS")
    return ev.select(
        "event_type",
        F.explode(
            F.array(
                F.struct(F.col("ts").alias("t"), F.lit(1).alias("d")),
                F.struct(end_t.alias("t"), F.lit(-1).alias("d")),
            )
        ).alias("bd"),
    ).select("event_type", F.col("bd.t").alias("t"), F.col("bd.d").alias("d"))


@register(
    "concurrent_sessions_peak",
    oracle=f"""
    WITH b AS (
        SELECT event_type, ts AS t, 1 AS d FROM events
        UNION ALL
        SELECT event_type, ts + INTERVAL {CONCURRENCY_WINDOW_SEC} SECOND,
               -1 FROM events
    ),
    r AS (
        SELECT event_type, t,
               CAST(sum(d) OVER (PARTITION BY event_type ORDER BY t, d)
                    AS BIGINT) AS conc
        FROM b
    ),
    pk AS (SELECT event_type, max(conc) AS peak FROM r GROUP BY 1)
    SELECT r.event_type,
           CAST(pk.peak AS BIGINT) AS peak_concurrent,
           min(r.t) AS first_peak_ts
    FROM r JOIN pk ON r.event_type = pk.event_type AND r.conc = pk.peak
    GROUP BY 1, 2
    """,
    doc="Sweep-line interval concurrency (the interval-algebra shape "
    "none of the join/window operators cover): each event opens a "
    "closed-open 5-minute activity window; per event_type, the peak "
    "number of simultaneously open windows and the first instant it "
    "is reached. Boundaries (+1 at start, -1 at end) are summed by a "
    "peer-inclusive RANGE window ordered by (t, d) — d ascending "
    "applies ends before starts at the same instant, which both "
    "engines evaluate identically, and an adjacent [a,b)/[b,c) pair "
    "never overlaps. The Spark plan is the TWO-LEVEL sweep: partial "
    "boundary sums per (event_type, hour bucket), a tiny running-sum "
    "carry table over buckets, then the in-bucket window runs "
    "partitioned by (event_type, bucket) — parallel across buckets, "
    "so one hot key no longer serializes the scan (the flat "
    "per-key window would; same decomposition as "
    "sliding_window_min_twolevel). The oracle is the flat global "
    "sweep — different execution, same semantics.",
)
def concurrent_sessions_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_type", "ts")
    # ONE events pass: each row explodes into its +1 start / -1 end
    # boundary. The union-of-two-projections formulation scanned (and
    # round-robin-repartitioned) the table once per arm, per consumer.
    b = _boundaries(ev).withColumn(
        "bkt",
        F.floor(
            F.col("t").cast("timestamp").cast("long")
            / CONCURRENCY_BUCKET_SEC
        ),
    )
    # level 1: per-bucket boundary totals -> carry-in via a running sum
    # over the (keys x buckets)-sized table — driver-free, tiny
    wb = (
        Window.partitionBy("event_type")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        b.groupBy("event_type", "bkt")
        .agg(F.sum("d").alias("bt"))
        .withColumn("carry_in", F.coalesce(F.sum("bt").over(wb), F.lit(0)))
        .select("event_type", "bkt", "carry_in")
    )
    # level 2: in-bucket sweep, partitioned by (event_type, bucket);
    # peers at the same (t, d) share the peer-inclusive RANGE sum, so
    # the result is order-deterministic
    wi = Window.partitionBy("event_type", "bkt").orderBy("t", "d")
    r = b.join(carry, ["event_type", "bkt"]).select(
        "event_type",
        "t",
        (F.col("carry_in") + F.sum("d").over(wi)).alias("conc"),
    )
    # Peak AND its first instant in ONE partial-aggregating pass:
    # min(struct(-conc, t)) is lexicographically the (max conc,
    # min t at that conc) pick — exactly the old
    # join-on-max + filter + re-aggregate readout, without
    # persisting r, without the peak self-join, and with map-side
    # combine so one row per key reaches the final exchange.
    s = F.min(F.struct((-F.col("conc")).alias("nc"), F.col("t").alias("t")))
    return (
        r.groupBy("event_type")
        .agg(s.alias("s"))
        .select(
            "event_type",
            (-F.col("s.nc")).alias("peak_concurrent"),
            F.col("s.t").alias("first_peak_ts"),
        )
    )


@register(
    "interval_coverage_seconds",
    oracle=f"""
    WITH b AS (
        SELECT event_type, ts AS t, 1 AS d FROM events
        UNION ALL
        SELECT event_type, ts + INTERVAL {CONCURRENCY_WINDOW_SEC} SECOND,
               -1 FROM events
    ),
    g AS (
        SELECT event_type, t, CAST(sum(d) AS BIGINT) AS dt
        FROM b GROUP BY 1, 2
    ),
    r AS (
        SELECT event_type, t,
               CAST(sum(dt) OVER w AS BIGINT) AS conc,
               CAST(COALESCE(sum(dt) OVER (PARTITION BY event_type
                                           ORDER BY t
                                           ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND 1 PRECEDING), 0)
                    AS BIGINT) AS prev_conc,
               lead(t) OVER (PARTITION BY event_type ORDER BY t) AS nt
        FROM g
        WINDOW w AS (PARTITION BY event_type ORDER BY t)
    )
    SELECT event_type,
           CAST(sum(CASE WHEN conc > 0 AND prev_conc = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_segments,
           CAST(ROUND(CAST(sum(CASE WHEN conc > 0 AND nt IS NOT NULL
                                    THEN epoch_us(nt) - epoch_us(t)
                                    ELSE 0 END) AS BIGINT) / 1000000.0, 6)
                AS DOUBLE) AS covered_sec
    FROM r
    GROUP BY 1
    """,
    doc="Interval-union coverage (the other half of the sweep-line "
    "family): per event_type, how many maximal covered segments the "
    "5-minute activity windows merge into and the total wall-clock "
    "seconds during which at least one window is open. Boundary "
    "deltas are pre-aggregated per instant (so the running sum needs "
    "no tie ordering at all), a segment starts where concurrency "
    "transitions 0 -> positive, and durations are exact "
    "epoch-microsecond differences summed as BIGINT — one division "
    "at the end, no float accumulation order to disagree on. The "
    "Spark plan reuses the two-level bucketed sweep: the per-"
    "(key, hour-bucket) windows compute the running sum, bucket-"
    "crossing lead/lag are patched from the tiny carry table (next "
    "bucket's first boundary; carry-in IS the previous bucket's "
    "closing concurrency), so no per-key global sort exists anywhere "
    "in the plan.",
)
def interval_coverage_seconds(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_type", "ts")
    g = (
        _boundaries(ev)
        .groupBy("event_type", "t")
        .agg(F.sum("d").alias("dt"))
        .withColumn(
            "bkt",
            F.floor(
                F.col("t").cast("timestamp").cast("long")
                / CONCURRENCY_BUCKET_SEC
            ),
        )
    )
    # tiny per-(key, bucket) table: boundary-delta totals, first
    # boundary instant; running-sum carry + the next bucket's first t
    wb = Window.partitionBy("event_type").orderBy("bkt")
    carry = (
        g.groupBy("event_type", "bkt")
        .agg(F.sum("dt").alias("bt"), F.min("t").alias("bft"))
        .select(
            "event_type",
            "bkt",
            F.coalesce(
                F.sum("bt").over(wb.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ).alias("carry_in"),
            F.lead("bft").over(wb).alias("next_bkt_t"),
        )
    )
    wi = Window.partitionBy("event_type", "bkt").orderBy("t")
    run = wi.rowsBetween(Window.unboundedPreceding, 0)
    r = (
        g.join(carry, ["event_type", "bkt"])
        .select(
            "event_type",
            "t",
            (F.col("carry_in") + F.sum("dt").over(run)).alias("conc"),
            # first row of a bucket: previous concurrency IS carry_in
            F.coalesce(
                F.col("carry_in")
                + F.sum("dt").over(wi.rowsBetween(Window.unboundedPreceding, -1)),
                F.col("carry_in"),
            ).alias("prev_conc"),
            # last row of a bucket: next boundary is the next bucket's first
            F.coalesce(F.lead("t").over(wi), F.col("next_bkt_t")).alias("nt"),
        )
    )
    covered_us = F.sum(
        F.when(
            (F.col("conc") > 0) & F.col("nt").isNotNull(),
            F.unix_micros(F.col("nt").cast("timestamp"))
            - F.unix_micros(F.col("t").cast("timestamp")),
        ).otherwise(F.lit(0))
    )
    return r.groupBy("event_type").agg(
        F.sum(
            F.when((F.col("conc") > 0) & (F.col("prev_conc") == 0), 1)
            .otherwise(0)
        ).alias("n_segments"),
        F.round(covered_us / F.lit(1000000.0), 6)
        .cast("double")
        .alias("covered_sec"),
    )
