"""Batch relational surface, part 2: pivot, ordered-set aggregates,
arg-min/max, analytic frame functions, sessionization, string
aggregation, subquery shapes.

Same determinism discipline as relational.py; sessionization's oracle
is the classic gaps-and-islands rewrite, proving Spark's
``session_window`` semantics against plain SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.plans.registry import register
from kinesis_analytics_demo_spark.session import read_table as _t


def _dec(col: str):
    return F.col(col).cast("decimal(18,6)")


# --------------------------------------------------------------------
# PIVOT: status columns from rows. Oracle uses portable FILTER'd aggs
# (DuckDB PIVOT exists but FILTER keeps column naming explicit).
# --------------------------------------------------------------------
@register(
    "pivot_order_status",
    oracle="""
    SELECT o_orderpriority,
        count(*) FILTER (o_orderstatus = 'O') AS n_open,
        count(*) FILTER (o_orderstatus = 'F') AS n_filled,
        count(*) FILTER (o_orderstatus = 'P') AS n_pending,
        CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                   FILTER (o_orderstatus = 'O'), 2) AS DOUBLE) AS open_value
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Pivot: order-status columns per priority (conditional "
    "aggregation — the shuffle-free way to pivot a low-cardinality "
    "dimension).",
)
def pivot_order_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_filled"),
        F.count(F.when(F.col("o_orderstatus") == "P", 1)).alias("n_pending"),
        F.round(
            F.sum(F.when(F.col("o_orderstatus") == "O", _dec("o_totalprice"))), 2
        )
        .cast("double")
        .alias("open_value"),
    )


# --------------------------------------------------------------------
# arg_min / arg_max — the batch twins of the reference's FIRST_VALUE /
# LAST_VALUE candlestick aggregates (SURVEY.md §2 A3/A4).
# --------------------------------------------------------------------
@register(
    "argminmax_events",
    oracle="""
    SELECT event_type,
           arg_min(value, ts) AS first_value,
           arg_max(value, ts) AS last_value,
           min(ts) AS first_ts,
           max(ts) AS last_ts
    FROM events
    GROUP BY event_type
    """,
    doc="min_by/max_by aggregates: value at earliest/latest event time "
    "per key — the deterministic FIRST_VALUE/LAST_VALUE replacement "
    "(reference flink/tumbling_window.py:184-185).",
)
def argminmax_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.min_by("value", "ts").alias("first_value"),
        F.max_by("value", "ts").alias("last_value"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


# --------------------------------------------------------------------
# Analytic frame functions: first/last value over explicit frames,
# ntile, percent_rank.
# --------------------------------------------------------------------
@register(
    "window_frames",
    oracle="""
    SELECT o_orderkey, o_custkey,
        first_value(o_orderkey) OVER w AS first_order,
        last_value(o_orderkey) OVER (PARTITION BY o_custkey
            ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order,
        CAST(ntile(4) OVER w AS INT) AS quartile,
        percent_rank() OVER w AS pr
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="Analytic frame functions: first/last value with explicit "
    "ROWS frames, ntile quartiles, percent_rank.",
)
def window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w_full).alias("last_order"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
    )


# --------------------------------------------------------------------
# Sessionization: Spark's session_window vs the gaps-and-islands SQL.
# --------------------------------------------------------------------
SESSION_GAP = "5 minutes"


@register(
    "sessionize_events",
    oracle="""
    WITH o AS (
        SELECT user_id, ts,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 5 MINUTE
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ),
    s AS (
        SELECT user_id, ts,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS session_id
        FROM o
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 5 MINUTE AS session_end,
           count(*) AS n_events
    FROM s
    GROUP BY user_id, session_id
    """,
    doc="Sessionization: session_window(ts, 5 min) per user — events "
    "within the gap merge into one session; verified against the "
    "gaps-and-islands SQL rewrite. In streaming mode the same "
    "operator runs with a watermark (merging session state).",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", SESSION_GAP), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "sessionize_dynamic_gap",
    oracle="""
    WITH g AS (
        SELECT user_id, ts, event_id,
               ts + CASE WHEN event_type = 'error'
                         THEN INTERVAL 2 MINUTE
                         ELSE INTERVAL 10 MINUTE END AS e
        FROM events),
    o AS (
        SELECT user_id, ts, e,
               MAX(e) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS prev_end
        FROM g),
    m AS (
        SELECT user_id, ts, e,
               CASE WHEN prev_end IS NULL OR ts > prev_end
                    THEN 1 ELSE 0 END AS is_new
        FROM o),
    s AS (
        SELECT user_id, ts, e,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS session_id
        FROM m)
    SELECT user_id,
           min(ts) AS session_start,
           max(e) AS session_end,
           count(*) AS n_events
    FROM s
    GROUP BY user_id, session_id
    """,
    doc="DYNAMIC-gap sessionization: the session timeout depends on "
    "the event (errors close after 2 minutes, everything else after "
    "10) — Spark's session_window with a gap EXPRESSION. The oracle "
    "is the generalized gaps-and-islands: a running MAX of per-event "
    "interval ends (a long-gap event can bridge past a short-gap "
    "one, so lag(ts) alone is wrong). Same single-shuffle shape as "
    "the fixed-gap sessionize_events.",
)
def sessionize_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    gap = F.when(
        F.col("event_type") == "error", F.lit("2 minutes")
    ).otherwise(F.lit("10 minutes"))
    return (
        ev.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


# --------------------------------------------------------------------
# Ordered string aggregation.
# --------------------------------------------------------------------
@register(
    "listagg_nations",
    oracle="""
    SELECT r_name,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           count(*) AS n_nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    doc="Ordered string aggregation (listagg/string_agg) with a "
    "deterministic ORDER BY inside the aggregate.",
)
def listagg_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list("n_name"))).alias("nations"),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )


# --------------------------------------------------------------------
# IN / NOT IN subqueries through the SQL front-end.
# --------------------------------------------------------------------
@register(
    "in_subquery_sql",
    oracle="""
    SELECT p_partkey, p_brand
    FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity >= 49)
      AND p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_discount = 0.0
                            AND l_quantity <= 2)
    """,
    doc="IN / NOT IN subqueries via the SQL entry point (Catalyst "
    "rewrites to semi/anti joins — same plan as the DataFrame form).",
)
def in_subquery_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "part").createOrReplaceTempView("part_v")
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT p_partkey, p_brand
        FROM part_v
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem_v WHERE l_quantity >= 49)
          AND p_partkey NOT IN (SELECT l_partkey FROM lineitem_v
                                WHERE l_discount = 0.0 AND l_quantity <= 2)
        """
    )


# --------------------------------------------------------------------
# Latest-row-per-key dedupe (the relational form of dropDuplicates
# with an ordering preference).
# --------------------------------------------------------------------
@register(
    "latest_order_per_customer",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate
    FROM (
        SELECT o_custkey, o_orderkey, o_orderdate,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders
    )
    WHERE rn = 1
    """,
    doc="Keyed latest-row dedupe: one row per customer, newest order "
    "wins (deterministic tie-break on the key).",
)
def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    # Latest-row pick as a plain struct max: (o_orderdate DESC,
    # o_orderkey DESC) is max(struct(o_orderdate, o_orderkey)), which
    # partial-combines map-side — one row per customer reaches the
    # exchange instead of the window formulation's full shuffle+sort
    # of every order row.
    return (
        orders.groupBy("o_custkey")
        .agg(F.max(F.struct("o_orderdate", "o_orderkey")).alias("s"))
        .select(
            "o_custkey",
            F.col("s.o_orderkey").alias("o_orderkey"),
            F.col("s.o_orderdate").alias("o_orderdate"),
        )
    )


# --------------------------------------------------------------------
# Per-key EMA: ordered-fold aggregate — the batch twin of the
# applyInPandasWithState streaming operator (streaming/stateful.py).
# Both engines fold left-to-right in f64 over (ts, event_id)-ordered
# values, so results are bit-identical.
# --------------------------------------------------------------------
EMA_ALPHA = 0.3


@register(
    "ema_per_key",
    oracle=f"""
    WITH ordered AS (
        SELECT event_type,
               list(value ORDER BY ts, event_id) AS vals
        FROM events
        GROUP BY event_type
    )
    SELECT event_type,
           list_reduce(vals, (acc, x) -> {EMA_ALPHA} * x + {1 - EMA_ALPHA} * acc)
               AS final_ema,
           len(vals) AS n_events
    FROM ordered
    """,
    doc="Per-key exponential moving average as an ordered array fold "
    "(recursive state — not expressible as a plain SQL aggregate); "
    "batch twin of the applyInPandasWithState streaming operator.",
)
def ema_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    ordered_vals = F.transform(
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "value"))),
        lambda s: s.getField("value"),
    )
    agg = ev.groupBy("event_type").agg(ordered_vals.alias("vals"))
    ema = F.aggregate(
        F.slice(F.col("vals"), 2, F.greatest(F.size("vals") - 1, F.lit(0))),
        F.element_at(F.col("vals"), 1),
        lambda acc, x: F.lit(EMA_ALPHA) * x + F.lit(1 - EMA_ALPHA) * acc,
    )
    return agg.select(
        "event_type",
        ema.alias("final_ema"),
        F.size("vals").cast("bigint").alias("n_events"),
    )


# --------------------------------------------------------------------
# Array function surface over the embedding column.
# --------------------------------------------------------------------
def _canon_float_array(col) -> "F.Column":
    """Canonicalize an array<float> to a comparison-stable string:
    widen to double (exact), scale to micro-units, round to BIGINT,
    comma-join. Array-typed result columns crash the driver's pandas
    canonicalizer (`sort_values` -> "unhashable type: 'list'"), so
    every registered query must emit scalars/strings at the top level
    (enforced by tests/test_plans.py)."""
    return F.array_join(
        F.transform(
            col,
            lambda x: F.round(x.cast("double") * 1000000)
            .cast("bigint")
            .cast("string"),
        ),
        ",",
    )


@register(
    "array_functions",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           embedding[1] AS first_component,
           embedding[64] AS last_component,
           array_to_string(list_transform(list_slice(embedding, 1, 4),
               x -> CAST(CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS VARCHAR)), ',')
               AS head4,
           array_to_string(list_transform(list_reverse(list_slice(embedding, 61, 64)),
               x -> CAST(CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS VARCHAR)), ',')
               AS tail4_rev,
           list_contains([CAST(label AS BIGINT)], 5) AS is_label5
    FROM embeddings
    """,
    doc="Array function surface: size, element_at, slice, reverse, "
    "contains — on the embedding column. Array outputs are serialized "
    "to canonical micro-unit strings (exact float->double widening, "
    "x1e6, round-half-away, comma-join) because the driver's pandas "
    "canonicalizer cannot sort/hash list-valued cells.",
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).alias("first_component"),
        F.element_at("embedding", 64).alias("last_component"),
        _canon_float_array(F.slice("embedding", 1, 4)).alias("head4"),
        _canon_float_array(F.reverse(F.slice("embedding", 61, 4))).alias(
            "tail4_rev"
        ),
        F.array_contains(
            F.array(F.col("label").cast("bigint")), F.lit(5).cast("bigint")
        ).alias("is_label5"),
    )


# --------------------------------------------------------------------
# Exact percentiles: Spark's percentile() and DuckDB's quantile_cont
# share the same linear-interpolation definition — verified bit-exact.
# --------------------------------------------------------------------
@register(
    "exact_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_extendedprice, 0.25) AS p25,
           quantile_cont(l_extendedprice, 0.5)  AS p50,
           quantile_cont(l_extendedprice, 0.99) AS p99,
           quantile_cont(l_quantity, 0.5) AS median_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="Exact interpolated percentiles (ordered-set aggregate): "
    "Spark percentile() == DuckDB quantile_cont bit-for-bit.",
)
def exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_extendedprice", 0.25).alias("p25"),
        F.percentile("l_extendedprice", 0.5).alias("p50"),
        F.percentile("l_extendedprice", 0.99).alias("p99"),
        F.percentile("l_quantity", 0.5).alias("median_qty"),
    )


# --------------------------------------------------------------------
# Approximate aggregates: sketch implementations differ per engine, so
# no value-oracle is possible — registered without one (the driver
# records a rows-only check; the exact twins above are the oracle'd
# coverage).
# --------------------------------------------------------------------
@register(
    "approx_aggregates",
    oracle=None,
    doc="Approximate aggregates (HLL count-distinct + quantile "
    "sketches) — engine-specific sketches, so the driver row is "
    "rows-only; the VALUE check is the pinned bounds oracle in "
    "tests/test_approx_bounds.py (each approx column asserted within "
    "its documented error — 3*rsd for HLL++, n/accuracy rank error "
    "for percentile_approx — against DuckDB exact values at sf0.001 "
    "and sf0.01). Exact twins are oracle-checked in "
    "distinct_aggregates/exact_percentiles.",
)
def approx_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # Quartiles as two scalar columns (not one array column): the
    # driver's pandas canonicalizer cannot hash list-valued cells.
    return li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5).alias("approx_median_price"),
        F.percentile_approx("l_extendedprice", 0.25).alias("approx_p25"),
        F.percentile_approx("l_extendedprice", 0.75).alias("approx_p75"),
    )


# --------------------------------------------------------------------
# LIKE / regexp / IN-list predicate surface.
# --------------------------------------------------------------------
@register(
    "string_predicates",
    oracle="""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE p_type LIKE 'SMALL%'
       OR regexp_matches(p_name, '(steel|copper)')
       OR p_brand IN ('Brand#1', 'Brand#5')
    """,
    doc="String predicate surface: LIKE prefix, regexp match, IN list.",
)
def string_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return part.filter(
        F.col("p_type").like("SMALL%")
        | F.col("p_name").rlike("(steel|copper)")
        | F.col("p_brand").isin("Brand#1", "Brand#5")
    ).select("p_partkey", "p_name", "p_type")


# --------------------------------------------------------------------
# Semi-structured JSON column access (the events.props payload —
# same shape as the reference's wider-than-declared JSON records,
# SURVEY.md §2 P4, but kept as a queryable column instead of pruned).
# --------------------------------------------------------------------
@register(
    "json_extraction_events",
    oracle="""
    SELECT event_type,
           CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_bucket,
           count(*) AS n,
           CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
    FROM events
    GROUP BY event_type, CAST(json_extract_string(props, '$.k') AS INT) % 10
    """,
    doc="JSON path extraction from a string column (get_json_object, "
    "JVM-side — no UDF) feeding a grouped aggregate.",
)
def json_extraction_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", (k % 10).alias("k_bucket"), k.alias("k"))
        .groupBy("event_type", "k_bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.max("k").cast("int").alias("max_k"))
    )


@register(
    "variant_props_extraction",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN CAST(json_extract_string(props, '$.k') AS INT)
                              % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_even_k,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT) AS sum_k,
           CAST(SUM(CASE WHEN json_extract_string(props, '$.missing')
                              IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_missing
    FROM events
    GROUP BY event_type
    """,
    doc="Spark 4 VARIANT ingestion: props parsed ONCE to the binary "
    "VARIANT type, then typed variant_get extractions feed the "
    "aggregate — the modern semi-structured path (vs per-path "
    "get_json_object re-parsing in json_extraction_events). Absent "
    "paths return NULL (counted per group). At scale the parse cost "
    "is paid once per row regardless of how many paths are read.",
)
def variant_props_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    v = ev.select("event_type", F.parse_json("props").alias("v"))
    k = F.expr("variant_get(v, '$.k', 'bigint')")
    missing = F.expr("variant_get(v, '$.missing', 'string')")
    return (
        v.select("event_type", k.alias("k"), missing.alias("m"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("k") % 2 == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_even_k"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.sum(F.when(F.col("m").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_missing"),
        )
    )


# --------------------------------------------------------------------
# UNPIVOT (melt): wide numeric columns -> (metric, value) rows.
# --------------------------------------------------------------------
@register(
    "unpivot_part_metrics",
    oracle="""
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value
    FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS metric, CAST(p_retailprice AS DOUBLE)
    FROM part
    """,
    doc="UNPIVOT/melt via DataFrame.unpivot (the inverse of "
    "pivot_order_status): wide columns to tall rows, no shuffle — "
    "a per-row Expand.",
)
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
    ).unpivot("p_partkey", ["p_size", "p_retailprice"], "metric", "value")
