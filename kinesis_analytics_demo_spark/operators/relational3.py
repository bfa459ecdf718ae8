"""Batch relational surface, part 3: TPC-H-shaped composite analytics
(volume shipping, market share, promo revenue, large orders) adapted
to the driver's star schema, several through the SQL text front-end
(E1) to exercise both entry points at query scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.plans.registry import register
from kinesis_analytics_demo_spark.session import read_table as _t


def _dec(col: str):
    return F.col(col).cast("decimal(18,6)")


def _rev():
    return _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast(
        "decimal(18,6)"
    )


# --------------------------------------------------------------------
# Q7-ish: trade volume between customer-nation / supplier-nation pairs
# by year. Dimensions broadcast; one shuffle on the 3-column group key.
# --------------------------------------------------------------------
@register(
    "nation_pair_volume",
    oracle="""
    SELECT cn.n_name AS cust_nation,
           sn.n_name AS supp_nation,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                * CAST(1 - l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS volume
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE cn.n_name IN ('NATION_0', 'NATION_1')
      AND sn.n_name IN ('NATION_0', 'NATION_1')
      AND cn.n_name != sn.n_name
    GROUP BY cn.n_name, sn.n_name, year(o_orderdate)
    """,
    doc="TPC-H Q7-style volume shipping: bilateral trade volume per "
    "year between two nations (double nation-dimension join).",
)
def nation_pair_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    cn = nation.select(
        F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_0", "NATION_1"))
    sn = nation.select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_0", "NATION_1"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cn), cust.c_nationkey == F.col("cnk"))
        .join(F.broadcast(sn), supp.s_nationkey == F.col("snk"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy(
            "cust_nation", "supp_nation", F.year("o_orderdate").alias("order_year")
        )
        .agg(F.round(F.sum(_rev()), 2).cast("double").alias("volume"))
    )


# --------------------------------------------------------------------
# Q8-ish market share: one nation's fraction of regional revenue per
# year. The share is a single f64 division of two decimal-exact sums.
# --------------------------------------------------------------------
@register(
    "market_share",
    oracle="""
    SELECT order_year,
           CAST(ROUND(nation_rev, 2) AS DOUBLE) / CAST(ROUND(total_rev, 2) AS DOUBLE) AS share
    FROM (
        SELECT CAST(year(o_orderdate) AS INT) AS order_year,
            SUM(CASE WHEN n_name = 'NATION_3'
                THEN CAST(l_extendedprice AS DECIMAL(18,6))
                     * CAST(1 - l_discount AS DECIMAL(18,6))
                ELSE CAST(0 AS DECIMAL(18,6)) END) AS nation_rev,
            SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                * CAST(1 - l_discount AS DECIMAL(18,6))) AS total_rev
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY year(o_orderdate)
    )
    """,
    doc="TPC-H Q8-style market share: NATION_3's fraction of ASIA "
    "supplier revenue per year (conditional aggregation + exact "
    "decimal sums, one final f64 division).",
)
def market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = _rev()
    zero = F.lit(0).cast("decimal(18,6)")
    agg = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(
            F.sum(F.when(F.col("n_name") == "NATION_3", rev).otherwise(zero)).alias(
                "nation_rev"
            ),
            F.sum(rev).alias("total_rev"),
        )
    )
    return agg.select(
        "order_year",
        (
            F.round(F.col("nation_rev"), 2).cast("double")
            / F.round(F.col("total_rev"), 2).cast("double")
        ).alias("share"),
    )


# --------------------------------------------------------------------
# Q14-ish promo revenue percentage via the SQL text front-end.
# --------------------------------------------------------------------
@register(
    "promo_revenue_pct",
    oracle="""
    SELECT CAST(ROUND(promo, 2) AS DOUBLE) * 100.0 / CAST(ROUND(total, 2) AS DOUBLE) AS promo_pct
    FROM (
        SELECT SUM(CASE WHEN p_type LIKE 'PROMO%'
                   THEN CAST(l_extendedprice AS DECIMAL(18,6))
                        * CAST(1 - l_discount AS DECIMAL(18,6))
                   ELSE CAST(0 AS DECIMAL(18,6)) END) AS promo,
               SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                   * CAST(1 - l_discount AS DECIMAL(18,6))) AS total
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-03-01'
    )
    """,
    doc="TPC-H Q14-style promo revenue share, written through the SQL "
    "text entry point (E1) — same Catalyst plan as the DataFrame form.",
)
def promo_revenue_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("li_q14")
    _t(spark, sf_dir, "part").createOrReplaceTempView("part_q14")
    return spark.sql(
        """
        SELECT CAST(ROUND(promo, 2) AS DOUBLE) * 100.0 / CAST(ROUND(total, 2) AS DOUBLE) AS promo_pct
        FROM (
            SELECT SUM(CASE WHEN p_type LIKE 'PROMO%'
                       THEN CAST(l_extendedprice AS DECIMAL(18,6))
                            * CAST(1 - l_discount AS DECIMAL(18,6))
                       ELSE CAST(0 AS DECIMAL(18,6)) END) AS promo,
                   SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                       * CAST(1 - l_discount AS DECIMAL(18,6))) AS total
            FROM li_q14 JOIN part_q14 ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1997-03-01'
        )
        """
    )


# --------------------------------------------------------------------
# Q18-ish large orders: HAVING over a fact aggregate, joined back to
# the enclosing fact+dims.
# --------------------------------------------------------------------
@register(
    "large_orders",
    oracle="""
    SELECT c_name, o_orderkey, o_orderdate,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,6))) > 150
    )
    GROUP BY c_name, o_orderkey, o_orderdate
    """,
    doc="TPC-H Q18-style large-volume orders: IN over a HAVING "
    "aggregate, joined back through customer (semi-join pushed into "
    "the fact scan side).",
)
def large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "bk"), li.l_orderkey == F.col("bk"), "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate")
        .agg(F.round(F.sum(_dec("l_quantity")), 2).cast("double").alias("total_qty"))
    )


# --------------------------------------------------------------------
# Salted aggregation for skewed keys: each hot key splits into
# SALT_BUCKETS sub-keys (uniform via a hash of a high-cardinality
# column), the sub-keys aggregate in parallel, and a trivially small
# second stage combines the partials. Decimal sums are associative,
# so the result is bit-identical to the unsalted aggregate — which is
# exactly what the oracle computes.
#
# Measured honestly (round-6 skew-stress fixture, 3M rows, hot key at
# 60%): for ALGEBRAIC aggregates like this one, Spark's map-side
# partial aggregation already collapses each mapper's output to one
# row per key BEFORE the shuffle — skew never reaches the reducer,
# and salting costs an extra shuffle (2.7s vs 1.1s naive at 3M rows).
# The pattern this query demonstrates earns its keep where map-side
# combine does NOT apply: holistic per-key state (exact percentiles,
# collect_list), and large-large shuffle joins on a hot key (measured
# crossover at 20M rows / 80%-hot: salted 5.4s vs naive SMJ 5.9s,
# widening with per-task data volume — see tests/test_skew_stress.py
# and README bench notes).
# --------------------------------------------------------------------
SALT_BUCKETS = 16


@register(
    "skewed_agg_salted",
    oracle="""
    SELECT event_type,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value,
           count(*) AS n_events,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events
    GROUP BY event_type
    """,
    doc="Two-phase salted aggregation over a 5-value (skewed) key: "
    "phase 1 groups on (key, hash-salt) across all reducers, phase 2 "
    "combines the per-salt partials — same exact result as a direct "
    "groupBy, without a hot reducer.",
)
def skewed_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    salted = ev.withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(SALT_BUCKETS)).cast("int")
    )
    partial = salted.groupBy("event_type", "salt").agg(
        F.sum(_dec("value")).alias("pv"),
        F.count(F.lit(1)).alias("pn"),
        F.min("value").alias("pmin"),
        F.max("value").alias("pmax"),
    )
    return partial.groupBy("event_type").agg(
        F.round(F.sum("pv"), 2).cast("double").alias("total_value"),
        F.sum("pn").alias("n_events"),
        F.min("pmin").alias("min_value"),
        F.max("pmax").alias("max_value"),
    )


@register(
    "skewed_join_salted",
    oracle="""
    WITH dim AS (
        SELECT DISTINCT event_type,
               CASE event_type
                   WHEN 'click' THEN 1.0 WHEN 'view' THEN 0.1
                   WHEN 'purchase' THEN 10.0 ELSE 0.5 END AS weight
        FROM events
    )
    SELECT e.event_type,
           CAST(ROUND(SUM(CAST(e.value * d.weight AS DECIMAL(18,6))), 2)
                AS DOUBLE) AS weighted_value,
           count(*) AS n_events
    FROM events e JOIN dim d ON e.event_type = d.event_type
    GROUP BY e.event_type
    """,
    doc="SALTED JOIN for skewed keys: events.event_type has 5 values, "
    "so a shuffle join would send whole key-partitions to 5 reducers. "
    "The small dim side is replicated SALT_BUCKETS times (one copy per "
    "salt), the fact side derives its salt from a high-cardinality "
    "column, and the join runs on (key, salt) — every reducer gets "
    "1/16th of each hot key. Same rows as the unsalted join (the "
    "oracle); the post-join salted aggregate reuses the two-phase "
    "combine.",
)
def skewed_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    weight = (
        F.when(F.col("event_type") == "click", 1.0)
        .when(F.col("event_type") == "view", 0.1)
        .when(F.col("event_type") == "purchase", 10.0)
        .otherwise(0.5)
    )
    dim = ev.select("event_type").distinct().select(
        "event_type", weight.alias("weight")
    )
    salts = spark.range(SALT_BUCKETS).select(F.col("id").cast("int").alias("salt"))
    dim_salted = dim.crossJoin(salts)  # 5 x 16 rows — replicated dim
    fact = ev.withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(SALT_BUCKETS)).cast("int")
    )
    joined = fact.join(dim_salted, ["event_type", "salt"])
    partial = joined.groupBy("event_type", "salt").agg(
        F.sum((F.col("value") * F.col("weight")).cast("decimal(18,6)")).alias("pv"),
        F.count(F.lit(1)).alias("pn"),
    )
    return partial.groupBy("event_type").agg(
        F.round(F.sum("pv"), 2).cast("double").alias("weighted_value"),
        F.sum("pn").alias("n_events"),
    )


# --------------------------------------------------------------------
# Monthly revenue time series (date bucketing at scale: partition-
# friendly group key, one shuffle).
# --------------------------------------------------------------------
@register(
    "monthly_revenue",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS revenue,
           count(*) AS n_orders
    FROM orders
    GROUP BY date_trunc('month', o_orderdate)
    """,
    doc="Monthly revenue time series: date_trunc bucketing + exact "
    "decimal sums.",
)
def monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.groupBy(F.date_trunc("month", "o_orderdate").alias("month")).agg(
        F.round(F.sum(_dec("o_totalprice")), 2).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# --------------------------------------------------------------------
# Explicit GROUPING SETS with grouping_id: the general form behind
# ROLLUP/CUBE (already covered), plus the grouping-bit introspection
# column analytics layers key off. One Expand + one shuffle.
# --------------------------------------------------------------------
@register(
    "grouping_sets_revenue",
    oracle="""
    SELECT o_orderstatus,
           o_orderpriority,
           GROUPING(o_orderstatus, o_orderpriority) AS gid,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    doc="Explicit GROUPING SETS ((a),(b),()) + GROUPING() id bits — "
    "the general grouping-set form (ROLLUP/CUBE are sugar over it), "
    "via the SQL front-end (E1).",
)
def grouping_sets_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus,
               o_orderpriority,
               GROUPING_ID(o_orderstatus, o_orderpriority) AS gid,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
                   AS revenue
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


# --------------------------------------------------------------------
# TPC-H Q19-shaped disjunctive predicate: OR of multi-column
# conjunctions across a join. Catalyst extracts the common l_partkey
# = p_partkey equi-condition so this stays a hash join (not nested
# loop), and pushes the per-table residuals below it.
# --------------------------------------------------------------------
@register(
    "disjunctive_filter_revenue",
    oracle="""
    SELECT count(*) AS n_items,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                * CAST(1 - l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 5 AND 25)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 20 AND 40)
    """,
    doc="Q19-style OR-of-conjunctions over a join: equi-key stays "
    "hash-joinable, residual disjunction evaluated post-join; "
    "single-row exact-decimal aggregate.",
)
def disjunctive_filter_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    cond1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(5, 25)
    )
    cond2 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(20, 40)
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond1 | cond2)
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(_rev()), 2).cast("double").alias("revenue"),
        )
    )


# --------------------------------------------------------------------
# Time-based RANGE frame: 30-day trailing revenue per customer. The
# frame is defined by event-time distance, not row count — rows at
# equal dates share a frame, unlike ROWS.
# --------------------------------------------------------------------
@register(
    "range_frame_trailing_revenue",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate
               RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW),
               2) AS DOUBLE) AS trailing_30d
    FROM orders
    """,
    doc="RANGE (time-distance) window frame: 30-day trailing sum per "
    "customer — equal-date rows share a frame (unlike ROWS). Spark "
    "expresses the interval frame as rangeBetween over the epoch-"
    "seconds ordering key.",
)
def range_frame_trailing_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = _t(spark, sf_dir, "orders")
    # o_orderdate is TIMESTAMP_NTZ; go through a UTC timestamp cast
    # (session tz pinned to UTC) for the epoch-seconds ordering key.
    epoch = F.col("o_orderdate").cast("timestamp").cast("long")
    w = W.partitionBy("o_custkey").orderBy(epoch).rangeBetween(-30 * 86400, 0)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum(_dec("o_totalprice")).over(w), 2)
        .cast("double")
        .alias("trailing_30d"),
    )


# --------------------------------------------------------------------
# TPC-H Q22-shaped: high-balance customers with no URGENT orders,
# summarized per market segment — scalar subquery (global avg over
# positive balances) + anti join + aggregate in one query. (Anchored
# on urgent orders because every customer in the test data has at
# least one order — a plain no-orders variant is vacuously empty.)
# --------------------------------------------------------------------
@register(
    "idle_high_balance_customers",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_custs,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS total_bal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """,
    doc="Q22 shape: scalar subquery threshold (avg positive balance), "
    "NOT EXISTS anti join against urgent orders, grouped aggregate — "
    "via the SQL front-end. The anti join build side is the filtered "
    "custkey projection, not the orders table.",
)
def idle_high_balance_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer_q22")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_q22")
    return spark.sql(
        """
        SELECT c_mktsegment,
               count(*) AS n_custs,
               CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE)
                   AS total_bal
        FROM customer_q22
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer_q22
                           WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders_q22
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
        GROUP BY c_mktsegment
        """
    )
