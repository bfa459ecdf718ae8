"""Batch relational surface, part 4: the correlated-subquery-heavy
TPC-H shapes (Q21 multi-EXISTS, Q17 correlated average, Q15 view +
scalar max, Q11 HAVING against a scalar subquery), adapted to the
driver's star schema (no partsupp / commitdate — lateness is
``l_shipdate > o_orderdate + 60 days``).

Scale notes: every correlated subquery is reformulated as an
aggregation so no per-row re-execution or nested-loop join appears.
Q21's double EXISTS/NOT EXISTS collapses into one groupBy on
``l_orderkey`` (the same key the lineitem-orders join shuffles on, so
the aggregation reuses that partitioning); Q17's per-part average and
Q11's corpus total become broadcast-joined aggregates. All money math
is decimal-exact; thresholds are expressed as exact decimal
multiplications (``5*qty*cnt < sum`` instead of ``qty < 0.2*avg``) so
no engine-specific decimal-division rounding can diverge.
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


LATE_DAYS = 60  # "kept waiting": shipped > 60 days after the order date


# --------------------------------------------------------------------
# Q21-shape: suppliers who kept multi-supplier orders waiting — the
# only supplier that shipped late on an order with >1 supplier.
# --------------------------------------------------------------------
@register(
    "suppliers_kept_waiting",
    oracle=f"""
    SELECT s_name, count(*) AS numwait
    FROM supplier, lineitem l1, orders
    WHERE s_suppkey = l1.l_suppkey
      AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL {LATE_DAYS} DAY
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o_orderdate + INTERVAL {LATE_DAYS} DAY)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
    doc="TPC-H Q21-style 'suppliers who kept orders waiting': the "
    "EXISTS / NOT EXISTS pair is reformulated as one per-order "
    "aggregation (distinct suppliers, distinct late suppliers, late "
    "line count) on the join key the lineitem-orders join already "
    "shuffled on, so the whole correlated pattern costs one shuffle.",
)
def suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = _t(spark, sf_dir, "supplier")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {LATE_DAYS} DAYS"
    )
    per_order = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late_supp"),
            F.min(F.when(late, F.col("l_suppkey"))).alias("late_supp"),
            F.sum(F.when(late, 1).otherwise(0)).alias("n_late_items"),
        )
    )
    return (
        per_order.filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .groupBy("late_supp")
        .agg(F.sum("n_late_items").cast("bigint").alias("numwait"))
        .join(F.broadcast(supp), F.col("late_supp") == supp.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(20)
    )


# --------------------------------------------------------------------
# Q17-shape: average yearly revenue lost if small-quantity orders of
# one brand's parts were not taken. The correlated per-part average
# quantity becomes a broadcast-joined per-part aggregate; the 20%%
# threshold is the exact decimal inequality 5*qty*cnt < sum_qty.
# --------------------------------------------------------------------
@register(
    "small_qty_revenue",
    oracle="""
    WITH bp AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#2'),
    pq AS (
        SELECT l_partkey,
               SUM(CAST(l_quantity AS DECIMAL(18,6))) AS sum_qty,
               COUNT(*) AS cnt
        FROM lineitem JOIN bp ON l_partkey = p_partkey
        GROUP BY l_partkey
    )
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE)
               / 7.0 AS avg_yearly
    FROM lineitem
    JOIN pq ON lineitem.l_partkey = pq.l_partkey
    WHERE CAST(l_quantity AS DECIMAL(18,6)) * 5 * cnt < sum_qty
    """,
    doc="TPC-H Q17-style small-quantity revenue: correlated "
    "avg-quantity subquery as a per-part aggregate broadcast back "
    "onto the brand-filtered lineitems; threshold kept in exact "
    "decimal multiplication so both engines agree bit-for-bit.",
)
def small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    bp = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#2")
        .select("p_partkey")
    )
    brand_li = li.join(F.broadcast(bp), li.l_partkey == F.col("p_partkey"))
    pq = brand_li.groupBy("l_partkey").agg(
        F.sum(_dec("l_quantity")).alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        brand_li.select("l_partkey", "l_quantity", "l_extendedprice")
        .join(
            F.broadcast(pq.select(F.col("l_partkey").alias("pk"), "sum_qty", "cnt")),
            F.col("l_partkey") == F.col("pk"),
        )
        .filter(_dec("l_quantity") * F.lit(5) * F.col("cnt") < F.col("sum_qty"))
        .agg(
            (
                F.round(F.sum(_dec("l_extendedprice")), 2).cast("double") / F.lit(7.0)
            ).alias("avg_yearly")
        )
    )


# --------------------------------------------------------------------
# Q15-shape: the supplier(s) with maximum revenue over one quarter.
# --------------------------------------------------------------------
@register(
    "top_supplier_revenue",
    oracle="""
    WITH rev AS (
        SELECT l_suppkey,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                    * CAST(1 - l_discount AS DECIMAL(18,6))), 2) AS DOUBLE)
                   AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM rev JOIN supplier ON l_suppkey = s_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
    doc="TPC-H Q15-style top supplier: quarterly revenue view, scalar "
    "max broadcast back (the supplier-level aggregate is tiny, so the "
    "max join is a broadcast of one row; Spark reuses the aggregated "
    "exchange for both branches).",
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.round(F.sum(_rev()), 2).cast("double").alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == F.col("__mx"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------
# Q11-shape: parts whose total ordered value exceeds a fixed fraction
# of the corpus-wide total (HAVING against a scalar subquery). The
# 0.05%% fraction is the exact decimal inequality val*2000 > total.
# --------------------------------------------------------------------
@register(
    "important_parts_value",
    oracle="""
    WITH pv AS (
        SELECT l_partkey,
               SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                   * CAST(1 - l_discount AS DECIMAL(18,6))) AS val
        FROM lineitem
        GROUP BY l_partkey
    )
    SELECT l_partkey AS p_partkey, p_name,
           CAST(ROUND(val, 2) AS DOUBLE) AS part_value
    FROM pv JOIN part ON l_partkey = part.p_partkey
    WHERE val * 2000 > (SELECT SUM(val) FROM pv)
    """,
    doc="TPC-H Q11-style important stock: per-part ordered value with "
    "a HAVING threshold against the grand total; the total is the sum "
    "of the unrounded per-part decimals (no second scan) broadcast "
    "back, and the fraction is an exact decimal multiplication.",
)
def important_parts_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    pv = li.groupBy("l_partkey").agg(F.sum(_rev()).alias("val"))
    # The grand total is ONE row broadcast against the per-part
    # aggregate; Spark plans a BroadcastNestedLoopJoin, which with a
    # 1-row build side is just a broadcast filter — scalable, and
    # whitelisted as such in tests/test_plans.py.
    total = pv.agg(F.sum("val").alias("__total"))
    return (
        pv.join(F.broadcast(total), F.col("val") * 2000 > F.col("__total"))
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "p_name",
            F.round(F.col("val"), 2).cast("double").alias("part_value"),
        )
    )


# --------------------------------------------------------------------
# Q4-shape: orders with at least one late line, counted by priority.
# The EXISTS is a left-semi hash join on the order key (equi key +
# lateness residual), then a 5-group count — no per-row subquery.
# --------------------------------------------------------------------
@register(
    "order_priority_check",
    oracle=f"""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL {LATE_DAYS} DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4-style order priority check (no commitdate in this "
    "schema; 'late' is shipped > 60 days after the order date): the "
    "correlated EXISTS runs as one left-semi hash join on the order "
    "key, orders-side quarter filter pushed to the scan.",
)
def order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late_exists = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {LATE_DAYS} DAYS")
        ),
        "left_semi",
    )
    return (
        late_exists.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------
# Q6-shape: revenue change from a discount band — a pure scan-side
# filter + single global aggregate (the canonical pushdown probe).
# --------------------------------------------------------------------
@register(
    "forecast_revenue_change",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                          * CAST(l_discount AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS revenue_change
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6-style forecast revenue change: all three predicates "
    "reach the parquet scan (PushedFilters), one partial+final "
    "aggregate, zero joins — decimal-exact sum.",
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(_dec("l_extendedprice") * _dec("l_discount")), 2)
            .cast("double")
            .alias("revenue_change")
        )
    )


# --------------------------------------------------------------------
# Q10-shape: customers who returned the most (by revenue) in a
# quarter. Aggregate on the custkey BEFORE joining customer/nation so
# the big-dim join carries one row per customer, then TakeOrdered.
# --------------------------------------------------------------------
@register(
    "returned_item_customers",
    oracle="""
    WITH rev AS (
        SELECT o_custkey,
               CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                    * CAST(1 - l_discount AS DECIMAL(18,6))), 2) AS DOUBLE)
                   AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-04-01'
        GROUP BY o_custkey
    )
    SELECT c_custkey, c_name, n_name, revenue
    FROM rev
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10-style returned-item reporting: returnflag + quarter "
    "filters ahead of the orderkey join, revenue aggregated per "
    "custkey BEFORE the customer join (at 100 TB customer is a big "
    "dim — joining post-aggregate carries one row per customer, not "
    "per line), nation broadcast, deterministic top-20 via "
    "TakeOrderedAndProject with a custkey tiebreak.",
)
def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.round(F.sum(_rev()), 2).cast("double").alias("revenue"))
    )
    return (
        rev.join(cust, rev.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("c_custkey", "c_name", "n_name", "revenue")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# --------------------------------------------------------------------
# Q12-shape: late lines per line status, split by order priority —
# the dual-CASE conditional aggregation over one join (no shipmode
# column in this schema; l_linestatus stands in for the group key).
# --------------------------------------------------------------------
@register(
    "late_lines_by_status",
    oracle=f"""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL {LATE_DAYS} DAY
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    doc="TPC-H Q12-style shipping audit (l_linestatus standing in for "
    "the absent shipmode): one orderkey hash join, lateness residual "
    "filter, dual conditional counts map-side-combined into 2 groups.",
)
def late_lines_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_shipdate"
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {LATE_DAYS} DAYS")
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )
