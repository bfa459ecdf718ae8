"""Batch relational surface over the TPC-H-ish driver tables.

The reference exercises no standalone filters/joins/sorts (SURVEY.md
§2 note under P4) — these come "for free" from Spark SQL and are the
extended batch scope the driver's oracle gate checks. Every query here
is pure DataFrame API (Catalyst-optimized: predicate pushdown, column
pruning, broadcast joins, partial aggregation, whole-stage codegen).

Determinism: sums/averages over DOUBLE columns are computed in DECIMAL
(exact, order-insensitive) and cast back to DOUBLE, so the result does
not depend on partitioning or AQE runtime decisions. The DuckDB oracle
does the same — both engines round the same binary double to the same
decimal (ties are unrepresentable in binary), sum exactly, and convert
the exact decimal to the nearest double.

Scale notes per query are inline; the recurring patterns:
- dimension tables (region/nation/supplier/part/customer vs the fact
  tables orders/lineitem) are explicitly ``broadcast()`` — at 100 TB
  the facts shuffle ~nothing for these joins;
- aggregations run partial (map-side) before the single shuffle on the
  group keys;
- top-k uses ``orderBy().limit()`` which Spark executes as per-
  partition TakeOrdered + driver merge of k rows, never a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.plans.registry import register
from kinesis_analytics_demo_spark.session import read_table as _t


def _dec(col):
    """Deterministic monetary arithmetic: double -> DECIMAL(18,6)."""
    return F.col(col).cast("decimal(18,6)") if isinstance(col, str) else col.cast("decimal(18,6)")


# --------------------------------------------------------------------
# Q1-style pricing summary: full-scan aggregate with computed measures.
# Scale: one shuffle on 2 low-cardinality keys; partial aggs map-side;
# whole-stage codegen end to end. The filter and the 8-column
# projection push into the parquet scan.
# --------------------------------------------------------------------
@register(
    "pricing_summary",
    oracle="""
    SELECT
        l_returnflag,
        l_linestatus,
        CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty,
        CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_base_price,
        CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                 * CAST(1 - l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_disc_price,
        CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                 * CAST(1 - l_discount AS DECIMAL(18,6))
                 * CAST(1 + l_tax AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_charge,
        count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-style pricing summary: grouped full-scan aggregate "
    "with derived measures (extended scope; SURVEY.md §7 step 4).",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast(
        "decimal(18,6)"
    )
    charge = disc_price * (F.lit(1) + F.col("l_tax")).cast("decimal(18,6)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(_dec("l_quantity")), 2).cast("double").alias("sum_qty"),
            F.round(F.sum(_dec("l_extendedprice")), 2).cast("double").alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --------------------------------------------------------------------
# Q3-style top-k: selective filters on both sides of a fact-fact join,
# dimension broadcast, TakeOrdered top-k (no global sort).
# --------------------------------------------------------------------
@register(
    "shipping_priority",
    oracle="""
    SELECT
        l_orderkey,
        CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                 * CAST(1 - l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue,
        o_orderdate,
        o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3-style shipping priority: 3-way join (broadcast dim), "
    "grouped revenue, deterministic top-10.",
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    revenue = _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast(
        "decimal(18,6)"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(revenue), 2).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


# --------------------------------------------------------------------
# Q5-style multi-join through the dimension snowflake:
# region -> nation -> customer/supplier -> orders -> lineitem, with the
# customer-nation = supplier-nation co-location constraint. All
# dimensions broadcast; the only shuffle is the final group-by.
# --------------------------------------------------------------------
@register(
    "regional_revenue",
    oracle="""
    SELECT
        n_name,
        CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                 * CAST(1 - l_discount AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
    doc="TPC-H Q5-style local-supplier revenue: 6-way snowflake join "
    "with broadcast dimensions and a compound join condition.",
)
def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast(
        "decimal(18,6)"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(revenue), 2).cast("double").alias("revenue"))
    )


# --------------------------------------------------------------------
# ROLLUP / grouping sets.
# --------------------------------------------------------------------
@register(
    "rollup_revenue",
    oracle="""
    SELECT
        o_orderstatus,
        o_orderpriority,
        CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_price,
        count(*) AS n_orders
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    doc="GROUP BY ROLLUP: hierarchical subtotals + grand total "
    "(extended scope — grouping sets).",
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.round(F.sum(_dec("o_totalprice")), 2).cast("double").alias("total_price"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# --------------------------------------------------------------------
# CUBE.
# --------------------------------------------------------------------
@register(
    "cube_lineitem",
    oracle="""
    SELECT
        l_returnflag,
        l_linestatus,
        CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="GROUP BY CUBE: all grouping-set combinations.",
)
def cube_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum(_dec("l_quantity")), 2).cast("double").alias("sum_qty")
    )


# --------------------------------------------------------------------
# Analytic window functions: rank / lag / running sum with frames.
# Scale: one shuffle on the partition key; frame evaluation is
# streaming within each partition (no row explosion).
# --------------------------------------------------------------------
@register(
    "window_functions",
    oracle="""
    SELECT
        o_custkey,
        o_orderkey,
        o_orderdate,
        row_number() OVER w AS rn,
        rank() OVER (PARTITION BY o_custkey ORDER BY CAST(o_totalprice AS DECIMAL(18,6)) DESC, o_orderkey) AS price_rank,
        lag(o_orderkey) OVER w AS prev_orderkey,
        lead(o_orderkey) OVER w AS next_orderkey,
        CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS running_total
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="Analytic window functions over orders: row_number, rank, "
    "lag/lead, running sum with an explicit ROWS frame.",
)
def window_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_price = W.partitionBy("o_custkey").orderBy(
        _dec("o_totalprice").desc(), F.col("o_orderkey")
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w_price).alias("price_rank"),
        F.lag("o_orderkey").over(w).alias("prev_orderkey"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.round(
            F.sum(_dec("o_totalprice")).over(
                w.rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
            2,
        )
        .cast("double")
        .alias("running_total"),
    )


@register(
    "window_rank_battery",
    oracle="""
    SELECT
        o_orderpriority,
        o_orderkey,
        dense_rank() OVER w AS drank,
        ntile(4) OVER w AS quartile,
        ROUND(percent_rank() OVER w, 9) AS pct_rank,
        ROUND(cume_dist() OVER w, 9) AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY CAST(o_totalprice AS DECIMAL(18,6)) DESC,
                          o_orderkey)
    """,
    doc="The remaining ranking window functions: dense_rank, "
    "ntile(4), percent_rank, cume_dist per order priority — "
    "completes the analytic-function surface beyond "
    "window_functions' row_number/rank/lag/lead. percent_rank and "
    "cume_dist are exact integer ratios (single double division), "
    "so both engines agree bitwise; deterministic total order via "
    "the (price DESC, orderkey) tiebreak.",
)
def window_rank_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy(
        _dec("o_totalprice").desc(), F.col("o_orderkey")
    )
    return orders.select(
        "o_orderpriority",
        "o_orderkey",
        F.dense_rank().over(w).alias("drank"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("cdist"),
    )


# --------------------------------------------------------------------
# Semi / anti joins (EXISTS / NOT EXISTS).
# --------------------------------------------------------------------
@register(
    "customers_with_high_value_orders",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_totalprice > 400000
    )
    """,
    doc="Left-semi join (EXISTS): customers having at least one "
    "high-value order.",
)
def customers_with_high_value_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    doc="Left-anti join (NOT EXISTS): customers with no orders at all.",
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


# --------------------------------------------------------------------
# Outer join with null-producing side.
# --------------------------------------------------------------------
@register(
    "customer_order_counts_outer",
    oracle="""
    SELECT c_custkey, count(o_orderkey) AS n_orders
    FROM customer
    LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
    doc="Left outer join + count over the nullable side (customers "
    "with zero orders count 0).",
)
def customer_order_counts_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


# --------------------------------------------------------------------
# Set operations.
# --------------------------------------------------------------------
@register(
    "set_ops_parts",
    oracle="""
    SELECT p_partkey FROM part WHERE p_size < 25
    INTERSECT
    SELECT p_partkey FROM part WHERE p_brand = 'Brand#1'
    UNION
    SELECT p_partkey FROM part WHERE p_size > 48
    EXCEPT
    SELECT p_partkey FROM part WHERE p_type = 'ECONOMY'
    """,
    doc="Set operations: INTERSECT / UNION (distinct) / EXCEPT chained "
    "with standard SQL precedence.",
)
def set_ops_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    small = part.filter(F.col("p_size") < 25).select("p_partkey")
    brand = part.filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    large = part.filter(F.col("p_size") > 48).select("p_partkey")
    economy = part.filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    # SQL precedence: INTERSECT binds tighter; UNION/EXCEPT left-to-right.
    return small.intersect(brand).union(large).distinct().exceptAll(economy.distinct())


# --------------------------------------------------------------------
# Scalar function surface: string / date / math / conditional.
# --------------------------------------------------------------------
@register(
    "scalar_functions",
    oracle="""
    SELECT
        p_partkey,
        upper(p_name) AS name_upper,
        substr(p_name, 1, 5) AS name_prefix,
        length(p_name) AS name_len,
        concat(p_brand, ':', p_type) AS brand_type,
        replace(p_type, 'ECONOMY', 'ECO') AS type_short,
        CAST(round(sqrt(CAST(p_size AS DOUBLE)), 4) AS DOUBLE) AS size_sqrt,
        CAST(round(ln(p_retailprice + 1), 4) AS DOUBLE) AS log_price,
        abs(p_size - 25) AS size_dist,
        p_size % 7 AS size_mod,
        CASE WHEN p_size < 10 THEN 'small'
             WHEN p_size < 30 THEN 'medium'
             ELSE 'large' END AS size_class,
        coalesce(nullif(p_brand, 'Brand#1'), 'OTHER') AS brand_or_other
    FROM part
    """,
    doc="Scalar expression surface: string ops, math, CASE WHEN, "
    "coalesce/nullif — all whole-stage-codegen JVM expressions.",
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit("ECONOMY"), F.lit("ECO")).alias("type_short"),
        F.round(F.sqrt(F.col("p_size").cast("double")), 4).alias("size_sqrt"),
        F.round(F.log(F.col("p_retailprice") + 1), 4).alias("log_price"),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
        (F.col("p_size") % 7).alias("size_mod"),
        F.when(F.col("p_size") < 10, "small")
        .when(F.col("p_size") < 30, "medium")
        .otherwise("large")
        .alias("size_class"),
        F.coalesce(F.nullif("p_brand", F.lit("Brand#1")), F.lit("OTHER")).alias(
            "brand_or_other"
        ),
    )


# --------------------------------------------------------------------
# Date/time function surface on orders.
# --------------------------------------------------------------------
@register(
    "datetime_functions",
    oracle="""
    SELECT
        o_orderkey,
        CAST(year(o_orderdate) AS INT) AS order_year,
        CAST(month(o_orderdate) AS INT) AS order_month,
        CAST(dayofmonth(o_orderdate) AS INT) AS order_day,
        CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        o_orderdate + INTERVAL 30 DAY AS due_date,
        CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since_epoch_start
    FROM orders
    """,
    doc="Date/time functions: extract parts, truncate, interval "
    "arithmetic, date difference.",
)
def datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")).alias("due_date"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1995-01-01").cast("date"),
        )
        .cast("bigint")
        .alias("days_since_epoch_start"),
    )


# --------------------------------------------------------------------
# Top-k per group (window + filter) — common analytics shape.
# --------------------------------------------------------------------
@register(
    "top_parts_per_brand",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice
    FROM (
        SELECT p_brand, p_partkey, p_retailprice,
               row_number() OVER (PARTITION BY p_brand
                                  ORDER BY p_retailprice DESC, p_partkey) AS rn
        FROM part
    )
    WHERE rn <= 3
    """,
    doc="Top-k per group via ranking window (deterministic tie-break "
    "on the key).",
)
def top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    part = _t(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.col("p_partkey"))
    return (
        part.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_retailprice")
    )


# --------------------------------------------------------------------
# Correlated scalar-subquery shape: compare to group average.
# Expressed as a join against the aggregated side (what Catalyst
# rewrites the subquery into anyway).
# --------------------------------------------------------------------
@register(
    "orders_above_customer_avg",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    JOIN (
        SELECT o_custkey AS ck,
               SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS sum_price,
               count(*) AS n
        FROM orders GROUP BY o_custkey
    ) a ON o_custkey = a.ck
    WHERE CAST(o_totalprice AS DECIMAL(18,6)) * a.n * 2 > a.sum_price * 3
    """,
    doc="Orders exceeding 1.5x their customer's average order value "
    "(correlated-subquery semantics via self-join on the aggregate). "
    "The comparison price > 1.5*avg is algebraically rearranged to "
    "price*n*2 > sum*3 — exact decimal arithmetic on both engines, "
    "no float-division boundary risk.",
)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    avg_side = orders.groupBy(F.col("o_custkey").alias("ck")).agg(
        F.sum(_dec("o_totalprice")).alias("sum_price"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        orders.join(avg_side, orders.o_custkey == avg_side.ck)
        .filter(
            _dec("o_totalprice") * F.col("n") * 2 > F.col("sum_price") * 3
        )
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# --------------------------------------------------------------------
# DISTINCT + count distinct variants.
# --------------------------------------------------------------------
@register(
    "distinct_aggregates",
    oracle="""
    SELECT
        l_returnflag,
        count(DISTINCT l_suppkey) AS n_suppliers,
        count(DISTINCT l_partkey) AS n_parts,
        count(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="COUNT(DISTINCT) aggregates (expand + two-phase aggregation "
    "in Spark).",
)
def distinct_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --------------------------------------------------------------------
# HAVING clause.
# --------------------------------------------------------------------
@register(
    "having_filter",
    oracle="""
    SELECT o_custkey, count(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    HAVING count(*) >= 3
    """,
    doc="Aggregate + HAVING (post-aggregation filter).",
)
def having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 3)
    )
