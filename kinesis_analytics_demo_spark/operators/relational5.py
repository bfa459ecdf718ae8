"""Batch relational surface, part 5: the remaining TPC-H query shapes
(Q2 min-cost supplier, Q9 profit rollup, Q13 order-count
distribution, Q16 supplier variety, Q20 nested-IN supplier audit),
adapted to the driver's star schema — there is no ``partsupp``, so
the part-supplier relationship comes from observed ``lineitem``
links, exactly the adaptation relational4 uses for Q11/Q17.

With relational/relational2/relational3/relational4 this completes
coverage of all 22 TPC-H query shapes (Q1,3,4,5,6,7,8,10,12,14,15,
17,18,19,21,22 live in the earlier modules).

Scale notes: every correlated/nested subquery is reformulated as an
aggregation + equi-join; dimensions broadcast; the only large
shuffles key on l_partkey / l_suppkey / o_custkey — the same keys
the underlying joins already hash on, so AQE coalesces rather than
re-shuffles. Money math follows the repo's DECIMAL discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.plans.registry import register
from kinesis_analytics_demo_spark.session import read_table as _t


def _dec(col: str):
    return F.col(col).cast("decimal(18,6)")


# --------------------------------------------------------------------
# Q2-shape: min-cost supplier per part. "Supply cost" is the minimum
# unit price this supplier ever charged for the part (min over the
# lineitem links); the query keeps, for EUROPE suppliers and
# mid-size STANDARD parts, the supplier(s) achieving the per-part
# minimum cost.
# --------------------------------------------------------------------
@register(
    "min_cost_supplier",
    oracle="""
    WITH ps AS (
        SELECT l_partkey, l_suppkey,
               min(CAST(l_extendedprice AS DOUBLE)
                   / CAST(l_quantity AS DOUBLE)) AS supply_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eu AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    ),
    cand AS (
        SELECT p.p_partkey, p.p_brand, eu.s_name, eu.s_acctbal, eu.n_name,
               ps.supply_cost,
               min(ps.supply_cost) OVER (PARTITION BY p.p_partkey) AS min_cost
        FROM ps
        JOIN eu ON ps.l_suppkey = eu.s_suppkey
        JOIN part p ON ps.l_partkey = p.p_partkey
        WHERE p.p_size BETWEEN 10 AND 20 AND p.p_type = 'STANDARD'
    )
    SELECT p_partkey, p_brand, s_name, s_acctbal, n_name, supply_cost
    FROM cand WHERE supply_cost = min_cost
    """,
    doc="TPC-H Q2-style min-cost supplier: per-(part, supplier) "
    "supply cost from lineitem links (no partsupp in this schema), "
    "region-filtered suppliers, and the per-part minimum kept via a "
    "window min — no correlated re-execution. At 100 TB: the "
    "(part, supplier) rollup shuffles on l_partkey once; supplier/"
    "nation/region and part are broadcast dims; the window min "
    "reuses the part-key partitioning. Unit cost is a single IEEE "
    "double division — bit-identical on both engines (decimal "
    "division result scales differ between them).",
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(
            F.col("l_extendedprice").cast("double")
            / F.col("l_quantity").cast("double")
        ).alias("supply_cost")
    )
    eu = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(_t(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    parts = _t(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "STANDARD")
    )
    cand = (
        ps.join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey")
        )
        .withColumn(
            "min_cost", F.min("supply_cost").over(Window.partitionBy("p_partkey"))
        )
    )
    return cand.filter(F.col("supply_cost") == F.col("min_cost")).select(
        "p_partkey", "p_brand", "s_name", "s_acctbal", "n_name", "supply_cost"
    )


# --------------------------------------------------------------------
# Q9-shape: profit by supplier nation and order year for one part
# family. Without partsupp's supplycost, cost is modeled as
# quantity * half the part's retail price — decimal-exact and
# schema-derivable.
# --------------------------------------------------------------------
@register(
    "product_profit_by_nation_year",
    oracle="""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,6))
                          * CAST(1 - l_discount AS DECIMAL(18,6))
                          - CAST(l_quantity AS DECIMAL(18,6))
                            * CAST(p_retailprice AS DECIMAL(18,6))
                            * CAST(0.5 AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS sum_profit
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE '%gear%'
    GROUP BY n_name, year(o_orderdate)
    """,
    doc="TPC-H Q9-style product-type profit: revenue minus a "
    "retail-price-derived cost per line, rolled up by supplier "
    "nation and order year for one part family. At 100 TB: the "
    "part-name filter prunes lineitem via the broadcast part dim "
    "BEFORE the orders join (the only fact-fact shuffle, keyed on "
    "l_orderkey); supplier and nation broadcast. Decimal-summed, "
    "rounded once.",
)
def product_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    parts = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    profit = _dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast(
        "decimal(18,6)"
    ) - _dec("l_quantity") * _dec("p_retailprice") * F.lit(0.5).cast("decimal(18,6)")
    return (
        li.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            _t(spark, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(_t(spark, sf_dir, "supplier")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).cast("double").alias("sum_profit"))
    )


# --------------------------------------------------------------------
# Q13-shape: distribution of per-customer order counts, zeros
# included via the outer join.
# --------------------------------------------------------------------
@register(
    "customer_order_count_distribution",
    oracle="""
    WITH c_orders AS (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM c_orders GROUP BY c_count
    """,
    doc="TPC-H Q13-style customer distribution: left join keeps "
    "order-less customers (count(o_orderkey) = 0 for them), then the "
    "histogram of counts. At 100 TB: orders pre-aggregates to "
    "(o_custkey, n) before the join so the outer join moves one row "
    "per customer, and the second groupBy is over at most "
    "max-order-count distinct keys — trivially small.",
)
def customer_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    per_cust = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    c_orders = cust.join(
        per_cust, F.col("c_custkey") == F.col("o_custkey"), "left"
    ).select(F.coalesce(F.col("n"), F.lit(0)).alias("c_count"))
    return c_orders.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


# --------------------------------------------------------------------
# Q16-shape: how many distinct suppliers serve each (brand, type,
# size-bucket), excluding suppliers in deficit — the "supplier
# variety" audit. The part-supplier relation again comes from
# lineitem links.
# --------------------------------------------------------------------
@register(
    "supplier_part_variety",
    oracle="""
    WITH links AS (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ),
    ok AS (SELECT s_suppkey FROM supplier WHERE s_acctbal >= 0)
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM links
    JOIN ok ON l_suppkey = s_suppkey
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 10, 15, 20, 25)
    GROUP BY p_brand, p_type, p_size
    """,
    doc="TPC-H Q16-style parts/supplier variety: distinct observed "
    "(part, supplier) links, negative-balance suppliers excluded "
    "(the NOT IN complaint filter's analogue, as an equi-semi-join "
    "not a NOT IN so nulls can't bite), count distinct suppliers per "
    "(brand, type, size). At 100 TB the DISTINCT link dedup shuffles "
    "on l_partkey once and count(DISTINCT) reuses that clustering; "
    "part and the supplier filter broadcast.",
)
def supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    links = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    ok = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") >= 0)
        .select("s_suppkey")
    )
    parts = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25)
    )
    return (
        links.join(F.broadcast(ok), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


# --------------------------------------------------------------------
# Q20-shape: suppliers who shipped an above-average volume of a part
# family in one year — the nested-IN audit reformulated as
# aggregate + join.
# --------------------------------------------------------------------
@register(
    "high_volume_part_suppliers",
    oracle="""
    WITH shipped AS (
        SELECT l_suppkey, sum(CAST(l_quantity AS DECIMAL(18,6))) AS qty
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'small%'
          AND l_shipdate >= DATE '1997-01-01'
          AND l_shipdate < DATE '1998-01-01'
        GROUP BY l_suppkey
    ),
    threshold AS (
        SELECT CAST(ROUND(avg(qty), 6) AS DECIMAL(18,6)) AS avg_qty FROM shipped
    )
    SELECT s_name, n_name,
           CAST(shipped.qty AS DOUBLE) AS shipped_qty
    FROM shipped, threshold
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE shipped.qty > threshold.avg_qty
    """,
    doc="TPC-H Q20-style supplier audit: per-supplier shipped volume "
    "of one part family in one year, keeping suppliers above the "
    "family-wide average — the nested IN (partsupp IN parts, "
    "availqty > half shipped) becomes one aggregate + a broadcast "
    "scalar threshold. At 100 TB: the part-family filter prunes via "
    "broadcast before any shuffle; the only exchange is the "
    "l_suppkey rollup (100-ish groups); the average is a 1-row "
    "broadcast. Quantity sums are decimal-exact; the avg is rounded "
    "to the decimal scale once on both engines.",
)
def high_volume_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    parts = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    shipped = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
        )
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty"))
    )
    thr = shipped.agg(
        F.round(F.avg("qty"), 6).cast("decimal(18,6)").alias("avg_qty")
    )
    return (
        shipped.crossJoin(F.broadcast(thr))
        .filter(F.col("qty") > F.col("avg_qty"))
        .join(
            F.broadcast(_t(spark, sf_dir, "supplier")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_name", "n_name", F.col("qty").cast("double").alias("shipped_qty"))
    )


# ------------------------------------------------ FULL OUTER join shape
FO_CUST_BAL = 9900.0
FO_SUPP_BAL = 9000.0


@register(
    "full_outer_balance_audit",
    oracle=f"""
    WITH c AS (
        SELECT c_nationkey AS nation_key, count(*) AS n_rich_customers
        FROM customer WHERE c_acctbal > {FO_CUST_BAL} GROUP BY c_nationkey
    ),
    s AS (
        SELECT s_nationkey AS nation_key, count(*) AS n_rich_suppliers
        FROM supplier WHERE s_acctbal > {FO_SUPP_BAL} GROUP BY s_nationkey
    )
    SELECT COALESCE(c.nation_key, s.nation_key) AS nation_key,
           COALESCE(c.n_rich_customers, 0) AS n_rich_customers,
           COALESCE(s.n_rich_suppliers, 0) AS n_rich_suppliers,
           CASE WHEN c.nation_key IS NULL THEN 'supplier_only'
                WHEN s.nation_key IS NULL THEN 'customer_only'
                ELSE 'both' END AS presence
    FROM c FULL OUTER JOIN s ON c.nation_key = s.nation_key
    """,
    doc="FULL OUTER join (the one join kind the rest of the relational "
    "family doesn't exercise): per-nation reconciliation of "
    "high-balance customers vs high-balance suppliers, keeping "
    "nations present on EITHER side with a presence tag — the "
    "two-ledger audit shape. Both inputs aggregate BEFORE the join "
    "(nation-cardinality row counts), so the full-outer join moves "
    "dozens of rows however large the base tables are; the filters "
    "push to the parquet scans.",
)
def full_outer_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > FO_CUST_BAL)
        .groupBy(F.col("c_nationkey").alias("nation_key"))
        .agg(F.count(F.lit(1)).alias("n_rich_customers"))
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > FO_SUPP_BAL)
        .groupBy(F.col("s_nationkey").alias("nation_key"))
        .agg(F.count(F.lit(1)).alias("n_rich_suppliers"))
    )
    c, s = cust.alias("c"), supp.alias("s")
    joined = c.join(s, F.col("c.nation_key") == F.col("s.nation_key"), "full_outer")
    presence = (
        F.when(F.col("c.nation_key").isNull(), "supplier_only")
        .when(F.col("s.nation_key").isNull(), "customer_only")
        .otherwise("both")
    )
    return joined.select(
        F.coalesce(F.col("c.nation_key"), F.col("s.nation_key")).alias(
            "nation_key"
        ),
        F.coalesce(F.col("n_rich_customers"), F.lit(0)).alias(
            "n_rich_customers"
        ),
        F.coalesce(F.col("n_rich_suppliers"), F.lit(0)).alias(
            "n_rich_suppliers"
        ),
        presence.alias("presence"),
    )
