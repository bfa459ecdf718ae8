"""Declarative data-quality expectations — the dbt-test /
Great-Expectations layer an ingestion pipeline runs before promoting
a batch: not-null, uniqueness, referential integrity, value ranges,
accepted sets, and cross-column consistency, each reported as a
(table, check, column, n_violations, passed) row.

Engine shape: every check is an aggregate that counts VIOLATIONS
(never materializes them), so each costs one scan with map-side
partial counts — the whole suite is a union of tiny aggregate rows.
Referential integrity is a broadcast anti-join count when the parent
side is dimension-sized (customer/orders here); at 100 TB fact-fact
containment swaps in the shared bloom-filter semi-join pattern
(operators/analytics.py).

Determinism: counts of exactly-decidable predicates — integers on
both engines, no float discipline needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.plans.registry import register
from kinesis_analytics_demo_spark.session import read_table as _t

EVENT_TYPES = ["view", "click", "purchase", "signup", "error"]


def _row(table, check, column, viol_col):
    return (
        F.lit(table).alias("table_name"),
        F.lit(check).alias("check"),
        F.lit(column).alias("column_name"),
        viol_col.cast("bigint").alias("n_violations"),
        (viol_col == 0).alias("passed"),
    )


@register(
    "data_quality_expectations",
    oracle=f"""
    SELECT 'orders' AS table_name, 'not_null' AS check,
           'o_custkey' AS column_name,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violations,
           SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) = 0 AS passed
    FROM orders
    UNION ALL
    SELECT 'orders', 'unique', 'o_orderkey',
           CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT),
           count(*) = count(DISTINCT o_orderkey)
    FROM orders
    UNION ALL
    SELECT 'orders', 'foreign_key', 'o_custkey',
           CAST(count(*) AS BIGINT), count(*) = 0
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey IS NULL
    UNION ALL
    SELECT 'lineitem', 'foreign_key', 'l_orderkey',
           CAST(count(*) AS BIGINT), count(*) = 0
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IS NULL
    UNION ALL
    SELECT 'events', 'accepted_values', 'event_type',
           CAST(SUM(CASE WHEN event_type NOT IN
                ({", ".join(repr(t) for t in EVENT_TYPES)})
                THEN 1 ELSE 0 END) AS BIGINT),
           SUM(CASE WHEN event_type NOT IN
                ({", ".join(repr(t) for t in EVENT_TYPES)})
                THEN 1 ELSE 0 END) = 0
    FROM events
    UNION ALL
    SELECT 'events', 'value_range', 'value',
           CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT),
           SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) = 0
    FROM events
    UNION ALL
    SELECT 'documents', 'consistent', 'n_chars',
           CAST(SUM(CASE WHEN n_chars != length(text) THEN 1 ELSE 0 END)
                AS BIGINT),
           SUM(CASE WHEN n_chars != length(text) THEN 1 ELSE 0 END) = 0
    FROM documents
    """,
    doc="Declarative expectation suite (dbt-test shape): not-null, "
    "key uniqueness, two referential-integrity checks (broadcast "
    "anti-join counts), accepted-values, range, and a cross-column "
    "consistency rule — one violation-COUNTING aggregate per check, "
    "unioned into a pass/fail report. The promote-or-quarantine gate "
    "run before a batch joins the corpus.",
)
def data_quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    lineitem = _t(spark, sf_dir, "lineitem")
    events = _t(spark, sf_dir, "events")
    documents = _t(spark, sf_dir, "documents")

    nn = orders.agg(
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("v")
    ).select(*_row("orders", "not_null", "o_custkey", F.col("v")))

    uq = orders.agg(
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).alias("v")
    ).select(*_row("orders", "unique", "o_orderkey", F.col("v")))

    fk1 = (
        orders.join(
            F.broadcast(customer.select("c_custkey")),
            orders["o_custkey"] == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("v"))
        .select(*_row("orders", "foreign_key", "o_custkey", F.col("v")))
    )

    fk2 = (
        lineitem.join(
            F.broadcast(orders.select("o_orderkey")),
            lineitem["l_orderkey"] == F.col("o_orderkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("v"))
        .select(*_row("lineitem", "foreign_key", "l_orderkey", F.col("v")))
    )

    av = events.agg(
        F.sum(
            F.when(~F.col("event_type").isin(EVENT_TYPES), 1).otherwise(0)
        ).alias("v")
    ).select(*_row("events", "accepted_values", "event_type", F.col("v")))

    rg = events.agg(
        F.sum(F.when(F.col("value") < 0, 1).otherwise(0)).alias("v")
    ).select(*_row("events", "value_range", "value", F.col("v")))

    cc = documents.agg(
        F.sum(
            F.when(F.col("n_chars") != F.length("text"), 1).otherwise(0)
        ).alias("v")
    ).select(*_row("documents", "consistent", "n_chars", F.col("v")))

    out = nn
    for part in (uq, fk1, fk2, av, rg, cc):
        out = out.unionByName(part)
    return out
