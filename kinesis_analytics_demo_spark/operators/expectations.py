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

from kinesis_analytics_demo_spark.functions import hashing as H
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

    def _explode_rows(aggdf, specs):
        """One fused violation-count aggregate -> one report row per
        check, exploded from the single result row (same trick as
        corr_matrix: same-table checks share ONE scan instead of one
        union arm each)."""
        return aggdf.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("table_name"),
                            F.lit(ch).alias("check"),
                            F.lit(c).alias("column_name"),
                            F.col(v).cast("bigint").alias("n_violations"),
                            (F.col(v) == 0).alias("passed"),
                        )
                        for (t, ch, c, v) in specs
                    ]
                )
            ).alias("r")
        ).select("r.*")

    nn_uq = _explode_rows(
        orders.agg(
            F.sum(
                F.when(F.col("o_custkey").isNull(), 1).otherwise(0)
            ).alias("v_nn"),
            (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).alias(
                "v_uq"
            ),
        ),
        [
            ("orders", "not_null", "o_custkey", "v_nn"),
            ("orders", "unique", "o_orderkey", "v_uq"),
        ],
    )

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

    av_rg = _explode_rows(
        events.agg(
            F.sum(
                F.when(
                    ~F.col("event_type").isin(EVENT_TYPES), 1
                ).otherwise(0)
            ).alias("v_av"),
            F.sum(F.when(F.col("value") < 0, 1).otherwise(0)).alias("v_rg"),
        ),
        [
            ("events", "accepted_values", "event_type", "v_av"),
            ("events", "value_range", "value", "v_rg"),
        ],
    )

    cc = documents.agg(
        F.sum(
            F.when(F.col("n_chars") != F.length("text"), 1).otherwise(0)
        ).alias("v")
    ).select(*_row("documents", "consistent", "n_chars", F.col("v")))

    out = nn_uq
    for part in (fk1, fk2, av_rg, cc):
        out = out.unionByName(part)
    return out


# ------------------------------------------- replica reconciliation
#: hash modulus for the PLANTED replica corruption: rows with
#: md5(event_id) % 97 == 0 are dropped from the replica, == 1 are
#: value-perturbed (+0.5) — ~1% each, deterministic on both engines
RECON_MOD = 97

_SIG_B = "event_id::VARCHAR || ':' || CAST(CAST(floor(value * 1000000) AS BIGINT) AS VARCHAR)"
_SIG_P = "event_id::VARCHAR || ':' || CAST(CAST(floor((value + 0.5) * 1000000) AS BIGINT) AS VARCHAR)"


@register(
    "reconcile_partition_checksums",
    oracle=f"""
    WITH e AS (
        SELECT CAST(ts AS DATE) AS day, event_type,
               {H.sql_md5_long(_SIG_B)} AS sig_b,
               {H.sql_md5_long(_SIG_P)} AS sig_p,
               {H.sql_md5_long("event_id::VARCHAR")} % {RECON_MOD} AS k
        FROM events
    ),
    b AS (SELECT day, event_type, sig_b AS sig FROM e),
    r AS (SELECT day, event_type,
                 CASE WHEN k = 1 THEN sig_p ELSE sig_b END AS sig
          FROM e WHERE k != 0),
    sb AS (SELECT day, event_type, CAST(count(*) AS BIGINT) AS n,
                  bit_xor(sig) AS x
           FROM b GROUP BY 1, 2),
    sr AS (SELECT day, event_type, CAST(count(*) AS BIGINT) AS n,
                  bit_xor(sig) AS x
           FROM r GROUP BY 1, 2),
    bad AS (SELECT sb.day, sb.event_type, sb.n AS n_base,
                   COALESCE(sr.n, 0) AS n_replica
            FROM sb LEFT JOIN sr USING (day, event_type)
            WHERE sr.n IS NULL OR sb.n != sr.n OR sb.x != sr.x),
    miss AS (SELECT day, event_type, CAST(count(*) AS BIGINT) AS c
             FROM (SELECT b.* FROM b
                   JOIN bad USING (day, event_type))
             ANTI JOIN r USING (day, event_type, sig)
             GROUP BY 1, 2),
    extr AS (SELECT day, event_type, CAST(count(*) AS BIGINT) AS c
             FROM (SELECT r.* FROM r
                   JOIN bad USING (day, event_type))
             ANTI JOIN b USING (day, event_type, sig)
             GROUP BY 1, 2)
    SELECT bad.day, bad.event_type, bad.n_base, bad.n_replica,
           COALESCE(miss.c, 0) AS n_missing,
           COALESCE(extr.c, 0) AS n_extra
    FROM bad
    LEFT JOIN miss USING (day, event_type)
    LEFT JOIN extr USING (day, event_type)
    """,
    doc="Merkle-style replica reconciliation — the anti-entropy audit "
    "a pipeline runs between a table and its replicated/re-ingested "
    "copy: phase 1 compares per-(day, event_type) partition "
    "summaries (row count + order-independent bit_xor of row content "
    "signatures — one scan per side, map-side combined, tiny "
    "output); phase 2 re-reads ONLY the mismatched partitions "
    "(a broadcast semi-join prunes everything else) and anti-joins "
    "signatures both directions to count missing vs extra rows. At "
    "100 TB with date-partitioned storage, phase 2's rescan is "
    "partition-pruned I/O proportional to the damage, not the "
    "table. The replica here is derived IN the query with planted "
    "deterministic corruption (drop md5%97==0, perturb ==1) so both "
    "engines audit the identical pair; row signatures integerize "
    "value via floor(v*1e6) — no float-formatting divergence. "
    "Conservation invariant pinned in tests: n_base - n_replica == "
    "n_missing - n_extra.",
)
def reconcile_partition_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_analytics_demo_spark.caching import tracked_persist

    ev = _t(spark, sf_dir, "events")
    sig_b = H.md5_long(
        F.concat(
            F.col("event_id").cast("string"),
            F.lit(":"),
            F.floor(F.col("value") * 1000000).cast("bigint").cast("string"),
        )
    )
    sig_p = H.md5_long(
        F.concat(
            F.col("event_id").cast("string"),
            F.lit(":"),
            F.floor((F.col("value") + 0.5) * 1000000)
            .cast("bigint")
            .cast("string"),
        )
    )
    k = F.pmod(H.md5_long(F.col("event_id").cast("string")), F.lit(RECON_MOD))
    e = ev.select(
        F.col("ts").cast("date").alias("day"),
        "event_type",
        sig_b.alias("sig_b"),
        sig_p.alias("sig_p"),
        k.alias("k"),
    )
    b = e.select("day", "event_type", F.col("sig_b").alias("sig"))
    r = e.filter(F.col("k") != 0).select(
        "day",
        "event_type",
        F.when(F.col("k") == 1, F.col("sig_p"))
        .otherwise(F.col("sig_b"))
        .alias("sig"),
    )
    part = ["day", "event_type"]

    def summarize(side):
        return side.groupBy(*part).agg(
            F.count(F.lit(1)).alias("n"), F.bit_xor("sig").alias("x")
        )

    sb, sr = summarize(b), summarize(r)
    bad = tracked_persist(
        sb.alias("sb")
        .join(sr.alias("sr"), part, "left")
        .filter(
            F.col("sr.n").isNull()
            | (F.col("sb.n") != F.col("sr.n"))
            | (F.col("sb.x") != F.col("sr.x"))
        )
        .select(
            "day",
            "event_type",
            F.col("sb.n").alias("n_base"),
            F.coalesce(F.col("sr.n"), F.lit(0)).alias("n_replica"),
        )
    )
    badp = F.broadcast(bad.select(*part))
    miss = (
        b.join(badp, part, "left_semi")
        .join(r, part + ["sig"], "left_anti")
        .groupBy(*part)
        .agg(F.count(F.lit(1)).alias("c"))
    )
    extr = (
        r.join(badp, part, "left_semi")
        .join(b, part + ["sig"], "left_anti")
        .groupBy(*part)
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        bad.join(miss.withColumnRenamed("c", "mc"), part, "left")
        .join(extr.withColumnRenamed("c", "ec"), part, "left")
        .select(
            "day",
            "event_type",
            "n_base",
            "n_replica",
            F.coalesce(F.col("mc"), F.lit(0)).alias("n_missing"),
            F.coalesce(F.col("ec"), F.lit(0)).alias("n_extra"),
        )
    )
