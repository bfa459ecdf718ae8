"""Table profiling — the data-quality audit a platform runs before
admitting a source into a pipeline: per-column null counts, exact
distinct cardinality, and typed min/max, in ONE scan.

Design for determinism: no value is ever cast to a display string
(engine string formats for doubles/timestamps differ in corners).
Numeric columns report min/max as DOUBLE; timestamps as epoch
microseconds (exact integers < 2^53, so the DOUBLE carries them
losslessly); varchar columns report raw lexicographic min/max.

Scale notes (100 TB): the whole profile is a single aggregate pass.
The several exact count(DISTINCT col) force Spark's Expand (one input
row fans to one row per distinct-column) — at 100 TB that multiplies
scan output by #profiled-columns, which is exactly when
approx_count_distinct (HLL, single pass, no Expand) replaces it;
everything else (null counts, min/max) stays map-side combinable.
The output is #columns rows — driver-safe at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.plans.registry import register
from kinesis_analytics_demo_spark.session import read_table as _t

#: (column, kind) — kind drives which min/max slot the column reports
#: into: 'num' -> DOUBLE, 'ts' -> epoch micros as DOUBLE, 'str' ->
#: lexicographic VARCHAR.
LINEITEM_PROFILE_COLS: list[tuple[str, str]] = [
    ("l_orderkey", "num"),
    ("l_partkey", "num"),
    ("l_suppkey", "num"),
    ("l_linenumber", "num"),
    ("l_quantity", "num"),
    ("l_extendedprice", "num"),
    ("l_discount", "num"),
    ("l_tax", "num"),
    ("l_returnflag", "str"),
    ("l_linestatus", "str"),
    ("l_shipdate", "ts"),
]


def _profile_oracle() -> str:
    selects = []
    for c, kind in LINEITEM_PROFILE_COLS:
        if kind == "num":
            mn, mx = f"CAST(min({c}) AS DOUBLE)", f"CAST(max({c}) AS DOUBLE)"
            ms, xs = "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)"
        elif kind == "ts":
            mn = f"CAST(epoch_us(min({c})) AS DOUBLE)"
            mx = f"CAST(epoch_us(max({c})) AS DOUBLE)"
            ms, xs = "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)"
        else:
            mn, mx = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
            ms, xs = f"min({c})", f"max({c})"
        selects.append(
            f"""SELECT '{c}' AS column_name,
                   count(*) AS n_rows,
                   count(*) - count({c}) AS n_nulls,
                   count(DISTINCT {c}) AS n_distinct,
                   {mn} AS min_num, {mx} AS max_num,
                   {ms} AS min_str, {xs} AS max_str
            FROM lineitem"""
        )
    return "\nUNION ALL\n".join(selects)


@register(
    "profile_lineitem",
    oracle=_profile_oracle(),
    doc="One-scan table profile of lineitem: per-column null count, "
    "exact distinct cardinality, typed min/max (DOUBLE for numerics, "
    "epoch-micros for timestamps, lexicographic for strings — never "
    "display-string casts, whose formats diverge between engines). "
    "The multi-column exact count(DISTINCT) plans via Expand (row "
    "fan-out per profiled column) — the documented 100 TB swap is "
    "approx_count_distinct, which removes the Expand entirely; null "
    "counts and min/max are plain map-side-combinable aggregates. "
    "Output is 11 rows regardless of table size.",
)
def profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, kind in LINEITEM_PROFILE_COLS:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"nn_{c}")
        )
        aggs.append(F.count_distinct(F.col(c)).alias(f"nd_{c}"))
        if kind == "num":
            aggs.append(F.min(c).cast("double").alias(f"mn_{c}"))
            aggs.append(F.max(c).cast("double").alias(f"mx_{c}"))
        elif kind == "ts":
            # testdata stores TIMESTAMP(MICROS) which Spark loads as
            # NTZ; the session is pinned UTC, so the cast to TIMESTAMP
            # is the identity wall-clock -> epoch mapping DuckDB's
            # epoch_us applies to its (naive) TIMESTAMP
            ts = F.col(c).cast("timestamp")
            aggs.append(
                F.unix_micros(F.min(ts)).cast("double").alias(f"mn_{c}")
            )
            aggs.append(
                F.unix_micros(F.max(ts)).cast("double").alias(f"mx_{c}")
            )
        else:
            aggs.append(F.min(c).alias(f"mn_{c}"))
            aggs.append(F.max(c).alias(f"mx_{c}"))
    one = li.agg(*aggs)
    rows = []
    for c, kind in LINEITEM_PROFILE_COLS:
        if kind == "str":
            mn_num = F.lit(None).cast("double")
            mx_num = F.lit(None).cast("double")
            mn_str, mx_str = F.col(f"mn_{c}"), F.col(f"mx_{c}")
        else:
            mn_num, mx_num = F.col(f"mn_{c}"), F.col(f"mx_{c}")
            mn_str = F.lit(None).cast("string")
            mx_str = F.lit(None).cast("string")
        rows.append(
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("n_rows").alias("n_rows"),
                F.col(f"nn_{c}").cast("bigint").alias("n_nulls"),
                F.col(f"nd_{c}").alias("n_distinct"),
                mn_num.alias("min_num"),
                mx_num.alias("max_num"),
                mn_str.alias("min_str"),
                mx_str.alias("max_str"),
            )
        )
    return one.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


@register(
    "file_provenance_audit",
    oracle="""
    SELECT 'events.parquet' AS file_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           min(ts) AS min_ts,
           max(ts) AS max_ts,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_event_types
    FROM events
    """,
    doc="File-level provenance/lineage audit via Spark's hidden "
    "_metadata column: per input file, row count, event-time span, "
    "and type cardinality — the which-file-broke-the-pipeline query "
    "(skew hunting, late-file detection, backfill verification). "
    "Zero extra scan cost: _metadata is populated by the reader "
    "itself. The fixture is single-file, so one row here; on a real "
    "lake this is one row per ingested file.",
)
def file_provenance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    # _metadata exists only on the raw scan (not after repartition),
    # so read directly rather than through read_table
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return (
        df.select(
            F.col("_metadata.file_name").alias("file_name"),
            F.col("ts").cast("timestamp").alias("ts"),
            "event_type",
        )
        .groupBy("file_name")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("ts").alias("min_ts"),
            F.max("ts").alias("max_ts"),
            F.count_distinct("event_type").alias("n_event_types"),
        )
    )
