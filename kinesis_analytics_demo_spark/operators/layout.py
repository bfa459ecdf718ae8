"""Data-layout operators: Z-order (Morton) interleaving for multi-
dimensional data skipping.

A parquet lake prunes at file/row-group granularity using min/max
statistics. Sorting by ONE column gives perfect stats on that column
and useless stats on every other; interleaving the bits of two (or
more) columns into a single Z-key and sorting by it gives every
column partially-tight stats — the layout trick behind Delta/Iceberg
``OPTIMIZE ZORDER BY``. Re-expressed engine-natively: the key is a
pure integer column expression (16 shift/mask terms per dimension,
whole-stage codegen), the layout write is ``repartitionByRange`` on
the key + ``sortWithinPartitions`` so every output file covers a
tight Z-range.

Scale: computing the key is a zero-shuffle scan; the layout write is
the one range-shuffle you are buying the skipping with. Skipping
effectiveness is demonstrated measurably in tests/test_layout.py:
row groups overlapping a single-dimension box under Z-order layout
are a strict subset of those under a wrong-single-column sort.

Determinism: integer bit arithmetic, identical on every engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.plans.registry import register
from kinesis_analytics_demo_spark.session import read_table as _t

ZBITS = 16  #: bits kept per dimension (keys must be in [0, 2^16))


def zorder_key(x: Column, y: Column, bits: int = ZBITS) -> Column:
    """Morton-interleave two non-negative integer columns: bit ``i``
    of ``x`` lands at position ``2i``, of ``y`` at ``2i+1``."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        xb = F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1))
        yb = F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1))
        z = z + F.shiftleft(xb, 2 * i) + F.shiftleft(yb, 2 * i + 1)
    return z


def sql_zorder_key(x: str, y: str, bits: int = ZBITS) -> str:
    """DuckDB twin of :func:`zorder_key`."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame, zcol: Column, path: str, n_files: int = 32
) -> None:
    """Lay ``df`` out as ``n_files`` parquet files, each covering a
    tight Z-range: range-partition on the key, sort within each
    partition. File-level min/max stats then skip on every interleaved
    dimension at once."""
    (
        df.withColumn("__z", zcol)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


@register(
    "zorder_key_events",
    oracle=f"""
    SELECT event_id,
           user_id,
           CAST(floor(value) AS BIGINT) AS vbucket,
           CAST({sql_zorder_key('user_id', 'CAST(floor(value) AS BIGINT)')}
                AS BIGINT) AS zkey
    FROM events
    """,
    doc="Z-order (Morton) key over (user_id, floor(value)) — the "
    "data-skipping layout key behind OPTIMIZE ZORDER BY, computed as "
    "32 shift/mask terms in whole-stage codegen (zero shuffle). "
    "Sorting the table by this key gives parquet min/max stats that "
    "prune on BOTH dimensions; measured row-group-pruning win pinned "
    "in tests/test_layout.py.",
)
def zorder_key_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    vb = F.floor(F.col("value")).cast("long")
    return events.select(
        "event_id",
        "user_id",
        vb.alias("vbucket"),
        zorder_key(F.col("user_id"), vb).cast("long").alias("zkey"),
    )
