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


# ----------------------------------------- zone-map pruning audit
#: zone widths: key-range zones, the shape of real partition dirs /
#: row-group clustering — zero-shuffle to assign, unlike row-count
#: zones which need a global row_number.
ZONE_ID_WIDTH = 1024  #: natural layout: event_id // 1024
ZONE_Z_WIDTH = 4096  #: z-order layout: zkey // 4096
#: 2-D box predicate (selects ~6% of rows at sf0.01)
PRED_U_LO, PRED_U_HI = 100, 150
PRED_V_LO, PRED_V_HI = 50, 80
#: time-range predicate [Jan 10, Jan 12)
PRED_T_LO, PRED_T_HI = "2024-01-10 00:00:00", "2024-01-12 00:00:00"


@register(
    "zone_map_pruning_audit",
    oracle=f"""
    WITH base AS (
        SELECT event_id, user_id, ts,
               CAST(floor(value) AS BIGINT) AS vb,
               {sql_zorder_key('user_id', 'CAST(floor(value) AS BIGINT)')}
                   AS zkey
        FROM events),
    tagged AS (
        SELECT 'natural' AS layout, event_id // {ZONE_ID_WIDTH} AS z, *
        FROM base
        UNION ALL
        SELECT 'daily', CAST(date_diff('day', DATE '2024-01-01',
                                       CAST(ts AS DATE)) AS BIGINT), *
        FROM base
        UNION ALL
        SELECT 'zorder', zkey // {ZONE_Z_WIDTH}, * FROM base),
    zones AS (
        SELECT layout, z, count(*) AS n,
               min(user_id) AS min_u, max(user_id) AS max_u,
               min(vb) AS min_v, max(vb) AS max_v,
               min(ts) AS min_t, max(ts) AS max_t,
               count_if(user_id BETWEEN {PRED_U_LO} AND {PRED_U_HI}
                        AND vb BETWEEN {PRED_V_LO} AND {PRED_V_HI}) AS ma,
               count_if(ts >= TIMESTAMP '{PRED_T_LO}'
                        AND ts < TIMESTAMP '{PRED_T_HI}') AS mb
        FROM tagged GROUP BY 1, 2),
    flags AS (
        SELECT *,
               (max_u >= {PRED_U_LO} AND min_u <= {PRED_U_HI}
                AND max_v >= {PRED_V_LO} AND min_v <= {PRED_V_HI}) AS sa,
               (max_t >= TIMESTAMP '{PRED_T_LO}'
                AND min_t < TIMESTAMP '{PRED_T_HI}') AS sb
        FROM zones)
    SELECT layout, 'box2d_user_value' AS pred,
           CAST(count(*) AS BIGINT) AS n_zones,
           CAST(count_if(sa) AS BIGINT) AS n_zones_scanned,
           CAST(COALESCE(SUM(CASE WHEN sa THEN n END), 0) AS BIGINT)
               AS n_rows_scanned,
           CAST(SUM(ma) AS BIGINT) AS n_rows_matching
    FROM flags GROUP BY layout
    UNION ALL
    SELECT layout, 'time_range',
           CAST(count(*) AS BIGINT),
           CAST(count_if(sb) AS BIGINT),
           CAST(COALESCE(SUM(CASE WHEN sb THEN n END), 0) AS BIGINT),
           CAST(SUM(mb) AS BIGINT)
    FROM flags GROUP BY layout
    """,
    doc="Data-skipping effectiveness audit: assigns every event to a "
    "KEY-RANGE zone under three layouts (insert-order event_id "
    "blocks, daily time partitions, z-order key blocks), computes "
    "each zone's min/max stats — exactly what parquet footers / "
    "Delta file stats store — and reports, per layout x predicate, "
    "how many zones and rows a min/max-pruning reader must touch vs "
    "rows actually matching. The quantified version of the layout "
    "story: the 2-D box predicate prunes only under z-order; the "
    "time-range predicate prunes under the time layout. Zone "
    "assignment is a pure column expression (no global row_number), "
    "so the audit itself is one scan + one hash aggregate per "
    "layout at any scale.",
)
def zone_map_pruning_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    vb = F.floor(F.col("value")).cast("long")
    base = ev.select(
        "event_id",
        "user_id",
        ts.alias("ts"),
        vb.alias("vb"),
        zorder_key(F.col("user_id"), vb).alias("zkey"),
    )
    # ONE events pass: each row explodes into its three (layout, zone)
    # tags — the three-arm union scanned the table once per layout,
    # per readout consumer.
    layouts = F.array(
        F.struct(
            F.lit("natural").alias("layout"),
            F.floor(F.col("event_id") / ZONE_ID_WIDTH).alias("z"),
        ),
        F.struct(
            F.lit("daily").alias("layout"),
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            )
            .cast("long")
            .alias("z"),
        ),
        F.struct(
            F.lit("zorder").alias("layout"),
            F.floor(F.col("zkey") / ZONE_Z_WIDTH).alias("z"),
        ),
    )
    tagged = base.select(F.explode(layouts).alias("lz"), "*").select(
        F.col("lz.layout").alias("layout"),
        F.col("lz.z").alias("z"),
        "event_id",
        "user_id",
        "ts",
        "vb",
        "zkey",
    )
    t_lo = F.to_timestamp(F.lit(PRED_T_LO))
    t_hi = F.to_timestamp(F.lit(PRED_T_HI))
    pa = F.col("user_id").between(PRED_U_LO, PRED_U_HI) & F.col("vb").between(
        PRED_V_LO, PRED_V_HI
    )
    pb = (F.col("ts") >= t_lo) & (F.col("ts") < t_hi)
    zones = tagged.groupBy("layout", "z").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("user_id").alias("min_u"),
        F.max("user_id").alias("max_u"),
        F.min("vb").alias("min_v"),
        F.max("vb").alias("max_v"),
        F.min("ts").alias("min_t"),
        F.max("ts").alias("max_t"),
        F.count_if(pa).alias("ma"),
        F.count_if(pb).alias("mb"),
    )
    sa = (
        (F.col("max_u") >= PRED_U_LO)
        & (F.col("min_u") <= PRED_U_HI)
        & (F.col("max_v") >= PRED_V_LO)
        & (F.col("min_v") <= PRED_V_HI)
    )
    sb = (F.col("max_t") >= t_lo) & (F.col("min_t") < t_hi)
    flags = zones.select("*", sa.alias("sa"), sb.alias("sb"))

    # Both predicates' readouts in ONE aggregate over the zone table,
    # exploded into the two report rows — the per-predicate audits
    # re-ran the whole scan + zone aggregation once each.
    def _pred_cols(flag: str, m: str, tag: str):
        return [
            F.count_if(F.col(flag)).cast("bigint").alias(f"zs_{tag}"),
            F.coalesce(F.sum(F.when(F.col(flag), F.col("n"))), F.lit(0))
            .cast("bigint")
            .alias(f"rs_{tag}"),
            F.sum(m).cast("bigint").alias(f"rm_{tag}"),
        ]

    g = flags.groupBy("layout").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_zones"),
        *_pred_cols("sa", "ma", "a"),
        *_pred_cols("sb", "mb", "b"),
    )

    def _pred_struct(pred_name: str, tag: str):
        return F.struct(
            F.lit(pred_name).alias("pred"),
            F.col(f"zs_{tag}").alias("n_zones_scanned"),
            F.col(f"rs_{tag}").alias("n_rows_scanned"),
            F.col(f"rm_{tag}").alias("n_rows_matching"),
        )

    return g.select(
        "layout",
        "n_zones",
        F.explode(
            F.array(
                _pred_struct("box2d_user_value", "a"),
                _pred_struct("time_range", "b"),
            )
        ).alias("p"),
    ).select(
        "layout",
        F.col("p.pred").alias("pred"),
        "n_zones",
        F.col("p.n_zones_scanned").alias("n_zones_scanned"),
        F.col("p.n_rows_scanned").alias("n_rows_scanned"),
        F.col("p.n_rows_matching").alias("n_rows_matching"),
    )
