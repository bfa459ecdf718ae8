"""Sketches, part 2 — cardinality and second-moment estimation built
from first principles on deterministic seeded hashes, so both engines
compute BIT-IDENTICAL sketch state and the estimates are exact-parity
oracle-checkable (the repo's Poisson-bootstrap discipline applied to
the two classic streaming sketches):

``hll_distinct_event_ids`` — a from-scratch HyperLogLog (Flajolet et
al. 2007): 256 registers addressed by the low 8 bits of a 60-bit
md5-derived hash, register value = position of the leading 1-bit in
the remaining 52-bit window. The harmonic-mean denominator
sum(2^-M_j) is computed EXACTLY as the integer sum(2^(53-M_j))
scaled once by 2^-53 at the end — no floating-point accumulation at
all, so partition order is irrelevant on both engines. (Spark's
built-in approx_count_distinct is the production path — benchmarked
in approx_aggregates; this query is the auditable open-box twin.)

``ams_f2_user_events`` — an AMS/Tug-of-War sketch (Alon, Matias &
Szegedy 1996) estimating the self-join size F2 = sum_u c_u^2 of the
events-by-user key: 16 independent +/-1 sign hashes, X_j = sum of
signs (an INTEGER, order-free), estimator = median of 4 means of 4
X_j^2 each. The only float ops are the final /4 divisions (exact:
the numerators are < 2^53) and the engine-proven interpolated
median. F2 is what a join optimizer needs to size a self-join's
shuffle before running it — compare join_size_estimate_sampled
(the sampling-based alternative on the same question).

Scale: both sketches are one scan + a groupBy over a BOUNDED key
domain (256 registers / 16 sketches) — the shuffle carries only
map-side-combined partials; sketch state is constant-size regardless
of input rows. The x16 explode in AMS multiplies scan-side rows but
combines per partition before the exchange.

Reference anchor: no sketch surface exists in the reference
(flink/tumbling_window.py, sliding_window.py); extends the sketch
battery of operators/sketches.py (KMV, CMS, Bloom).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.plans.registry import register
from kinesis_analytics_demo_spark.session import read_table as _t

HLL_B = 8  #: register-index bits
HLL_M = 1 << HLL_B  #: 256 registers
HLL_W = 60 - HLL_B  #: 52-bit rho window from the 60-bit md5 hash
HLL_SHIFT = HLL_W + 1  #: max rho (all-zero window) = 53
#: standard HLL bias constant for m >= 128
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)

#: 60-bit md5 integer, SQL fragment (functions/hashing.py primitive)
_H_SQL = "CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT)"


@register(
    "hll_distinct_event_ids",
    oracle=f"""
    WITH h AS (
        SELECT {_H_SQL} AS h FROM events),
    r AS (
        SELECT h & {HLL_M - 1} AS reg,
               CASE WHEN h >> {HLL_B} = 0 THEN {HLL_SHIFT}
                    ELSE {HLL_W} - length(bin(h >> {HLL_B})) + 1
               END AS rho
        FROM h),
    m AS (
        SELECT reg, MAX(rho) AS mj FROM r GROUP BY reg),
    s AS (
        SELECT CAST(SUM(1::BIGINT << ({HLL_SHIFT} - mj)) AS BIGINT)
               + ({HLL_M} - COUNT(*)) * (1::BIGINT << {HLL_SHIFT})
                   AS s_int,
               CAST(COUNT(*) AS BIGINT) AS n_registers_hit
        FROM m),
    t AS (SELECT CAST(COUNT(DISTINCT event_id) AS BIGINT) AS true_distinct
          FROM events)
    SELECT t.true_distinct, s.n_registers_hit,
           CAST(ROUND({HLL_ALPHA!r}::DOUBLE * {float(HLL_M * HLL_M)}::DOUBLE
                * ({float(1 << HLL_SHIFT)}::DOUBLE / s.s_int), 2) AS DOUBLE)
               AS hll_estimate,
           CAST(ROUND(({HLL_ALPHA!r}::DOUBLE * {float(HLL_M * HLL_M)}::DOUBLE
                * ({float(1 << HLL_SHIFT)}::DOUBLE / s.s_int)
                - t.true_distinct)
                / t.true_distinct, 6) + 0.0 AS DOUBLE) AS rel_err
    FROM s, t
    """,
    doc="HyperLogLog cardinality of event_id from first principles "
    "(see module docstring): 256 registers, rho via the minimal-"
    "binary-string length (bin() renders integers identically on "
    "both engines — no log2, which mis-rounds at 2^k-1 boundaries), "
    "integer-exact harmonic denominator, one final float expression "
    "evaluated in the same parenthesization on both engines. "
    "Emits the estimate next to the exact distinct and the relative "
    "error; no small-range (linear counting) branch — the corpus is "
    "above the 5m/2 threshold at every SF, and the raw-estimate bias "
    "below it would still be engine-identical.",
)
def hll_distinct_event_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    h = F.conv(
        F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    w = F.shiftright(h, HLL_B)
    r = ev.select(
        h.bitwiseAND(HLL_M - 1).alias("reg"),
        F.when(w == 0, F.lit(HLL_SHIFT))
        .otherwise(F.lit(HLL_W) - F.length(F.bin(w)) + 1)
        .alias("rho"),
    )
    m = r.groupBy("reg").agg(F.max("rho").alias("mj"))
    s = m.agg(
        (
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_SHIFT} - mj)"))
            + (F.lit(HLL_M) - F.count(F.lit(1)))
            * F.lit(1 << HLL_SHIFT).cast("long")
        )
        .cast("long")
        .alias("s_int"),
        F.count(F.lit(1)).cast("long").alias("n_registers_hit"),
    )
    t = ev.agg(
        F.countDistinct("event_id").cast("long").alias("true_distinct")
    )
    est = (
        F.lit(HLL_ALPHA)
        * F.lit(float(HLL_M * HLL_M))
        * (F.lit(float(1 << HLL_SHIFT)) / F.col("s_int"))
    )
    return (
        s.crossJoin(F.broadcast(t))
        .select(
            "true_distinct",
            "n_registers_hit",
            F.round(est, 2).cast("double").alias("hll_estimate"),
            (
                F.round(
                    (est - F.col("true_distinct")) / F.col("true_distinct"),
                    6,
                )
                + F.lit(0.0)
            )
            .cast("double")
            .alias("rel_err"),
        )
    )


AMS_SKETCHES = 16  #: independent sign hashes
AMS_GROUPS = 4  #: median-of-means: 4 groups x 4 sketches


@register(
    "ams_f2_user_events",
    oracle=f"""
    WITH signs AS (
        SELECT j,
               CASE WHEN CAST(('0x' || substr(md5(
                        CAST(user_id AS VARCHAR) || '|ams' ||
                        CAST(j AS VARCHAR)), 1, 15)) AS BIGINT) % 2 = 0
                    THEN 1 ELSE -1 END AS sgn
        FROM events, (SELECT unnest(generate_series(1, {AMS_SKETCHES}))
                      AS j)),
    x AS (
        SELECT j, CAST(SUM(sgn) AS BIGINT) AS xj FROM signs GROUP BY j),
    g AS (
        SELECT (j - 1) // {AMS_SKETCHES // AMS_GROUPS} AS grp,
               CAST(SUM(xj * xj) AS DOUBLE)
                   / {AMS_SKETCHES // AMS_GROUPS} AS mean_x2
        FROM x GROUP BY 1),
    est AS (
        SELECT quantile_cont(mean_x2, 0.5) AS f2_est FROM g),
    tru AS (
        SELECT CAST(SUM(c * c) AS BIGINT) AS f2_true
        FROM (SELECT CAST(COUNT(*) AS BIGINT) AS c
              FROM events GROUP BY user_id))
    SELECT tru.f2_true,
           CAST(ROUND(est.f2_est, 2) AS DOUBLE) AS f2_estimate,
           CAST(ROUND((est.f2_est - tru.f2_true) / tru.f2_true, 6) + 0.0
                AS DOUBLE) AS rel_err
    FROM est, tru
    """,
    doc="AMS tug-of-war second-moment sketch for the user_id key of "
    "events (see module docstring): 16 seeded-md5 sign hashes, "
    "integer X_j sums, median of 4 group means of X_j^2 against the "
    "exact F2 = sum of squared per-user counts. The engine-proven "
    "interpolated median (percentile == quantile_cont) is the only "
    "non-trivial float op; /4 means are exact doubles.",
)
def ams_f2_user_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    signs = ev.select(
        F.explode(
            F.sequence(F.lit(1), F.lit(AMS_SKETCHES))
        ).alias("j"),
        "user_id",
    ).select(
        "j",
        F.when(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("user_id").cast("string"),
                            F.lit("|ams"),
                            F.col("j").cast("string"),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            % 2
            == 0,
            1,
        )
        .otherwise(-1)
        .alias("sgn"),
    )
    x = signs.groupBy("j").agg(F.sum("sgn").cast("long").alias("xj"))
    per_group = AMS_SKETCHES // AMS_GROUPS
    g = x.groupBy(
        F.floor((F.col("j") - 1) / per_group).alias("grp")
    ).agg(
        (
            F.sum(F.col("xj") * F.col("xj")).cast("double")
            / F.lit(per_group)
        ).alias("mean_x2")
    )
    est = g.agg(F.percentile("mean_x2", 0.5).alias("f2_est"))
    tru = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).cast("long").alias("f2_true"))
    )
    return est.crossJoin(F.broadcast(tru)).select(
        "f2_true",
        F.round("f2_est", 2).cast("double").alias("f2_estimate"),
        (
            F.round(
                (F.col("f2_est") - F.col("f2_true")) / F.col("f2_true"), 6
            )
            + F.lit(0.0)
        )
        .cast("double")
        .alias("rel_err"),
    )


# ---------------------------------------- rolling HLL sketch merge
HLL_ROLL_DAYS = 7  #: trailing window width (weekly-active-users)

#: 60-bit md5 integer over user_id (the WAU key)
_HU_SQL = (
    "CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)"
)


#: shared with streaming_hll_rolling_replay (reference_queries2.py):
#: the streaming sliding-window register merge must equal this batch
#: range-join merge exactly.
HLL_ROLL_ORACLE = f"""
    WITH r AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               {_HU_SQL} & {HLL_M - 1} AS reg,
               CASE WHEN {_HU_SQL} >> {HLL_B} = 0 THEN {HLL_SHIFT}
                    ELSE {HLL_W} - length(bin({_HU_SQL} >> {HLL_B})) + 1
               END AS rho
        FROM events),
    daily AS (
        SELECT day, reg, MAX(rho) AS mj FROM r GROUP BY day, reg),
    days AS (SELECT DISTINCT day FROM daily),
    merged AS (
        SELECT d.day, s.reg, MAX(s.mj) AS mj,
               CAST(COUNT(DISTINCT s.day) AS BIGINT) AS nd
        FROM days d JOIN daily s
          ON s.day BETWEEN d.day - INTERVAL {HLL_ROLL_DAYS - 1} DAY
                       AND d.day
        GROUP BY d.day, s.reg),
    s AS (
        SELECT day, MAX(nd) AS n_days_merged,
               CAST(SUM(1::BIGINT << ({HLL_SHIFT} - mj)) AS BIGINT)
               + ({HLL_M} - COUNT(*)) * (1::BIGINT << {HLL_SHIFT})
                   AS s_int,
               CAST(COUNT(*) AS BIGINT) AS n_registers_hit
        FROM merged GROUP BY day),
    du AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day,
                  user_id
           FROM events),
    tru AS (
        SELECT d.day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT)
                          AS true_distinct
        FROM days d JOIN du u
          ON u.day BETWEEN d.day - INTERVAL {HLL_ROLL_DAYS - 1} DAY
                       AND d.day
        GROUP BY d.day)
    SELECT s.day, s.n_days_merged, s.n_registers_hit,
           CAST(ROUND({HLL_ALPHA!r}::DOUBLE * {float(HLL_M * HLL_M)}::DOUBLE
                * ({float(1 << HLL_SHIFT)}::DOUBLE / s.s_int), 2) AS DOUBLE)
               AS hll_estimate,
           tru.true_distinct,
           CAST(ROUND(({HLL_ALPHA!r}::DOUBLE * {float(HLL_M * HLL_M)}::DOUBLE
                * ({float(1 << HLL_SHIFT)}::DOUBLE / s.s_int)
                - tru.true_distinct)
                / tru.true_distinct, 6) + 0.0 AS DOUBLE) AS rel_err
    FROM s JOIN tru ON s.day = tru.day
    """


@register(
    "hll_rolling_distinct_users",
    oracle=HLL_ROLL_ORACLE,
    doc="Rolling 7-day distinct users (weekly-active-users) from "
    "MERGED daily HyperLogLog sketches — the canonical 100 TB "
    "pre-aggregation pattern: the raw scan builds one 256-register "
    "sketch PER DAY (map-side-combinable, constant state), and every "
    "trailing-window question is then answered by register-wise MAX "
    "over at most 7 day-sketches x 256 rows — the range join touches "
    "the days x 256 sketch table, never the events again. Estimator "
    "arithmetic is the integer-exact harmonic form of "
    "hll_distinct_event_ids (same registers, same rho, zero float "
    "accumulation), so both engines are bit-identical. The exact "
    "rolling COUNT(DISTINCT) and rel_err columns are the AUDIT side "
    "(computed from the bounded daily-distinct-users table here; at "
    "production scale you emit only the estimate). Raw estimate, no "
    "linear-counting branch: ln() is not bit-reproducible across "
    "libm builds, and the small-range bias is engine-identical and "
    "visible in rel_err.",
)
def hll_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    daily = hll_user_daily_registers(ev)
    return hll_rolling_from_daily(daily, ev)


def hll_user_register_cols() -> tuple:
    """(reg, rho) column expressions over ``user_id`` — the sketch
    primitive shared by the batch query and the streaming replay."""
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    w = F.shiftright(h, HLL_B)
    return (
        h.bitwiseAND(HLL_M - 1).alias("reg"),
        F.when(w == 0, F.lit(HLL_SHIFT))
        .otherwise(F.lit(HLL_W) - F.length(F.bin(w)) + 1)
        .alias("rho"),
    )


def hll_user_daily_registers(ev: DataFrame) -> DataFrame:
    """Per-day 256-register HLL sketch of user_id: (day, reg, mj)."""
    reg, rho = hll_user_register_cols()
    r = ev.select(
        F.to_date(F.date_trunc("day", F.col("ts").cast("timestamp"))).alias(
            "day"
        ),
        reg,
        rho,
    )
    return r.groupBy("day", "reg").agg(F.max("rho").alias("mj"))


def hll_rolling_from_daily(daily: DataFrame, ev: DataFrame) -> DataFrame:
    """Trailing-window register merge + estimate + exact-audit join,
    given the (day, reg, mj) daily sketch table — the part of the
    rolling-WAU plan that never touches raw events again."""
    days = daily.select("day").distinct().select(F.col("day").alias("d"))
    merged = (
        F.broadcast(days)
        .join(
            daily,
            daily["day"].between(
                F.date_sub(F.col("d"), HLL_ROLL_DAYS - 1), F.col("d")
            ),
        )
        .groupBy("d", "reg")
        .agg(
            F.max("mj").alias("mj"),
            F.countDistinct("day").cast("long").alias("nd"),
        )
    )
    s = merged.groupBy("d").agg(
        F.max("nd").alias("n_days_merged"),
        (
            F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_SHIFT} - mj)"))
            + (F.lit(HLL_M) - F.count(F.lit(1)))
            * F.lit(1 << HLL_SHIFT).cast("long")
        )
        .cast("long")
        .alias("s_int"),
        F.count(F.lit(1)).cast("long").alias("n_registers_hit"),
    )
    du = ev.select(
        F.to_date(F.date_trunc("day", F.col("ts").cast("timestamp"))).alias(
            "day"
        ),
        "user_id",
    ).distinct()
    tru = (
        F.broadcast(days.select(F.col("d").alias("td")))
        .join(
            du,
            du["day"].between(
                F.date_sub(F.col("td"), HLL_ROLL_DAYS - 1), F.col("td")
            ),
        )
        .groupBy("td")
        .agg(F.countDistinct("user_id").cast("long").alias("true_distinct"))
    )
    est = (
        F.lit(HLL_ALPHA)
        * F.lit(float(HLL_M * HLL_M))
        * (F.lit(float(1 << HLL_SHIFT)) / F.col("s_int"))
    )
    return (
        s.join(tru, s["d"] == tru["td"])
        .select(
            F.col("d").alias("day"),
            "n_days_merged",
            "n_registers_hit",
            F.round(est, 2).cast("double").alias("hll_estimate"),
            "true_distinct",
            (
                F.round(
                    (est - F.col("true_distinct")) / F.col("true_distinct"),
                    6,
                )
                + F.lit(0.0)
            )
            .cast("double")
            .alias("rel_err"),
        )
    )


# ------------------------------------- Misra-Gries / space-saving top-k
MG_K = 8  #: summary capacity per bucket (error <= n_bucket/(k+1))
MG_BUCKETS = 32  #: deterministic item-hash buckets (user_id % buckets)
MG_TOPN = 10  #: final report size
MG_SHIFT = 24  #: entry = (item << shift) | count; count < 2^24
MG_MASK = (1 << MG_SHIFT) - 1

#: The full oracle, shared VERBATIM with streaming_spacesaving_replay
#: (one sketch definition, batch + streaming readouts): per bucket,
#: fold the (ts, event_id)-ordered item stream through the
#: Misra-Gries update with a LIST-of-BIGINT accumulator (bit-packed
#: entries — the scalar/list-state discipline; the DuckDB struct-
#: accumulator trap does not apply), then decode, join exact counts,
#: and rank.
MG_ORACLE = f"""
    WITH b AS (
        SELECT user_id % {MG_BUCKETS} AS bucket, ts, event_id, user_id
        FROM events),
    seq AS (
        SELECT bucket,
               [x.user_id for x in
                list({{'ts': ts, 'event_id': event_id,
                       'user_id': user_id}} ORDER BY ts, event_id)]
                   AS items
        FROM b GROUP BY bucket),
    st AS (
        SELECT bucket,
               list_reduce(
                   [[]::BIGINT[]] || [[x] for x in items],
                   (st, xe) -> CASE
                       WHEN len(list_filter(st,
                                e -> (e >> {MG_SHIFT}) = xe[1])) > 0
                       THEN list_transform(st,
                                e -> CASE WHEN (e >> {MG_SHIFT}) = xe[1]
                                          THEN e + 1 ELSE e END)
                       WHEN len(st) < {MG_K}
                       THEN list_append(st, (xe[1] << {MG_SHIFT}) + 1)
                       ELSE list_filter(
                                list_transform(st, e -> e - 1),
                                e -> (e & {MG_MASK}) > 0)
                   END) AS state
        FROM seq),
    dec AS (
        SELECT e >> {MG_SHIFT} AS user_id,
               e & {MG_MASK} AS approx_count
        FROM (SELECT unnest(state) AS e FROM st)),
    ex AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS exact_count
        FROM events GROUP BY user_id),
    r AS (
        SELECT d.user_id, d.approx_count, ex.exact_count,
               row_number() OVER (ORDER BY d.approx_count DESC,
                                  d.user_id) AS rnk
        FROM dec d JOIN ex ON d.user_id = ex.user_id)
    SELECT CAST(rnk AS INT) AS rank,
           CAST(user_id AS BIGINT) AS user_id,
           CAST(approx_count AS BIGINT) AS approx_count,
           exact_count,
           CAST(exact_count - approx_count AS BIGINT) AS undercount
    FROM r WHERE rnk <= {MG_TOPN}
"""


def mg_finalize(entries: DataFrame, ev: DataFrame) -> DataFrame:
    """Decode bit-packed MG entries ``(e)``, join exact counts from
    the events table, rank by (approx DESC, user) and keep the top
    MG_TOPN — shared by the batch query and the streaming replay."""
    from pyspark.sql import Window

    dec = entries.select(
        F.shiftright(F.col("e"), MG_SHIFT).alias("user_id"),
        F.col("e").bitwiseAND(F.lit(MG_MASK)).alias("approx_count"),
    )
    ex = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_count")
    )
    r = dec.join(ex, "user_id").withColumn(
        "rnk",
        F.row_number().over(
            Window.orderBy(F.desc("approx_count"), F.col("user_id"))
        ),
    )
    return r.filter(F.col("rnk") <= MG_TOPN).select(
        F.col("rnk").cast("int").alias("rank"),
        F.col("user_id").cast("bigint").alias("user_id"),
        F.col("approx_count").cast("bigint").alias("approx_count"),
        "exact_count",
        (F.col("exact_count") - F.col("approx_count"))
        .cast("bigint")
        .alias("undercount"),
    )


def mg_update_lambda(st, xe):
    """One Misra-Gries update as a pure JVM expression: ``st`` is the
    bit-packed LIST state, ``xe`` the incoming item. Mirrors the
    DuckDB fold in MG_ORACLE exactly."""
    item = xe  # the raw item; state entries below are packed, xe is not
    seen = F.exists(st, lambda e: F.shiftright(e, MG_SHIFT) == item)
    return (
        F.when(
            seen,
            F.transform(
                st,
                lambda e: F.when(
                    F.shiftright(e, MG_SHIFT) == item, e + 1
                ).otherwise(e),
            ),
        )
        .when(
            F.size(st) < MG_K,
            F.concat(st, F.array(F.shiftleft(item, MG_SHIFT) + 1)),
        )
        .otherwise(
            F.filter(
                F.transform(st, lambda e: e - 1),
                lambda e: e.bitwiseAND(F.lit(MG_MASK)) > 0,
            )
        )
    )


@register(
    "heavy_hitters_spacesaving",
    oracle=MG_ORACLE,
    doc=f"Misra-Gries (space-saving) top-{MG_TOPN} users by event "
    f"count: the items are hash-bucketed ({MG_BUCKETS} buckets = the "
    "deterministic stand-in for 'one summary per input partition'), "
    f"each bucket folds its (ts, event_id)-ordered item stream "
    f"through a capacity-{MG_K} Misra-Gries summary (match -> "
    "increment; room -> insert at 1; full -> decrement all, drop "
    "zeros), and because the bucketing partitions the ITEM space, "
    "the global summary is the plain union — no cross-bucket merge "
    "arithmetic. Guarantees: approx <= exact (pure undercount), "
    f"error <= n_bucket/{MG_K + 1}; any item with global share above "
    "that survives. The DETERMINISTIC oracle-checkable twin of "
    "per-partition streaming summaries (the Poisson-bootstrap "
    "discipline: swap buckets for physical partitions + a merge in "
    "production, one line). State is a LIST of bit-packed BIGINTs "
    f"(item << {MG_SHIFT} | count) folded with identical lambdas on "
    "both engines — pure integer ops, no float discipline needed. "
    "Scale: the fold is map-side-sequential per bucket (the sketch "
    "property), the shuffle carries only {MG_BUCKETS} bounded "
    "summaries plus the exact-count rollup for the audit columns; "
    "compare heavy_hitters_cms (hash-collision overcount) — MG is "
    "the undercount-biased dual with deterministic state.",
)
def heavy_hitters_spacesaving(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    seq = (
        ev.select(
            (F.col("user_id") % MG_BUCKETS).alias("bucket"),
            F.col("ts").cast("timestamp").alias("ts"),
            "event_id",
            "user_id",
        )
        .groupBy("bucket")
        .agg(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("ts", "event_id", "user_id"))
                ),
                lambda x: x["user_id"],
            ).alias("items")
        )
    )
    st = seq.select(
        "bucket",
        F.aggregate(
            F.col("items"),
            F.expr("CAST(array() AS ARRAY<BIGINT>)"),
            mg_update_lambda,
        ).alias("state"),
    )
    entries = st.select(F.explode("state").alias("e"))
    return mg_finalize(entries, ev)


# --------------------------------------- bitmap-index type overlap
BM_WORD = 63  #: bits per bitmap word (63 keeps the sign bit clear)


@register(
    "bitmap_type_overlap",
    oracle=f"""
    WITH w AS (
        SELECT event_type, user_id // {BM_WORD} AS word,
               bit_or(1::BIGINT << CAST(user_id % {BM_WORD} AS INT)) AS bm
        FROM events GROUP BY 1, 2),
    n AS (
        SELECT event_type, CAST(SUM(bit_count(bm)) AS BIGINT) AS n_users
        FROM w GROUP BY event_type),
    inter AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(SUM(bit_count(a.bm & b.bm)) AS BIGINT) AS n_both
        FROM w a JOIN w b
          ON a.word = b.word AND a.event_type < b.event_type
        GROUP BY 1, 2)
    SELECT i.type_a, i.type_b,
           na.n_users AS n_users_a, nb.n_users AS n_users_b, i.n_both,
           ROUND(CAST(i.n_both AS DOUBLE)
                 / (na.n_users + nb.n_users - i.n_both), 6) AS jaccard
    FROM inter i
    JOIN n na ON na.event_type = i.type_a
    JOIN n nb ON nb.event_type = i.type_b
    """,
    doc=f"Bitmap-index audience overlap between event types: per "
    f"(type, word) the user set compresses to a {BM_WORD}-bit BIGINT "
    "word (bit i set iff user word*63+i did the type — the roaring/"
    "bitmap-index layout OLAP engines use for COUNT(DISTINCT)-"
    "intersection questions), and every pairwise overlap is "
    "SUM(bit_count(a & b)) over word-aligned pairs — no distinct "
    "shuffle, no set materialization, pure integer ops on both "
    "engines. Reports per-pair audience sizes, the intersection, "
    "and Jaccard affinity (one IEEE division under ROUND). Scale: "
    "the bitmap build is one map-side-combinable BIT_OR rollup "
    "(state = one word per present (type, word) — dense user-id "
    "spaces compress ~63:1); intersections join word-aligned on the "
    "word key and never touch raw users. The classic bitmap-index "
    "win: K type-pair overlaps cost one self-join of the compressed "
    "table, not K distinct-count scans.",
)
def bitmap_type_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # integer floor-div via subtraction of the modulus keeps the word
    # index in exact BIGINT arithmetic (Spark's / is float division)
    w = (
        ev.select(
            "event_type",
            ((F.col("user_id") - F.col("user_id") % BM_WORD) / BM_WORD)
            .cast("long")
            .alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), "
                f"CAST(user_id % {BM_WORD} AS INT))"
            ).alias("bit"),
        )
        .groupBy("event_type", "word")
        .agg(F.bit_or("bit").alias("bm"))
    )
    from kinesis_analytics_demo_spark.caching import tracked_persist

    w = tracked_persist(w)
    n = w.groupBy("event_type").agg(
        F.sum(F.bit_count("bm")).cast("bigint").alias("n_users")
    )
    a = w.select(
        F.col("event_type").alias("type_a"),
        F.col("word"),
        F.col("bm").alias("bm_a"),
    )
    b = w.select(
        F.col("event_type").alias("type_b"),
        F.col("word").alias("word_b"),
        F.col("bm").alias("bm_b"),
    )
    inter = (
        a.join(
            b,
            (F.col("word") == F.col("word_b"))
            & (F.col("type_a") < F.col("type_b")),
        )
        .groupBy("type_a", "type_b")
        .agg(
            F.sum(F.bit_count(F.col("bm_a").bitwiseAND(F.col("bm_b"))))
            .cast("bigint")
            .alias("n_both")
        )
    )
    na = n.select(
        F.col("event_type").alias("type_a"), F.col("n_users").alias("n_users_a")
    )
    nb = n.select(
        F.col("event_type").alias("type_b"), F.col("n_users").alias("n_users_b")
    )
    return (
        inter.join(F.broadcast(na), "type_a")
        .join(F.broadcast(nb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_users_a",
            "n_users_b",
            "n_both",
            F.round(
                F.col("n_both").cast("double")
                / (
                    F.col("n_users_a")
                    + F.col("n_users_b")
                    - F.col("n_both")
                ),
                6,
            ).alias("jaccard"),
        )
    )


# ------------------------------------ Chao1 species-richness estimate
CHAO_SAMPLE_MOD = 10  #: deterministic 1/10 document sample


@register(
    "chao1_vocab_estimate",
    oracle=f"""
    WITH st AS (
        SELECT unnest(string_split_regex(text, '\\s+')) AS w
        FROM documents WHERE doc_id % {CHAO_SAMPLE_MOD} = 0),
    cf AS (SELECT w, COUNT(*) AS tf FROM st GROUP BY w),
    s AS (
        SELECT COUNT(*) AS d_sample,
               SUM(tf) AS n_tokens,
               COUNT(CASE WHEN tf = 1 THEN 1 END) AS f1,
               COUNT(CASE WHEN tf = 2 THEN 1 END) AS f2
        FROM cf),
    tru AS (
        SELECT COUNT(DISTINCT w) AS d_true
        FROM (SELECT unnest(string_split_regex(text, '\\s+')) AS w
              FROM documents))
    SELECT CAST(n_tokens AS BIGINT) AS n_sample_tokens,
           CAST(d_sample AS BIGINT) AS d_sample,
           CAST(f1 AS BIGINT) AS f1,
           CAST(f2 AS BIGINT) AS f2,
           CAST(ROUND(d_sample + CAST(f1 AS DOUBLE) * (f1 - 1)
                      / (2.0 * (f2 + 1)), 6) AS DOUBLE) AS chao1_est,
           CAST(d_true AS BIGINT) AS d_true,
           CAST(ROUND(100.0 * (d_sample + CAST(f1 AS DOUBLE) * (f1 - 1)
                               / (2.0 * (f2 + 1)) - d_true)
                      / d_true, 6) AS DOUBLE) + 0.0 AS err_pct
    FROM s, tru
    """,
    doc="Chao1 species-richness estimator (Chao 1984, bias-corrected "
    "form D + f1(f1-1)/(2(f2+1)), defined even when no doubletons) "
    "applied to vocabulary: estimate the FULL corpus's distinct-token "
    "count from a deterministic 1/10 document sample using only the "
    "sample's singleton/doubleton profile — the unseen-species bound "
    "a crawl-curation pass uses to decide whether more data still "
    "buys vocabulary. err_pct audits the estimate against the true "
    "full-corpus distinct count (the same correlated-sampling "
    "discipline as join_size_estimate_sampled). All counts are exact "
    "integers; one final double expression. Scale: the sample scan "
    "map-side combines to vocab grain; the frequency-of-frequencies "
    "profile is 2 numbers — constant state, like the HLL/KMV family.",
)
def chao1_vocab_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_analytics_demo_spark.functions import hashing as H

    docs = _t(spark, sf_dir, "documents")
    st = docs.where(F.col("doc_id") % CHAO_SAMPLE_MOD == 0).select(
        F.explode(H.words(F.col("text"))).alias("w")
    )
    cf = st.groupBy("w").agg(F.count(F.lit(1)).alias("tf"))
    s = cf.agg(
        F.count(F.lit(1)).alias("d_sample"),
        F.sum("tf").alias("n_tokens"),
        F.count(F.when(F.col("tf") == 1, 1)).alias("f1"),
        F.count(F.when(F.col("tf") == 2, 1)).alias("f2"),
    )
    tru = (
        docs.select(F.explode(H.words(F.col("text"))).alias("w"))
        .agg(F.count_distinct("w").alias("d_true"))
    )
    chao = F.col("d_sample") + F.col("f1").cast("double") * (
        F.col("f1") - 1
    ) / (F.lit(2.0) * (F.col("f2") + 1))
    return s.crossJoin(F.broadcast(tru)).select(
        F.col("n_tokens").cast("bigint").alias("n_sample_tokens"),
        F.col("d_sample").cast("bigint").alias("d_sample"),
        F.col("f1").cast("bigint").alias("f1"),
        F.col("f2").cast("bigint").alias("f2"),
        F.round(chao, 6).cast("double").alias("chao1_est"),
        F.col("d_true").cast("bigint").alias("d_true"),
        (
            F.round(
                F.lit(100.0) * (chao - F.col("d_true")) / F.col("d_true"),
                6,
            ).cast("double")
            + F.lit(0.0)
        ).alias("err_pct"),
    )


# --------------------------------------- Good-Turing count smoothing
GT_MAX_R = 10  #: frequency classes reported


@register(
    "good_turing_counts",
    oracle=f"""
    WITH w AS (
        SELECT string_split_regex(text, '\\s+') AS ws FROM documents),
    t AS (
        SELECT ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
        FROM (SELECT ws, unnest(generate_series(1, len(ws) - 2)) AS i
              FROM w)),
    cf AS (SELECT g, COUNT(*) AS tf FROM t GROUP BY g),
    ff AS (SELECT tf AS r, COUNT(*) AS fr FROM cf GROUP BY tf),
    tot AS (
        SELECT r, fr,
               SUM(r * fr) OVER () AS n_tokens
        FROM ff)
    SELECT CAST(a.r AS BIGINT) AS r,
           CAST(a.fr AS BIGINT) AS f_r,
           CAST(COALESCE(b.fr, 0) AS BIGINT) AS f_r1,
           CAST(ROUND((a.r + 1) * CAST(COALESCE(b.fr, 0) AS DOUBLE)
                      / a.fr, 6) AS DOUBLE) AS r_star,
           CAST(ROUND((a.r + 1) * CAST(COALESCE(b.fr, 0) AS DOUBLE)
                      / a.fr / a.n_tokens, 9) AS DOUBLE) AS p_gt
    FROM tot a LEFT JOIN ff b ON b.r = a.r + 1
    WHERE a.r <= {GT_MAX_R}
    """,
    doc=f"Good-Turing frequency smoothing (Good 1953) over corpus "
    "word TRIGRAMS — the Katz-backoff setting (n-gram counts, not "
    f"unigram vocab): for each observed frequency class r <= "
    f"{GT_MAX_R}, the adjusted count r* = (r+1) * f_(r+1) / f_r and "
    "the smoothed probability r*/N — the unseen-mass machinery "
    "behind Katz backoff, and the companion diagnostic to "
    "chao1_vocab_estimate. Trigrams, because the synthetic corpus "
    "draws from a ~31-word vocabulary where EVERY unigram occurs "
    "26+ times at every SF — the unigram f-of-f profile has no "
    "low-frequency classes at all (an empty, untestable readout), "
    "while the trigram profile has a genuine Zipf tail (f1 ~ 9.4k "
    "at sf0.001). Classes whose successor class is empty report "
    "r* = 0 (the raw Turing estimate; production smoothers fit a "
    "power law over the gaps — Gale & Sampson 1995). Exact integer "
    "counts, one final double expression per row. Scale: the "
    "trigram rollup map-side combines; the f-of-f profile is "
    "O(max frequency) rows — effectively constant.",
)
def good_turing_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from kinesis_analytics_demo_spark.functions import hashing as H

    docs = _t(spark, sf_dir, "documents")
    ws = H.words(F.col("text"))
    tri = F.transform(
        F.sequence(F.lit(1), F.size("ws") - 2),
        lambda i: F.concat_ws(
            " ",
            F.element_at(F.col("ws"), i),
            F.element_at(F.col("ws"), i + 1),
            F.element_at(F.col("ws"), i + 2),
        ),
    )
    t = (
        docs.select(ws.alias("ws"))
        .filter(F.size("ws") >= 3)  # sequence(1, n<=0) would descend
        .select(F.explode(tri).alias("g"))
    )
    cf = t.groupBy("g").agg(F.count(F.lit(1)).alias("tf"))
    ff = cf.groupBy(F.col("tf").alias("r")).agg(
        F.count(F.lit(1)).alias("fr")
    )
    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    tot = ff.select(
        "r", "fr", F.sum(F.col("r") * F.col("fr")).over(wall).alias("n_tokens")
    )
    b = ff.select((F.col("r") - 1).alias("r"), F.col("fr").alias("fr1"))
    j = tot.join(b, "r", "left").where(F.col("r") <= GT_MAX_R)
    rstar = (F.col("r") + 1) * F.coalesce(F.col("fr1"), F.lit(0)).cast(
        "double"
    ) / F.col("fr")
    return j.select(
        F.col("r").cast("bigint").alias("r"),
        F.col("fr").cast("bigint").alias("f_r"),
        F.coalesce(F.col("fr1"), F.lit(0)).cast("bigint").alias("f_r1"),
        F.round(rstar, 6).cast("double").alias("r_star"),
        F.round(rstar / F.col("n_tokens"), 9).cast("double").alias("p_gt"),
    )
