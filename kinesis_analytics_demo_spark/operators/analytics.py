"""Corpus/event analytics: count-min-sketch heavy hitters and cohort
retention — two aggregation shapes a 100 TB pipeline runs constantly
(approximate frequency under bounded memory; user-lifecycle rollups).

Both are pure integer/date arithmetic, so Spark and the DuckDB oracle
agree exactly with no decimal discipline needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.caching import tracked_persist
from kinesis_analytics_demo_spark.functions import hashing as H
from kinesis_analytics_demo_spark.plans.registry import register
from kinesis_analytics_demo_spark.session import read_table as _t

# Count-min sketch geometry: D independent hash rows x W buckets.
# Seeds come from the same fixed Mersenne-affine family as minhash
# (deterministic at import, identical constants in both engines).
CMS_DEPTH = 4
CMS_WIDTH = 64
CMS_SEEDS = H.MINHASH_PERMS[:CMS_DEPTH]
CMS_TOP_K = 20

_SQL_TOKENS = "string_split_regex(text, '\\s+')"


def _sql_bucket(d: int, h: str) -> str:
    a, b = CMS_SEEDS[d]
    return f"((({a} * {h} + {b}) % {H.MERSENNE_P}) % {CMS_WIDTH})"


def _bucket(d: int, h) -> F.Column:
    a, b = CMS_SEEDS[d]
    return ((F.lit(a) * h + F.lit(b)) % H.MERSENNE_P) % CMS_WIDTH


@register(
    "heavy_hitters_cms",
    oracle=f"""
    WITH tok AS (
        SELECT unnest({_SQL_TOKENS}) AS token FROM documents
    ),
    th AS (SELECT token, {H.sql_md5_long('token')} % {H.MERSENNE_P} AS h
           FROM tok),
    rows_ AS (
        SELECT d.d,
               CASE d.d {' '.join(f"WHEN {d} THEN {_sql_bucket(d, 'h')}" for d in range(CMS_DEPTH))} END AS bucket
        FROM th, (SELECT unnest(generate_series(0, {CMS_DEPTH - 1})) AS d) d
    ),
    cms AS (SELECT d, bucket, count(*) AS cnt FROM rows_ GROUP BY d, bucket),
    exact_ AS (
        SELECT token, h, count(*) AS exact_count FROM th GROUP BY token, h
        ORDER BY exact_count DESC, token LIMIT {CMS_TOP_K}
    ),
    est AS (
        SELECT e.token, e.exact_count,
               min(c.cnt) AS cms_estimate
        FROM exact_ e,
             (SELECT unnest(generate_series(0, {CMS_DEPTH - 1})) AS d) d
        JOIN cms c
          ON c.d = d.d
         AND c.bucket = (CASE d.d {' '.join(f"WHEN {d} THEN {_sql_bucket(d, 'e.h')}" for d in range(CMS_DEPTH))} END)
        GROUP BY e.token, e.exact_count
    )
    SELECT token, exact_count, cms_estimate,
           cms_estimate >= exact_count AS never_underestimates
    FROM est
    """,
    doc="Count-min-sketch heavy hitters: a D=4 x W=64 sketch of the "
    "corpus token stream (affine hashes from the shared Mersenne "
    "family), then the top-20 exact tokens audited against their CMS "
    "estimate (min over rows; one-sided error, never under). At "
    "100 TB the sketch is the point: the groupBy(d, bucket) state is "
    "256 integers REGARDLESS of corpus size — map-side combine does "
    "almost all the work and the shuffle moves <= D*W rows per "
    "partition — while the exact top-k here exists only to measure "
    "the sketch's error on the heaviest keys.",
)
def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    th = docs.select(
        F.explode(H.words(F.col("text"))).alias("token")
    ).select("token", (H.md5_long(F.col("token")) % H.MERSENNE_P).alias("h"))
    rows = th.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), _bucket(d, F.col("h")).alias("bucket")
                    )
                    for d in range(CMS_DEPTH)
                ]
            )
        ).alias("s")
    ).select("s.d", "s.bucket")
    cms = rows.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("cnt"))
    exact = (
        th.groupBy("token", "h")
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .orderBy(F.desc("exact_count"), F.col("token"))
        .limit(CMS_TOP_K)
    )
    probes = exact.select(
        "token",
        "exact_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), _bucket(d, F.col("h")).alias("bucket")
                    )
                    for d in range(CMS_DEPTH)
                ]
            )
        ).alias("s"),
    ).select("token", "exact_count", "s.d", "s.bucket")
    est = (
        probes.join(F.broadcast(cms), ["d", "bucket"])
        .groupBy("token", "exact_count")
        .agg(F.min("cnt").alias("cms_estimate"))
    )
    return est.select(
        "token",
        "exact_count",
        "cms_estimate",
        (F.col("cms_estimate") >= F.col("exact_count")).alias(
            "never_underestimates"
        ),
    )


@register(
    "cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        FROM events GROUP BY user_id
    ),
    active AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS week
        FROM events
    )
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, a.week) / 7 AS BIGINT)
               AS week_offset,
           count(*) AS n_users
    FROM active a JOIN firsts f USING (user_id)
    GROUP BY f.cohort_week, week_offset
    """,
    doc="Cohort retention: users bucketed by first-activity week, "
    "counted in each subsequent activity week — the classic "
    "triangle. At 100 TB: both the first-event min and the distinct "
    "(user, week) activity set key on user_id, so one hash partition "
    "serves the aggregate, the distinct, AND the join (no second "
    "shuffle); the result is O(weeks^2) rows. Week truncation is "
    "Monday-based in both engines; the offset is exact integer "
    "day-arithmetic.",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.to_date(F.date_trunc("week", F.col("ts"))).alias("week")
    ).distinct()
    return (
        active.join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# Z-score anomaly geometry: flag events more than sqrt(Z_THRESHOLD_SQ)
# standard deviations from their event_type's mean value. The square
# is the stored constant because the selection runs in decimal on z^2.
Z_THRESHOLD_SQ = "6.25"  # T = 2.5


@register(
    "anomaly_zscore_events",
    oracle=f"""
    WITH stats AS (
        SELECT event_type,
               count(*) AS n,
               SUM(CAST(value AS DECIMAL(18,6))) AS s1,
               SUM(CAST(value AS DECIMAL(18,6))
                   * CAST(value AS DECIMAL(18,6))) AS s2
        FROM events GROUP BY event_type
    ),
    scored AS (
        SELECT e.event_id, e.event_type, e.value,
               s.n * CAST(e.value AS DECIMAL(18,6)) - s.s1 AS a,
               s.n * s.s2 - s.s1 * s.s1 AS b
        FROM events e JOIN stats s USING (event_type)
    )
    SELECT event_id, event_type, value,
           CAST(a AS DOUBLE) / sqrt(CAST(b AS DOUBLE)) AS zscore
    FROM scored
    WHERE a * a > CAST({Z_THRESHOLD_SQ} AS DECIMAL(18,6)) * b
    """,
    doc="Per-key z-score anomaly detection: one aggregate pass builds "
    "(n, sum, sum-of-squares) per event_type (decimal-exact, "
    "order-insensitive), broadcast back and every event scored in a "
    "second map-only pass — two corpus scans, one 5-row shuffle, no "
    "window. Selection is the ALL-DECIMAL inequality "
    "(n*x - s1)^2 > T^2 * (n*s2 - s1^2) — algebraically |z| > T with "
    "zero float steps, so the flag boundary cannot diverge between "
    "engines; the reported z is then a two-op IEEE expression "
    "(double cast of each exact decimal, one divide, one sqrt) that "
    "is bitwise reproducible. At 100 TB the stats side is a "
    "broadcast join; scoring is whole-stage codegen.",
)
def anomaly_zscore_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,6)")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec).alias("s1"),
        F.sum(dec * dec).alias("s2"),
    )
    a = F.col("n") * dec - F.col("s1")
    b = F.col("n") * F.col("s2") - F.col("s1") * F.col("s1")
    scored = ev.join(F.broadcast(stats), "event_type").select(
        "event_id",
        "event_type",
        "value",
        a.alias("a"),
        b.alias("b"),
    )
    keep = (F.col("a") * F.col("a")) > (
        F.lit(Z_THRESHOLD_SQ).cast("decimal(18,6)") * F.col("b")
    )
    return scored.filter(keep).select(
        "event_id",
        "event_type",
        "value",
        (
            F.col("a").cast("double") / F.sqrt(F.col("b").cast("double"))
        ).alias("zscore"),
    )


# Bloom-filter semi-join geometry: D hash probes into a W-bit space.
BLOOM_D = 3
BLOOM_W = 4096
BLOOM_SEEDS = H.MINHASH_PERMS[CMS_DEPTH : CMS_DEPTH + BLOOM_D]
HIGH_BALANCE = 9000.0


def _sql_bloom_pos(d: int, key: str) -> str:
    a, b = BLOOM_SEEDS[d]
    return f"((({a} * {key} + {b}) % {H.MERSENNE_P}) % {BLOOM_W})"


def _bloom_pos(d: int, key) -> F.Column:
    a, b = BLOOM_SEEDS[d]
    return ((F.lit(a) * key + F.lit(b)) % H.MERSENNE_P) % BLOOM_W


@register(
    "bloom_filter_semijoin",
    oracle=f"""
    WITH keys AS (
        SELECT c_custkey FROM customer WHERE c_acctbal > {HIGH_BALANCE}
    ),
    bloom AS (
        SELECT DISTINCT d.d,
               CASE d.d {' '.join(f"WHEN {d} THEN {_sql_bloom_pos(d, 'c_custkey')}" for d in range(BLOOM_D))} END AS pos
        FROM keys, (SELECT unnest(generate_series(0, {BLOOM_D - 1})) AS d) d
    ),
    opos AS (
        SELECT o.o_orderkey, o.o_custkey, d.d,
               CASE d.d {' '.join(f"WHEN {d} THEN {_sql_bloom_pos(d, 'o.o_custkey')}" for d in range(BLOOM_D))} END AS pos
        FROM orders o,
             (SELECT unnest(generate_series(0, {BLOOM_D - 1})) AS d) d
    ),
    probe AS (
        SELECT op.o_orderkey, op.o_custkey, count(b.pos) AS hits
        FROM opos op
        LEFT JOIN bloom b ON b.d = op.d AND b.pos = op.pos
        GROUP BY op.o_orderkey, op.o_custkey
    ),
    audit AS (
        SELECT p.o_orderkey,
               p.hits = {BLOOM_D} AS pass_bloom,
               k.c_custkey IS NOT NULL AS true_member
        FROM probe p LEFT JOIN keys k ON p.o_custkey = k.c_custkey
    )
    SELECT count(*) AS n_orders,
           CAST(sum(CASE WHEN pass_bloom THEN 1 ELSE 0 END) AS BIGINT)
               AS n_pass_bloom,
           CAST(sum(CASE WHEN true_member THEN 1 ELSE 0 END) AS BIGINT)
               AS n_true_members,
           CAST(sum(CASE WHEN pass_bloom AND NOT true_member
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS n_false_positives
    FROM audit
    """,
    doc="Explicit Bloom-filter semi-join (the runtime-filter pattern "
    "Spark injects for shuffle pruning, made inspectable): the small "
    "side's keys set D=3 positions in a W=4096-bit space; the big "
    "side passes when all D probes hit, and the audit row counts the "
    "false positives the exact semi-join would have skipped. At "
    "100 TB the bloom (<= W position rows after DISTINCT) broadcasts "
    "where the key set itself might not, and the probe is a "
    "map-side-only membership test — the pattern that cuts a "
    "fact-fact shuffle's probe side before the real join.",
)
def bloom_filter_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The filter itself is D sets of <= BLOOM_W positions — collect
    # each as a sorted array in ONE 1-row aggregate over the key scan
    # and test membership map-side with array_contains, instead of
    # exploding every order into D probe rows, semi-joining, counting
    # hits by order key and joining the misses back (the r11
    # before-plan paid 4 scans / 14 Exchanges; the probe side
    # shuffled 3x the order rows twice). The probe now touches each
    # order row once with zero exchanges — exactly the map-side
    # membership test the doc promises at 100 TB. keys feeds both the
    # filter build and the exact audit, so it is persisted.
    keys = tracked_persist(
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > HIGH_BALANCE)
        .select("c_custkey")
    )
    bloom = keys.agg(
        *[
            F.sort_array(
                F.collect_set(_bloom_pos(d, F.col("c_custkey")))
            ).alias(f"s{d}")
            for d in range(BLOOM_D)
        ]
    )
    orders = _t(spark, sf_dir, "orders")
    hit = lambda d: F.array_contains(  # noqa: E731
        F.col(f"s{d}"), _bloom_pos(d, F.col("o_custkey"))
    )
    all_hit = hit(0)
    for d in range(1, BLOOM_D):
        all_hit = all_hit & hit(d)
    audit = (
        orders.select("o_orderkey", "o_custkey")
        .crossJoin(F.broadcast(bloom))
        .join(
            F.broadcast(keys),
            F.col("o_custkey") == F.col("c_custkey"),
            "left",
        )
        .select(
            all_hit.alias("pass_bloom"),
            F.col("c_custkey").isNotNull().alias("true_member"),
        )
    )
    return audit.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(F.col("pass_bloom"), 1).otherwise(0)).alias("n_pass_bloom"),
        F.sum(F.when(F.col("true_member"), 1).otherwise(0)).alias("n_true_members"),
        F.sum(
            F.when(F.col("pass_bloom") & ~F.col("true_member"), 1).otherwise(0)
        ).alias("n_false_positives"),
    )


ATTRIBUTION_WINDOW_S = 7 * 24 * 3600  #: last-touch lookback (7 days)

#: shared by the batch query and the streaming replay row — the
#: streaming stateful operator must equal this batch result exactly
ATTRIBUTION_ORACLE = f"""
    WITH ordered AS (
        SELECT event_id, user_id, ts, event_type,
               last_value(CASE WHEN event_type IN ('view', 'click')
                               THEN event_id END IGNORE NULLS)
                   OVER w AS touch_id,
               last_value(CASE WHEN event_type IN ('view', 'click')
                               THEN event_type END IGNORE NULLS)
                   OVER w AS touch_type,
               last_value(CASE WHEN event_type IN ('view', 'click')
                               THEN ts END IGNORE NULLS)
                   OVER w AS touch_ts
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
    SELECT event_id AS conversion_id, user_id,
           touch_id AS touch_event_id, touch_type,
           CAST(date_diff('second', touch_ts, ts) AS BIGINT)
               AS seconds_to_convert
    FROM ordered
    WHERE event_type = 'purchase' AND touch_id IS NOT NULL
      AND date_diff('second', touch_ts, ts) <= {ATTRIBUTION_WINDOW_S}
    """


@register(
    "attribution_last_touch",
    oracle=ATTRIBUTION_ORACLE,
    doc="Marketing last-touch attribution: each purchase is credited "
    "to the user's most recent preceding view/click within a 7-day "
    "window — one user_id-partitioned ordered window (single "
    "shuffle), ignore-nulls last_value over the strictly-preceding "
    "frame, deterministic (ts, event_id) ordering. The per-user "
    "frame is the standard sessionize/as-of shape; no join, no "
    "second shuffle.",
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin("view", "click")
    ordered = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.last(F.when(is_touch, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("touch_id"),
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
        F.last(F.when(is_touch, F.col("ts")), ignorenulls=True)
        .over(w)
        .alias("touch_ts"),
    )
    # parquet may surface ts as TIMESTAMP_NTZ (driver testdata since
    # r3) — cast through TIMESTAMP (session tz UTC) before epoch math
    delta = (
        F.col("ts").cast("timestamp").cast("long")
        - F.col("touch_ts").cast("timestamp").cast("long")
    )
    return (
        ordered.filter(
            (F.col("event_type") == "purchase")
            & F.col("touch_id").isNotNull()
            & (delta <= ATTRIBUTION_WINDOW_S)
        )
        .select(
            F.col("event_id").alias("conversion_id"),
            "user_id",
            F.col("touch_id").alias("touch_event_id"),
            "touch_type",
            delta.alias("seconds_to_convert"),
        )
    )


# Seasonal anomaly threshold: T = 3 sigma against the (type, hour)
# baseline. All comparisons run on doubles cast from EXACT decimal
# sums in identical order on both engines (the Welch discipline from
# stats2 — never square a wide decimal).
SEASONAL_T = 3.0


@register(
    "anomaly_seasonal_baseline",
    oracle=f"""
    WITH st AS (
        SELECT event_type, hour(ts) AS hr, count(*) AS n,
               sum(CAST(value AS DECIMAL(18,6))) AS s1,
               sum(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
                   AS s2
        FROM events GROUP BY 1, 2),
    scored AS (
        SELECT st.event_type, st.hr, st.n,
               CAST(st.s1 AS DOUBLE) AS s1d, CAST(st.s2 AS DOUBLE) AS s2d,
               (st.n * e.value - CAST(st.s1 AS DOUBLE)) AS a,
               (st.n * CAST(st.s2 AS DOUBLE)
                - CAST(st.s1 AS DOUBLE) * CAST(st.s1 AS DOUBLE)) AS b
        FROM events e JOIN st
          ON e.event_type = st.event_type AND hour(e.ts) = st.hr)
    SELECT event_type, CAST(hr AS INT) AS hr,
           CAST(max(n) AS BIGINT) AS n,
           ROUND(max(s1d) / max(n), 6) AS mean_value,
           ROUND(sqrt(max(b) / max(n) / (max(n) - 1)), 6) AS sd_value,
           CAST(count_if(a * a > {SEASONAL_T * SEASONAL_T!r} * b) AS BIGINT)
               AS n_anomalies
    FROM scored GROUP BY 1, 2
    """,
    doc="Seasonality-aware anomaly counts: each event is scored "
    "against the mean/std of its OWN (event_type, hour-of-day) "
    "stratum — the baseline shape that catches 'normal at 2pm, "
    "anomalous at 3am' regressions a global z-score "
    "(anomaly_zscore_events) averages away. Sufficient statistics "
    "per stratum in exact DECIMAL, comparison |n*x - s1|^2 > "
    "T^2 * (n*s2 - s1^2) evaluated in identically-ordered doubles "
    "cast from the exact sums (never squaring a wide decimal — the "
    "Welch discipline). At 100 TB the stats table is at most "
    "types x 24 rows: broadcast join, scoring in codegen, one "
    "map-side-combinable re-aggregate.",
)
def anomaly_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    hr = F.hour(F.col("ts").cast("timestamp"))
    dec = F.col("value").cast("decimal(18,6)")
    st = (
        ev.select("event_type", hr.alias("hr"), dec.alias("v"))
        .groupBy("event_type", "hr")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s1"),
            F.sum(F.col("v") * F.col("v")).alias("s2"),
        )
    )
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("double")
    scored = (
        ev.select("event_type", hr.alias("hr"), "value")
        .join(F.broadcast(st), ["event_type", "hr"])
        .select(
            "event_type",
            "hr",
            "n",
            s1d.alias("s1d"),
            s2d.alias("s2d"),
            (F.col("n") * F.col("value") - s1d).alias("a"),
            (F.col("n") * s2d - s1d * s1d).alias("b"),
        )
    )
    return (
        scored.groupBy("event_type", "hr")
        .agg(
            F.max("n").alias("mn"),
            F.max("s1d").alias("m1"),
            F.max("b").alias("mb"),
            F.count_if(
                F.col("a") * F.col("a")
                > F.lit(SEASONAL_T * SEASONAL_T) * F.col("b")
            ).alias("n_anom"),
        )
        .select(
            "event_type",
            F.col("hr").cast("int"),
            F.col("mn").cast("bigint").alias("n"),
            F.round(F.col("m1") / F.col("mn"), 6).alias("mean_value"),
            F.round(
                F.sqrt(F.col("mb") / F.col("mn") / (F.col("mn") - 1)), 6
            ).alias("sd_value"),
            F.col("n_anom").cast("bigint").alias("n_anomalies"),
        )
    )


# U-shaped (position-based) attribution: 40% first touch, 40% last,
# the remaining 20% split across the middle touches. Credits are
# integer MICRO-credits (1e6 per conversion) so the middle split
# 200000 // (K-2) truncates IDENTICALLY on both engines — no float
# division anywhere in the accumulation.
U_FIRST_LAST = 400_000
U_MIDDLE_POOL = 200_000
U_WHOLE = 1_000_000
U_HALF = 500_000


@register(
    "attribution_position_weighted",
    oracle=f"""
    WITH p AS (
        SELECT event_id AS pid, user_id, ts AS pts
        FROM events WHERE event_type = 'purchase'),
    t AS (
        SELECT event_id AS tid, user_id, ts AS tts, event_type AS ttype
        FROM events WHERE event_type IN ('view', 'click')),
    j AS (
        SELECT p.pid, t.tid, t.ttype,
               row_number() OVER (PARTITION BY p.pid
                                  ORDER BY t.tts, t.tid) AS pos,
               count(*) OVER (PARTITION BY p.pid) AS k
        FROM p JOIN t
          ON p.user_id = t.user_id
         AND (t.tts < p.pts OR (t.tts = p.pts AND t.tid < p.pid))
         AND date_diff('second', t.tts, p.pts) <= {ATTRIBUTION_WINDOW_S}),
    credited AS (
        SELECT ttype,
               CASE WHEN k = 1 THEN {U_WHOLE}
                    WHEN k = 2 THEN {U_HALF}
                    WHEN pos = 1 OR pos = k THEN {U_FIRST_LAST}
                    ELSE {U_MIDDLE_POOL} // (k - 2) END AS micro
        FROM j)
    SELECT ttype AS touch_type,
           CAST(count(*) AS BIGINT) AS n_touches,
           CAST(ROUND(CAST(SUM(micro) AS DOUBLE) / {U_WHOLE}, 6) AS DOUBLE)
               AS credited_conversions
    FROM credited GROUP BY ttype
    """,
    doc="U-shaped (position-based) multi-touch attribution: every "
    "view/click in the 7-day window before a purchase shares that "
    "conversion's credit — 40% to the first touch, 40% to the last, "
    "20% split over the middle (whole/half for 1- and 2-touch "
    "journeys). The multi-touch complement to attribution_last_touch "
    "(same window, same (ts, event_id) ordering discipline). Credits "
    "accumulate as INTEGER micro-credits so the middle-split "
    "division truncates identically on both engines; the only float "
    "op is the final display division. Plan: one user-keyed "
    "purchase x touch join bounded by the 7-day predicate, two "
    "conversion-partitioned windows, one aggregate by touch type.",
)
def attribution_position_weighted(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        F.col("ts").alias("pts"),
    )
    t = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("tid"),
        "user_id",
        F.col("ts").alias("tts"),
        F.col("event_type").alias("ttype"),
    )
    before = (F.col("tts") < F.col("pts")) | (
        (F.col("tts") == F.col("pts")) & (F.col("tid") < F.col("pid"))
    )
    in_window = (
        F.col("pts").cast("timestamp").cast("long")
        - F.col("tts").cast("timestamp").cast("long")
        <= ATTRIBUTION_WINDOW_S
    )
    j = p.join(t, "user_id").filter(before & in_window)
    w = Window.partitionBy("pid").orderBy("tts", "tid")
    wk = Window.partitionBy("pid")
    j = j.select(
        "ttype",
        F.row_number().over(w).alias("pos"),
        F.count(F.lit(1)).over(wk).alias("k"),
    )
    micro = (
        F.when(F.col("k") == 1, U_WHOLE)
        .when(F.col("k") == 2, U_HALF)
        .when(
            (F.col("pos") == 1) | (F.col("pos") == F.col("k")), U_FIRST_LAST
        )
        .otherwise(
            F.floor(F.lit(U_MIDDLE_POOL) / (F.col("k") - 2)).cast("long")
        )
    )
    return (
        j.select("ttype", micro.alias("micro"))
        .groupBy(F.col("ttype").alias("touch_type"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            F.round(F.sum("micro").cast("double") / U_WHOLE, 6)
            .cast("double")
            .alias("credited_conversions"),
        )
    )


# ------------------------------- difference-in-differences estimator
#: assignment window: users with an error in the FIRST 5% of event
#: time are "treated". At the global-median window every test-scale
#: user has at least one error (all SFs: control cohort empty, the
#: estimator degenerates to zero rows); the early-exposure window
#: splits the cohorts at every SF (sf0.001 10/15, sf0.01 72/150,
#: sf0.1 729/1500) and is the cleaner design anyway — assignment
#: strictly precedes (almost all of) the pre-period it is compared
#: against, so treatment can't proxy for pre-period outcome volume.
DID_ASSIGN_Q = 0.05


@register(
    "did_error_impact",
    oracle=f"""
    WITH b AS (
        SELECT user_id, event_type, value,
               -- whole-second truncation matches Spark's ts->long cast
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS es
        FROM events),
    med AS (SELECT quantile_cont(es, 0.5) AS m,
                   quantile_cont(es, {DID_ASSIGN_Q}) AS a FROM b),
    treated AS (
        SELECT DISTINCT user_id FROM b, med
        WHERE event_type = 'error' AND es <= med.a),
    u AS (
        SELECT b.user_id,
               MAX(CASE WHEN t.user_id IS NOT NULL THEN 1 ELSE 0 END)
                   AS grp,
               COALESCE(SUM(CASE WHEN event_type = 'purchase'
                                  AND es <= med.m
                            THEN CAST(value AS DECIMAL(18,6)) END),
                        0) AS pre_v,
               COALESCE(SUM(CASE WHEN event_type = 'purchase'
                                  AND es > med.m
                            THEN CAST(value AS DECIMAL(18,6)) END),
                        0) AS post_v
        FROM b CROSS JOIN med
        LEFT JOIN treated t ON b.user_id = t.user_id
        GROUP BY b.user_id),
    g AS (
        SELECT grp, CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(pre_v) AS DOUBLE) / count(*) AS pre_mean,
               CAST(SUM(post_v) AS DOUBLE) / count(*) AS post_mean
        FROM u GROUP BY grp)
    SELECT t.n AS n_treated, c.n AS n_control,
           ROUND(t.pre_mean, 6) + 0.0 AS pre_treated,
           ROUND(t.post_mean, 6) + 0.0 AS post_treated,
           ROUND(c.pre_mean, 6) + 0.0 AS pre_control,
           ROUND(c.post_mean, 6) + 0.0 AS post_control,
           ROUND((t.post_mean - t.pre_mean)
                 - (c.post_mean - c.pre_mean), 6) + 0.0 AS did
    FROM (SELECT * FROM g WHERE grp = 1) t,
         (SELECT * FROM g WHERE grp = 0) c
    """,
    doc="Difference-in-differences causal estimate of error exposure "
    "on purchase revenue: users are assigned to treatment by EARLY "
    "behavior only (any 'error' event in the first 5% of global "
    "event time — assignment can't leak post-period outcomes and "
    "barely overlaps the pre-period it is differenced against), "
    "per-user purchase revenue is totaled in each period "
    "(zero-filled — non-purchasers stay in their cohort), and DiD = "
    "(post_T - pre_T) - (post_C - pre_C) cancels both the group "
    "level difference and the common time trend — the standard "
    "quasi-experimental readout when an A/B split isn't available "
    "(Card & Krueger 1994). Determinism: per-user outcomes are "
    "DECIMAL-exact sums; each group mean is ONE cast + ONE IEEE "
    "division; the DiD is a fixed 3-op chain released under "
    "ROUND(.,6) with -0.0 normalizers. Scale: one scan to user "
    "grain (map-side combinable), the treated set is a hash "
    "semi-join on user_id, the final algebra runs on 2 rows.",
)
def did_error_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    b = ev.select(
        "user_id",
        "event_type",
        "value",
        F.col("ts").cast("timestamp").cast("long").alias("es"),
    )
    from kinesis_analytics_demo_spark.caching import tracked_persist

    b = tracked_persist(b)
    med = b.agg(
        F.percentile("es", 0.5).alias("m"),
        F.percentile("es", DID_ASSIGN_Q).alias("a"),
    )
    bm = b.crossJoin(F.broadcast(med))
    treated = (
        bm.filter((F.col("event_type") == "error") & (F.col("es") <= F.col("a")))
        .select("user_id")
        .distinct()
        .withColumn("is_t", F.lit(1))
    )
    dec = F.col("value").cast("decimal(18,6)")
    u = (
        bm.join(F.broadcast(treated), "user_id", "left")
        .groupBy("user_id")
        .agg(
            F.max(F.coalesce(F.col("is_t"), F.lit(0))).alias("grp"),
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("event_type") == "purchase")
                        & (F.col("es") <= F.col("m")),
                        dec,
                    )
                ),
                F.lit(0).cast("decimal(18,6)"),
            ).alias("pre_v"),
            F.coalesce(
                F.sum(
                    F.when(
                        (F.col("event_type") == "purchase")
                        & (F.col("es") > F.col("m")),
                        dec,
                    )
                ),
                F.lit(0).cast("decimal(18,6)"),
            ).alias("post_v"),
        )
    )
    # Both cohorts' counts and means in ONE conditional aggregate over
    # u — the grp-keyed groupBy + filter/filter + crossJoin readout
    # re-ran the full per-user aggregation lineage once per cohort.
    # Decimal sums are exact, so the conditional sums equal the
    # per-group sums bit-for-bit; the (nt > 0 AND nc > 0) guard keeps
    # the old empty-cohort behavior (empty result, not a NULL row).
    one = u.agg(
        F.sum(F.when(F.col("grp") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("nt"),
        F.sum(F.when(F.col("grp") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("nc"),
        F.sum(F.when(F.col("grp") == 1, F.col("pre_v"))).alias("spt"),
        F.sum(F.when(F.col("grp") == 1, F.col("post_v"))).alias("sqt"),
        F.sum(F.when(F.col("grp") == 0, F.col("pre_v"))).alias("spc"),
        F.sum(F.when(F.col("grp") == 0, F.col("post_v"))).alias("sqc"),
    ).filter((F.col("nt") > 0) & (F.col("nc") > 0))
    t = one.select(
        F.col("nt").alias("n_treated"),
        F.col("nc").alias("n_control"),
        (F.col("spt").cast("double") / F.col("nt")).alias("pt"),
        (F.col("sqt").cast("double") / F.col("nt")).alias("qt"),
        (F.col("spc").cast("double") / F.col("nc")).alias("pc"),
        (F.col("sqc").cast("double") / F.col("nc")).alias("qc"),
    )
    return t.select(
        "n_treated",
        "n_control",
        (F.round(F.col("pt"), 6) + F.lit(0.0)).alias("pre_treated"),
        (F.round(F.col("qt"), 6) + F.lit(0.0)).alias("post_treated"),
        (F.round(F.col("pc"), 6) + F.lit(0.0)).alias("pre_control"),
        (F.round(F.col("qc"), 6) + F.lit(0.0)).alias("post_control"),
        (
            F.round(
                (F.col("qt") - F.col("pt")) - (F.col("qc") - F.col("pc")), 6
            )
            + F.lit(0.0)
        ).alias("did"),
    )


# ------------------------------------------- RFM segmentation
RFM_Q = 5  #: quintile scores


@register(
    "rfm_segmentation",
    oracle=f"""
    WITH mx AS (SELECT MAX(o_orderdate) AS m FROM orders),
    c AS (
        SELECT o_custkey,
               date_diff('day', MAX(o_orderdate), (SELECT m FROM mx))
                   AS recency_days,
               COUNT(*) AS frequency,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
        FROM orders GROUP BY o_custkey),
    sc AS (
        SELECT ntile({RFM_Q}) OVER (ORDER BY recency_days DESC, o_custkey)
                   AS r_score,
               ntile({RFM_Q}) OVER (ORDER BY frequency, o_custkey)
                   AS f_score,
               ntile({RFM_Q}) OVER (ORDER BY monetary, o_custkey)
                   AS m_score,
               monetary
        FROM c)
    SELECT CAST(r_score AS INT) AS r_score,
           CAST(f_score AS INT) AS f_score,
           CAST(m_score AS INT) AS m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(ROUND(SUM(monetary), 2) AS DOUBLE) AS segment_revenue
    FROM sc GROUP BY 1, 2, 3
    """,
    doc="RFM segmentation (Hughes 1994): per-customer Recency (days "
    "since last order, relative to the corpus max date so the result "
    "is replay-stable), Frequency (order count) and Monetary (exact "
    "DECIMAL spend) are each dealt into quintile scores 1..5 (5 = "
    "most recent / most frequent / highest spend) by ntile over a "
    "TOTAL order (metric, custkey) — the ntile remainder policy is "
    "identical on both engines only under a total order. Emits the "
    "segment rollup (up to 125 cells). Scale: one hash aggregate to "
    "customer grain; the three global ntiles are single-partition "
    "windows over CUSTOMERS — at 10^9+ swap for histogram-quantile "
    "cuts (the lorenz_curve_deciles note).",
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    od = _t(spark, sf_dir, "orders")
    mx = od.agg(F.max("o_orderdate").alias("m"))
    c = (
        od.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last_od"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias(
                "monetary"
            ),
        )
        .crossJoin(F.broadcast(mx))
        .select(
            "o_custkey",
            F.datediff(F.col("m"), F.col("last_od")).alias("recency_days"),
            "frequency",
            "monetary",
        )
    )
    sc = c.select(
        F.ntile(RFM_Q)
        .over(Window.orderBy(F.desc("recency_days"), F.col("o_custkey")))
        .alias("r_score"),
        F.ntile(RFM_Q)
        .over(Window.orderBy("frequency", "o_custkey"))
        .alias("f_score"),
        F.ntile(RFM_Q)
        .over(Window.orderBy("monetary", "o_custkey"))
        .alias("m_score"),
        "monetary",
    )
    return sc.groupBy("r_score", "f_score", "m_score").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.round(F.sum("monetary"), 2).cast("double").alias("segment_revenue"),
    ).select(
        F.col("r_score").cast("int"),
        F.col("f_score").cast("int"),
        F.col("m_score").cast("int"),
        "n_customers",
        "segment_revenue",
    )


# ------------------------------------- ABC (Pareto) classification
ABC_A = 0.8  #: class A = parts covering the first 80% of revenue
ABC_B = 0.95  #: class B = next 15%


@register(
    "abc_classification_parts",
    oracle=f"""
    WITH pr AS (
        SELECT l_partkey,
               SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                   * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS rev
        FROM lineitem GROUP BY l_partkey),
    r AS (
        SELECT l_partkey, rev,
               SUM(rev) OVER (ORDER BY rev DESC, l_partkey) AS crev,
               SUM(rev) OVER () AS trev
        FROM pr),
    cls AS (
        SELECT rev,
               CASE WHEN CAST(crev AS DOUBLE) / CAST(trev AS DOUBLE)
                         <= {ABC_A} THEN 'A'
                    WHEN CAST(crev AS DOUBLE) / CAST(trev AS DOUBLE)
                         <= {ABC_B} THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM r)
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(ROUND(SUM(rev), 2) AS DOUBLE) AS class_revenue,
           CAST(ROUND(CAST(SUM(rev) AS DOUBLE)
                      / (SELECT CAST(SUM(rev) AS DOUBLE) FROM pr), 6)
                AS DOUBLE) AS revenue_share
    FROM cls GROUP BY abc_class
    """,
    doc="ABC / Pareto classification of parts by discounted revenue: "
    "parts are ranked by exact-DECIMAL revenue (ties broken by "
    "partkey), class A covers the first 80% of cumulative revenue, "
    "B to 95%, C the tail — the inventory-prioritization rollup. "
    "Cumulative and total sums are exact decimals; the class "
    "boundary compares one IEEE division against literal thresholds, "
    "identical on both engines. Scale: one hash aggregate to part "
    "grain plus a global ordered window over PARTS — at 10^9 parts "
    "use a two-pass histogram cut like the decile operators.",
)
def abc_classification_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    pr = li.groupBy("l_partkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
        ).alias("rev")
    )
    wo = Window.orderBy(F.desc("rev"), "l_partkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wa = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    share = F.sum("rev").over(wo).cast("double") / F.sum("rev").over(
        wa
    ).cast("double")
    cls = pr.select(
        "rev",
        F.when(share <= ABC_A, "A")
        .when(share <= ABC_B, "B")
        .otherwise("C")
        .alias("abc_class"),
    )
    tot = pr.agg(F.sum("rev").cast("double").alias("t"))
    return (
        cls.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.round(F.sum("rev"), 2).cast("double").alias("class_revenue"),
            F.sum("rev").cast("double").alias("sr"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "abc_class",
            "n_parts",
            "class_revenue",
            F.round(F.col("sr") / F.col("t"), 6)
            .cast("double")
            .alias("revenue_share"),
        )
    )
