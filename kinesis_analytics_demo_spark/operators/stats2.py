"""Statistics, part 2 — operational data-diagnosis shapes: key-skew
profiling, robust (median/MAD) outlier detection, Poisson-bootstrap
confidence intervals, a Welch-t A/B readout, and CUSUM changepoint
detection.

``skew_profile_lineitem`` is the pre-flight check behind every
salting/AQE decision in this repo: the top-20 heaviest join/agg keys
with their absolute and relative frequency. The plan is the same
TakeOrderedAndProject discipline as corpus_sample_exact_k — per-key
counts aggregate with map-side combine, then per-partition top-k
heaps merge on the driver; no global sort, no full-key-list
materialization. At 100 TB this is the query you run BEFORE choosing
a partitioning, and it costs one aggregate scan.

``anomaly_mad_events`` flags per-event-type outliers by the robust
median/MAD rule (Hampel identifier): |x - median| > 3 * MAD. Unlike
the z-score twin (anomaly_zscore_events), a single extreme value
cannot drag the threshold — median and MAD have a 50% breakdown
point. MAD is inherently two-pass (the deviation median needs the
median first), so the plan is: grouped exact percentile (one
shuffle) -> broadcast the tiny per-type medians back -> second
grouped percentile over deviations -> broadcast again for the final
count aggregate. All three aggregates shuffle on the same key;
medians use the engine-exact interpolated percentile
(Spark percentile == DuckDB quantile_cont, proven by
exact_percentiles); subtraction/abs/3x-multiply are single IEEE
operations, bit-identical on both engines.

``bootstrap_ci_event_values`` attaches a 95% confidence interval to
the per-type mean by the Poisson bootstrap (Chamandy et al., 2012) —
the resampling scheme built for data too large to hold centrally:
each row contributes Poisson(1)-weighted copies to each of 100
replicas, so replica statistics are map-side-combinable sums and the
shuffle carries types x replicas partial rows, never resampled data.
Weights come from an inverse-CDF ladder over seeded md5 uniforms
with the breakpoints precomputed in Python and embedded as identical
double literals in both engines — deterministic, ln()-free, and
oracle-checkable (swap the seeded uniform for true randomness in
production, one line).

Reference anchor: no statistics surface exists in the reference
(flink/tumbling_window.py, sliding_window.py); these extend the
audit battery of operators/stats.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.functions import hashing as H
from kinesis_analytics_demo_spark.plans.registry import register
from kinesis_analytics_demo_spark.session import read_table as _t

SKEW_TOP = 20  #: heaviest keys reported
MAD_K = 3.0  #: Hampel threshold multiplier

BOOT_R = 100  #: bootstrap replicas
BOOT_LO, BOOT_HI = 0.025, 0.975  #: 95% interval
_HASH_SPACE = float(1 << 60)
#: Poisson(1) CDF breakpoints, precomputed once in Python and embedded
#: as IDENTICAL double literals in the Spark expression and the DuckDB
#: SQL — the weight ladder is then pure double comparison, no ln() on
#: either engine. P(X <= k) = e^-1 * sum_{i<=k} 1/i!.
_POIS_CDF: list[float] = []
_acc = 0.0
for _k in range(9):
    _acc += math.exp(-1.0) / math.factorial(_k)
    _POIS_CDF.append(_acc)


@register(
    "skew_profile_lineitem",
    oracle=f"""
    WITH c AS (
        SELECT l_partkey AS key, count(*) AS cnt FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT sum(cnt) AS total FROM c)
    SELECT key, cnt, CAST(cnt * 100.0 AS DOUBLE) / total AS pct
    FROM c, tot
    ORDER BY cnt DESC, key
    LIMIT {SKEW_TOP}
    """,
    doc="Key-skew profile: the top-20 heaviest l_partkey values with "
    "absolute and relative frequency — the pre-flight diagnosis for "
    "salting / broadcast / AQE-skew-join decisions. Map-side-combined "
    "counts + TakeOrderedAndProject (per-partition heaps, no global "
    "sort); one scan at any corpus size.",
)
def skew_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    c = li.groupBy(F.col("l_partkey").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tot = c.agg(F.sum("cnt").alias("total"))
    return (
        c.crossJoin(F.broadcast(tot))
        .select(
            "key",
            "cnt",
            ((F.col("cnt") * 100.0).cast("double") / F.col("total")).alias("pct"),
        )
        .orderBy(F.desc("cnt"), F.col("key"))
        .limit(SKEW_TOP)
    )


def _sql_pois_case(u: str) -> str:
    whens = " ".join(
        f"WHEN {u} < {c!r} THEN {k}" for k, c in enumerate(_POIS_CDF)
    )
    return f"(CASE {whens} ELSE {len(_POIS_CDF)} END)"


@register(
    "bootstrap_ci_event_values",
    oracle=f"""
    WITH rep AS (
        SELECT e.event_type, e.value, r.r,
               ({H.sql_md5_long("e.event_id::VARCHAR || '_' || r.r::VARCHAR")}
                / {_HASH_SPACE!r}) AS u
        FROM events e, (SELECT unnest(generate_series(0, {BOOT_R - 1})) AS r) r
    ),
    wtd AS (
        SELECT event_type, r,
               {_sql_pois_case('u')} AS w, value
        FROM rep
    ),
    means AS (
        SELECT event_type, r,
               CAST(sum(w * CAST(value AS DECIMAL(28, 10))) AS DOUBLE)
                   / sum(w) AS m
        FROM wtd GROUP BY event_type, r
        HAVING sum(w) > 0
    )
    SELECT event_type,
           quantile_cont(m, {BOOT_LO!r}) AS ci_lo,
           quantile_cont(m, {BOOT_HI!r}) AS ci_hi,
           count(*) AS n_replicas
    FROM means GROUP BY event_type
    """,
    doc="Poisson-bootstrap 95% confidence interval for the per-type "
    "mean value (Chamandy et al., Google 2012 — the resampling "
    "scheme that works when data cannot be held centrally): each row "
    "contributes Poisson(1)-weighted copies to 100 replicas, weights "
    "drawn by inverse-CDF over a seeded md5 uniform (precomputed "
    "breakpoint literals shared by both engines — no ln()). One "
    "map-side-combined aggregate per (type, replica); the shuffle "
    "carries types x 100 partial sums, never the exploded rows. "
    "Replica sums run in DECIMAL so accumulation order cannot leak "
    "into the interval.",
)
def bootstrap_ci_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    rep = ev.select(
        "event_type",
        "value",
        "event_id",
        F.explode(F.sequence(F.lit(0), F.lit(BOOT_R - 1))).alias("r"),
    )
    u = (
        H.md5_long(
            F.concat(
                F.col("event_id").cast("string"),
                F.lit("_"),
                F.col("r").cast("string"),
            )
        )
        / F.lit(_HASH_SPACE)
    )
    w = F.when(u < _POIS_CDF[0], 0)
    for k in range(1, len(_POIS_CDF)):
        w = w.when(u < _POIS_CDF[k], k)
    w = w.otherwise(len(_POIS_CDF))
    wtd = rep.select("event_type", "r", w.alias("w"), "value")
    means = (
        wtd.groupBy("event_type", "r")
        .agg(
            F.sum(F.col("w") * F.col("value").cast("decimal(28,10)")).alias("s"),
            F.sum("w").alias("sw"),
        )
        .filter(F.col("sw") > 0)
        .select(
            "event_type",
            (F.col("s").cast("double") / F.col("sw")).alias("m"),
        )
    )
    return means.groupBy("event_type").agg(
        F.percentile("m", BOOT_LO).alias("ci_lo"),
        F.percentile("m", BOOT_HI).alias("ci_hi"),
        F.count(F.lit(1)).alias("n_replicas"),
    )


@register(
    "ab_test_welch_events",
    oracle=f"""
    WITH assigned AS (
        SELECT ({H.sql_md5_long('user_id::VARCHAR')} % 2) AS arm,
               CAST(value AS DECIMAL(18, 6)) AS v
        FROM events
    ),
    st AS (
        SELECT arm, count(*) AS n, sum(v) AS s1, sum(v * v) AS s2
        FROM assigned GROUP BY arm
    ),
    wide AS (
        SELECT max(CASE WHEN arm = 0 THEN n END) AS n_a,
               max(CASE WHEN arm = 1 THEN n END) AS n_b,
               max(CASE WHEN arm = 0 THEN CAST(s1 AS DOUBLE) / n END) AS mean_a,
               max(CASE WHEN arm = 1 THEN CAST(s1 AS DOUBLE) / n END) AS mean_b,
               -- variance in DOUBLE from the exact decimal sums:
               -- s1 * s1 at DECIMAL(28,6) needs precision 57 > the
               -- 38 cap, where Spark (allowPrecisionLoss) and DuckDB
               -- round differently (ADVICE r4) — so cast each sum to
               -- double FIRST and accept documented IEEE semantics,
               -- identically ordered on both engines
               max(CASE WHEN arm = 0 THEN
                   (n * CAST(s2 AS DOUBLE)
                    - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                   / n / (n - 1) END) AS var_a,
               max(CASE WHEN arm = 1 THEN
                   (n * CAST(s2 AS DOUBLE)
                    - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                   / n / (n - 1) END) AS var_b
        FROM st
    )
    SELECT n_a, n_b, mean_a, mean_b,
           mean_a - mean_b AS mean_diff,
           ROUND((mean_a - mean_b) / sqrt(var_a / n_a + var_b / n_b), 6)
               AS t_stat,
           ROUND((var_a / n_a + var_b / n_b) * (var_a / n_a + var_b / n_b)
               / ((var_a / n_a) * (var_a / n_a) / (n_a - 1)
                  + (var_b / n_b) * (var_b / n_b) / (n_b - 1)), 6)
               AS df_welch
    FROM wide
    """,
    doc="A/B experiment readout: users deterministically bucketed into "
    "two arms by a salted hash (the engine-side emulation of "
    "experiment assignment), then Welch's unequal-variance t-test "
    "from one decimal-exact sufficient-statistics aggregate — "
    "(n, sum, sum-of-squares) per arm, every later step a fixed-order "
    "IEEE expression over exact inputs, so t and the Welch-"
    "Satterthwaite df are bitwise reproducible. One 2-row shuffle at "
    "any corpus size.",
)
def ab_test_welch_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "value")
    arm = F.pmod(H.md5_long(F.col("user_id").cast("string")), F.lit(2))
    dec = F.col("value").cast("decimal(18,6)")
    st = ev.select(arm.alias("arm"), dec.alias("v")).groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s1"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    # cast-to-double BEFORE multiplying: the decimal product s1*s1
    # exceeds precision 38 and the engines' precision-loss rounding
    # diverges (ADVICE r4); this order matches the oracle exactly
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("double")
    var = (
        (F.col("n") * s2d - s1d * s1d)
        / F.col("n")
        / (F.col("n") - 1)
    )
    wide = st.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("arm") == 0, mean)).alias("mean_a"),
        F.max(F.when(F.col("arm") == 1, mean)).alias("mean_b"),
        F.max(F.when(F.col("arm") == 0, var)).alias("var_a"),
        F.max(F.when(F.col("arm") == 1, var)).alias("var_b"),
    )
    se_a = F.col("var_a") / F.col("n_a")
    se_b = F.col("var_b") / F.col("n_b")
    se2 = se_a + se_b
    return wide.select(
        "n_a",
        "n_b",
        "mean_a",
        "mean_b",
        (F.col("mean_a") - F.col("mean_b")).alias("mean_diff"),
        F.round((F.col("mean_a") - F.col("mean_b")) / F.sqrt(se2), 6).alias(
            "t_stat"
        ),
        F.round(
            se2 * se2
            / (
                se_a * se_a / (F.col("n_a") - 1)
                + se_b * se_b / (F.col("n_b") - 1)
            ),
            6,
        ).alias("df_welch"),
    )


@register(
    "cusum_changepoint_events",
    oracle="""
    WITH o AS (
        SELECT event_type, ts, event_id,
               CAST(value AS DECIMAL(18, 6)) AS v,
               row_number() OVER w AS k,
               sum(CAST(value AS DECIMAL(18, 6))) OVER w AS cs
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    tot AS (
        SELECT event_type, count(*) AS n, sum(v) AS s FROM o GROUP BY 1
    ),
    d AS (
        SELECT o.event_type, o.ts, o.k,
               abs(t.n * o.cs - o.k * t.s) AS absd, t.n
        FROM o JOIN tot t ON o.event_type = t.event_type
    ),
    best AS (
        SELECT event_type, ts, k, absd, n,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY absd DESC, k) AS rn
        FROM d
    )
    SELECT event_type, ts AS cp_ts, CAST(k AS BIGINT) AS cp_k,
           ROUND(CAST(absd AS DOUBLE) / n, 6) AS cusum_score
    FROM best WHERE rn = 1
    """,
    doc="CUSUM changepoint detection per event type (Page 1954): the "
    "split point maximizing |cumulative deviation from the global "
    "mean|. Formulated mean-division-free as |n*CumSum_k - k*Total| "
    "— every comparison happens on EXACT decimals, floats appear "
    "only in the final reported score (ROUND 6). One per-key ordered "
    "window (key-partitioned parallelism, the EMA discipline) plus a "
    "per-key 1-row total broadcast back; argmax via one ranked "
    "window with an earliest-index tiebreak.",
)
def cusum_changepoint_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_type", "ts", "event_id", "value")
    dec = F.col("value").cast("decimal(18,6)")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    o = ev.select(
        "event_type",
        "ts",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy("ts", "event_id")
        ).alias("k"),
        F.sum(dec).over(w).alias("cs"),
        dec.alias("v"),
    )
    tot = o.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    d = o.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "ts",
        "k",
        F.abs(F.col("n") * F.col("cs") - F.col("k") * F.col("s")).alias("absd"),
        "n",
    )
    best = d.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(F.desc("absd"), F.col("k"))
        ),
    ).filter(F.col("rn") == 1)
    return best.select(
        "event_type",
        F.col("ts").alias("cp_ts"),
        F.col("k").cast("bigint").alias("cp_k"),
        F.round(F.col("absd").cast("double") / F.col("n"), 6).alias("cusum_score"),
    )


@register(
    "anomaly_mad_events",
    oracle=f"""
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, e.value, m.med,
               abs(e.value - m.med) AS d
        FROM events e JOIN med m ON e.event_type = m.event_type
    ),
    mad AS (
        SELECT event_type, quantile_cont(d, 0.5) AS mad
        FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           min(d.med) AS median_value,
           min(m.mad) AS mad,
           count(*) AS n_total,
           count(*) FILTER (WHERE d.d > {MAD_K} * m.mad) AS n_outliers
    FROM dev d JOIN mad m ON d.event_type = m.event_type
    GROUP BY d.event_type
    """,
    doc="Robust per-type outlier detection (Hampel identifier): flag "
    "|x - median| > 3*MAD. Median and MAD have a 50% breakdown point, "
    "so extreme values cannot mask themselves (unlike z-scores). "
    "Two-pass by necessity: grouped exact percentile, broadcast "
    "medians back, grouped deviation percentile, broadcast again for "
    "the count — all shuffles on event_type, engine-exact "
    "interpolated percentiles.",
)
def anomaly_mad_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(F.percentile("value", 0.5).alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "value",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("d"),
    )
    mad = dev.groupBy("event_type").agg(F.percentile("d", 0.5).alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.min("med").alias("median_value"),
            F.min("mad").alias("mad"),
            F.count(F.lit(1)).alias("n_total"),
            F.count_if(F.col("d") > MAD_K * F.col("mad")).alias("n_outliers"),
        )
    )


@register(
    "gini_user_revenue",
    oracle="""
    WITH ux AS (
        SELECT event_type, user_id,
               SUM(CAST(value AS DECIMAL(18,6))) AS x
        FROM events GROUP BY 1, 2),
    r AS (
        SELECT event_type, x,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY x, user_id) AS i,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM ux)
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n_users,
           CAST(ROUND(CAST(SUM(x) AS DOUBLE) / max(n), 6) AS DOUBLE) AS mean_user_value,
           CAST(ROUND(
               (2.0 * CAST(SUM(i * x) AS DOUBLE)
                - (max(n) + 1.0) * CAST(SUM(x) AS DOUBLE))
               / (max(n) * CAST(SUM(x) AS DOUBLE)), 6) AS DOUBLE) AS gini
    FROM r GROUP BY event_type
    """,
    doc="Gini coefficient of per-user revenue concentration within "
    "each event type — the whale-dependence audit (how unequal is "
    "value across users). Rank-weighted formula G = (2*sum(i*x) - "
    "(n+1)*sum(x)) / (n*sum(x)) over users ordered by (value, "
    "user_id): both sums accumulate in exact DECIMAL (rank i is an "
    "integer weight), and the final expression is a fixed-order "
    "IEEE chain over exact double casts. The rank window is "
    "partitioned by event_type — parallel, never a global sort; at "
    "100 TB the per-user rollup map-side-combines first.",
)
def gini_user_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    ux = ev.groupBy("event_type", "user_id").agg(
        F.sum(F.col("value").cast("decimal(18,6)")).alias("x")
    )
    w = Window.partitionBy("event_type").orderBy("x", "user_id")
    wc = Window.partitionBy("event_type")
    r = ux.select(
        "event_type",
        "x",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(wc).alias("n"),
    )
    sx = F.sum("x")
    six = F.sum(F.col("i") * F.col("x"))
    n = F.max("n")
    return r.groupBy("event_type").agg(
        n.cast("bigint").alias("n_users"),
        F.round(sx.cast("double") / n, 6).cast("double").alias("mean_user_value"),
        F.round(
            (
                F.lit(2.0) * six.cast("double")
                - (n + F.lit(1.0)) * sx.cast("double")
            )
            / (n * sx.cast("double")),
            6,
        )
        .cast("double")
        .alias("gini"),
    )


# -------------------------------------------- distribution drift
DRIFT_EDGES = [0.2, 0.4, 0.6, 0.8]  #: reference quintile cut points


@register(
    "feature_drift_halves",
    oracle=f"""
    WITH b AS (
        SELECT event_type, value,
               CAST(ts AS TIMESTAMP) AS tts
        FROM events),
    med AS (
        SELECT quantile_cont(epoch(tts), 0.5) AS m FROM b),
    halves AS (
        SELECT event_type, value,
               CASE WHEN epoch(tts) <= med.m THEN 0 ELSE 1 END AS half
        FROM b, med),
    edges AS (
        SELECT event_type,
               quantile_cont(value, {DRIFT_EDGES!r}) AS q
        FROM halves WHERE half = 0 GROUP BY event_type),
    bucketed AS (
        SELECT h.event_type, h.half,
               (CASE WHEN h.value >= e.q[1] THEN 1 ELSE 0 END
              + CASE WHEN h.value >= e.q[2] THEN 1 ELSE 0 END
              + CASE WHEN h.value >= e.q[3] THEN 1 ELSE 0 END
              + CASE WHEN h.value >= e.q[4] THEN 1 ELSE 0 END) AS b
        FROM halves h JOIN edges e USING (event_type)),
    cnt AS (
        SELECT event_type, b,
               CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n1,
               CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n2
        FROM bucketed GROUP BY 1, 2),
    tot AS (
        SELECT event_type,
               CAST(SUM(n1) AS BIGINT) AS t1,
               CAST(SUM(n2) AS BIGINT) AS t2
        FROM cnt GROUP BY event_type)
    SELECT c.event_type, tot.t1 AS n_first, tot.t2 AS n_second,
           CAST(ROUND(SUM(CAST(
               (CAST(c.n1 AS DOUBLE) / tot.t1
                - CAST(c.n2 AS DOUBLE) / tot.t2)
               * (CAST(c.n1 AS DOUBLE) / tot.t1
                  - CAST(c.n2 AS DOUBLE) / tot.t2)
               / (CAST(c.n1 AS DOUBLE) / tot.t1
                  + CAST(c.n2 AS DOUBLE) / tot.t2)
               AS DECIMAL(28,18))), 6) AS DOUBLE)
               AS drift_stat
    FROM cnt c JOIN tot USING (event_type)
    GROUP BY c.event_type, tot.t1, tot.t2
    """,
    doc="Distribution-drift audit between the corpus's first and "
    "second time halves (split at the global median event epoch): "
    "per event type, values bucket into the FIRST half's quintiles "
    "and the two halves' bucket shares are compared by the "
    "triangular discrimination statistic sum((p1-p2)^2/(p1+p2)) — "
    "the ln-free stand-in for PSI/KL (same zero iff identical, "
    "bounded, and bit-reproducible: shares are exact-integer counts "
    "quantized to DECIMAL(28,18) per bucket term before the "
    "order-free decimal sum) "
    "over engine-proven interpolated quintile edges, combined in a "
    "fixed-order 5-term sum via order-insensitive integer "
    "aggregation). The drift gate a production feature pipeline "
    "runs before retraining. Plan: one scan to count per (type, "
    "half, bucket) after a broadcast of the 5x4 edge table and the "
    "1-row median epoch; no row-level shuffles beyond the grouped "
    "counts.",
)
def feature_drift_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    b = ev.select(
        "event_type",
        "value",
        F.col("ts").cast("timestamp").cast("long").alias("ep"),
    )
    med = b.agg(F.percentile("ep", 0.5).alias("m"))
    halves = b.crossJoin(F.broadcast(med)).select(
        "event_type",
        "value",
        F.when(F.col("ep") <= F.col("m"), 0).otherwise(1).alias("half"),
    )
    edges = (
        halves.filter(F.col("half") == 0)
        .groupBy("event_type")
        .agg(F.percentile("value", DRIFT_EDGES).alias("q"))
    )
    bucket = sum(
        F.when(
            F.col("value") >= F.element_at("q", i + 1), 1
        ).otherwise(0)
        for i in range(len(DRIFT_EDGES))
    )
    bucketed = halves.join(F.broadcast(edges), "event_type").select(
        "event_type", "half", bucket.alias("b")
    )
    cnt = bucketed.groupBy("event_type", "b").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n1"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n2"),
    )
    from pyspark.sql import Window as _W

    wt = _W.partitionBy("event_type")
    p1 = F.col("n1").cast("double") / F.sum("n1").over(wt)
    p2 = F.col("n2").cast("double") / F.sum("n2").over(wt)
    terms = cnt.select(
        "event_type",
        F.sum("n1").over(wt).cast("long").alias("n_first"),
        F.sum("n2").over(wt).cast("long").alias("n_second"),
        ((p1 - p2) * (p1 - p2) / (p1 + p2))
        .cast("decimal(28,18)")
        .alias("term"),
    )
    return terms.groupBy("event_type", "n_first", "n_second").agg(
        F.round(F.sum("term"), 6).cast("double").alias("drift_stat")
    )


# --------------------------------------------- Hill tail-index estimator
HILL_K = 100  #: top-order statistics used (k); needs k+1 per group


@register(
    "hill_tail_index_event_values",
    oracle=f"""
    WITH r AS (
        SELECT event_type, value,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY value DESC, event_id) AS rn,
               CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
                   AS n_obs
        FROM events),
    t AS (
        SELECT event_type, MAX(n_obs) AS n_obs,
               MAX(CASE WHEN rn = {HILL_K + 1} THEN value END) AS x_k1,
               [x.value for x in
                list({{'rn': rn, 'value': value}} ORDER BY rn)
                if x.rn <= {HILL_K}] AS topk
        FROM r WHERE rn <= {HILL_K + 1}
        GROUP BY event_type
        HAVING MAX(CASE WHEN rn = {HILL_K + 1} THEN value END)
               IS NOT NULL),
    h AS (
        SELECT event_type, n_obs, x_k1,
               list_reduce([0.0] || [ln(x / x_k1) for x in topk],
                           (a, b) -> a + b) / {HILL_K} AS hinv
        FROM t WHERE x_k1 > 0)
    SELECT event_type, n_obs,
           CAST(x_k1 AS DOUBLE) AS x_k1,
           ROUND(hinv, 6) + 0.0 AS hill_inv,
           CASE WHEN hinv = 0 THEN NULL
                ELSE ROUND(1.0 / hinv, 6) + 0.0 END AS tail_alpha
    FROM h
    """,
    doc=f"Hill tail-index estimator per event type (Hill 1975): over "
    f"the top k={HILL_K} order statistics, hill_inv = (1/k) * "
    "sum ln(x_(i) / x_(k+1)) and tail_alpha = 1/hill_inv — the "
    "standard heavy-tail diagnosis. alpha <= 2 means infinite "
    "variance: means/CIs are unstable and robust statistics "
    "(MAD, Theil-Sen) are mandatory; it is also the skew early-"
    "warning for value-weighted partitioning. Determinism: the "
    "top-k SET is fixed by the (value DESC, event_id) total order; "
    "each ln is one IEEE op on exact doubles; the sum is a FIXED-"
    "ORDER left fold over the rank-ordered list (the Holt/ACF "
    "discipline) released under ROUND(.,6). Scale: rank-filter via "
    "WindowGroupLimit-style per-partition top-(k+1) heaps — the "
    "fold state is one bounded k-element array per group; no "
    "global sort of the raw table.",
)
def hill_tail_index_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.desc("value"), F.col("event_id")
    )
    n_obs = F.count(F.lit(1)).over(Window.partitionBy("event_type"))
    r = ev.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        n_obs.cast("bigint").alias("n_obs"),
    ).filter(F.col("rn") <= HILL_K + 1)
    t = (
        r.groupBy("event_type")
        .agg(
            F.max("n_obs").alias("n_obs"),
            F.max(
                F.when(F.col("rn") == HILL_K + 1, F.col("value"))
            ).alias("x_k1"),
            F.transform(
                F.filter(
                    F.sort_array(F.collect_list(F.struct("rn", "value"))),
                    lambda x: x["rn"] <= HILL_K,
                ),
                lambda x: x["value"],
            ).alias("topk"),
        )
        .filter(F.col("x_k1").isNotNull() & (F.col("x_k1") > 0))
    )
    hinv = (
        F.aggregate(
            F.transform(
                F.col("topk"), lambda x: F.log(x / F.col("x_k1"))
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        / HILL_K
    )
    h = t.withColumn("hinv", hinv)
    return h.select(
        "event_type",
        "n_obs",
        F.col("x_k1").cast("double").alias("x_k1"),
        (F.round(F.col("hinv"), 6) + F.lit(0.0)).alias("hill_inv"),
        F.when(F.col("hinv") == 0, F.lit(None).cast("double"))
        .otherwise(F.round(F.lit(1.0) / F.col("hinv"), 6) + F.lit(0.0))
        .alias("tail_alpha"),
    )
