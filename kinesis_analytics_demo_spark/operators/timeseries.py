"""Time-series analysis operators: forecasting, trend, correlation.

Split out of ``temporal.py`` (which keeps the as-of/range joins and
interval/sweep operators) — pure move, no semantic change. Families
here: Holt double-exponential smoothing, Theil-Sen robust trend,
autocorrelation (ACF), Mann-Kendall trend test, lagged cross-
correlation (CCF), matrix-profile motif/discord discovery, Hurst
exponent (R/S analysis), and SAX symbolic discretization. All operate
on per-day aggregates of the events table, so every operator is a
handful of hash aggregates plus bounded per-key array folds — the
daily series per key is small even at 100 TB of raw events, and the
heavy lifting (the raw-event scan) is a single map-side-combinable
aggregate shared by the whole family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.plans.registry import register
from kinesis_analytics_demo_spark.session import read_table as _t

# ------------------------------------- Holt double exponential smoothing
HOLT_ALPHA = 0.5  #: level smoothing (exactly representable in binary)
HOLT_BETA = 0.3  #: trend smoothing (same literal parsed by both engines)


@register(
    "holt_forecast_event_types",
    oracle=f"""
    WITH d AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
                   AS v
        FROM events GROUP BY 1, 2),
    series AS (
        SELECT event_type,
               [x.v for x in list({{'day': day, 'v': v}} ORDER BY day)] AS vs
        FROM d GROUP BY event_type),
    fitted AS (
        -- state is a 2-element DOUBLE list [level, trend], NOT a
        -- struct: DuckDB 1.0 list_reduce mis-evaluates multi-field
        -- struct accumulators (the 't' expression sees a corrupted
        -- 'l'), while list-typed state folds correctly (verified
        -- against a pure-Python trace).
        SELECT event_type, len(vs) AS n_days,
               list_reduce(
                   [[vs[1], vs[2] - vs[1]]] ||
                   [[CAST(y AS DOUBLE), CAST(0 AS DOUBLE)]
                    for y in vs[3:]],
                   (acc, e) -> [
                       {HOLT_ALPHA} * e[1]
                            + {1 - HOLT_ALPHA} * (acc[1] + acc[2]),
                       {HOLT_BETA} * ({HOLT_ALPHA} * e[1]
                                + {1 - HOLT_ALPHA} * (acc[1] + acc[2])
                                - acc[1])
                            + {1 - HOLT_BETA} * acc[2]]) AS st
        FROM series WHERE len(vs) >= 2)
    -- '+ 0.0' normalizes IEEE negative zero: DuckDB ROUND(-1e-9, 6)
    -- yields -0.0 while Spark yields 0.0, and the driver hash is
    -- repr-sensitive; a near-flat series rounding to zero from below
    -- must hash identically on both engines.
    SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
           ROUND(st[1], 6) + 0.0 AS level,
           ROUND(st[2], 6) + 0.0 AS trend,
           ROUND(st[1] + st[2], 6) + 0.0 AS forecast_next
    FROM fitted
    """,
    doc="Holt double exponential smoothing over each event type's "
    "daily revenue series: level/trend state folded left-to-right "
    "over the day-ordered values (init l=y1, t=y2-y1; "
    "alpha=0.5, beta=0.3), one-step-ahead forecast = level + trend. "
    "Daily inputs are DECIMAL-exact sums rounded once, and the fold "
    "is the SAME fixed-order IEEE chain on both engines (Spark "
    "aggregate() vs DuckDB list_reduce) — bitwise-reproducible "
    "without any ln/exp. Per-type series are bounded (one value per "
    "day), so collect_list state is O(days); the heavy lifting — "
    "the daily rollup — is one map-side-combinable aggregate.",
)
def holt_forecast_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    d = (
        ev.groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts").cast("timestamp")).alias("day"),
        )
        .agg(
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("v")
        )
    )
    series = d.groupBy("event_type").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "v"))),
            lambda x: x["v"],
        ).alias("vs")
    )
    vs = F.col("vs")
    a, b = HOLT_ALPHA, HOLT_BETA
    y1 = F.element_at(vs, 1)
    y2 = F.element_at(vs, 2)

    def _step(acc, y):
        new_l = F.lit(a) * y + F.lit(1 - a) * (acc["l"] + acc["t"])
        new_t = (
            F.lit(b)
            * (F.lit(a) * y + F.lit(1 - a) * (acc["l"] + acc["t"]) - acc["l"])
            + F.lit(1 - b) * acc["t"]
        )
        return F.struct(new_l.alias("l"), new_t.alias("t"))

    st = F.aggregate(
        F.slice(vs, 3, F.greatest(F.size(vs) - 2, F.lit(0))),
        F.struct(y1.alias("l"), (y2 - y1).alias("t")),
        _step,
    )
    return (
        series.filter(F.size(vs) >= 2)
        .select(
            "event_type",
            F.size(vs).cast("bigint").alias("n_days"),
            st.alias("st"),
        )
        .select(
            "event_type",
            "n_days",
            (F.round(F.col("st.l"), 6) + F.lit(0.0)).alias("level"),
            (F.round(F.col("st.t"), 6) + F.lit(0.0)).alias("trend"),
            (F.round(F.col("st.l") + F.col("st.t"), 6) + F.lit(0.0)).alias(
                "forecast_next"
            ),
        )
    )


# ------------------------------------------- Theil-Sen robust trend
def _ts_median_sql(arr: str) -> str:
    """Exact median of a sorted DOUBLE list: the order statistic for
    odd n, the fixed two-term IEEE mean for even n — NOT quantile_cont
    (whose interpolation formula a + (b-a)*f is a different IEEE
    chain than Spark's)."""
    return f"""CASE WHEN len({arr}) % 2 = 1
             THEN {arr}[(len({arr}) + 1) // 2]
             ELSE ({arr}[len({arr}) // 2]
                   + {arr}[len({arr}) // 2 + 1]) / 2.0 END"""


def _ts_median_col(arr):
    n = F.size(arr)
    mid = ((n + 1) / 2).cast("int")
    return F.when(
        n % 2 == 1, F.element_at(arr, mid)
    ).otherwise(
        (
            F.element_at(arr, (n / 2).cast("int"))
            + F.element_at(arr, (n / 2).cast("int") + 1)
        )
        / 2.0
    )


@register(
    "theil_sen_trend_event_types",
    oracle=f"""
    WITH d AS (
        SELECT event_type,
               date_diff('day', DATE '1970-01-01',
                         CAST(date_trunc('day', ts) AS DATE)) AS di,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
                   AS v
        FROM events GROUP BY 1, 2),
    p AS (
        SELECT a.event_type,
               (b.v - a.v) / CAST(b.di - a.di AS DOUBLE) + 0.0 AS slope
        FROM d a JOIN d b
          ON a.event_type = b.event_type AND b.di > a.di),
    s AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               list_sort(list(slope)) AS sl
        FROM p GROUP BY event_type),
    m AS (
        SELECT event_type, n_pairs,
               {_ts_median_sql('sl')} AS med
        FROM s),
    r AS (
        SELECT d.event_type,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               MAX(m.n_pairs) AS n_pairs, MAX(m.med) AS med,
               list_sort(list(d.v - m.med * d.di)) AS res
        FROM d JOIN m ON d.event_type = m.event_type
        GROUP BY d.event_type)
    SELECT event_type, n_days, n_pairs,
           ROUND(med, 6) + 0.0 AS slope_per_day,
           ROUND({_ts_median_sql('res')}, 6) + 0.0 AS intercept
    FROM r
    """,
    doc="Theil-Sen robust trend per event type over the daily revenue "
    "series: slope = MEDIAN of all pairwise slopes (v_j - v_i) / "
    "(day_j - day_i), intercept = median of (v_i - slope * day_i) — "
    "the 29.3%%-breakdown robust alternative to the OLS trend (one "
    "corrupted ingest day cannot move it). Daily inputs are the "
    "repo's DECIMAL-exact rounded sums; every slope/residual is one "
    "fixed IEEE expression; the median is an ORDER STATISTIC over an "
    "identically sorted double list on both engines (two-term mean "
    "for even n; + 0.0 normalizes any -0.0 before the sort so the "
    "repr-sensitive driver hash can't diverge). Scale: the pairwise "
    "expansion is O(days^2) per type — bounded by the CALENDAR, not "
    "the data (the heavy scan is the map-side-combinable daily "
    "rollup); the per-type fold state is one bounded slope list.",
)
def theil_sen_trend_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_analytics_demo_spark.caching import tracked_persist

    ev = _t(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type",
        F.datediff(
            F.to_date(F.date_trunc("day", F.col("ts").cast("timestamp"))),
            F.lit("1970-01-01").cast("date"),
        ).alias("di"),
    ).agg(
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("v")
    )
    d = tracked_persist(d)
    a = d.select("event_type", F.col("di").alias("i"), F.col("v").alias("vi"))
    b = d.select(
        F.col("event_type").alias("et2"),
        F.col("di").alias("j"),
        F.col("v").alias("vj"),
    )
    p = a.join(
        b, (F.col("event_type") == F.col("et2")) & (F.col("j") > F.col("i"))
    ).select(
        "event_type",
        (
            (F.col("vj") - F.col("vi"))
            / (F.col("j") - F.col("i")).cast("double")
            + F.lit(0.0)
        ).alias("slope"),
    )
    s = p.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sort_array(F.collect_list("slope")).alias("sl"),
    )
    m = s.select(
        "event_type", "n_pairs", _ts_median_col(F.col("sl")).alias("med")
    )
    r = (
        d.join(F.broadcast(m), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.max("n_pairs").alias("n_pairs"),
            F.max("med").alias("med"),
            F.sort_array(
                F.collect_list(F.col("v") - F.col("med") * F.col("di"))
            ).alias("res"),
        )
    )
    return r.select(
        "event_type",
        "n_days",
        "n_pairs",
        (F.round(F.col("med"), 6) + F.lit(0.0)).alias("slope_per_day"),
        (F.round(_ts_median_col(F.col("res")), 6) + F.lit(0.0)).alias(
            "intercept"
        ),
    )


# ------------------------------------------- autocorrelation function
ACF_MAX_LAG = 7  #: report lags 1..7 (a weekly cycle on daily data)


@register(
    "acf_event_type_daily",
    oracle=f"""
    WITH d AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
                   AS v
        FROM events GROUP BY 1, 2),
    series AS (
        SELECT event_type,
               [x.v for x in list({{'day': day, 'v': v}} ORDER BY day)] AS vs
        FROM d GROUP BY event_type),
    st AS (
        SELECT event_type, vs, len(vs) AS n,
               list_reduce([0.0] || vs, (a, b) -> a + b) / len(vs) AS m
        FROM series WHERE len(vs) >= {ACF_MAX_LAG + 1}),
    dn AS (
        SELECT event_type, vs, n, m,
               list_reduce([0.0] || [(x - m) * (x - m) for x in vs],
                           (a, b) -> a + b) AS den
        FROM st)
    SELECT event_type,
           CAST(lag AS INT) AS lag,
           CAST(n AS BIGINT) AS n_days,
           CASE WHEN den = 0 THEN NULL
                ELSE ROUND(list_reduce(
                         [0.0] || [(vs[i] - m) * (vs[i + lag] - m)
                                   for i in generate_series(1, n - lag)],
                         (a, b) -> a + b) / den, 6) + 0.0
           END AS acf
    FROM dn, LATERAL (SELECT unnest(generate_series(1, {ACF_MAX_LAG}))
                      AS lag)
    """,
    doc=f"Sample autocorrelation of each event type's daily revenue "
    f"series at lags 1..{ACF_MAX_LAG}: acf(L) = sum_i (v_i - m)"
    "(v_i+L - m) / sum_i (v_i - m)^2 over the day-ordered series — "
    "the seasonality detector (a weekly cycle shows as an acf(7) "
    "peak) that decides whether anomaly baselines need day-of-week "
    "stratification (anomaly_seasonal_baseline) and whether Holt "
    "needs the seasonal term. Determinism: daily inputs are "
    "DECIMAL-exact rounded sums; the mean, denominator, and every "
    "lag's numerator are FIXED-ORDER left folds over the same "
    "day-sorted array on both engines (the Holt discipline) — one "
    "IEEE division per lag, NULL on a constant series. Scale: the "
    "heavy scan is the map-side-combinable daily rollup; per-type "
    "state is one bounded array (days), lags expand O(1) rows each.",
)
def acf_event_type_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts").cast("timestamp")).alias("day"),
    ).agg(
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("v")
    )
    series = d.groupBy("event_type").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "v"))),
            lambda x: x["v"],
        ).alias("vs")
    )
    vs = F.col("vs")
    n = F.size(vs)
    m = F.aggregate(vs, F.lit(0.0), lambda a, x: a + x) / n
    den = F.aggregate(
        F.transform(vs, lambda x: (x - F.col("m")) * (x - F.col("m"))),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    st = (
        series.filter(n >= ACF_MAX_LAG + 1)
        .withColumn("n", n)
        .withColumn("m", m)
        .withColumn("den", den)
    )

    def _acf(lag):
        num = F.aggregate(
            F.transform(
                F.sequence(F.lit(1), F.col("n") - lag),
                lambda i: (F.element_at(vs, i) - F.col("m"))
                * (F.element_at(vs, i + lag) - F.col("m")),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        return F.when(
            F.col("den") != 0.0, F.round(num / F.col("den"), 6) + F.lit(0.0)
        )

    lags = F.explode(
        F.transform(
            F.sequence(F.lit(1), F.lit(ACF_MAX_LAG)),
            lambda L: F.struct(
                L.cast("int").alias("lag"), _acf(L).alias("acf")
            ),
        )
    )
    return st.select(
        "event_type", lags.alias("s"), F.col("n").cast("bigint").alias("n_days")
    ).select("event_type", "s.lag", "n_days", "s.acf")


# --------------------------------------------- Mann-Kendall trend test
@register(
    "mann_kendall_event_types",
    oracle="""
    WITH d AS (
        SELECT event_type,
               date_diff('day', DATE '1970-01-01',
                         CAST(date_trunc('day', ts) AS DATE)) AS di,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
                   AS v
        FROM events GROUP BY 1, 2),
    s AS (
        SELECT a.event_type,
               CAST(SUM(CAST(sign(b.v - a.v) AS BIGINT)) AS BIGINT)
                   AS s_stat
        FROM d a JOIN d b
          ON a.event_type = b.event_type AND b.di > a.di
        GROUP BY a.event_type),
    n AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
        FROM d GROUP BY event_type),
    ties AS (
        SELECT event_type,
               CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5))
                             FILTER (t > 1), 0) AS BIGINT) AS tie_term
        FROM (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS t
              FROM d GROUP BY event_type, v)
        GROUP BY event_type)
    SELECT n.event_type, n.n_days, s.s_stat,
           ROUND((CAST(n_days AS DOUBLE) * (n_days - 1) * (2 * n_days + 5)
                  - tie_term) / 18.0, 6) + 0.0 AS var_s,
           CASE WHEN (CAST(n_days AS DOUBLE) * (n_days - 1)
                      * (2 * n_days + 5) - tie_term) = 0 THEN NULL
                WHEN s_stat > 0 THEN ROUND((s_stat - 1) / sqrt(
                    (CAST(n_days AS DOUBLE) * (n_days - 1)
                     * (2 * n_days + 5) - tie_term) / 18.0), 6) + 0.0
                WHEN s_stat < 0 THEN ROUND((s_stat + 1) / sqrt(
                    (CAST(n_days AS DOUBLE) * (n_days - 1)
                     * (2 * n_days + 5) - tie_term) / 18.0), 6) + 0.0
                ELSE 0.0 END AS z
    FROM n JOIN s ON n.event_type = s.event_type
    JOIN ties ON n.event_type = ties.event_type
    """,
    doc="Mann-Kendall non-parametric trend test per event type over "
    "the daily revenue series: S = sum over day pairs i<j of "
    "sign(v_j - v_i) (integer-exact — no float accumulation at "
    "all), tie-corrected variance Var(S) = (n(n-1)(2n+5) - "
    "sum_t t(t-1)(2t+5)) / 18, and the continuity-corrected normal "
    "score z = (S -/+ 1)/sqrt(Var). The distribution-free companion "
    "to theil_sen_trend_event_types: MK answers IS there a "
    "monotonic trend (outlier-robust, no linearity assumption), "
    "Theil-Sen answers how steep. Determinism: S and the tie term "
    "are pure BIGINT sums; the only float ops are the final two "
    "fixed IEEE expressions (one division, one sqrt-divide), "
    "released under ROUND(.,6) with the -0.0 normalizer. Scale: "
    "the pairwise expansion is O(days^2) per type — bounded by the "
    "CALENDAR, not the data; the heavy scan is the map-side-"
    "combinable daily rollup.",
)
def mann_kendall_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_analytics_demo_spark.caching import tracked_persist

    ev = _t(spark, sf_dir, "events")
    d = tracked_persist(
        ev.groupBy(
            "event_type",
            F.datediff(
                F.to_date(
                    F.date_trunc("day", F.col("ts").cast("timestamp"))
                ),
                F.lit("1970-01-01").cast("date"),
            ).alias("di"),
        ).agg(
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("v")
        )
    )
    a = d.select("event_type", F.col("di").alias("i"), F.col("v").alias("vi"))
    b = d.select(
        F.col("event_type").alias("et2"),
        F.col("di").alias("j"),
        F.col("v").alias("vj"),
    )
    s = (
        a.join(
            b,
            (F.col("event_type") == F.col("et2")) & (F.col("j") > F.col("i")),
        )
        .groupBy("event_type")
        .agg(
            F.sum(F.signum(F.col("vj") - F.col("vi")).cast("bigint"))
            .cast("bigint")
            .alias("s_stat")
        )
    )
    n = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    t = F.col("t")
    ties = (
        d.groupBy("event_type", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .groupBy("event_type")
        .agg(
            F.coalesce(
                F.sum(
                    F.when(t > 1, t * (t - 1) * (2 * t + 5)).otherwise(
                        F.lit(None)
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("tie_term")
        )
    )
    var_num = (
        F.col("n_days").cast("double")
        * (F.col("n_days") - 1)
        * (2 * F.col("n_days") + 5)
        - F.col("tie_term")
    )
    sd = F.sqrt(var_num / 18.0)
    ss = F.col("s_stat")
    z = (
        F.when(var_num == 0, F.lit(None).cast("double"))
        .when(ss > 0, F.round((ss - 1) / sd, 6) + F.lit(0.0))
        .when(ss < 0, F.round((ss + 1) / sd, 6) + F.lit(0.0))
        .otherwise(F.lit(0.0))
    )
    return (
        n.join(s, "event_type")
        .join(ties, "event_type")
        .select(
            "event_type",
            "n_days",
            "s_stat",
            (F.round(var_num / 18.0, 6) + F.lit(0.0)).alias("var_s"),
            z.alias("z"),
        )
    )


# ------------------------------------- lagged cross-correlation (CCF)
CCF_X_TYPE = "view"  #: leading series
CCF_Y_TYPE = "purchase"  #: lagged series (y at day d + lag)
CCF_MAX_LAG = 3  #: report lags -3..3


@register(
    "ccf_view_purchase_daily",
    oracle=f"""
    WITH d AS (
        SELECT event_type,
               date_diff('day', DATE '1970-01-01',
                         CAST(date_trunc('day', ts) AS DATE)) AS di,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2)
                    AS DECIMAL(18,2)) AS v
        FROM events
        WHERE event_type IN ('{CCF_X_TYPE}', '{CCF_Y_TYPE}')
        GROUP BY 1, 2),
    x AS (SELECT di, v FROM d WHERE event_type = '{CCF_X_TYPE}'),
    y AS (SELECT di, v FROM d WHERE event_type = '{CCF_Y_TYPE}'),
    aligned AS (
        SELECT lag, x.v AS xv, y.v AS yv
        FROM x
        CROSS JOIN (SELECT unnest(generate_series(
            -{CCF_MAX_LAG}, {CCF_MAX_LAG})) AS lag) l
        JOIN y ON y.di = x.di + lag),
    st AS (
        SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_days,
               SUM(xv) AS sx, SUM(yv) AS sy,
               SUM(CAST(xv AS DECIMAL(38,4)) * yv) AS sxy,
               SUM(CAST(xv AS DECIMAL(38,4)) * xv) AS sxx,
               SUM(CAST(yv AS DECIMAL(38,4)) * yv) AS syy
        FROM aligned GROUP BY lag)
    SELECT CAST(lag AS INT) AS lag, n_days,
           CASE WHEN CAST(n_days * sxx - sx * sx AS DOUBLE) *
                     CAST(n_days * syy - sy * sy AS DOUBLE) <= 0
                THEN NULL
                ELSE ROUND(CAST(n_days * sxy - sx * sy AS DOUBLE)
                     / sqrt(CAST(n_days * sxx - sx * sx AS DOUBLE)
                            * CAST(n_days * syy - sy * sy AS DOUBLE)),
                     6) + 0.0
           END AS ccf
    FROM st
    """,
    doc=f"Lagged cross-correlation between the daily revenue series "
    f"of '{CCF_X_TYPE}' (x) and '{CCF_Y_TYPE}' (y): ccf(L) = "
    "Pearson corr(x_d, y_d+L) for L in -3..3 over the days where "
    "both series exist — the lead/lag detector behind conversion-"
    "delay attribution (a peak at L=+2 means purchases follow views "
    "by two days; the ACF's two-series sibling). Determinism: daily "
    "values are DECIMAL(18,2)-exact; all five sufficient statistics "
    "accumulate in DECIMAL (order-free), and each correlation is "
    "computed from them in a fixed IEEE chain (two casts, one "
    "multiply, one sqrt, one divide) released under ROUND(.,6) "
    "with the -0.0 normalizer; NULL when either variance is zero. "
    "Scale: one map-side-combinable rollup scan; the per-lag join "
    "is over O(calendar) rows. The lag expansion happens on the "
    "tiny daily table (generator, not a join), never on raw events.",
)
def ccf_view_purchase_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_analytics_demo_spark.caching import tracked_persist

    ev = _t(spark, sf_dir, "events")
    d = tracked_persist(
        ev.filter(F.col("event_type").isin(CCF_X_TYPE, CCF_Y_TYPE))
        .groupBy(
            "event_type",
            F.datediff(
                F.to_date(
                    F.date_trunc("day", F.col("ts").cast("timestamp"))
                ),
                F.lit("1970-01-01").cast("date"),
            ).alias("di"),
        )
        .agg(
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("decimal(18,2)")
            .alias("v")
        )
    )
    x = (
        d.filter(F.col("event_type") == CCF_X_TYPE)
        .select("di", F.col("v").alias("xv"))
        .withColumn(
            "lag",
            F.explode(
                F.sequence(F.lit(-CCF_MAX_LAG), F.lit(CCF_MAX_LAG))
            ),
        )
    )
    y = d.filter(F.col("event_type") == CCF_Y_TYPE).select(
        F.col("di").alias("dj"), F.col("v").alias("yv")
    )
    aligned = x.join(y, F.col("dj") == F.col("di") + F.col("lag"))
    xv, yv = F.col("xv"), F.col("yv")
    st = aligned.groupBy("lag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum(xv).alias("sx"),
        F.sum(yv).alias("sy"),
        F.sum(xv.cast("decimal(38,4)") * yv).alias("sxy"),
        F.sum(xv.cast("decimal(38,4)") * xv).alias("sxx"),
        F.sum(yv.cast("decimal(38,4)") * yv).alias("syy"),
    )
    nd = F.col("n_days")
    dx = (nd * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    dy = (nd * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    num = (nd * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    ccf = F.when(dx * dy <= 0, F.lit(None).cast("double")).otherwise(
        F.round(num / F.sqrt(dx * dy), 6) + F.lit(0.0)
    )
    return st.select(
        F.col("lag").cast("int").alias("lag"), "n_days", ccf.alias("ccf")
    )


# ------------------------------------ matrix-profile motif / discord
MP_W = 7  #: subsequence window (one week of daily points)
MP_EXCL = 4  #: trivial-match exclusion zone (|i - j| >= excl)
MP_MIN_DAYS = MP_W + MP_EXCL + 4  #: need >= 2 mutually valid windows


@register(
    "matrix_profile_daily",
    oracle=f"""
    WITH d AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
                   AS v
        FROM events GROUP BY 1, 2),
    series AS (
        SELECT event_type,
               [x.v for x in list({{'day': day, 'v': v}} ORDER BY day)]
                   AS vs
        FROM d GROUP BY event_type),
    base AS (
        SELECT event_type, vs, len(vs) - {MP_W - 1} AS nw
        FROM series WHERE len(vs) >= {MP_MIN_DAYS}),
    stat AS (
        SELECT event_type, vs, nw,
               [list_reduce([0.0] ||
                    [vs[i + t] for t in generate_series(0, {MP_W - 1})],
                    (a, b) -> a + b) / {MP_W}.0
                for i in generate_series(1, nw)] AS ms
        FROM base),
    stat2 AS (
        SELECT event_type, vs, nw, ms,
               [sqrt(list_reduce([0.0] ||
                    [(vs[i + t] - ms[i]) * (vs[i + t] - ms[i])
                     for t in generate_series(0, {MP_W - 1})],
                    (a, b) -> a + b) / {MP_W}.0)
                for i in generate_series(1, nw)] AS ss
        FROM stat),
    prof AS (
        SELECT event_type, nw,
               list_filter(
                   [CASE WHEN ss[i] > 0 THEN
                       list_sort([{{'p': list_reduce([0.0] ||
                           [((vs[i + t] - ms[i]) / ss[i]
                             - (vs[j + t] - ms[j]) / ss[j])
                            * ((vs[i + t] - ms[i]) / ss[i]
                               - (vs[j + t] - ms[j]) / ss[j])
                            for t in generate_series(0, {MP_W - 1})],
                           (a, b) -> a + b),
                          'i': i, 'nn': j}}
                         for j in generate_series(1, nw)
                         if abs(i - j) >= {MP_EXCL} AND ss[j] > 0])[1]
                    ELSE NULL END
                    for i in generate_series(1, nw)],
                   x -> x IS NOT NULL AND x.p IS NOT NULL) AS pr
        FROM stat2),
    pick AS (
        SELECT event_type, nw,
               list_sort(pr)[1] AS motif,
               list_sort([{{'p': x.p, 'ni': -x.i, 'nn': x.nn}}
                          for x in pr])[-1] AS disc
        FROM prof WHERE len(pr) > 0)
    SELECT event_type, CAST(nw AS BIGINT) AS n_windows,
           CAST(motif.i AS INT) AS motif_i,
           CAST(motif.nn AS INT) AS motif_j,
           ROUND(motif.p, 6) AS motif_dist,
           CAST(-disc.ni AS INT) AS discord_i,
           CAST(disc.nn AS INT) AS discord_j,
           ROUND(disc.p, 6) AS discord_dist
    FROM pick
    """,
    doc=f"Matrix-profile-style motif and discord discovery (Yeh et "
    f"al., ICDM 2016) over each event type's daily revenue series: "
    f"all length-{MP_W} subsequences are z-normalized and every "
    f"window's nearest neighbor (outside the |i-j| < {MP_EXCL} "
    "trivial-match exclusion zone) is found by exact squared "
    "Euclidean distance; the MOTIF is the globally closest pair "
    "(the series' repeated weekly pattern) and the DISCORD is the "
    "window farthest from its own nearest neighbor (the strongest "
    "subsequence ANOMALY — the time-series dual of the pointwise "
    "MAD/z-score detectors). Determinism: daily inputs are "
    "DECIMAL-exact; every mean, std, and distance is a FIXED-ORDER "
    "fold (the ACF discipline) with single IEEE divide/sqrt ops; "
    "argmin/argmax run on lexicographic (dist, index) structs over "
    "bit-identical doubles; constant-std windows are excluded "
    "(z-normalization undefined). Scale: the O(nw^2 x w) pair work "
    "is bounded by the CALENDAR, not the data (nw = days - 6); the "
    "heavy scan is the map-side-combinable daily rollup, per-type "
    "state one bounded array.",
)
def matrix_profile_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts").cast("timestamp")).alias("day"),
    ).agg(
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("v")
    )
    series = d.groupBy("event_type").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "v"))),
            lambda x: x["v"],
        ).alias("vs")
    )
    base = series.filter(F.size("vs") >= MP_MIN_DAYS).withColumn(
        "nw", F.size("vs") - (MP_W - 1)
    )
    vs = F.col("vs")

    def _wsum(i, term):
        return F.aggregate(
            F.transform(F.sequence(F.lit(0), F.lit(MP_W - 1)), term(i)),
            F.lit(0.0),
            lambda a, x: a + x,
        )

    stat = base.withColumn(
        "ms",
        F.transform(
            F.sequence(F.lit(1), F.col("nw")),
            lambda i: _wsum(i, lambda i: lambda t: F.element_at(vs, i + t))
            / F.lit(float(MP_W)),
        ),
    )
    ms = F.col("ms")
    stat2 = stat.withColumn(
        "ss",
        F.transform(
            F.sequence(F.lit(1), F.col("nw")),
            lambda i: F.sqrt(
                _wsum(
                    i,
                    lambda i: lambda t: (
                        F.element_at(vs, i + t) - F.element_at(ms, i)
                    )
                    * (F.element_at(vs, i + t) - F.element_at(ms, i)),
                )
                / F.lit(float(MP_W))
            ),
        ),
    )
    # Persist barrier (measured, not stylistic): without it Catalyst's
    # project-collapse inlines the ms/ss ARRAY-BUILDING expressions
    # into every element_at access downstream, and higher-order
    # functions evaluate interpreted without common-subexpression
    # reuse — the nw^2 x w distance pass then rebuilds the nw x w
    # fold arrays per access (~nw^4 x w^2 work; minutes at 24
    # windows). Materializing the 5 per-type rows once makes ms/ss
    # plain stored arrays.
    from kinesis_analytics_demo_spark.caching import tracked_persist

    stat2 = tracked_persist(stat2)
    ss = F.col("ss")

    def _znorm(i, t):
        return (F.element_at(vs, i + t) - F.element_at(ms, i)) / F.element_at(
            ss, i
        )

    def _dist(i, j):
        return F.aggregate(
            F.transform(
                F.sequence(F.lit(0), F.lit(MP_W - 1)),
                lambda t: (_znorm(i, t) - _znorm(j, t))
                * (_znorm(i, t) - _znorm(j, t)),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )

    def _cands(i):
        js = F.filter(
            F.sequence(F.lit(1), F.col("nw")),
            lambda j: (F.abs(i - j) >= MP_EXCL)
            & (F.element_at(ss, j) > 0),
        )
        return F.transform(
            js,
            lambda j: F.struct(
                _dist(i, j).alias("p"),
                i.cast("int").alias("i"),
                j.cast("int").alias("nn"),
            ),
        )

    prof = stat2.withColumn(
        "pr",
        F.filter(
            F.transform(
                F.sequence(F.lit(1), F.col("nw")),
                lambda i: F.when(
                    F.element_at(ss, i) > 0,
                    F.try_element_at(F.array_sort(_cands(i)), F.lit(1)),
                ),
            ),
            lambda x: x.isNotNull() & x["p"].isNotNull(),
        ),
    ).filter(F.size("pr") > 0)
    pr = F.col("pr")
    pick = prof.select(
        "event_type",
        F.col("nw").cast("bigint").alias("n_windows"),
        F.array_min(pr).alias("motif"),
        F.array_max(
            F.transform(
                pr,
                lambda x: F.struct(
                    x["p"].alias("p"),
                    (-x["i"]).alias("ni"),
                    x["nn"].alias("nn"),
                ),
            )
        ).alias("disc"),
    )
    return pick.select(
        "event_type",
        "n_windows",
        F.col("motif.i").cast("int").alias("motif_i"),
        F.col("motif.nn").cast("int").alias("motif_j"),
        F.round(F.col("motif.p"), 6).alias("motif_dist"),
        (-F.col("disc.ni")).cast("int").alias("discord_i"),
        F.col("disc.nn").cast("int").alias("discord_j"),
        F.round(F.col("disc.p"), 6).alias("discord_dist"),
    )


# ----------------------------------- Hurst exponent (R/S analysis)
HURST_SCALES = [4, 8, 12]  #: block sizes (testdata spans 30 days)


@register(
    "hurst_exponent_daily",
    oracle=f"""
    WITH d AS (
        SELECT date_trunc('day', ts) AS day,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
                   AS v
        FROM events GROUP BY 1),
    series AS (
        SELECT [x.v for x in list({{'day': day, 'v': v}} ORDER BY day)]
                   AS vs
        FROM d),
    sc_t AS (
        SELECT vs, sc
        FROM series, (SELECT unnest({HURST_SCALES}) AS sc)
        WHERE len(vs) // sc >= 2),
    bi AS (
        SELECT sc, vs,
               unnest(generate_series(0, len(vs) // sc - 1)) AS b
        FROM sc_t),
    blk AS (
        SELECT sc, b, vs[b * sc + 1 : b * sc + sc] AS xs
        FROM bi),
    stat AS (
        SELECT sc, b, xs,
               list_reduce([0.0] || xs, (a, x) -> a + x) / len(xs) AS m
        FROM blk),
    rs AS (
        SELECT sc, b,
               list_max(z) - list_min(z) AS r,
               sqrt(list_reduce(
                        [0.0] || [(x - m) * (x - m) for x in xs],
                        (a, x) -> a + x) / len(xs)) AS s
        FROM (
            SELECT sc, b, xs, m,
                   list_reduce([[0.0]] || [[x] for x in xs],
                               (a, e) -> a || [a[-1] + (e[1] - m)])
                       [2:] AS z
            FROM stat)),
    agg AS (
        SELECT sc,
               COUNT(CASE WHEN s > 0 THEN 1 END) AS n_blocks,
               CAST(SUM(CASE WHEN s > 0 THEN
                        CAST(ROUND(r / s, 12) AS DECIMAL(28,12)) END)
                    AS DOUBLE)
                   / COUNT(CASE WHEN s > 0 THEN 1 END) AS avg_rs
        FROM rs GROUP BY sc
        HAVING COUNT(CASE WHEN s > 0 THEN 1 END) > 0),
    pts AS (
        SELECT list({{'x': ln(CAST(sc AS DOUBLE)),
                      'y': ln(avg_rs)}} ORDER BY sc) AS ps,
               CAST(COUNT(*) AS DOUBLE) AS k
        FROM agg),
    reg AS (
        SELECT CASE WHEN k >= 2 THEN
               ((k * list_reduce([0.0] || [p.x * p.y for p in ps],
                                 (a, x) -> a + x))
                - (list_reduce([0.0] || [p.x for p in ps],
                               (a, x) -> a + x)
                   * list_reduce([0.0] || [p.y for p in ps],
                                 (a, x) -> a + x)))
               / ((k * list_reduce([0.0] || [p.x * p.x for p in ps],
                                    (a, x) -> a + x))
                  - (list_reduce([0.0] || [p.x for p in ps],
                                 (a, x) -> a + x)
                     * list_reduce([0.0] || [p.x for p in ps],
                                   (a, x) -> a + x)))
               END AS h
        FROM pts)
    SELECT CAST(agg.sc AS INT) AS scale,
           CAST(agg.n_blocks AS BIGINT) AS n_blocks,
           CAST(ROUND(agg.avg_rs, 6) AS DOUBLE) AS avg_rs,
           CAST(ROUND(reg.h, 6) AS DOUBLE) + 0.0 AS hurst
    FROM agg, reg
    """,
    doc="Hurst exponent of the corpus-wide daily revenue series by "
    "rescaled-range analysis (Hurst 1951; Mandelbrot & Wallis 1969): "
    "for each block size n in "
    f"{HURST_SCALES}, the series splits into contiguous blocks, each "
    "contributing R/S = (range of cumulative mean-deviations) / "
    "(population sigma); H is the log-log slope of avg R/S on n "
    "(H = 0.5 random walk, > 0.5 persistent/trending, < 0.5 "
    "mean-reverting) — the long-range-dependence diagnostic that "
    "tells the forecasting family (Holt, Theil-Sen) whether history "
    "helps at all. Determinism: daily values are DECIMAL-exact; "
    "block means, cumulative deviations (LIST-state fold — never a "
    "struct, the Holt trap), and sigma are fixed-order left folds "
    "over day-sorted arrays; per-block R/S is rounded to 12 dp and "
    "averaged in exact DECIMAL; the final regression folds a "
    "scale-sorted 3-point list (the Zipf discipline). Zero-sigma "
    "blocks are excluded on both engines. Scale: one "
    "map-side-combinable daily rollup; everything after is one "
    "bounded array per scale.",
)
def hurst_exponent_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    d = ev.groupBy(
        F.date_trunc("day", F.col("ts").cast("timestamp")).alias("day")
    ).agg(
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("v")
    )
    series = d.agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "v"))),
            lambda x: x["v"],
        ).alias("vs")
    )
    scales = F.array(*[F.lit(s) for s in HURST_SCALES])
    blk = (
        series.select(F.explode(scales).alias("sc"), "vs")
        .where((F.size("vs") / F.col("sc")).cast("int") >= 2)
        .select(
            "sc",
            F.explode(
                F.sequence(
                    F.lit(0),
                    (F.size("vs") / F.col("sc")).cast("int") - 1,
                )
            ).alias("b"),
            "vs",
        )
        .select(
            "sc",
            "b",
            F.slice(
                F.col("vs"), F.col("b") * F.col("sc") + 1, F.col("sc")
            ).alias("xs"),
        )
    )
    stat = blk.withColumn(
        "m",
        F.aggregate(F.col("xs"), F.lit(0.0), lambda a, x: a + x)
        / F.size("xs"),
    )
    z = F.slice(
        F.aggregate(
            F.col("xs"),
            F.array(F.lit(0.0)),
            lambda a, x: F.concat(
                a, F.array(F.element_at(a, -1) + (x - F.col("m")))
            ),
        ),
        2,
        F.size("xs"),
    )
    rs = stat.withColumn("z", z).select(
        "sc",
        "b",
        (F.array_max("z") - F.array_min("z")).alias("r"),
        F.sqrt(
            F.aggregate(
                F.transform(
                    F.col("xs"),
                    lambda x: (x - F.col("m")) * (x - F.col("m")),
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            / F.size("xs")
        ).alias("s"),
    )
    agg = (
        rs.groupBy("sc")
        .agg(
            F.count(F.when(F.col("s") > 0, 1)).alias("n_blocks"),
            (
                F.sum(
                    F.when(
                        F.col("s") > 0,
                        F.round(F.col("r") / F.col("s"), 12).cast(
                            "decimal(28,12)"
                        ),
                    )
                ).cast("double")
                / F.count(F.when(F.col("s") > 0, 1))
            ).alias("avg_rs"),
        )
        .where(F.col("n_blocks") > 0)
    )
    pts = agg.agg(
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("sc"),
                        F.log(F.col("sc").cast("double")).alias("x"),
                        F.log(F.col("avg_rs")).alias("y"),
                    )
                )
            ),
            lambda s: F.struct(s["x"].alias("x"), s["y"].alias("y")),
        ).alias("ps"),
        F.count(F.lit(1)).cast("double").alias("k"),
    )

    def fold(expr):
        return F.aggregate(F.col("ps"), F.lit(0.0), expr)

    sx = fold(lambda a, p: a + p["x"])
    sy = fold(lambda a, p: a + p["y"])
    sxy = fold(lambda a, p: a + (p["x"] * p["y"]))
    sxx = fold(lambda a, p: a + (p["x"] * p["x"]))
    k = F.col("k")
    reg = pts.select(
        F.when(
            k >= 2,
            ((k * sxy) - (sx * sy)) / ((k * sxx) - (sx * sx)),
        ).alias("h")
    )
    return agg.crossJoin(F.broadcast(reg)).select(
        F.col("sc").cast("int").alias("scale"),
        F.col("n_blocks").cast("bigint").alias("n_blocks"),
        F.round(F.col("avg_rs"), 6).cast("double").alias("avg_rs"),
        (F.round(F.col("h"), 6).cast("double") + F.lit(0.0)).alias("hurst"),
    )


# --------------------------- SAX symbolic aggregate approximation
SAX_FRAME = 7  #: PAA frame length (days)
#: gaussian breakpoints for a 4-symbol alphabet (Lin et al. 2003)
SAX_B1, SAX_B2, SAX_B3 = -0.6745, 0.0, 0.6745


@register(
    "sax_words_daily",
    oracle=f"""
    WITH d AS (
        SELECT event_type, date_trunc('day', ts) AS day,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
                   AS v
        FROM events GROUP BY 1, 2),
    series AS (
        SELECT event_type,
               [x.v for x in list({{'day': day, 'v': v}} ORDER BY day)]
                   AS vs
        FROM d GROUP BY event_type),
    st AS (
        SELECT event_type, vs, len(vs) AS n,
               list_reduce([0.0] || vs, (a, x) -> a + x) / len(vs) AS m
        FROM series WHERE len(vs) >= {SAX_FRAME}),
    sd AS (
        SELECT event_type, vs, n, m,
               sqrt(list_reduce(
                        [0.0] || [(x - m) * (x - m) for x in vs],
                        (a, x) -> a + x) / n) AS s
        FROM st),
    paa AS (
        SELECT event_type, n, n // {SAX_FRAME} AS nseg,
               [list_reduce(
                    [0.0] || [(x - m) / s
                              for x in vs[g * {SAX_FRAME} + 1 :
                                          g * {SAX_FRAME} + {SAX_FRAME}]],
                    (a, x) -> a + x) / {SAX_FRAME}
                for g in generate_series(0, n // {SAX_FRAME} - 1)] AS segs
        FROM sd WHERE s > 0)
    SELECT event_type,
           CAST(n AS BIGINT) AS n_days,
           CAST(nseg AS BIGINT) AS n_segments,
           array_to_string(
               [CASE WHEN q < {SAX_B1} THEN 'a'
                     WHEN q < {SAX_B2} THEN 'b'
                     WHEN q < {SAX_B3} THEN 'c'
                     ELSE 'd' END for q in segs], '') AS sax_word
    FROM paa
    """,
    doc="SAX (Symbolic Aggregate approXimation, Lin, Keogh, Lonardi "
    "& Chiu, DMKD 2003) of each event type's daily revenue series: "
    "z-normalize against the series' own mean/sigma, average over "
    f"{SAX_FRAME}-day PAA frames, and map each frame to a 4-symbol "
    "alphabet at the equiprobable gaussian breakpoints (-0.6745, 0, "
    "0.6745) — the discretization that lets time series reuse the "
    "TEXT machinery (shingle dedup, winnowing, suffix audits) for "
    "motif mining; the symbolic companion to matrix_profile_daily. "
    "Determinism: daily values DECIMAL-exact; mean/sigma/PAA are "
    "fixed-order left folds over day-sorted arrays; symbol "
    "assignment compares identical doubles against literals. Scale: "
    "map-side daily rollup; per-type state is one bounded array.",
)
def sax_words_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    d = ev.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts").cast("timestamp")).alias("day"),
    ).agg(
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("v")
    )
    series = d.groupBy("event_type").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "v"))),
            lambda x: x["v"],
        ).alias("vs")
    )
    n = F.size("vs")
    st = series.where(n >= SAX_FRAME).withColumn(
        "m",
        F.aggregate(F.col("vs"), F.lit(0.0), lambda a, x: a + x)
        / F.size("vs"),
    )
    sd = st.withColumn(
        "s",
        F.sqrt(
            F.aggregate(
                F.transform(
                    F.col("vs"),
                    lambda x: (x - F.col("m")) * (x - F.col("m")),
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            / F.size("vs")
        ),
    ).where(F.col("s") > 0)
    seg_mean = lambda g: (
        F.aggregate(
            F.transform(
                F.slice(
                    F.col("vs"), g * SAX_FRAME + 1, F.lit(SAX_FRAME)
                ),
                lambda x: (x - F.col("m")) / F.col("s"),
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        / SAX_FRAME
    )
    paa = sd.select(
        "event_type",
        F.size("vs").alias("n"),
        (F.size("vs") / SAX_FRAME).cast("int").alias("nseg"),
        F.transform(
            F.sequence(
                F.lit(0), (F.size("vs") / SAX_FRAME).cast("int") - 1
            ),
            seg_mean,
        ).alias("segs"),
    )
    sym = lambda q: (
        F.when(q < SAX_B1, "a")
        .when(q < SAX_B2, "b")
        .when(q < SAX_B3, "c")
        .otherwise("d")
    )
    return paa.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        F.col("nseg").cast("bigint").alias("n_segments"),
        F.array_join(F.transform(F.col("segs"), sym), "").alias("sax_word"),
    )
