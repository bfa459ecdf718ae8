"""Distribution-comparison and dispersion statistics, round 6.

Third stats batch: a two-sample Kolmogorov-Smirnov test, the Lorenz
curve behind the existing Gini coefficient, Goh-Barabasi interevent
burstiness, and per-user event-type Shannon entropy.  All follow the
house determinism discipline: counts and sums are computed exactly
(BIGINT / DECIMAL), irrational functions (ln, sqrt) are applied to
already-exact scalars so IEEE double evaluation is order-free, and
every signed ROUND(.,6) double gets the ``+ 0.0`` negative-zero
normalizer.

Public sources: Kolmogorov (1933) / Smirnov (1948) two-sample
statistic with the Smirnov asymptotic 95% critical value c(0.05) =
1.358; Goh & Barabasi, "Burstiness and memory in complex systems",
EPL 81 (2008); Lorenz (1905) cumulative-share curve.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.plans.registry import register
from kinesis_analytics_demo_spark.session import read_table as _t

# ----------------------------------------- two-sample KS test
KS_TYPE_A = "purchase"
KS_TYPE_B = "view"
#: Smirnov asymptotic critical value for alpha = 0.05:
#: reject H0 (same distribution) iff sqrt(na*nb/(na+nb)) * D > 1.358.
KS_CRIT_95 = 1.358


@register(
    "ks_test_purchase_view",
    oracle=f"""
    WITH pool AS (
        SELECT value,
               CASE WHEN event_type = '{KS_TYPE_A}' THEN 1 ELSE 0 END AS ia,
               CASE WHEN event_type = '{KS_TYPE_B}' THEN 1 ELSE 0 END AS ib
        FROM events
        WHERE event_type IN ('{KS_TYPE_A}', '{KS_TYPE_B}')),
    g AS (
        SELECT value, SUM(ia) AS da, SUM(ib) AS db
        FROM pool GROUP BY value),
    c AS (
        SELECT SUM(da) OVER (ORDER BY value) AS ca,
               SUM(db) OVER (ORDER BY value) AS cb
        FROM g),
    tot AS (
        SELECT SUM(ia) AS na, SUM(ib) AS nb FROM pool)
    SELECT CAST(na AS BIGINT) AS n_a,
           CAST(nb AS BIGINT) AS n_b,
           CAST(ROUND(MAX(ABS(CAST(ca AS DOUBLE) / na
                             - CAST(cb AS DOUBLE) / nb)), 6)
                AS DOUBLE) + 0.0 AS d_stat,
           CAST(ROUND(SQRT(CAST(na AS DOUBLE) * nb / (na + nb))
                      * MAX(ABS(CAST(ca AS DOUBLE) / na
                               - CAST(cb AS DOUBLE) / nb)), 6)
                AS DOUBLE) + 0.0 AS ks_scaled,
           SQRT(CAST(na AS DOUBLE) * nb / (na + nb))
               * MAX(ABS(CAST(ca AS DOUBLE) / na
                        - CAST(cb AS DOUBLE) / nb))
               > {KS_CRIT_95} AS reject_95
    FROM c, tot
    GROUP BY na, nb
    """,
    doc=f"Two-sample Kolmogorov-Smirnov test between the `value` "
    f"distributions of '{KS_TYPE_A}' and '{KS_TYPE_B}' events. "
    "D = max over pooled distinct values of |ECDF_a - ECDF_b|, "
    "computed from exact cumulative counts (one window over distinct "
    "values), so the doubles fed to ABS/MAX are identical on both "
    "engines; the decision column compares the Smirnov-scaled "
    "statistic to the asymptotic 95% critical value 1.358. Scale: "
    "grouping by value collapses the pool to distinct values before "
    "the window; for a truly continuous column at 100 TB, pre-bin "
    "values to ~1e6 quantile buckets first (same single shuffle, "
    "bounded window input).",
)
def ks_test_purchase_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pool = ev.where(F.col("event_type").isin(KS_TYPE_A, KS_TYPE_B)).select(
        "value",
        F.when(F.col("event_type") == KS_TYPE_A, 1).otherwise(0).alias("ia"),
        F.when(F.col("event_type") == KS_TYPE_B, 1).otherwise(0).alias("ib"),
    )
    g = pool.groupBy("value").agg(
        F.sum("ia").alias("da"), F.sum("ib").alias("db")
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    c = g.select(
        F.sum("da").over(w).alias("ca"), F.sum("db").over(w).alias("cb")
    )
    tot = pool.agg(F.sum("ia").alias("na"), F.sum("ib").alias("nb"))
    gap = F.abs(
        F.col("ca").cast("double") / F.col("na")
        - F.col("cb").cast("double") / F.col("nb")
    )
    scale = F.sqrt(
        F.col("na").cast("double") * F.col("nb")
        / (F.col("na") + F.col("nb"))
    )
    return (
        c.crossJoin(F.broadcast(tot))
        .groupBy("na", "nb")
        .agg(F.max(gap).alias("d"))
        .select(
            F.col("na").cast("bigint").alias("n_a"),
            F.col("nb").cast("bigint").alias("n_b"),
            (F.round(F.col("d"), 6).cast("double") + F.lit(0.0)).alias(
                "d_stat"
            ),
            (
                F.round(scale * F.col("d"), 6).cast("double") + F.lit(0.0)
            ).alias("ks_scaled"),
            (scale * F.col("d") > F.lit(KS_CRIT_95)).alias("reject_95"),
        )
    )


# ----------------------------------------- Lorenz curve deciles
LORENZ_BUCKETS = 10


@register(
    "lorenz_curve_deciles",
    oracle=f"""
    WITH ux AS (
        SELECT user_id, SUM(CAST(value AS DECIMAL(18,6))) AS x
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id),
    dealt AS (
        SELECT x, ntile({LORENZ_BUCKETS}) OVER (ORDER BY x, user_id)
                   AS decile
        FROM ux),
    d AS (
        SELECT decile, COUNT(*) AS n_users, SUM(x) AS dx
        FROM dealt GROUP BY decile),
    c AS (
        SELECT decile, n_users, dx,
               SUM(dx) OVER (ORDER BY decile) AS cx,
               SUM(dx) OVER () AS tx,
               SUM(n_users) OVER (ORDER BY decile) AS cn,
               SUM(n_users) OVER () AS tn
        FROM d)
    SELECT CAST(decile AS INT) AS decile,
           CAST(n_users AS BIGINT) AS n_users,
           CAST(ROUND(dx, 2) AS DOUBLE) AS decile_value,
           CAST(ROUND(CAST(cn AS DOUBLE) / tn, 6) AS DOUBLE)
               AS cum_pop_share,
           CAST(ROUND(CAST(cx AS DOUBLE) / CAST(tx AS DOUBLE), 6)
                AS DOUBLE) AS cum_value_share
    FROM c ORDER BY decile
    """,
    doc="Lorenz curve (cumulative population share vs cumulative "
    "value share) over per-user purchase revenue, in "
    f"{LORENZ_BUCKETS} ntile buckets — the curve whose enclosed area "
    "is the Gini coefficient already emitted by gini_user_revenue. "
    "Per-user sums are exact DECIMAL, the ntile deal is ordered by "
    "(x, user_id) so ties break identically on both engines, and "
    "cumulative shares divide exact decimals. Scale: the global "
    "ntile is a single-partition window over USERS (not events); "
    "beyond ~10^9 users swap ntile for a two-pass histogram decile "
    "(approx percentile cuts + bucket join), same output contract.",
)
def lorenz_curve_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    ux = ev.where(F.col("event_type") == "purchase").groupBy("user_id").agg(
        F.sum(F.col("value").cast("decimal(18,6)")).alias("x")
    )
    dealt = ux.select(
        "x",
        F.ntile(LORENZ_BUCKETS)
        .over(Window.orderBy("x", "user_id"))
        .alias("decile"),
    )
    d = dealt.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_users"), F.sum("x").alias("dx")
    )
    wo = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    wa = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return d.select(
        F.col("decile").cast("int").alias("decile"),
        F.col("n_users").cast("bigint").alias("n_users"),
        F.round(F.col("dx"), 2).cast("double").alias("decile_value"),
        F.round(
            F.sum("n_users").over(wo).cast("double")
            / F.sum("n_users").over(wa),
            6,
        )
        .cast("double")
        .alias("cum_pop_share"),
        F.round(
            F.sum("dx").over(wo).cast("double")
            / F.sum("dx").over(wa).cast("double"),
            6,
        )
        .cast("double")
        .alias("cum_value_share"),
    )


# ----------------------------------------- interevent burstiness
@register(
    "burstiness_interevent",
    oracle="""
    WITH seq AS (
        SELECT event_type,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id)
                   AS gap
        FROM events),
    s AS (
        SELECT event_type,
               COUNT(gap) AS n,
               SUM(CAST(gap AS DECIMAL(38,0))) AS s1,
               SUM(CAST(gap AS DECIMAL(38,0))
                   * CAST(gap AS DECIMAL(38,0))) AS s2
        FROM seq WHERE gap IS NOT NULL
        GROUP BY event_type),
    m AS (
        SELECT event_type, n,
               CAST(s1 AS DOUBLE) / n / 1e6 AS mu,
               SQRT((CAST(s2 AS DOUBLE)
                     - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
                    / (n - 1)) / 1e6 AS sd
        FROM s WHERE n > 1)
    SELECT event_type,
           CAST(n AS BIGINT) AS n_gaps,
           CAST(ROUND(mu, 6) AS DOUBLE) + 0.0 AS mean_gap_s,
           CAST(ROUND(sd, 6) AS DOUBLE) + 0.0 AS sd_gap_s,
           CAST(ROUND(sd / mu, 6) AS DOUBLE) + 0.0 AS cv,
           CAST(ROUND((sd - mu) / (sd + mu), 6) AS DOUBLE) + 0.0
               AS burstiness
    FROM m
    """,
    doc="Goh-Barabasi burstiness B = (sigma - mu) / (sigma + mu) of "
    "the interevent gaps of each event type's global stream (B = -1 "
    "perfectly periodic, 0 Poisson, -> 1 extremely bursty), plus the "
    "coefficient of variation. Gaps are exact microsecond BIGINTs "
    "(unix_micros <-> epoch_us, the profiling.py pairing); sum and "
    "sum-of-squares are exact DECIMAL(38,0) so mu/sigma come from "
    "identical doubles on both engines regardless of partitioning. "
    "Scale: one window per event_type partition, then a hash "
    "aggregate of three sufficient statistics — no global ordering.",
)
def burstiness_interevent(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    seq = ev.select(
        "event_type",
        (
            us
            - F.lag(us).over(
                Window.partitionBy("event_type").orderBy("ts", "event_id")
            )
        ).alias("gap"),
    )
    gdec = F.col("gap").cast("decimal(38,0)")
    s = (
        seq.where(F.col("gap").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("gap").alias("n"),
            F.sum(gdec).alias("s1"),
            F.sum(gdec * gdec).alias("s2"),
        )
        .where(F.col("n") > 1)
    )
    mu = F.col("s1").cast("double") / F.col("n") / F.lit(1e6)
    sd = (
        F.sqrt(
            (
                F.col("s2").cast("double")
                - F.col("s1").cast("double")
                * F.col("s1").cast("double")
                / F.col("n")
            )
            / (F.col("n") - 1)
        )
        / F.lit(1e6)
    )
    return s.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_gaps"),
        (F.round(mu, 6).cast("double") + F.lit(0.0)).alias("mean_gap_s"),
        (F.round(sd, 6).cast("double") + F.lit(0.0)).alias("sd_gap_s"),
        (F.round(sd / mu, 6).cast("double") + F.lit(0.0)).alias("cv"),
        (F.round((sd - mu) / (sd + mu), 6).cast("double") + F.lit(0.0)).alias(
            "burstiness"
        ),
    )


# ----------------------------------------- per-user type entropy
@register(
    "user_diversity_entropy",
    oracle="""
    WITH ct AS (
        SELECT user_id, event_type, COUNT(*) AS c
        FROM events GROUP BY user_id, event_type),
    term AS (
        SELECT user_id, c,
               CAST(ROUND(c * ln(CAST(c AS DOUBLE)), 12)
                    AS DECIMAL(28,12)) AS clnc
        FROM ct),
    u AS (
        SELECT user_id,
               SUM(c) AS n,
               COUNT(*) AS n_types,
               SUM(clnc) AS sterm
        FROM term GROUP BY user_id)
    SELECT user_id,
           CAST(n AS BIGINT) AS n_events,
           CAST(n_types AS INT) AS n_types,
           CAST(ROUND(ln(CAST(n AS DOUBLE))
                      - CAST(sterm AS DOUBLE) / n, 6) AS DOUBLE) + 0.0
               AS entropy_nats
    FROM u
    """,
    doc="Per-user Shannon entropy (nats) of the event-type "
    "distribution — the behavioural-diversity feature of a training "
    "corpus curation pass (H = ln n - (1/n) * sum c*ln c). Each "
    "c*ln(c) term is rounded to 12 dp and summed as exact DECIMAL so "
    "the cross-type accumulation order cannot skew the 6-dp output "
    "(the text_token_entropy discipline). Scale: two hash aggregates "
    "keyed by (user, type) then user — no windows, no skew hazard "
    "beyond a single hot user.",
)
def user_diversity_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    ct = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    term = ct.select(
        "user_id",
        "c",
        F.round(F.col("c") * F.log(F.col("c").cast("double")), 12)
        .cast("decimal(28,12)")
        .alias("clnc"),
    )
    u = term.groupBy("user_id").agg(
        F.sum("c").alias("n"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum("clnc").alias("sterm"),
    )
    return u.select(
        "user_id",
        F.col("n").cast("bigint").alias("n_events"),
        F.col("n_types").cast("int").alias("n_types"),
        (
            F.round(
                F.log(F.col("n").cast("double"))
                - F.col("sterm").cast("double") / F.col("n"),
                6,
            ).cast("double")
            + F.lit(0.0)
        ).alias("entropy_nats"),
    )


# ------------------------------- sequential probability ratio test
#: SPRT (Wald 1945) testing the purchase share of the event stream:
#: H0 p = 0.15 vs H1 p = 0.20 at alpha = beta = 0.05. The per-event
#: log-likelihood increments and the decision boundaries are
#: precomputed in PYTHON and embedded as identical double literals in
#: both engines (the Poisson-bootstrap literal discipline), so
#: LLR_n = k*L1 + (n-k)*L0 is two exact-integer-by-literal products.
SPRT_L1 = 0.287682072451781  #: ln(p1/p0)
SPRT_L0 = -0.060624621816434736  #: ln((1-p1)/(1-p0))
SPRT_A = 2.9444389791664403  #: accept-H1 boundary ln((1-b)/a)
SPRT_B = -2.9444389791664403  #: accept-H0 boundary ln(b/(1-a))


@register(
    "sprt_purchase_rate",
    oracle=f"""
    WITH c AS (
        SELECT row_number() OVER (ORDER BY ts, event_id) AS rn,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   OVER (ORDER BY ts, event_id) AS k
        FROM events),
    l AS (
        SELECT rn, k,
               k * {SPRT_L1} + (rn - k) * {SPRT_L0} AS llr
        FROM c),
    d AS (
        SELECT MIN(CASE WHEN llr >= {SPRT_A} OR llr <= {SPRT_B}
                        THEN rn END) AS dn,
               MAX(rn) AS n FROM l)
    SELECT CASE WHEN l.llr >= {SPRT_A} THEN 'accept_h1'
                WHEN l.llr <= {SPRT_B} THEN 'accept_h0'
                ELSE 'continue' END AS outcome,
           CAST(l.rn AS BIGINT) AS n_at_decision,
           CAST(l.k AS BIGINT) AS k_at_decision,
           CAST(ROUND(l.llr, 6) AS DOUBLE) + 0.0 AS llr
    FROM l JOIN d ON l.rn = COALESCE(d.dn, d.n)
    """,
    doc="Wald's sequential probability ratio test (1945) on the "
    "purchase share of the event stream in (ts, event_id) order: "
    "H0 p=0.15 vs H1 p=0.20, alpha=beta=0.05. Because the Bernoulli "
    "LLR is k*L1 + (n-k)*L0 with Python-precomputed literals, the "
    "walk is exact given the integer cumulative counts, and the "
    "FIRST boundary crossing (or 'continue' at stream end) is a "
    "deterministic row pick. The early-stopping A/B machinery that "
    "complements the fixed-horizon Welch test. Scale: the cumulative "
    "count is a global ordered window — inherently sequential "
    "semantics; at scale run per-segment SPRTs (partition the "
    "window) or the streaming stateful twin pattern.",
)
def sprt_purchase_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_analytics_demo_spark.caching import tracked_persist

    ev = _t(spark, sf_dir, "events")
    wo = Window.orderBy(F.col("ts").cast("timestamp"), "event_id")
    c = ev.select(
        F.row_number().over(wo).alias("rn"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .over(wo.rowsBetween(Window.unboundedPreceding, 0))
        .alias("k"),
    )
    ll = tracked_persist(
        c.select(
            "rn",
            "k",
            (
                F.col("k") * F.lit(SPRT_L1)
                + (F.col("rn") - F.col("k")) * F.lit(SPRT_L0)
            ).alias("llr"),
        )
    )
    crossed = (F.col("llr") >= SPRT_A) | (F.col("llr") <= SPRT_B)
    d = ll.agg(
        F.min(F.when(crossed, F.col("rn"))).alias("dn"),
        F.max("rn").alias("n"),
    )
    return ll.join(
        F.broadcast(d),
        ll["rn"] == F.coalesce(d["dn"], d["n"]),
    ).select(
        F.when(F.col("llr") >= SPRT_A, "accept_h1")
        .when(F.col("llr") <= SPRT_B, "accept_h0")
        .otherwise("continue")
        .alias("outcome"),
        F.col("rn").cast("bigint").alias("n_at_decision"),
        F.col("k").cast("bigint").alias("k_at_decision"),
        (F.round(F.col("llr"), 6).cast("double") + F.lit(0.0)).alias("llr"),
    )


# ------------------------------------ Theil index decomposition
@register(
    "theil_index_by_type",
    oracle="""
    WITH ux AS (
        SELECT event_type, user_id,
               SUM(CAST(value AS DECIMAL(18,6))) AS x
        FROM events GROUP BY event_type, user_id),
    g AS (
        SELECT event_type,
               COUNT(*) AS ng,
               SUM(x) AS sg,
               ROUND(CAST(SUM(x) AS DOUBLE) / COUNT(*), 9) AS mug
        FROM ux GROUP BY event_type),
    tt AS (
        SELECT SUM(ng) AS n, SUM(sg) AS st,
               ROUND(CAST(SUM(sg) AS DOUBLE) / SUM(ng), 9) AS mu
        FROM g),
    term AS (
        SELECT ux.event_type,
               CAST(ROUND((CAST(ux.x AS DOUBLE) / g.mug)
                          * ln(CAST(ux.x AS DOUBLE) / g.mug), 12)
                    AS DECIMAL(28,12)) AS t
        FROM ux JOIN g ON g.event_type = ux.event_type
        WHERE CAST(ux.x AS DOUBLE) > 0),
    w AS (
        SELECT event_type, SUM(t) AS ts, COUNT(*) AS nt
        FROM term GROUP BY event_type)
    SELECT g.event_type,
           CAST(g.ng AS BIGINT) AS n_users,
           CAST(ROUND(g.mug, 6) AS DOUBLE) AS mean_value,
           CAST(ROUND(CAST(w.ts AS DOUBLE) / w.nt, 6) AS DOUBLE) + 0.0
               AS theil_within,
           CAST(ROUND((CAST(g.sg AS DOUBLE) / CAST(tt.st AS DOUBLE))
                      * ln(g.mug / tt.mu), 6) AS DOUBLE) + 0.0
               AS between_term
    FROM g JOIN w ON w.event_type = g.event_type, tt
    """,
    doc="Theil T inequality index decomposed by event type (Theil "
    "1967): within each type, T_g averages (x/mu_g) ln(x/mu_g) over "
    "the users with POSITIVE per-user value totals (zero-total users "
    "contribute no entropy term and are excluded from the divisor, so "
    "within+between reconstructs the total index only when every user "
    "total is positive), and the between-group contribution "
    "s_g ln(mu_g/mu) whose sum over types is the between component "
    "of total inequality — the decomposable complement to "
    "gini_user_revenue / lorenz_curve_deciles (Gini does not "
    "decompose additively; Theil does). Per-user sums are exact "
    "DECIMAL, group means are quantized to a 9-dp grid before ln so "
    "both engines feed identical doubles, each entropy term is "
    "rounded to 12 dp and summed in exact DECIMAL (the "
    "user_diversity_entropy discipline). Scale: two hash aggregates "
    "keyed by (type, user) then type; no windows.",
)
def theil_index_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    ux = ev.groupBy("event_type", "user_id").agg(
        F.sum(F.col("value").cast("decimal(18,6)")).alias("x")
    )
    g = ux.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum("x").alias("sg"),
        F.round(
            F.sum("x").cast("double") / F.count(F.lit(1)), 9
        ).alias("mug"),
    )
    tt = g.agg(
        F.sum("ng").alias("n"),
        F.sum("sg").alias("st"),
        F.round(F.sum("sg").cast("double") / F.sum("ng"), 9).alias("mu"),
    )
    xr = F.col("x").cast("double") / F.col("mug")
    term = (
        ux.join(F.broadcast(g), "event_type")
        .where(F.col("x").cast("double") > 0)
        .select(
            "event_type",
            F.round(xr * F.log(xr), 12).cast("decimal(28,12)").alias("t"),
        )
    )
    w = term.groupBy("event_type").agg(
        F.sum("t").alias("ts"), F.count(F.lit(1)).alias("nt")
    )
    return (
        g.join(w, "event_type")
        .crossJoin(F.broadcast(tt))
        .select(
            "event_type",
            F.col("ng").cast("bigint").alias("n_users"),
            F.round(F.col("mug"), 6).cast("double").alias("mean_value"),
            (
                F.round(F.col("ts").cast("double") / F.col("nt"), 6)
                .cast("double")
                + F.lit(0.0)
            ).alias("theil_within"),
            (
                F.round(
                    (F.col("sg").cast("double") / F.col("st").cast("double"))
                    * F.log(F.col("mug") / F.col("mu")),
                    6,
                ).cast("double")
                + F.lit(0.0)
            ).alias("between_term"),
        )
    )
