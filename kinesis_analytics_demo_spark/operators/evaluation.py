"""Model-evaluation and audit analytics: ROC-AUC, decile lift/gains,
Kaplan-Meier survival, and a Benford first-digit forensic audit.

These are the readout queries a training/curation pipeline runs AFTER
a model or heuristic produces scores: does the score rank positives
above negatives (AUC), how concentrated is the response in the top
deciles (gains/lift), how long until users convert (survival), and do
the raw values look organic or fabricated (Benford).

Determinism discipline (repo-wide): scores are quantized to integer
units through exact DECIMAL sums, every rank statistic is then pure
integer arithmetic, and the only floating-point steps are final
single-division displays (or, for Kaplan-Meier, a fixed-order product
fold — the Holt/list_reduce pattern). No ln/exp anywhere.

Reference anchor: no evaluation surface exists in the reference
(flink/tumbling_window.py, sliding_window.py); this extends the
driver-mandated LLM-data-pipeline battery.

Scale notes (100 TB): every query here first collapses events to ONE
row per user (map-side-combinable aggregate); the rank/cumsum windows
then run over per-user or per-distinct-score rows. AUC and the gains
table quantize scores to integer units precisely so the global
ordered window sees a BOUNDED number of distinct keys — at larger
scale, widen the quantization grid and these plans are unchanged.
Kaplan-Meier folds over distinct DAYS (bounded by the time range),
Benford over 9 digit rows.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.plans.registry import register
from kinesis_analytics_demo_spark.session import read_table as _t

#: per-user activity score = whole-unit-quantized sum of non-purchase
#: event values; the binary label is "heavy buyer" = purchase count
#: STRICTLY above the global median purchase count — self-calibrating,
#: so both classes are non-empty at every scale factor (a fixed
#: "has a purchase" label is degenerate on this corpus: every user
#: buys). Purchase value never enters the score (no leakage).
_SCORE_SQL = """
    SELECT user_id,
           COALESCE(SUM(CASE WHEN event_type != 'purchase'
                    THEN CAST(value AS DECIMAL(18,6)) END),
                    0) AS sv,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS np
    FROM events GROUP BY user_id
"""
_LABELED_SQL = f"""
    WITH cnts AS ({_SCORE_SQL}),
    med AS (SELECT median(np) AS m FROM cnts)
    SELECT user_id,
           CAST(ROUND(sv, 0) AS BIGINT) AS score,
           CASE WHEN np > m THEN 1 ELSE 0 END AS pos
    FROM cnts, med
"""


def _user_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_analytics_demo_spark.caching import tracked_persist

    ev = _t(spark, sf_dir, "events")
    cnts = ev.groupBy("user_id").agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") != "purchase",
                    F.col("value").cast("decimal(18,6)"),
                )
            ),
            F.lit(0).cast("decimal(18,6)"),
        ).alias("sv"),
        F.count(
            F.when(F.col("event_type") == "purchase", 1)
        ).alias("np"),
    )
    # The median broadcast and the returned frame are two consumers of
    # the per-user rollup, and downstream callers add their own 1-row
    # broadcasts (n for the rank windows) — every F.broadcast collect
    # re-runs the full events scan + aggregate without this persist
    # (calibration_bins' before-plan: 4 events scans). The cached frame
    # is one narrow row per user.
    cnts = tracked_persist(cnts)
    med = cnts.agg(F.percentile("np", 0.5).alias("m"))
    return cnts.crossJoin(F.broadcast(med)).select(
        "user_id",
        F.round("sv", 0).cast("long").alias("score"),
        F.when(F.col("np") > F.col("m"), 1).otherwise(0).alias("pos"),
    )


@register(
    "roc_auc_purchase_propensity",
    oracle=f"""
    WITH u AS ({_LABELED_SQL}),
    g AS (
        SELECT score,
               CAST(SUM(pos) AS BIGINT) AS np,
               CAST(SUM(1 - pos) AS BIGINT) AS nn
        FROM u GROUP BY score),
    c AS (
        SELECT np, nn,
               COALESCE(SUM(nn) OVER (ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS nn_below
        FROM g)
    SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
           CAST(SUM(nn) AS BIGINT) AS n_neg,
           CAST(ROUND(CAST(SUM(np * (2 * nn_below + nn)) AS DOUBLE)
                / (2.0 * SUM(np) * SUM(nn)), 6) AS DOUBLE) AS auc
    FROM c
    """,
    doc="ROC-AUC of the activity score (non-purchase value sum per "
    "user, whole-unit quantized) as a purchase-propensity predictor, "
    "via the tie-aware Mann-Whitney identity: AUC = P(score_pos > "
    "score_neg) + P(equal)/2 = sum over distinct scores of "
    "np*(2*nn_below + nn) / (2*Npos*Nneg). The numerator is PURE "
    "INTEGER (ties contribute the exact half through the factor-2 "
    "scaling — no fractional ranks), so the only float op is the "
    "final division. The ordered cumsum window runs over DISTINCT "
    "quantized scores (bounded — widen the grid at larger scale), "
    "never over raw rows; the per-user rollup map-side-combines.",
)
def roc_auc_purchase_propensity(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = _user_scores(spark, sf_dir)
    g = u.groupBy("score").agg(
        F.sum("pos").cast("long").alias("np"),
        F.sum(F.lit(1) - F.col("pos")).cast("long").alias("nn"),
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    c = g.select(
        "np",
        "nn",
        F.coalesce(F.sum("nn").over(w), F.lit(0)).alias("nn_below"),
    )
    return c.agg(
        F.sum("np").cast("long").alias("n_pos"),
        F.sum("nn").cast("long").alias("n_neg"),
        F.round(
            F.sum(
                F.col("np") * (F.lit(2) * F.col("nn_below") + F.col("nn"))
            ).cast("double")
            / (F.lit(2.0) * F.sum("np") * F.sum("nn")),
            6,
        )
        .cast("double")
        .alias("auc"),
    )


GAINS_TILES = 10  #: decile analysis


@register(
    "lift_gains_deciles",
    oracle=f"""
    WITH u AS ({_LABELED_SQL}),
    t AS (
        SELECT pos,
               ntile({GAINS_TILES}) OVER (ORDER BY score DESC, user_id)
                   AS decile
        FROM u),
    d AS (
        SELECT decile,
               CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(pos) AS BIGINT) AS n_conv
        FROM t GROUP BY decile)
    SELECT decile,
           n_users,
           n_conv,
           CAST(ROUND(CAST(n_conv AS DOUBLE) / n_users, 6) AS DOUBLE)
               AS conv_rate,
           CAST(ROUND(CAST(SUM(n_conv) OVER (ORDER BY decile) AS DOUBLE)
                / SUM(n_conv) OVER (), 6) AS DOUBLE) AS cum_capture,
           CAST(ROUND((CAST(n_conv AS DOUBLE) / n_users)
                / (CAST(SUM(n_conv) OVER () AS DOUBLE)
                   / SUM(n_users) OVER ()), 6) AS DOUBLE) AS lift
    FROM d
    """,
    doc="Decile gains/lift table: users ranked by activity score "
    "(DESC, user_id tiebreak for a total order — ntile's "
    "remainder-to-first-buckets split is then identical on both "
    "engines, verified), split into 10 tiles; per decile the "
    "conversion rate, cumulative share of all conversions captured "
    "(the gains curve), and lift over the base rate. The campaign "
    "targeting readout: decile 1's lift is what a score is FOR. "
    "Counts are integers; the three ratios are final-step double "
    "divisions. The global ntile window is the documented "
    "quantize-then-rank scale path shared with the AUC query; the "
    "decile rollup and the cumulative windows run over 10 rows.",
)
def lift_gains_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = _user_scores(spark, sf_dir)
    t = u.select(
        "pos",
        F.ntile(GAINS_TILES)
        .over(Window.orderBy(F.desc("score"), "user_id"))
        .alias("decile"),
    )
    d = t.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("pos").cast("long").alias("n_conv"),
    )
    wcum = Window.orderBy("decile")
    wall = Window.partitionBy()
    return d.select(
        "decile",
        "n_users",
        "n_conv",
        F.round(F.col("n_conv").cast("double") / F.col("n_users"), 6)
        .cast("double")
        .alias("conv_rate"),
        F.round(
            F.sum("n_conv").over(wcum).cast("double")
            / F.sum("n_conv").over(wall),
            6,
        )
        .cast("double")
        .alias("cum_capture"),
        F.round(
            (F.col("n_conv").cast("double") / F.col("n_users"))
            / (
                F.sum("n_conv").over(wall).cast("double")
                / F.sum("n_users").over(wall)
            ),
            6,
        )
        .cast("double")
        .alias("lift"),
    )


KM_VAL_MIN = 150  #: big-ticket purchase threshold (mixed censoring
#: at every SF: per-user max purchase value has median ~145)


@register(
    "survival_km_conversion",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               date_diff('second', MIN(ts),
                   COALESCE(MIN(CASE WHEN event_type = 'purchase'
                                      AND value >= {KM_VAL_MIN}
                                     THEN ts END), MAX(ts))) // 86400
                   AS t_day,
               MAX(CASE WHEN event_type = 'purchase'
                         AND value >= {KM_VAL_MIN}
                        THEN 1 ELSE 0 END) AS ev
        FROM events GROUP BY user_id),
    days AS (
        SELECT t_day,
               CAST(SUM(ev) AS BIGINT) AS d,
               CAST(SUM(1 - ev) AS BIGINT) AS c
        FROM per_user GROUP BY t_day),
    risk AS (
        SELECT t_day, d, c,
               CAST(SUM(d + c) OVER (ORDER BY t_day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - (d + c) AS BIGINT) AS seen_before,
               CAST(SUM(d + c) OVER () AS BIGINT) AS n_total
        FROM days),
    steps AS (
        SELECT list({{'t': t_day, 'd': d, 'n': n_total - seen_before}}
                    ORDER BY t_day) AS arr
        FROM risk WHERE d > 0),
    idx AS (
        SELECT arr, UNNEST(generate_series(1, len(arr))) AS k FROM steps)
    SELECT arr[k].t AS t_day,
           arr[k].n AS n_risk,
           arr[k].d AS n_events,
           CAST(ROUND(list_reduce(
               [CAST(1 AS DOUBLE)] ||
               [1 - CAST(arr[i].d AS DOUBLE) / arr[i].n
                for i in generate_series(1, k)],
               (acc, x) -> acc * x), 6) AS DOUBLE) AS survival
    FROM idx
    """,
    doc="Kaplan-Meier survival curve for time-to-first-BIG-TICKET-purchase (value >= 150) in "
    "whole days from each user's first event; users who never make "
    "one are right-censored at their last observed event (the 150 "
    "threshold sits near the median per-user max purchase, so every "
    "SF has BOTH events and censorings). Classic "
    "product-limit estimator S(t_k) = prod_{i<=k} (1 - d_i/n_i) over "
    "the distinct DAYS with at least one conversion, with n_i = "
    "users at risk entering day i. The product is a fixed-order "
    "left-to-right double fold (Spark aggregate() over a sorted "
    "struct array vs DuckDB list_reduce over a SCALAR double state — "
    "the struct-state list_reduce miscompiles in DuckDB 1.0, see "
    "holt_forecast_event_types) — bit-identical, ln/exp-free. "
    "Day-level d/c counts and at-risk cumsums are pure integers. "
    "Scale: one per-user rollup (map-side combine), then everything "
    "runs over distinct days — bounded by the corpus time range; "
    "the single collect_list row holds O(days) structs.",
)
def survival_km_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    ts_l = F.col("ts").cast("timestamp").cast("long")
    conv = (F.col("event_type") == "purchase") & (
        F.col("value") >= KM_VAL_MIN
    )
    per_user = ev.groupBy("user_id").agg(
        F.floor(
            (
                F.coalesce(F.min(F.when(conv, ts_l)), F.max(ts_l))
                - F.min(ts_l)
            )
            / F.lit(86400)
        )
        .cast("long")
        .alias("t_day"),
        F.max(F.when(conv, 1).otherwise(0)).alias("ev"),
    )
    days = per_user.groupBy("t_day").agg(
        F.sum("ev").cast("long").alias("d"),
        F.sum(F.lit(1) - F.col("ev")).cast("long").alias("c"),
    )
    wcum = Window.orderBy("t_day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wall = Window.partitionBy()
    risk = days.select(
        "t_day",
        "d",
        (
            F.sum(F.col("d") + F.col("c")).over(wall)
            - (
                F.sum(F.col("d") + F.col("c")).over(wcum)
                - (F.col("d") + F.col("c"))
            )
        )
        .cast("long")
        .alias("n"),
    ).filter(F.col("d") > 0)
    steps = risk.agg(
        F.sort_array(F.collect_list(F.struct("t_day", "d", "n"))).alias(
            "arr"
        )
    )
    idx = steps.select(
        "arr",
        F.explode(F.sequence(F.lit(1), F.size("arr"))).alias("k"),
    )
    e_k = F.element_at(F.col("arr"), F.col("k"))
    surv = F.aggregate(
        F.slice(F.col("arr"), 1, F.col("k")),
        F.lit(1.0),
        lambda acc, e: acc
        * (F.lit(1.0) - e["d"].cast("double") / e["n"]),
    )
    return idx.select(
        e_k["t_day"].alias("t_day"),
        e_k["n"].alias("n_risk"),
        e_k["d"].alias("n_events"),
        F.round(surv, 6).cast("double").alias("survival"),
    )


#: Benford expected first-digit shares log10(1 + 1/d), precomputed in
#: Python and embedded as IDENTICAL double literals in both engines —
#: no cross-engine log10() call anywhere.
BENFORD_EXP: dict[int, float] = {
    d: math.log10(1.0 + 1.0 / d) for d in range(1, 10)
}
_BENFORD_CASE = (
    "CASE digit "
    + " ".join(f"WHEN {d} THEN {p!r}" for d, p in BENFORD_EXP.items())
    + " END"
)


@register(
    "benford_first_digit_values",
    oracle=f"""
    WITH v AS (
        SELECT CAST(SUBSTR(CAST(CAST(FLOOR(value) AS BIGINT) AS VARCHAR),
                           1, 1) AS INT) AS digit
        FROM events WHERE value >= 1),
    d AS (
        SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs
        FROM v GROUP BY digit)
    SELECT digit, n_obs,
           CAST(ROUND(CAST(n_obs AS DOUBLE)
                / SUM(n_obs) OVER (), 6) AS DOUBLE) AS obs_share,
           CAST({_BENFORD_CASE} AS DOUBLE) AS exp_share,
           CAST(ROUND(CAST(n_obs AS DOUBLE) / SUM(n_obs) OVER ()
                - {_BENFORD_CASE}, 6) + 0.0 AS DOUBLE) AS excess
    FROM d
    """,
    doc="Benford's-law first-digit audit over event values >= 1 — the "
    "fabricated-data forensic: organic multiplicative quantities "
    "follow P(d) = log10(1 + 1/d), uniform-made-up numbers don't. "
    "First digit is extracted by INTEGER string conversion "
    "(floor -> BIGINT -> first char): double->string formatting "
    "differs between engines but integer rendering is identical, and "
    "FLOOR sidesteps DuckDB's round-on-cast vs Spark's "
    "truncate-on-cast. Expected shares are Python-precomputed double "
    "literals shared by both engines (no runtime log10); excess "
    "carries the +0.0 negative-zero normalizer. One scan, a 9-row "
    "aggregate, 9-row windows.",
)
def benford_first_digit_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    v = ev.filter(F.col("value") >= 1).select(
        F.substring(
            F.floor(F.col("value")).cast("long").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    d = v.groupBy("digit").agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    wall = Window.partitionBy()
    exp_share = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in BENFORD_EXP.items() for x in kv]
        ),
        F.col("digit"),
    )
    obs_raw = F.col("n_obs").cast("double") / F.sum("n_obs").over(wall)
    return d.select(
        "digit",
        "n_obs",
        F.round(obs_raw, 6).cast("double").alias("obs_share"),
        exp_share.cast("double").alias("exp_share"),
        (F.round(obs_raw - exp_share, 6) + F.lit(0.0))
        .cast("double")
        .alias("excess"),
    )


# ---------------------------------------- calibration bins + Brier
CAL_BINS = 10  #: reliability-diagram bins


@register(
    "calibration_bins_propensity",
    oracle=f"""
    WITH u AS ({_LABELED_SQL}),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM u),
    rk AS (
        SELECT pos,
               row_number() OVER (ORDER BY score, user_id) AS r
        FROM u),
    b AS (
        SELECT ((r - 1) * {CAL_BINS}) // (SELECT n FROM nn) + 1 AS bin,
               pos, r,
               2 * r - 1 - 2 * (SELECT n FROM nn) * pos AS dev
        FROM rk)
    SELECT CAST(bin AS INT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(pos) AS BIGINT) AS n_pos,
           CAST(ROUND(CAST(SUM(2 * r - 1) AS DOUBLE)
                / (2.0 * (SELECT n FROM nn) * COUNT(*)), 6) AS DOUBLE)
               AS mean_pred,
           CAST(ROUND(CAST(SUM(pos) AS DOUBLE) / COUNT(*), 6) AS DOUBLE)
               AS pos_rate,
           CAST(ROUND(CAST(SUM(CAST(dev AS DECIMAL(19,0))
                                * CAST(dev AS DECIMAL(19,0))) AS DOUBLE)
                / (4.0 * (SELECT n FROM nn) * (SELECT n FROM nn)
                   * COUNT(*)), 6) AS DOUBLE) AS brier
    FROM b GROUP BY bin
    """,
    doc="Reliability diagram + per-bin Brier score for the rank-"
    "calibrated purchase propensity: predicted probability = mid-rank "
    "percentile (2r-1)/(2n) over the (score, user_id)-totally-ordered "
    "users, binned into 10 equal-population bins; each bin reports "
    "mean predicted probability vs empirical positive rate (their "
    "gap IS the calibration error) and the bin's Brier contribution. "
    "Complements roc_auc_purchase_propensity: AUC measures ranking, "
    "this measures probability calibration. Integer-exact core: the "
    "squared deviation (2r-1-2n*pos)^2 sums in DECIMAL(38,0) (never "
    "a float accumulation) and every displayed value is one final "
    "division chain in identical operand order on both engines; bins "
    "come from pure integer division, not ntile, so the remainder "
    "policy is explicit. Scale: one row per user after the rollup; "
    "the global ordered window is the same bounded-key caveat as AUC "
    "(quantize the score grid to widen).",
)
def calibration_bins_propensity(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = _user_scores(spark, sf_dir)
    nn = u.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    rk = u.crossJoin(F.broadcast(nn)).select(
        "pos",
        "n",
        F.row_number()
        .over(Window.orderBy("score", "user_id"))
        .cast("bigint")
        .alias("r"),
    )
    b = rk.select(
        "pos",
        "r",
        "n",
        F.expr(f"CAST(((r - 1) * {CAL_BINS}) div n AS INT) + 1").alias(
            "bin"
        ),
        (
            2 * F.col("r") - 1 - 2 * F.col("n") * F.col("pos")
        ).alias("dev"),
    )
    dev_d = F.col("dev").cast("decimal(19,0)")
    return b.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("pos").cast("bigint").alias("n_pos"),
        F.round(
            F.sum(2 * F.col("r") - 1).cast("double")
            / (F.lit(2.0) * F.max("n") * F.count(F.lit(1))),
            6,
        )
        .cast("double")
        .alias("mean_pred"),
        F.round(
            F.sum("pos").cast("double") / F.count(F.lit(1)), 6
        )
        .cast("double")
        .alias("pos_rate"),
        F.round(
            F.sum(dev_d * dev_d).cast("double")
            / (
                F.lit(4.0)
                * F.max("n")
                * F.max("n")
                * F.count(F.lit(1))
            ),
            6,
        )
        .cast("double")
        .alias("brier"),
    )


# ------------------------------------ WOE / information-value screening
IV_TILES = 5  #: quintile bins for the numeric features
IV_SMOOTH = 0.5  #: Laplace half-count per cell (zero-cell guard)


@register(
    "woe_iv_feature_screening",
    oracle=f"""
    WITH cnts AS (
        SELECT user_id,
               COALESCE(SUM(CASE WHEN event_type != 'purchase'
                        THEN CAST(value AS DECIMAL(18,6)) END),
                        0) AS sv,
               COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS np,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
        FROM events GROUP BY user_id),
    med AS (SELECT median(np) AS m FROM cnts),
    u AS (
        SELECT user_id,
               CASE WHEN np > m THEN 1 ELSE 0 END AS pos,
               ntile({IV_TILES}) OVER (ORDER BY CAST(ROUND(sv, 0) AS BIGINT),
                                       user_id) AS activity_bin,
               ntile({IV_TILES}) OVER (ORDER BY n_events, user_id)
                   AS volume_bin,
               n_types AS breadth_bin
        FROM cnts, med),
    long AS (
        SELECT pos, f.feature, f.bin
        FROM u, LATERAL (SELECT unnest([
            {{'feature': 'activity_quintile',
              'bin': CAST(activity_bin AS BIGINT)}},
            {{'feature': 'volume_quintile',
              'bin': CAST(volume_bin AS BIGINT)}},
            {{'feature': 'type_breadth', 'bin': breadth_bin}}],
            recursive := true)) f),
    c AS (
        SELECT feature, bin,
               CAST(SUM(pos) AS BIGINT) AS n_pos,
               CAST(SUM(1 - pos) AS BIGINT) AS n_neg
        FROM long GROUP BY feature, bin),
    t AS (
        SELECT feature,
               SUM(n_pos) AS tp, SUM(n_neg) AS tn,
               CAST(COUNT(*) AS BIGINT) AS nb
        FROM c GROUP BY feature),
    w AS (
        SELECT c.feature, c.bin, c.n_pos, c.n_neg,
               (c.n_pos + {IV_SMOOTH})
                   / (t.tp + {IV_SMOOTH} * t.nb) AS dp,
               (c.n_neg + {IV_SMOOTH})
                   / (t.tn + {IV_SMOOTH} * t.nb) AS dn
        FROM c JOIN t ON c.feature = t.feature),
    iv AS (
        SELECT feature,
               list_reduce(
                   [0.0] || [x.c for x in
                             list({{'bin': bin,
                                    'c': (dp - dn) * ln(dp / dn)}}
                                  ORDER BY bin)],
                   (a, b) -> a + b) AS iv_raw
        FROM w GROUP BY feature)
    SELECT w.feature, CAST(w.bin AS BIGINT) AS bin, w.n_pos, w.n_neg,
           ROUND(ln(w.dp / w.dn), 6) + 0.0 AS woe,
           ROUND(iv.iv_raw, 6) + 0.0 AS iv
    FROM w JOIN iv ON w.feature = iv.feature
    """,
    doc="Weight-of-evidence / information-value screening of three "
    "user-level features against the heavy-buyer label (purchase "
    "count above the global median — the roc_auc label, shared "
    "definition): activity-score quintile, event-volume quintile, "
    "and event-type breadth. Per (feature, bin): WOE = "
    "ln(P(bin|pos)/P(bin|neg)) with a Laplace half-count per cell "
    "(the standard zero-cell guard), and per feature IV = "
    "sum (dp - dn) * WOE — the credit-scoring feature-screening "
    "statistic (Siddiqi 2006): IV < 0.02 useless, > 0.3 strong. "
    "Determinism: bin counts are exact integers (ntile under a "
    "total order with the user_id tiebreak — the lift_gains "
    "lesson), distributions are fixed IEEE divisions of "
    "half-smoothed integers, each WOE is one ln, and the IV sum is "
    "a FIXED-ORDER fold over bin-ordered terms (ACF discipline), "
    "all released under ROUND(.,6) with -0.0 normalizers. Scale: "
    "one map-side-combinable rollup to user grain, two bounded "
    "ntile windows over users (quantize to a score grid and group "
    "first beyond that, the roc_auc note), and the WOE/IV algebra "
    "runs on <= 15 bin rows.",
)
def woe_iv_feature_screening(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # NOT persisted (r11 measured revert): caching this user-grain
    # rollup for the median broadcast + main path re-run measured
    # +10..+30% across 3 same-window alternations — the two global
    # ntile sorts dominate and the cache barrier serializes them
    # behind the rollup, while the duplicate aggregation is parallel
    # slack at local[32]. At production scale the rollup is a stored
    # feature table (persisted upstream), not an in-query cache.
    cnts = ev.groupBy("user_id").agg(
        F.coalesce(
            F.sum(
                F.when(
                    F.col("event_type") != "purchase",
                    F.col("value").cast("decimal(18,6)"),
                )
            ),
            F.lit(0).cast("decimal(18,6)"),
        ).alias("sv"),
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("np"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.countDistinct("event_type").cast("bigint").alias("n_types"),
    )
    med = cnts.agg(F.percentile("np", 0.5).alias("m"))
    u = cnts.crossJoin(F.broadcast(med)).select(
        F.when(F.col("np") > F.col("m"), 1).otherwise(0).alias("pos"),
        F.ntile(IV_TILES)
        .over(Window.orderBy(F.round("sv", 0).cast("long"), F.col("user_id")))
        .cast("bigint")
        .alias("activity_bin"),
        F.ntile(IV_TILES)
        .over(Window.orderBy("n_events", "user_id"))
        .cast("bigint")
        .alias("volume_bin"),
        F.col("n_types").alias("breadth_bin"),
    )
    long = u.select(
        "pos",
        F.explode(
            F.array(
                F.struct(
                    F.lit("activity_quintile").alias("feature"),
                    F.col("activity_bin").alias("bin"),
                ),
                F.struct(
                    F.lit("volume_quintile").alias("feature"),
                    F.col("volume_bin").alias("bin"),
                ),
                F.struct(
                    F.lit("type_breadth").alias("feature"),
                    F.col("breadth_bin").alias("bin"),
                ),
            )
        ).alias("f"),
    ).select("pos", "f.feature", "f.bin")
    c = long.groupBy("feature", "bin").agg(
        F.sum("pos").cast("bigint").alias("n_pos"),
        F.sum(F.lit(1) - F.col("pos")).cast("bigint").alias("n_neg"),
    )
    t = c.groupBy("feature").agg(
        F.sum("n_pos").alias("tp"),
        F.sum("n_neg").alias("tn"),
        F.count(F.lit(1)).cast("bigint").alias("nb"),
    )
    w = c.join(F.broadcast(t), "feature").select(
        "feature",
        "bin",
        "n_pos",
        "n_neg",
        (
            (F.col("n_pos") + IV_SMOOTH)
            / (F.col("tp") + IV_SMOOTH * F.col("nb"))
        ).alias("dp"),
        (
            (F.col("n_neg") + IV_SMOOTH)
            / (F.col("tn") + IV_SMOOTH * F.col("nb"))
        ).alias("dn"),
    )
    iv = w.groupBy("feature").agg(
        F.aggregate(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            "bin",
                            (
                                (F.col("dp") - F.col("dn"))
                                * F.log(F.col("dp") / F.col("dn"))
                            ).alias("c"),
                        )
                    )
                ),
                lambda x: x["c"],
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("iv_raw")
    )
    return w.join(F.broadcast(iv), "feature").select(
        "feature",
        F.col("bin").cast("bigint").alias("bin"),
        "n_pos",
        "n_neg",
        (F.round(F.log(F.col("dp") / F.col("dn")), 6) + F.lit(0.0)).alias(
            "woe"
        ),
        (F.round(F.col("iv_raw"), 6) + F.lit(0.0)).alias("iv"),
    )


# ------------------------------ isotonic calibration (PAVA, exact)
@register(
    "isotonic_calibration_pava",
    oracle=f"""
    WITH u AS ({_LABELED_SQL}),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM u),
    rk AS (
        SELECT pos,
               row_number() OVER (ORDER BY score, user_id) AS r
        FROM u),
    bins AS (
        SELECT ((r - 1) * {CAL_BINS}) // (SELECT n FROM nn) + 1 AS bin,
               COUNT(*) AS nb, SUM(pos) AS pb
        FROM rk GROUP BY 1),
    pfx AS (
        SELECT bin, nb, pb,
               SUM(nb) OVER (ORDER BY bin) AS cn,
               SUM(pb) OVER (ORDER BY bin) AS cp
        FROM bins),
    pairs AS (
        SELECT j.bin AS j, unnest(generate_series(j.bin, {CAL_BINS})) AS k,
               j.cn - j.nb AS cn0, j.cp - j.pb AS cp0
        FROM pfx j),
    av AS (
        SELECT pairs.j, pairs.k,
               CAST(kk.cp - pairs.cp0 AS DOUBLE)
                   / (kk.cn - pairs.cn0) AS a
        FROM pairs JOIN pfx kk ON kk.bin = pairs.k),
    tri AS (
        SELECT unnest(generate_series(j, k)) AS i, j, a FROM av),
    mn AS (SELECT i, j, MIN(a) AS m FROM tri GROUP BY i, j),
    iso AS (SELECT i, MAX(m) AS y FROM mn GROUP BY i)
    SELECT CAST(pfx.bin AS INT) AS bin,
           CAST(pfx.nb AS BIGINT) AS n_users,
           CAST(pfx.pb AS BIGINT) AS n_pos,
           CAST(ROUND(CAST(pfx.pb AS DOUBLE) / pfx.nb, 6) AS DOUBLE)
               AS pos_rate,
           CAST(ROUND(iso.y, 6) AS DOUBLE) AS isotonic_rate
    FROM pfx JOIN iso ON iso.i = pfx.bin
    """,
    doc="Isotonic calibration of the binned purchase propensity via "
    "the pool-adjacent-violators MINIMAX identity (Robertson, Wright "
    "& Dykstra 1988): the weighted-isotonic fit at bin i equals "
    "max over j <= i of min over k >= i of the pooled rate "
    "(cp_k - cp_(j-1)) / (cn_k - cn_(j-1)) — no iteration, no state, "
    "just the O(B^3) lattice over B = 10 bins, generated by explode "
    "(never a non-equi join). The pooled rates divide EXACT integer "
    "prefix sums, so both engines compare identical doubles and the "
    "argmax lattice is bit-deterministic. Pairs with "
    "calibration_bins_propensity (same bin deal): pos_rate is the "
    "raw reliability curve, isotonic_rate its monotone projection — "
    "the production probability-calibration map. Scale: everything "
    "after the bin rollup is B^3 = 1000 rows regardless of corpus "
    "size; the rollup itself is the AUC global-rank caveat.",
)
def isotonic_calibration_pava(spark: SparkSession, sf_dir: str) -> DataFrame:
    u = _user_scores(spark, sf_dir)
    nn = u.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    rk = u.crossJoin(F.broadcast(nn)).select(
        "pos",
        "n",
        F.row_number()
        .over(Window.orderBy("score", "user_id"))
        .cast("bigint")
        .alias("r"),
    )
    bins = (
        rk.select(
            F.expr(f"CAST(((r - 1) * {CAL_BINS}) div n AS INT) + 1").alias(
                "bin"
            ),
            "pos",
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("nb"), F.sum("pos").alias("pb"))
    )
    wo = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    # Persist the CAL_BINS-row prefix table: three consumers (the
    # pair grid, the k-side lookup, the final readout join) otherwise
    # each re-run the whole ranked-binning lineage — including its
    # global row_number sort over all users.
    from kinesis_analytics_demo_spark.caching import tracked_persist

    pfx = tracked_persist(
        bins.select(
            "bin",
            "nb",
            "pb",
            F.sum("nb").over(wo).alias("cn"),
            F.sum("pb").over(wo).alias("cp"),
        ).repartition(1)
    )
    pairs = pfx.select(
        F.col("bin").alias("j"),
        F.explode(F.sequence("bin", F.lit(CAL_BINS))).alias("k"),
        (F.col("cn") - F.col("nb")).alias("cn0"),
        (F.col("cp") - F.col("pb")).alias("cp0"),
    )
    kk = pfx.select(
        F.col("bin").alias("k"),
        F.col("cn").alias("cnk"),
        F.col("cp").alias("cpk"),
    )
    av = pairs.join(F.broadcast(kk), "k").select(
        "j",
        "k",
        (
            (F.col("cpk") - F.col("cp0")).cast("double")
            / (F.col("cnk") - F.col("cn0"))
        ).alias("a"),
    )
    tri = av.select(
        F.explode(F.sequence("j", "k")).alias("i"), "j", "a"
    )
    mn = tri.groupBy("i", "j").agg(F.min("a").alias("m"))
    iso = mn.groupBy("i").agg(F.max("m").alias("y"))
    return pfx.join(
        F.broadcast(iso), pfx["bin"] == iso["i"]
    ).select(
        F.col("bin").cast("int").alias("bin"),
        F.col("nb").cast("bigint").alias("n_users"),
        F.col("pb").cast("bigint").alias("n_pos"),
        F.round(F.col("pb").cast("double") / F.col("nb"), 6)
        .cast("double")
        .alias("pos_rate"),
        F.round(F.col("y"), 6).cast("double").alias("isotonic_rate"),
    )


# --------------------------- split-conformal prediction intervals
CP_ALPHA = 0.1  #: target miscoverage (90% intervals)


@register(
    "conformal_interval_event_values",
    oracle=f"""
    WITH tr AS (
        SELECT event_type,
               COUNT(*) AS n_train,
               CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6)))
                               AS DOUBLE) / COUNT(*), 6) AS DOUBLE) AS pred
        FROM events WHERE event_id % 2 = 0
        GROUP BY event_type),
    cal AS (
        SELECT e.event_type, tr.n_train, tr.pred,
               ABS(e.value - tr.pred) AS r, e.event_id
        FROM events e JOIN tr ON tr.event_type = e.event_type
        WHERE e.event_id % 2 = 1),
    rk AS (
        SELECT event_type, n_train, pred, r,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY r, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n_cal
        FROM cal),
    q AS (
        SELECT event_type, n_train, n_cal, pred, r AS qhat
        FROM rk
        WHERE rn = LEAST(CAST(ceil((1 - {CP_ALPHA}) * (n_cal + 1))
                              AS BIGINT), n_cal))
    SELECT q.event_type,
           CAST(q.n_train AS BIGINT) AS n_train,
           CAST(q.n_cal AS BIGINT) AS n_cal,
           q.pred,
           CAST(ROUND(q.qhat, 6) AS DOUBLE) AS qhat,
           CAST(ROUND(CAST(COUNT(CASE WHEN cal.r <= q.qhat THEN 1 END)
                           AS DOUBLE) / q.n_cal, 6) AS DOUBLE)
               AS cal_coverage
    FROM q JOIN cal ON cal.event_type = q.event_type
    GROUP BY q.event_type, q.n_train, q.n_cal, q.pred, q.qhat
    """,
    doc="Split-conformal prediction intervals (Vovk et al. 2005; Lei "
    "et al. JASA 2018) for event values: the model is the per-type "
    "train-half mean (even event_ids, exact DECIMAL mean rounded "
    "once), nonconformity = |value - pred| on the held-out odd half, "
    "and qhat is the ceil((1-alpha)(n+1))-th EXACT order statistic "
    "(rank over a (r, event_id) total order — no quantile "
    "interpolation, so both engines pick the same row). The interval "
    "pred +/- qhat then covers >= 90% of exchangeable future values; "
    "cal_coverage audits it on the calibration half. Scale: one "
    "window per event_type partition; qhat selection is "
    "WindowGroupLimit-able; nothing global.",
)
def conformal_interval_event_values(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    tr = (
        ev.where(F.col("event_id") % 2 == 0)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_train"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            )
            .cast("double")
            .alias("pred"),
        )
    )
    cal = (
        ev.where(F.col("event_id") % 2 == 1)
        .join(F.broadcast(tr), "event_type")
        .select(
            "event_type",
            "n_train",
            "pred",
            F.abs(F.col("value") - F.col("pred")).alias("r"),
            "event_id",
        )
    )
    wt = Window.partitionBy("event_type")
    rk = cal.select(
        "event_type",
        "n_train",
        "pred",
        "r",
        F.row_number().over(wt.orderBy("r", "event_id")).alias("rn"),
        F.count(F.lit(1)).over(wt).alias("n_cal"),
    )
    q = rk.where(
        F.col("rn")
        == F.least(
            F.ceil(F.lit(1 - CP_ALPHA) * (F.col("n_cal") + 1)).cast(
                "bigint"
            ),
            F.col("n_cal"),
        )
    ).select("event_type", "n_train", "n_cal", "pred", F.col("r").alias("qhat"))
    return (
        cal.select("event_type", "r")
        .join(F.broadcast(q), "event_type")
        .groupBy("event_type", "n_train", "n_cal", "pred", "qhat")
        .agg(
            F.round(
                F.count(F.when(F.col("r") <= F.col("qhat"), 1)).cast(
                    "double"
                )
                / F.col("n_cal"),
                6,
            )
            .cast("double")
            .alias("cal_coverage")
        )
        .select(
            "event_type",
            F.col("n_train").cast("bigint").alias("n_train"),
            F.col("n_cal").cast("bigint").alias("n_cal"),
            "pred",
            F.round(F.col("qhat"), 6).cast("double").alias("qhat"),
            "cal_coverage",
        )
    )
