"""Complex-event-processing patterns — the MATCH_RECOGNIZE analog.

Flink SQL (the reference's engine family) ships row-pattern matching
as MATCH_RECOGNIZE; Spark has no direct equivalent, but the two
workhorse pattern classes reduce to single-pass window functions over
the per-key event-time order:

- ``cep_click_error_no_purchase``: sequence-with-veto — an error
  preceded by a click within 5 minutes with NO purchase between them
  (the "user clicked, hit an error, never recovered" incident
  pattern; MATCH_RECOGNIZE ``PATTERN (C NOT_P* E)``).
- ``cep_rising_streaks``: consecutive-condition runs — maximal
  strictly-rising value runs of length >= 3 per user
  (``PATTERN (A B+)`` with a DEFINE on the previous row).

Scale: both are one shuffle on the key followed by streaming window
evaluation within each partition — no joins, no row explosion; the
same cost shape as any per-key analytic. A streaming deployment of
the veto pattern is the stateful top-k/session family
(applyInPandasWithState keeping the last click/purchase per key).

Determinism: pattern decisions compare exact timestamps/values;
tiebreaks on event_id everywhere a sort order matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.plans.registry import register
from kinesis_analytics_demo_spark.session import read_table as _t

CLICK_WINDOW_S = 300


@register(
    "cep_click_error_no_purchase",
    oracle=f"""
    WITH o AS (
        SELECT user_id, ts, event_id, event_type,
               MAX(CASE WHEN event_type = 'click' THEN ts END)
                   OVER w AS last_click_ts,
               MAX(CASE WHEN event_type = 'purchase' THEN ts END)
                   OVER w AS last_purchase_ts
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id AS error_id, user_id, ts AS error_ts,
           last_click_ts
    FROM o
    WHERE event_type = 'error'
      AND last_click_ts IS NOT NULL
      AND ts - last_click_ts <= INTERVAL {CLICK_WINDOW_S} SECOND
      AND (last_purchase_ts IS NULL OR last_purchase_ts < last_click_ts)
    """,
    doc="CEP sequence-with-veto (MATCH_RECOGNIZE 'C NOT_P* E'): "
    "errors preceded by a click within 5 minutes with no purchase "
    "between — one running-MAX window pass per key, no joins. The "
    "incident pattern a funnel can't express (the veto needs "
    "BETWEEN-ness, not stage counts).",
)
def cep_click_error_no_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    w = (
        Window.partitionBy("user_id")
        .orderBy(ts.asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_click = F.max(
        F.when(F.col("event_type") == "click", ts)
    ).over(w)
    last_purchase = F.max(
        F.when(F.col("event_type") == "purchase", ts)
    ).over(w)
    o = ev.select(
        "user_id",
        ts.alias("ts"),
        "event_id",
        "event_type",
        last_click.alias("last_click_ts"),
        last_purchase.alias("last_purchase_ts"),
    )
    return o.filter(
        (F.col("event_type") == "error")
        & F.col("last_click_ts").isNotNull()
        & (
            F.col("ts").cast("long") - F.col("last_click_ts").cast("long")
            <= CLICK_WINDOW_S
        )
        & (
            F.col("last_purchase_ts").isNull()
            | (F.col("last_purchase_ts") < F.col("last_click_ts"))
        )
    ).select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts").alias("error_ts"),
        "last_click_ts",
    )


MIN_STREAK = 3


@register(
    "cep_rising_streaks",
    oracle=f"""
    WITH o AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN value > lag(value) OVER w THEN 0 ELSE 1 END
                   AS brk
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    g AS (
        SELECT user_id, ts, event_id, value,
               SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS run_id
        FROM o
    )
    SELECT user_id, CAST(run_id AS BIGINT) AS run_id,
           CAST(count(*) AS BIGINT) AS run_len,
           min(ts) AS run_start, max(ts) AS run_end,
           min(value) AS first_value, max(value) AS last_value
    FROM g
    GROUP BY user_id, run_id
    HAVING count(*) >= {MIN_STREAK}
    """,
    doc="CEP consecutive-condition runs (MATCH_RECOGNIZE 'A B+' with "
    "DEFINE B AS B.value > PREV(value)): maximal strictly-rising "
    "value streaks of length >= 3 per user via gaps-and-islands — "
    "lag + break-flag cumulative sum, one shuffle. min/max value "
    "equal first/last BECAUSE the run is strictly rising (the "
    "invariant itself).",
)
def cep_rising_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    w = Window.partitionBy("user_id").orderBy(ts.asc(), F.col("event_id").asc())
    brk = F.when(
        F.col("value") > F.lag("value").over(w), F.lit(0)
    ).otherwise(F.lit(1))
    g = ev.select(
        "user_id", ts.alias("ts"), "event_id", "value", brk.alias("brk")
    ).withColumn(
        "run_id",
        F.sum("brk").over(
            Window.partitionBy("user_id")
            .orderBy(F.col("ts").asc(), F.col("event_id").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        g.groupBy("user_id", "run_id")
        .agg(
            F.count(F.lit(1)).alias("run_len"),
            F.min("ts").alias("run_start"),
            F.max("ts").alias("run_end"),
            F.min("value").alias("first_value"),
            F.max("value").alias("last_value"),
        )
        .filter(F.col("run_len") >= MIN_STREAK)
        .select(
            "user_id",
            F.col("run_id").cast("bigint").alias("run_id"),
            F.col("run_len").cast("bigint").alias("run_len"),
            "run_start",
            "run_end",
            "first_value",
            "last_value",
        )
    )


@register(
    "event_transition_matrix",
    oracle="""
    WITH o AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    ),
    t AS (SELECT prev_type AS from_type, event_type AS to_type,
                 count(*) AS n
          FROM o WHERE prev_type IS NOT NULL
          GROUP BY 1, 2),
    rt AS (SELECT from_type, SUM(n) AS row_n FROM t GROUP BY 1)
    SELECT t.from_type, t.to_type,
           CAST(t.n AS BIGINT) AS n,
           ROUND(CAST(t.n AS DOUBLE) / rt.row_n, 6) AS prob
    FROM t JOIN rt ON t.from_type = rt.from_type
    """,
    doc="First-order Markov transition matrix over per-user event "
    "sequences: lag() pairs consecutive events (one shuffle on "
    "user_id), counts aggregate map-side, and row-normalized "
    "probabilities are exact integer ratios — the behavioral-"
    "modeling summary (what follows what) that feeds journey "
    "analysis and synthetic-sequence generators.",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    w = Window.partitionBy("user_id").orderBy(ts.asc(), F.col("event_id").asc())
    o = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    t = o.groupBy(
        F.col("prev_type").alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).alias("n"))
    rt = t.groupBy("from_type").agg(F.sum("n").alias("row_n"))
    return t.join(F.broadcast(rt), "from_type").select(
        "from_type",
        "to_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("n").cast("double") / F.col("row_n"), 6).alias("prob"),
    )


MIN_PAIR_SUPPORT = 2


@register(
    "market_basket_part_pairs",
    oracle=f"""
    WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    nb AS (SELECT count(DISTINCT l_orderkey) AS n_baskets FROM b),
    item AS (SELECT l_partkey, count(*) AS n_item FROM b GROUP BY 1),
    pair AS (
        SELECT a.l_partkey AS part_a, c.l_partkey AS part_b,
               count(*) AS n_both
        FROM b a JOIN b c
          ON a.l_orderkey = c.l_orderkey AND a.l_partkey < c.l_partkey
        GROUP BY 1, 2
        HAVING count(*) >= {MIN_PAIR_SUPPORT})
    SELECT p.part_a, p.part_b,
           CAST(p.n_both AS BIGINT) AS n_both,
           CAST(ia.n_item AS BIGINT) AS n_a,
           CAST(ib.n_item AS BIGINT) AS n_b,
           ROUND(CAST(p.n_both AS DOUBLE) / nb.n_baskets, 6) AS support,
           ROUND(CAST(p.n_both AS DOUBLE) * nb.n_baskets
                 / (ia.n_item * ib.n_item), 6) AS lift
    FROM pair p
    JOIN item ia ON p.part_a = ia.l_partkey
    JOIN item ib ON p.part_b = ib.l_partkey, nb
    """,
    doc="Market-basket association rules: part pairs co-occurring in "
    f">= {MIN_PAIR_SUPPORT} orders with support and lift. The pair "
    "generation is a self-equi-join on the basket key — candidate "
    "pairs per basket are C(items,2) with items bounded (<= 13 here; "
    "cap or top-k per basket at scale), so the join output is "
    "O(baskets x basket_size^2), never parts^2. Support/lift are "
    "exact integer ratios, rounded once.",
)
def market_basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # NOT persisted (r11 measured revert): caching the distinct
    # basket-item table for its five consumers (self-join x2, margins,
    # basket count) measured +4..+12% across 3 same-window
    # alternations, with or without join-key cache partitioning — the
    # parallel duplicate distincts are cheaper locally than the cache
    # barrier. At production scale the basket table is a stored
    # intermediate (materialized upstream), not an in-query cache.
    b = li.select("l_orderkey", "l_partkey").distinct()
    nb = b.agg(F.count_distinct("l_orderkey").alias("n_baskets"))
    item = b.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_item"))
    a = b.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a")
    )
    c = b.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b")
    )
    pair = (
        a.join(c, "ok")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= MIN_PAIR_SUPPORT)
    )
    ia = item.select(
        F.col("l_partkey").alias("part_a"), F.col("n_item").alias("n_a")
    )
    ib = item.select(
        F.col("l_partkey").alias("part_b"), F.col("n_item").alias("n_b")
    )
    return (
        pair.join(ia, "part_a")
        .join(ib, "part_b")
        .crossJoin(F.broadcast(nb))
        .select(
            "part_a",
            "part_b",
            F.col("n_both").cast("bigint").alias("n_both"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.round(
                F.col("n_both").cast("double") / F.col("n_baskets"), 6
            ).alias("support"),
            F.round(
                F.col("n_both").cast("double")
                * F.col("n_baskets")
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )


@register(
    "funnel_time_to_convert",
    oracle="""
    WITH o AS (
        SELECT user_id, ts, event_id, event_type,
               MAX(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING) AS last_view_ts
        FROM events),
    conv AS (
        SELECT user_id,
               epoch(ts) - epoch(last_view_ts) AS secs
        FROM o
        WHERE event_type = 'purchase' AND last_view_ts IS NOT NULL)
    SELECT CAST(count(*) AS BIGINT) AS n_conversions,
           ROUND(quantile_cont(secs, 0.5), 6) AS p50_secs,
           ROUND(quantile_cont(secs, 0.9), 6) AS p90_secs,
           ROUND(min(secs), 6) AS min_secs,
           ROUND(max(secs), 6) AS max_secs
    FROM conv
    """,
    doc="Funnel latency: the time-to-convert distribution (seconds "
    "from each purchase back to the user's most recent prior view) — "
    "the metric stage-count funnels can't give you. One running-MAX "
    "window pass (the CEP shape) feeds exact p50/p90; durations are "
    "exact epoch differences, so both engines agree to the "
    "microsecond.",
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    w = (
        Window.partitionBy("user_id")
        .orderBy(ts.asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    o = ev.select(
        "user_id",
        ts.alias("ts"),
        "event_type",
        F.max(F.when(F.col("event_type") == "view", ts)).over(w).alias(
            "last_view_ts"
        ),
    )
    conv = o.filter(
        (F.col("event_type") == "purchase")
        & F.col("last_view_ts").isNotNull()
    ).select(
        (
            F.col("ts").cast("double") - F.col("last_view_ts").cast("double")
        ).alias("secs")
    )
    return conv.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_conversions"),
        F.round(F.percentile("secs", 0.5), 6).alias("p50_secs"),
        F.round(F.percentile("secs", 0.9), 6).alias("p90_secs"),
        F.round(F.min("secs"), 6).alias("min_secs"),
        F.round(F.max("secs"), 6).alias("max_secs"),
    )


# ------------------------------------------------ top session paths
PATH_GAP_MIN = 240  #: session gap (minutes) — wide enough for paths
PATH_MAX_LEN = 5  #: keep the first N steps of each session
PATH_TOP = 20  #: report the most frequent multi-event paths


@register(
    "top_session_paths",
    oracle=f"""
    WITH o AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN ts - lag(ts) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id)
                        > INTERVAL {PATH_GAP_MIN} MINUTE
                    OR lag(ts) OVER
                        (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS nw
        FROM events),
    s AS (
        SELECT user_id, ts, event_id, event_type,
               SUM(nw) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
        FROM o),
    p AS (
        SELECT user_id, sid, count(*) AS n_ev,
               array_to_string(
                   (list(event_type ORDER BY ts, event_id))[1:{PATH_MAX_LEN}],
                   '>') AS path
        FROM s GROUP BY user_id, sid)
    SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
    FROM p WHERE n_ev >= 2
    GROUP BY path
    ORDER BY n_sessions DESC, path
    LIMIT {PATH_TOP}
    """,
    doc="Session path mining: the most frequent multi-event journey "
    "shapes — sessions from the gaps-and-islands rewrite "
    "({PATH_GAP_MIN}-minute gap, (ts, event_id) tiebreaks), each "
    "session's first 5 event types joined into a path string, "
    "singleton sessions excluded, top 20 by frequency. The FULL-path "
    "complement to the pairwise event_transition_matrix. Order "
    "inside a session is pinned by sort_array over (ts, event_id, "
    "type) structs — collect_list alone does not guarantee order. "
    "At scale this is two user-partitioned windows + one aggregate "
    "keyed by path string; TakeOrderedAndProject caps the output.",
)
def top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    # exact microsecond interval comparison on BOTH engines — epoch
    # truncation would flip boundary rows with fractional-second gaps
    nw = F.when(
        prev.isNull()
        | (
            F.col("ts").cast("timestamp") - prev.cast("timestamp")
            > F.expr(f"INTERVAL {PATH_GAP_MIN} MINUTES")
        ),
        1,
    ).otherwise(0)
    s = ev.select("user_id", "ts", "event_id", "event_type").withColumn(
        "sid",
        F.sum(nw).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    paths = (
        s.groupBy("user_id", "sid")
        .agg(
            F.count(F.lit(1)).alias("n_ev"),
            F.array_join(
                F.slice(
                    F.transform(
                        F.sort_array(
                            F.collect_list(
                                F.struct("ts", "event_id", "event_type")
                            )
                        ),
                        lambda r: r["event_type"],
                    ),
                    1,
                    PATH_MAX_LEN,
                ),
                ">",
            ).alias("path"),
        )
        .filter(F.col("n_ev") >= 2)
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), "path")
        .limit(PATH_TOP)
    )


# ---------------------------- Markov removal-effect attribution
MK_CHANNELS = ["click", "error", "signup", "view"]  #: non-conversion states
MK_ITERS = 25  #: Jacobi iterations to absorption (sub-stochastic chain)
MK_SCALE = 12  #: decimal digits of per-iteration state rounding

#: the journey/transition construction shared by both engines: events
#: per user up to and including the FIRST purchase, in (ts, event_id)
#: order; purchase maps to the absorbing CONV state, journey end
#: without purchase to NULLSTATE; START edges feed each user's first
#: kept event.
_MK_EDGE_SQL = """
    o AS (
        SELECT user_id, event_type, ts, event_id,
               COALESCE(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0) AS prior_p
        FROM events),
    k AS (SELECT * FROM o WHERE prior_p = 0),
    seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM k),
    edges AS (
        SELECT CASE WHEN event_type = 'purchase' THEN 'CONV'
                    ELSE event_type END AS f,
               CASE WHEN nxt IS NULL THEN 'NULLSTATE'
                    WHEN nxt = 'purchase' THEN 'CONV'
                    ELSE nxt END AS t
        FROM seq WHERE event_type != 'purchase'
        UNION ALL
        SELECT 'START',
               CASE WHEN event_type = 'purchase' THEN 'CONV'
                    ELSE event_type END
        FROM seq WHERE rn = 1),
    tm AS (
        SELECT f, t,
               CAST(count(*) AS DOUBLE)
                   / SUM(count(*)) OVER (PARTITION BY f) AS p
        FROM edges GROUP BY f, t)"""


def _mk_model_cols_sql() -> str:
    cols = []
    for i, ci in enumerate(MK_CHANNELS):
        for j, cj in enumerate(MK_CHANNELS):
            cols.append(
                f"COALESCE(MAX(CASE WHEN f = '{ci}' AND t = '{cj}' "
                f"THEN p END), 0.0) AS m{i}{j}"
            )
        cols.append(
            f"COALESCE(MAX(CASE WHEN f = '{ci}' AND t = 'CONV' "
            f"THEN p END), 0.0) AS v{i}"
        )
        cols.append(
            f"COALESCE(MAX(CASE WHEN f = 'START' AND t = '{ci}' "
            f"THEN p END), 0.0) AS s{i}"
        )
    cols.append(
        "COALESCE(MAX(CASE WHEN f = 'START' AND t = 'CONV' "
        "THEN p END), 0.0) AS sc"
    )
    return ",\n               ".join(cols)


def _mk_fold_sql(r: int) -> str:
    """The 25-iteration absorption fold with channel ``r`` removed
    (-1 = full chain); returns a DOUBLE[4] SQL expression. The state
    list and the per-index 4-term sums use the exact op order the
    Spark twin uses."""
    items = []
    for i in range(4):
        if i == r:
            items.append("0.0")
            continue
        expr = f"v{i}"
        for j in range(4):
            expr = f"{expr} + m{i}{j} * s_[{j + 1}]"
        items.append(f"ROUND({expr}, {MK_SCALE})")
    body = ", ".join(items)
    return (
        f"list_reduce([[0.0, 0.0, 0.0, 0.0]] || "
        f"[[CAST(q AS DOUBLE)] for q in generate_series(1, {MK_ITERS})], "
        f"(s_, x_) -> [{body}])"
    )


def _mk_pstart_sql(vec: str, r: int) -> str:
    expr = "sc"
    for j in range(4):
        if j == r:
            continue
        expr = f"{expr} + s{j} * {vec}[{j + 1}]"
    return f"ROUND({expr}, {MK_SCALE})"


def _mk_oracle() -> str:
    folds = ",\n        ".join(
        f"{_mk_fold_sql(r)} AS pv{r + 1}" for r in range(-1, 4)
    )
    pstarts = ",\n        ".join(
        f"{_mk_pstart_sql(f'pv{r + 1}', r)} AS ps{r + 1}"
        for r in range(-1, 4)
    )
    res = " + ".join(f"(1.0 - ps{r + 1} / ps0)" for r in range(4))
    chan_rows = []
    for r in range(4):
        chan_rows.append(
            f"SELECT '{MK_CHANNELS[r]}' AS channel,"
            f" ROUND(ps0, 6) + 0.0 AS conv_prob,"
            f" CASE WHEN ps0 > 0 THEN"
            f" ROUND(1.0 - ps{r + 1} / ps0, 6) + 0.0 END AS removal_effect,"
            f" CASE WHEN ps0 > 0 AND re_sum > 0 THEN"
            f" ROUND((1.0 - ps{r + 1} / ps0) / re_sum, 6) + 0.0 END"
            f" AS attribution_share"
            f" FROM ps"
        )
    union = " UNION ALL ".join(chan_rows)
    return f"""
    WITH {_MK_EDGE_SQL},
    model AS (
        SELECT {_mk_model_cols_sql()}
        FROM tm),
    pv AS (
        SELECT *,
        {folds}
        FROM model),
    ps0_ AS (
        SELECT *,
        {pstarts}
        FROM pv),
    ps AS (
        SELECT *, CASE WHEN ps0 > 0 THEN {res} END AS re_sum
        FROM ps0_ WHERE ps0 IS NOT NULL)
    SELECT * FROM ({union})
    """


@register(
    "markov_attribution_removal",
    oracle=_mk_oracle(),
    doc=f"Markov-chain removal-effect attribution (Anderl et al. "
    f"2014): user journeys (events up to the first purchase, "
    "event-time order) become a first-order absorbing chain over "
    f"{{START, {', '.join(MK_CHANNELS)}, CONV, NULLSTATE}}; "
    f"conversion probability from START is solved by {MK_ITERS} "
    "Jacobi iterations of p = V + M p (the pagerank iteration "
    "discipline: 12-digit state rounding, fixed 4-term chains), and "
    "each channel's REMOVAL EFFECT is the relative conversion drop "
    "when journeys through it are absorbed into NULLSTATE (forcing "
    "p[c] = 0) — the data-driven alternative to last-touch/U-shape "
    "position rules (both also registered, for comparison on the "
    "same journeys). Shares normalize removal effects to 1. "
    "Determinism: transition probabilities are exact-integer "
    "divisions; the iteration arithmetic is generated from ONE "
    "Python loop for both engines, so op order is identical by "
    "construction. Scale: journeys need one per-user window scan; "
    "the chain model is O(channels^2) ~ 25 numbers — the fold runs "
    "on a single row regardless of corpus size.",
)
def markov_attribution_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    uw = Window.partitionBy("user_id").orderBy(
        F.col("ts").cast("timestamp"), "event_id"
    )
    o = ev.withColumn(
        "prior_p",
        F.coalesce(
            F.count(
                F.when(F.col("event_type") == "purchase", 1)
            ).over(uw.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ),
    )
    k = o.filter(F.col("prior_p") == 0)
    seq = k.select(
        "user_id",
        "event_type",
        F.lead("event_type").over(uw).alias("nxt"),
        F.row_number().over(uw).alias("rn"),
    )
    conv_map = lambda c: F.when(c == "purchase", "CONV").otherwise(c)
    # NOT fused into an explode (r11 measured revert): rewriting the
    # mid/start union as one explode-of-conditional-structs pass kept
    # the identical job/stage/task schedule (the union arms already
    # share the window exchange at runtime) and measured +27% from
    # the per-row array/struct overhead. The static plan's duplicate
    # Window nodes are plan-text, not executed work.
    mid = seq.filter(F.col("event_type") != "purchase").select(
        F.col("event_type").alias("f"),
        F.when(F.col("nxt").isNull(), "NULLSTATE")
        .otherwise(conv_map(F.col("nxt")))
        .alias("t"),
    )
    start = seq.filter(F.col("rn") == 1).select(
        F.lit("START").alias("f"), conv_map(F.col("event_type")).alias("t")
    )
    edges = mid.unionByName(start)
    tm = (
        edges.groupBy("f", "t")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "p",
            F.col("n").cast("double")
            / F.sum("n").over(Window.partitionBy("f")),
        )
    )
    aggs = []
    for i, ci in enumerate(MK_CHANNELS):
        for j, cj in enumerate(MK_CHANNELS):
            aggs.append(
                F.coalesce(
                    F.max(
                        F.when(
                            (F.col("f") == ci) & (F.col("t") == cj),
                            F.col("p"),
                        )
                    ),
                    F.lit(0.0),
                ).alias(f"m{i}{j}")
            )
        aggs.append(
            F.coalesce(
                F.max(
                    F.when(
                        (F.col("f") == ci) & (F.col("t") == "CONV"),
                        F.col("p"),
                    )
                ),
                F.lit(0.0),
            ).alias(f"v{i}")
        )
        aggs.append(
            F.coalesce(
                F.max(
                    F.when(
                        (F.col("f") == "START") & (F.col("t") == ci),
                        F.col("p"),
                    )
                ),
                F.lit(0.0),
            ).alias(f"s{i}")
        )
    aggs.append(
        F.coalesce(
            F.max(
                F.when(
                    (F.col("f") == "START") & (F.col("t") == "CONV"),
                    F.col("p"),
                )
            ),
            F.lit(0.0),
        ).alias("sc")
    )
    model = tm.agg(*aggs)

    def fold_col(r: int):
        def step(p, _):
            items = []
            for i in range(4):
                if i == r:
                    items.append(F.lit(0.0))
                    continue
                expr = F.col(f"v{i}")
                for j in range(4):
                    expr = expr + F.col(f"m{i}{j}") * F.element_at(p, j + 1)
                items.append(F.round(expr, MK_SCALE))
            return F.array(*items)

        return F.aggregate(
            F.sequence(F.lit(1), F.lit(MK_ITERS)),
            F.array(F.lit(0.0), F.lit(0.0), F.lit(0.0), F.lit(0.0)),
            step,
        )

    def pstart_col(vec, r: int):
        expr = F.col("sc")
        for j in range(4):
            if j == r:
                continue
            expr = expr + F.col(f"s{j}") * F.element_at(vec, j + 1)
        return F.round(expr, MK_SCALE)

    pv = model.select(
        "*", *[fold_col(r).alias(f"pv{r + 1}") for r in range(-1, 4)]
    )
    ps = pv.select(
        "*",
        *[
            pstart_col(F.col(f"pv{r + 1}"), r).alias(f"ps{r + 1}")
            for r in range(-1, 4)
        ],
    )
    re_sum = None
    for r in range(4):
        term = F.lit(1.0) - F.col(f"ps{r + 1}") / F.col("ps0")
        re_sum = term if re_sum is None else re_sum + term
    ps = ps.withColumn(
        "re_sum", F.when(F.col("ps0") > 0, re_sum)
    )
    out = None
    for r in range(4):
        re_raw = F.lit(1.0) - F.col(f"ps{r + 1}") / F.col("ps0")
        row = ps.select(
            F.lit(MK_CHANNELS[r]).alias("channel"),
            (F.round(F.col("ps0"), 6) + F.lit(0.0)).alias("conv_prob"),
            F.when(
                F.col("ps0") > 0, F.round(re_raw, 6) + F.lit(0.0)
            ).alias("removal_effect"),
            F.when(
                (F.col("ps0") > 0) & (F.col("re_sum") > 0),
                F.round(re_raw / F.col("re_sum"), 6) + F.lit(0.0),
            ).alias("attribution_share"),
        )
        out = row if out is None else out.unionByName(row)
    return out


# -------------------------- bigram next-event prediction accuracy
@register(
    "markov_next_event_accuracy",
    oracle="""
    WITH b AS (
        SELECT user_id, event_type,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS es,
               ts, event_id
        FROM events),
    med AS (SELECT quantile_cont(es, 0.5) AS m FROM b),
    pairs AS (
        SELECT event_type AS f, es,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS t
        FROM b),
    split AS (
        SELECT f, t, CASE WHEN es <= med.m THEN 1 ELSE 0 END AS is_train
        FROM pairs, med WHERE t IS NOT NULL),
    pred AS (
        SELECT f, t AS predicted_next FROM (
            SELECT f, t, row_number() OVER (
                PARTITION BY f ORDER BY count(*) DESC, t) AS rn
            FROM split WHERE is_train = 1 GROUP BY f, t)
        WHERE rn = 1),
    tr AS (
        SELECT f, CAST(count(*) AS BIGINT) AS n_train
        FROM split WHERE is_train = 1 GROUP BY f),
    te AS (
        SELECT s.f,
               CAST(count(*) AS BIGINT) AS n_test,
               CAST(SUM(CASE WHEN s.t = p.predicted_next
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
        FROM split s JOIN pred p ON s.f = p.f
        WHERE s.is_train = 0 GROUP BY s.f)
    SELECT te.f AS from_state, tr.n_train, te.n_test,
           p.predicted_next,
           ROUND(CAST(n_hit AS DOUBLE) / n_test, 6) + 0.0 AS top1_acc
    FROM te JOIN tr ON te.f = tr.f JOIN pred p ON te.f = p.f
    """,
    doc="Out-of-sample top-1 accuracy of the first-order (bigram) "
    "next-event model: transitions whose FROM event falls in the "
    "first time half train a per-state argmax predictor (most "
    "frequent successor, deterministic alphabetical tiebreak), "
    "scored on the second half's transitions — the predictive-"
    "validity check that tells you whether the transition matrix "
    "(event_transition_matrix) and the Markov attribution chain "
    "actually generalize forward in time, or just memorize the "
    "past. Near-uniform accuracy ~1/states means user behavior is "
    "memoryless and sequence features won't help a model. "
    "Determinism: pure integer counts, an argmax under a total "
    "order, one IEEE division under ROUND with the -0.0 normalizer "
    "(whole-second epoch truncation on both engines). Scale: one "
    "per-user window scan; train/test never materialize beyond "
    "(state, successor) counts.",
)
def markov_next_event_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_analytics_demo_spark.caching import tracked_persist

    ev = _t(spark, sf_dir, "events")
    b = ev.select(
        "user_id",
        "event_type",
        F.col("ts").cast("timestamp").cast("long").alias("es"),
        F.col("ts").cast("timestamp").alias("tts"),
        "event_id",
    )
    uw = Window.partitionBy("user_id").orderBy("tts", "event_id")
    pairs = b.select(
        F.col("event_type").alias("f"),
        "es",
        F.lead("event_type").over(uw).alias("t"),
    ).filter(F.col("t").isNotNull())
    # median over ALL events (not just paired rows) — the oracle's
    # split population; a pairs-only median silently shifts the
    # boundary because each user's last event has no successor
    med = b.agg(F.percentile("es", 0.5).alias("m"))
    split = tracked_persist(
        pairs.crossJoin(F.broadcast(med)).select(
            "f",
            "t",
            F.when(F.col("es") <= F.col("m"), 1).otherwise(0).alias(
                "is_train"
            ),
        )
    )
    # Prediction AND train totals in ONE pass over the train counts:
    # min_by over struct(-n, t) IS the row_number (n DESC, t ASC)
    # pick, map-side combining, and n_train = sum of the same counts
    # — the previous shape ran two cache passes (pred window + tr
    # aggregate) and re-joined pred a second time for the readout.
    cnt = (
        split.filter(F.col("is_train") == 1)
        .groupBy("f", "t")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pred_tr = cnt.groupBy("f").agg(
        F.min_by("t", F.struct(-F.col("n"), F.col("t"))).alias(
            "predicted_next"
        ),
        F.sum("n").cast("bigint").alias("n_train"),
    )
    te = (
        split.filter(F.col("is_train") == 0)
        .join(F.broadcast(pred_tr), "f")
        .groupBy("f", "predicted_next", "n_train")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_test"),
            F.sum(
                F.when(F.col("t") == F.col("predicted_next"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_hit"),
        )
    )
    return te.select(
        F.col("f").alias("from_state"),
        "n_train",
        "n_test",
        "predicted_next",
        (
            F.round(F.col("n_hit").cast("double") / F.col("n_test"), 6)
            + F.lit(0.0)
        ).alias("top1_acc"),
    )


# ------------------------------- exact Shapley-value attribution
#: coalition value v(T) = conversions from journeys whose channel set
#: is a SUBSET of T (monotone, v(empty) = direct purchases), the
#: order-free simplified game of Zhao, Mahboobi & Bagheri (2018),
#: "Shapley value methods for attribution modeling in online
#: advertising". With |N| = 4 channels the 16-coalition lattice is
#: enumerated EXACTLY in Python once and embedded as literal tables
#: in both engines; weights |S|!(n-1-|S|)!/n! all have denominator
#: n! = 24, so phi stays exact-integer (x24) until one final division.


def _sh_key(s) -> str:
    return ",".join(sorted(s))


def _sh_lattice():
    from itertools import combinations

    n = len(MK_CHANNELS)
    subsets = [
        frozenset(c)
        for r in range(n + 1)
        for c in combinations(MK_CHANNELS, r)
    ]
    containment = [
        (_sh_key(t), _sh_key(s))
        for t in subsets
        for s in subsets
        if s <= t
    ]
    import math

    terms = []
    for ch in MK_CHANNELS:
        rest = [c for c in MK_CHANNELS if c != ch]
        for r in range(n):
            for c in combinations(rest, r):
                s = frozenset(c)
                w24 = math.factorial(len(s)) * math.factorial(
                    n - 1 - len(s)
                )
                terms.append(
                    (ch, _sh_key(s | {ch}), _sh_key(s), w24)
                )
    return containment, terms


_SH_CONTAIN, _SH_TERMS = _sh_lattice()


def _sh_values_sql(rows, cols: str) -> str:
    body = ", ".join(
        "(" + ", ".join(f"'{v}'" if isinstance(v, str) else str(v) for v in r)
        + ")"
        for r in rows
    )
    return f"(VALUES {body}) AS t({cols})"


@register(
    "shapley_attribution_exact",
    oracle=f"""
    WITH o AS (
        SELECT user_id, event_type, ts, event_id,
               COALESCE(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0) AS prior_p
        FROM events),
    j AS (
        SELECT user_id,
               COALESCE(array_to_string(
                   list_sort(array_agg(DISTINCT event_type)
                             FILTER (event_type != 'purchase')), ','), '')
                   AS s_key,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS conv
        FROM o WHERE prior_p = 0 GROUP BY user_id),
    obs AS (SELECT s_key, SUM(conv) AS c FROM j GROUP BY s_key),
    cont AS (SELECT * FROM {{CONT}}),
    v AS (
        SELECT cont.t_key, COALESCE(SUM(obs.c), 0) AS val
        FROM cont LEFT JOIN obs ON obs.s_key = cont.s_key
        GROUP BY cont.t_key),
    trm AS (SELECT * FROM {{TERMS}}),
    phi AS (
        SELECT trm.channel,
               SUM(trm.w24 * (vw.val - vo.val)) AS phi24
        FROM trm
        JOIN v vw ON vw.t_key = trm.with_key
        JOIN v vo ON vo.t_key = trm.without_key
        GROUP BY trm.channel)
    SELECT channel,
           CAST(ROUND(CAST(phi24 AS DOUBLE) / 24.0, 6) AS DOUBLE) + 0.0
               AS shapley_conversions,
           CAST(ROUND(CAST(phi24 AS DOUBLE)
                      / CAST(SUM(phi24) OVER () AS DOUBLE), 6)
                AS DOUBLE) + 0.0 AS share
    FROM phi
    """.replace("{CONT}", _sh_values_sql(_SH_CONTAIN, "t_key, s_key"))
    .replace(
        "{TERMS}",
        _sh_values_sql(_SH_TERMS, "channel, with_key, without_key, w24"),
    ),
    doc="Exact Shapley-value channel attribution (Zhao et al. 2018) "
    "over the SAME journeys as the Markov/last-touch/U-shape "
    "operators: v(T) = conversions whose distinct-channel set is "
    "contained in coalition T; each channel's Shapley value uses the "
    "exact factorial weights of the 4-channel lattice, kept as "
    "integer 24ths until the final division, so the result is "
    "exact-integer arithmetic end to end (no float accumulation "
    "anywhere). Completes the attribution family: position rules "
    "(last-touch, U-shape), a Markov removal-effect model, and a "
    "cooperative-game model on one journey definition. Scale: one "
    "per-user window scan + a hash aggregate to at most 2^|N| "
    "observed channel sets; the lattice joins touch 16-row literal "
    "tables regardless of corpus size.",
)
def shapley_attribution_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    uw = Window.partitionBy("user_id").orderBy(
        F.col("ts").cast("timestamp"), "event_id"
    )
    o = ev.withColumn(
        "prior_p",
        F.coalesce(
            F.count(F.when(F.col("event_type") == "purchase", 1)).over(
                uw.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    )
    j = (
        o.filter(F.col("prior_p") == 0)
        .groupBy("user_id")
        .agg(
            F.coalesce(
                F.array_join(
                    F.array_sort(
                        F.collect_set(
                            F.when(
                                F.col("event_type") != "purchase",
                                F.col("event_type"),
                            )
                        )
                    ),
                    ",",
                ),
                F.lit(""),
            ).alias("s_key"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("conv"),
        )
    )
    obs = j.groupBy("s_key").agg(F.sum("conv").alias("c"))
    cont = spark.createDataFrame(_SH_CONTAIN, "t_key string, s_key string")
    v = (
        cont.join(F.broadcast(obs), "s_key", "left")
        .groupBy("t_key")
        .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("val"))
    )
    trm = spark.createDataFrame(
        _SH_TERMS, "channel string, with_key string, without_key string, w24 long"
    )
    vw = v.select(F.col("t_key").alias("with_key"), F.col("val").alias("vw"))
    vo = v.select(
        F.col("t_key").alias("without_key"), F.col("val").alias("vo")
    )
    phi = (
        trm.join(F.broadcast(vw), "with_key")
        .join(F.broadcast(vo), "without_key")
        .groupBy("channel")
        .agg(F.sum(F.col("w24") * (F.col("vw") - F.col("vo"))).alias("phi24"))
    )
    tot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return phi.select(
        "channel",
        (
            F.round(F.col("phi24").cast("double") / F.lit(24.0), 6)
            .cast("double")
            + F.lit(0.0)
        ).alias("shapley_conversions"),
        (
            F.round(
                F.col("phi24").cast("double")
                / F.sum("phi24").over(tot).cast("double"),
                6,
            ).cast("double")
            + F.lit(0.0)
        ).alias("share"),
    )
