"""Statistical profiling battery: Pearson correlation matrix, closed-
form OLS regression, and a chi-square independence test — the
numeric-audit layer a data pipeline runs before trusting a corpus
(feature drift, spurious-correlation checks, categorical balance).

All three are single-scan, shuffle-light shapes: the sufficient
statistics (Sx, Sy, Sxy, Sxx, Syy, counts) are decomposable sums
computed map-side in ONE aggregate over the scan (DECIMAL(12,3)
inputs: exact for this 2-fraction-digit data, and products stay
inside DuckDB's int64 decimal-multiply fast path); the closed-form
combination happens on the tiny aggregate output. This is the moment
method every distributed stats library uses — at 100 TB nothing but
one partial-aggregate exchange moves.

Determinism: sufficient statistics accumulate in DECIMAL over
DECIMAL(12,3)-cast inputs — exact, order-insensitive; the closed-form
combination is a fixed chain of scalar IEEE-754 double ops, rounded
once at the edge. The chi-square cell fold sorts cells and folds
left-to-right (the entropy pattern) — though with DECIMAL cell terms
it is order-free anyway.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.plans.registry import register
from kinesis_analytics_demo_spark.session import read_table as _t

CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _dec(c: str):
    return F.col(c).cast("decimal(12,3)")


def _corr_expr(n, sx, sy, sxy, sxx, syy):
    """Pearson r from decimal sufficient stats — fixed op order."""
    n = n.cast("double")
    sx, sy = sx.cast("double"), sy.cast("double")
    sxy, sxx, syy = sxy.cast("double"), sxx.cast("double"), syy.cast("double")
    cov = n * sxy - sx * sy
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    return cov / (F.sqrt(vx) * F.sqrt(vy))


def _sql_corr(n, sx, sy, sxy, sxx, syy):
    return (
        f"(({n} * {sxy} - {sx} * {sy}) / "
        f"(sqrt({n} * {sxx} - {sx} * {sx}) * "
        f"sqrt({n} * {syy} - {sy} * {sy})))"
    )


def _sql_sstats() -> str:
    """One aggregate row of every sufficient statistic (DuckDB)."""
    parts = ["CAST(count(*) AS DOUBLE) AS n"]
    for c in CORR_COLS:
        parts.append(
            f"CAST(SUM(CAST({c} AS DECIMAL(12,3))) AS DOUBLE) AS s_{c}"
        )
        parts.append(
            f"CAST(SUM(CAST({c} AS DECIMAL(12,3))"
            f" * CAST({c} AS DECIMAL(12,3))) AS DOUBLE) AS s_{c}_{c}"
        )
    for a, b in combinations(CORR_COLS, 2):
        parts.append(
            f"CAST(SUM(CAST({a} AS DECIMAL(12,3))"
            f" * CAST({b} AS DECIMAL(12,3))) AS DOUBLE) AS s_{a}_{b}"
        )
    return "SELECT " + ", ".join(parts) + " FROM lineitem"


def _sstats(df: DataFrame) -> DataFrame:
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for c in CORR_COLS:
        aggs.append(F.sum(_dec(c)).cast("double").alias(f"s_{c}"))
        aggs.append(
            F.sum(_dec(c) * _dec(c)).cast("double").alias(f"s_{c}_{c}")
        )
    for a, b in combinations(CORR_COLS, 2):
        aggs.append(F.sum(_dec(a) * _dec(b)).cast("double").alias(f"s_{a}_{b}"))
    return df.agg(*aggs)


@register(
    "corr_matrix_lineitem",
    oracle="WITH s AS ({stats})\n{selects}".format(
        stats=_sql_sstats(),
        selects="\nUNION ALL\n".join(
            f"SELECT '{a}' AS col_x, '{b}' AS col_y, "
            f"ROUND({_sql_corr('n', f's_{a}', f's_{b}', f's_{a}_{b}', f's_{a}_{a}', f's_{b}_{b}')}, 6)"
            f" AS corr FROM s"
            for a, b in combinations(CORR_COLS, 2)
        ),
    ),
    doc="Pearson correlation matrix over the four lineitem numeric "
    "columns via the moment method: ONE aggregate computes all 15 "
    "decimal sufficient statistics map-side (single exchange of one "
    "partial row per task); the 6 pairwise correlations are scalar "
    "arithmetic on that row. The drift/collinearity audit shape.",
)
def corr_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _sstats(li)
    # ONE plan for all 6 pairs: a union of 6 per-pair selects re-runs
    # the full scan+aggregate per branch (Spark does not share the
    # aggregate subtree across union arms — measured 6 lineitem scans
    # / 24 exchanges in the static plan, r11 optimization round).
    # Exploding an array of 6 structs built from the single stats row
    # computes the identical values with exactly one scan + one
    # partial-aggregate exchange.
    cells = [
        F.struct(
            F.lit(a).alias("col_x"),
            F.lit(b).alias("col_y"),
            F.round(
                _corr_expr(
                    F.col("n"),
                    F.col(f"s_{a}"),
                    F.col(f"s_{b}"),
                    F.col(f"s_{a}_{b}"),
                    F.col(f"s_{a}_{a}"),
                    F.col(f"s_{b}_{b}"),
                ),
                6,
            ).alias("corr"),
        )
        for a, b in combinations(CORR_COLS, 2)
    ]
    return s.select(F.explode(F.array(*cells)).alias("r")).select(
        "r.col_x", "r.col_y", "r.corr"
    )


@register(
    "ols_discount_vs_quantity",
    oracle=f"""
    WITH s AS ({_sql_sstats()})
    SELECT ROUND((n * s_l_quantity_l_discount
                  - s_l_quantity * s_l_discount)
                 / (n * s_l_quantity_l_quantity
                    - s_l_quantity * s_l_quantity), 9) AS slope,
           ROUND((s_l_discount - ((n * s_l_quantity_l_discount
                  - s_l_quantity * s_l_discount)
                 / (n * s_l_quantity_l_quantity
                    - s_l_quantity * s_l_quantity)) * s_l_quantity)
                 / n, 9) AS intercept,
           ROUND(POW({_sql_corr('n', 's_l_quantity', 's_l_discount',
                                's_l_quantity_l_discount',
                                's_l_quantity_l_quantity',
                                's_l_discount_l_discount')}, 2), 9)
               AS r_squared
    FROM s
    """,
    doc="Closed-form OLS of l_discount on l_quantity (normal "
    "equations from the same one-pass decimal sufficient statistics "
    "as the correlation matrix). The is-this-relationship-real audit: "
    "slope/intercept plus R^2; on independent columns R^2 ~ 0.",
)
def ols_discount_vs_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _sstats(li)
    n = F.col("n")
    sx, sy = F.col("s_l_quantity"), F.col("s_l_discount")
    sxy = F.col("s_l_quantity_l_discount")
    sxx = F.col("s_l_quantity_l_quantity")
    syy = F.col("s_l_discount_l_discount")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        F.round(slope, 9).alias("slope"),
        F.round((sy - slope * sx) / n, 9).alias("intercept"),
        F.round(
            F.pow(_corr_expr(n, sx, sy, sxy, sxx, syy), 2), 9
        ).alias("r_squared"),
    )


@register(
    "chisq_event_type_weekday",
    oracle="""
    WITH o AS (
        SELECT event_type, dayofweek(ts) AS dow,
               CAST(count(*) AS DECIMAL(18,0)) AS obs
        FROM events GROUP BY 1, 2),
    tot AS (SELECT CAST(SUM(obs) AS DOUBLE) AS n FROM o),
    rt AS (SELECT event_type, CAST(SUM(obs) AS DOUBLE) AS r FROM o GROUP BY 1),
    ct AS (SELECT dow, CAST(SUM(obs) AS DOUBLE) AS c FROM o GROUP BY 1),
    cells AS (
        SELECT o.event_type, o.dow,
               CAST(ROUND(POW(CAST(o.obs AS DOUBLE)
                              - rt.r * ct.c / tot.n, 2)
                          / (rt.r * ct.c / tot.n), 9)
                    AS DECIMAL(28,9)) AS term
        FROM o, tot
        JOIN rt ON o.event_type = rt.event_type
        JOIN ct ON o.dow = ct.dow),
    agg AS (SELECT SUM(term) AS stat,
                   count(*) AS n_cells FROM cells)
    SELECT CAST(ROUND(stat, 6) AS DOUBLE) AS chi_square,
           CAST((SELECT count(DISTINCT event_type) FROM o) - 1 AS BIGINT)
             * CAST((SELECT count(DISTINCT dow) FROM o) - 1 AS BIGINT)
               AS dof,
           CAST(n_cells AS BIGINT) AS n_cells
    FROM agg
    """,
    doc="Chi-square independence test of event_type x weekday: "
    "observed cell counts vs the independence expectation, per-cell "
    "terms rounded and summed in DECIMAL (order-free), with the "
    "degrees of freedom. The categorical-balance audit — a uniform "
    "generator should not reject independence.",
)
def chisq_event_type_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # DuckDB dayofweek: 0=Sunday..6; Spark dayofweek: 1=Sunday..7
    o = ev.groupBy(
        "event_type",
        (F.dayofweek(F.col("ts").cast("timestamp")) - 1).alias("dow"),
    ).agg(F.count(F.lit(1)).cast("decimal(18,0)").alias("obs"))
    tot = o.agg(F.sum("obs").cast("double").alias("n"))
    rt = o.groupBy("event_type").agg(F.sum("obs").cast("double").alias("r"))
    ct = o.groupBy("dow").agg(F.sum("obs").cast("double").alias("c"))
    e = F.col("r") * F.col("c") / F.col("n")
    cells = (
        o.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "dow")
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "dow",
            F.round(
                F.pow(F.col("obs").cast("double") - e, 2) / e, 9
            )
            .cast("decimal(28,9)")
            .alias("term"),
        )
    )
    nr = o.select("event_type").distinct().count()
    nc = o.select("dow").distinct().count()
    return cells.agg(
        F.round(F.sum("term"), 6).cast("double").alias("chi_square"),
        F.lit((nr - 1) * (nc - 1)).cast("bigint").alias("dof"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
    )


@register(
    "daily_p95_value",
    oracle="""
    SELECT event_type,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(count(*) AS BIGINT) AS n,
           ROUND(quantile_cont(value, 0.95), 6) AS p95
    FROM events
    GROUP BY 1, 2
    """,
    doc="Windowed exact percentile: p95 of value per (event_type, "
    "day) — the SLO/latency-dashboard shape (global percentiles hide "
    "regressions that daily ones expose). Exact per-group sort is "
    "fine because groups are day-bounded; at larger windows swap in "
    "the mergeable histogram sketch (quantile_histogram_events). "
    "F.percentile == quantile_cont bit-for-bit (the winsorize-"
    "established parity), rounded once.",
)
def daily_p95_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts").cast("timestamp")).alias("day"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.percentile("value", 0.95), 6).alias("p95"),
        )
        .select("event_type", "day", F.col("n").cast("bigint"), "p95")
    )


# ------------------------------------- Cramer's V association strength
@register(
    "cramers_v_type_weekday",
    oracle="""
    WITH o AS (
        SELECT event_type, dayofweek(ts) AS dow,
               CAST(count(*) AS DECIMAL(18,0)) AS obs
        FROM events GROUP BY 1, 2),
    tot AS (SELECT CAST(SUM(obs) AS DOUBLE) AS n FROM o),
    rt AS (SELECT event_type, CAST(SUM(obs) AS DOUBLE) AS r FROM o GROUP BY 1),
    ct AS (SELECT dow, CAST(SUM(obs) AS DOUBLE) AS c FROM o GROUP BY 1),
    cells AS (
        SELECT CAST(ROUND(POW(CAST(o.obs AS DOUBLE)
                              - rt.r * ct.c / tot.n, 2)
                          / (rt.r * ct.c / tot.n), 9)
                    AS DECIMAL(28,9)) AS term
        FROM o, tot
        JOIN rt ON o.event_type = rt.event_type
        JOIN ct ON o.dow = ct.dow),
    dims AS (
        SELECT CAST((SELECT count(*) FROM rt) AS DOUBLE) AS r,
               CAST((SELECT count(*) FROM ct) AS DOUBLE) AS c),
    agg AS (
        SELECT CAST(SUM(term) AS DOUBLE) AS chi2, tot.n, dims.r, dims.c
        FROM cells, tot, dims GROUP BY tot.n, dims.r, dims.c)
    SELECT CAST(ROUND(chi2, 6) AS DOUBLE) AS chi_square,
           CAST(n AS BIGINT) AS n,
           CAST(r AS INT) AS n_rows,
           CAST(c AS INT) AS n_cols,
           CAST(ROUND(sqrt((chi2 / n) / LEAST(r - 1, c - 1)), 6)
                AS DOUBLE) AS cramers_v,
           CAST(ROUND(sqrt(GREATEST(chi2 / n
                                    - (r - 1) * (c - 1) / (n - 1), 0.0)
                           / LEAST(r - (r - 1) * (r - 1) / (n - 1) - 1,
                                   c - (c - 1) * (c - 1) / (n - 1) - 1)),
                      6) AS DOUBLE) AS cramers_v_corrected
    FROM agg
    """,
    doc="Cramer's V effect size for the event_type x weekday "
    "contingency table — the [0, 1]-normalized association strength "
    "the raw chi-square (chisq_event_type_weekday, same cell "
    "construction) cannot give, plus the Bergsma (2013) "
    "bias-corrected variant that de-biases small-sample phi^2 and "
    "the table dimensions. Per-cell terms are rounded to 9 dp and "
    "summed in exact DECIMAL (the chi-square discipline); V is one "
    "sqrt of exact-operand IEEE arithmetic. A uniform generator "
    "should sit near 0. Scale: the contingency rollup map-side "
    "combines; everything after is O(r x c) cells.",
)
def cramers_v_type_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_analytics_demo_spark.caching import tracked_persist

    ev = _t(spark, sf_dir, "events")
    # Persist the contingency table (types x 7 rows, one partition):
    # its four direct consumers (grand total, row/col margins, the
    # cell pass) plus the margin re-counts in `dims` otherwise re-run
    # the full events aggregation six times (before-plan: 7 scans).
    o = tracked_persist(
        ev.groupBy(
            "event_type",
            (F.dayofweek(F.col("ts").cast("timestamp")) - 1).alias("dow"),
        )
        .agg(F.count(F.lit(1)).cast("decimal(18,0)").alias("obs"))
        .repartition(1)
    )
    tot = o.agg(F.sum("obs").cast("double").alias("n"))
    rt = o.groupBy("event_type").agg(F.sum("obs").cast("double").alias("r"))
    ct = o.groupBy("dow").agg(F.sum("obs").cast("double").alias("c"))
    e = F.col("r") * F.col("c") / F.col("n")
    cells = (
        o.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "dow")
        .crossJoin(F.broadcast(tot))
        .select(
            F.round(
                F.pow(F.col("obs").cast("double") - e, 2) / e, 9
            )
            .cast("decimal(28,9)")
            .alias("term")
        )
    )
    dims = rt.agg(F.count(F.lit(1)).cast("double").alias("r")).crossJoin(
        F.broadcast(ct.agg(F.count(F.lit(1)).cast("double").alias("c")))
    )
    agg = (
        cells.agg(F.sum("term").cast("double").alias("chi2"))
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(dims))
    )
    phi2 = F.col("chi2") / F.col("n")
    r, c, n = F.col("r"), F.col("c"), F.col("n")
    phi2c = F.greatest(
        phi2 - (r - 1) * (c - 1) / (n - 1), F.lit(0.0)
    )
    rc = r - (r - 1) * (r - 1) / (n - 1)
    cc = c - (c - 1) * (c - 1) / (n - 1)
    return agg.select(
        F.round(F.col("chi2"), 6).cast("double").alias("chi_square"),
        n.cast("bigint").alias("n"),
        r.cast("int").alias("n_rows"),
        c.cast("int").alias("n_cols"),
        F.round(F.sqrt(phi2 / F.least(r - 1, c - 1)), 6)
        .cast("double")
        .alias("cramers_v"),
        F.round(F.sqrt(phi2c / F.least(rc - 1, cc - 1)), 6)
        .cast("double")
        .alias("cramers_v_corrected"),
    )
