"""Deterministic sketches: KMV (k-minimum-values) distinct counting
and sketch-merge set estimation.

Spark's built-in ``approx_count_distinct`` (HyperLogLog++) is
engine-specific — no cross-engine value oracle is possible
(``approx_aggregates`` carries a rows-only check for it). KMV closes
that gap: the sketch is the k smallest DISTINCT md5-derived hashes,
a pure deterministic function of the data, identical on any engine —
so the estimates themselves are oracle-checked to the last bit.

Estimator: with hashes uniform on [0, M) and h_k the k-th smallest
distinct hash, distinct-count ~= (k-1) * M / h_k (the classic KMV /
bottom-k estimator). Error ~ 1/sqrt(k-2) (~6% at k=256).

Scale shape: the per-group sketch is a bounded top-k — Spark plans the
row_number window with WindowGroupLimit (partial top-k BEFORE the
shuffle), so the exchange carries at most groups x k rows, never the
corpus; merging sketches (set union/intersection estimation) unions
two bounded sketches and re-truncates — O(k), the way sketch stores
merge shards at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.functions import hashing as H
from kinesis_analytics_demo_spark.plans.registry import register
from kinesis_analytics_demo_spark.session import read_table as _t

KMV_K = 256
HASH_SPACE = 1 << 60  # md5_long draws 60 bits


@register(
    "approx_distinct_kmv",
    oracle=f"""
    WITH h AS (
        SELECT DISTINCT l_returnflag,
               {H.sql_md5_long('l_partkey::VARCHAR')} AS h
        FROM lineitem
    ),
    ranked AS (
        SELECT l_returnflag, h,
               row_number() OVER (PARTITION BY l_returnflag ORDER BY h)
                   AS rn
        FROM h
    )
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS sketch_size,
           max(h) AS kth_min_hash,
           CASE WHEN count(*) < {KMV_K}
                THEN CAST(count(*) AS DOUBLE)
                ELSE CAST(ROUND(({KMV_K} - 1) * {HASH_SPACE}.0 / max(h), 4)
                          AS DOUBLE)
           END AS approx_distinct
    FROM ranked
    WHERE rn <= {KMV_K}
    GROUP BY l_returnflag
    """,
    doc="KMV (bottom-k) distinct-count estimation, fully "
    "deterministic: sketch = the k=256 smallest distinct 60-bit md5 "
    "hashes per group, estimate = (k-1)*M/h_k. Unlike HLL the result "
    "is a pure function of the data, so the ESTIMATE itself is "
    "oracle-checked bit-for-bit. WindowGroupLimit keeps the top-k "
    "partial before the shuffle: the exchange carries groups x k "
    "rows, never the corpus.",
)
def approx_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    h = li.select(
        "l_returnflag",
        H.md5_long(F.col("l_partkey").cast("string")).alias("h"),
    ).distinct()
    w = Window.partitionBy("l_returnflag").orderBy("h")
    return (
        h.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("sketch_size"),
            F.max("h").alias("kth_min_hash"),
            # a sketch that never filled holds the COMPLETE distinct
            # set — return it exactly; the (k-1)*M/h_k estimator badly
            # overestimates a partial sketch (ADVICE r2 item 2).
            F.when(
                F.count(F.lit(1)) < KMV_K,
                F.count(F.lit(1)).cast("double"),
            )
            .otherwise(
                F.round(
                    (KMV_K - 1) * float(HASH_SPACE) / F.max("h"), 4
                ).cast("double")
            )
            .alias("approx_distinct"),
        )
    )


@register(
    "kmv_source_overlap",
    oracle=f"""
    WITH h AS (
        SELECT DISTINCT source, {H.sql_md5_long('text')} AS h
        FROM documents
    ),
    ranked AS (
        SELECT source, h,
               row_number() OVER (PARTITION BY source ORDER BY h) AS rn
        FROM h
    ),
    sk AS (SELECT source, h FROM ranked WHERE rn <= {KMV_K}),
    pairs AS (
        SELECT a.source AS source_a, b.source AS source_b, a.h, 'a' AS side
        FROM sk a JOIN (SELECT DISTINCT source FROM sk) b
          ON a.source < b.source
        UNION ALL
        SELECT a.source AS source_a, b.source AS source_b, b.h, 'b' AS side
        FROM (SELECT DISTINCT source FROM sk) a JOIN sk b
          ON a.source < b.source
    ),
    merged AS (
        SELECT source_a, source_b, h,
               count(DISTINCT side) AS n_sides,
               row_number() OVER (PARTITION BY source_a, source_b
                                  ORDER BY h) AS rn
        FROM pairs
        GROUP BY source_a, source_b, h
    )
    SELECT source_a, source_b,
           CAST(count(*) AS BIGINT) AS union_sketch_size,
           CAST(sum(CASE WHEN n_sides = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_common_in_sketch
    FROM merged
    WHERE rn <= {KMV_K}
    GROUP BY source_a, source_b
    """,
    doc="Sketch MERGE: per-source KMV sketches of document-text hashes "
    "unioned pairwise and re-truncated to k — n_common_in_sketch / k "
    "estimates the Jaccard overlap between sources (cross-source "
    "contamination signal). All O(sources^2 x k) work happens on "
    "bounded sketches, never the corpus.",
)
def kmv_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    h = docs.select(
        "source", H.md5_long(F.col("text")).alias("h")
    ).distinct()
    w = Window.partitionBy("source").orderBy("h")
    sk = (
        h.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= KMV_K)
        .select("source", "h")
    )
    # sources x k rows; persisted because the pair construction below
    # reads it three times (srcs, left, right) and each unpersisted
    # read would repeat the corpus-wide distinct + top-k window.
    # Tracked so harness code can release it after the final action
    # (ADVICE r2 item 3).
    from kinesis_analytics_demo_spark.caching import tracked_persist

    sk = tracked_persist(sk)
    srcs = sk.select("source").distinct()
    a = sk.alias("a")
    b = sk.alias("b")
    left = a.join(
        F.broadcast(srcs.alias("sb")), F.col("a.source") < F.col("sb.source")
    ).select(
        F.col("a.source").alias("source_a"),
        F.col("sb.source").alias("source_b"),
        F.col("a.h").alias("h"),
        F.lit("a").alias("side"),
    )
    right = b.join(
        F.broadcast(srcs.alias("sa")), F.col("sa.source") < F.col("b.source")
    ).select(
        F.col("sa.source").alias("source_a"),
        F.col("b.source").alias("source_b"),
        F.col("b.h").alias("h"),
        F.lit("b").alias("side"),
    )
    merged = (
        left.unionByName(right)
        .groupBy("source_a", "source_b", "h")
        .agg(F.count_distinct("side").alias("n_sides"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("source_a", "source_b").orderBy("h")
            ),
        )
        .filter(F.col("rn") <= KMV_K)
    )
    return merged.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("union_sketch_size"),
        F.sum(F.when(F.col("n_sides") == 2, 1).otherwise(0)).alias(
            "n_common_in_sketch"
        ),
    )


# ------------------------------------------------- histogram quantiles
N_BINS = 256
QUANTILES = [0.5, 0.9, 0.99]


_QH_ORACLE = f"""
    WITH stats AS (
        SELECT min(value) AS mn, max(value) AS mx,
               (max(value) - min(value)) / {N_BINS} AS w
        FROM events),
    binned AS (
        SELECT event_type,
               CAST(CASE WHEN stats.w = 0 THEN 0
                         ELSE least(floor((value - stats.mn) / stats.w),
                                    {N_BINS - 1}) END AS BIGINT) AS bin
        FROM events, stats),
    hist AS (
        SELECT event_type, bin, count(*) AS cnt
        FROM binned GROUP BY 1, 2),
    cum AS (
        SELECT event_type, bin, cnt,
               SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS c,
               SUM(cnt) OVER (PARTITION BY event_type) AS n
        FROM hist),
    qs AS (SELECT unnest([{", ".join(f"CAST({q} AS DOUBLE)" for q in QUANTILES)}]) AS q),
    hit AS (
        SELECT cum.event_type, qs.q, cum.bin, cum.cnt,
               cum.c - cum.cnt AS cb, cum.n
        FROM cum, qs
        WHERE (cum.c - cum.cnt) < qs.q * cum.n
          AND qs.q * cum.n <= cum.c)
    SELECT hit.event_type, hit.q,
           CAST(hit.n AS BIGINT) AS n,
           ROUND(stats.mn
                 + (hit.bin + (hit.q * hit.n - hit.cb) / hit.cnt)
                   * stats.w, 6) AS estimate
    FROM hit, stats
    """


def histogram_bin_counts(
    ev: DataFrame, mn: float | None = None, mx: float | None = None
) -> DataFrame:
    """(event_type, mn, w, bin, cnt) — the mergeable sketch: a plain
    count aggregate, legal in STREAMING (complete/update) as well as
    batch; partials merge by integer addition.

    Batch derives the bin bounds from the data in the same plan; a
    STREAMING caller must pass calibrated ``mn``/``mx`` (two scalars
    from history — a second aggregation over the stream itself is
    not expressible), the standard stream-the-sketch calibration."""
    if mn is not None and mx is not None:
        stats = ev.sparkSession.range(1).select(
            F.lit(float(mn)).alias("mn"),
            F.lit(float(mx)).alias("mx"),
            F.lit((float(mx) - float(mn)) / N_BINS).alias("w"),
        )
    else:
        stats = ev.agg(
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
            ((F.max("value") - F.min("value")) / N_BINS).alias("w"),
        )
    # w == 0 guard: a degenerate range (all values equal, OR a span so
    # small that (mx-mn)/N_BINS underflows to 0.0 — hypothesis found
    # [0,0,0,0,5e-324]) must put every row in bin 0, not divide by
    # zero (Spark ANSI errors; DuckDB would silently yield inf->255).
    binned = ev.crossJoin(F.broadcast(stats)).select(
        "event_type",
        "mn",
        "w",
        F.when(F.col("w") == 0.0, F.lit(0))
        .otherwise(
            F.least(
                F.floor((F.col("value") - F.col("mn")) / F.col("w")),
                F.lit(N_BINS - 1),
            )
        )
        .cast("bigint")
        .alias("bin"),
    )
    return binned.groupBy("event_type", "mn", "w", "bin").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def quantiles_from_histogram(hist: DataFrame) -> DataFrame:
    """Finalize p50/p90/p99 from a (event_type, mn, w, bin, cnt)
    sketch — a tiny keys x bins batch computation, the downstream
    step of the stream-the-sketch pattern."""
    wc = Window.partitionBy("event_type").orderBy("bin")
    wn = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "mn",
        "w",
        "bin",
        "cnt",
        F.sum("cnt").over(wc).alias("c"),
        F.sum("cnt").over(wn).alias("n"),
    )
    qs = F.array(*[F.lit(q) for q in QUANTILES])
    hit = cum.select("*", F.explode(qs).alias("q")).filter(
        ((F.col("c") - F.col("cnt")) < F.col("q") * F.col("n"))
        & (F.col("q") * F.col("n") <= F.col("c"))
    )
    est = F.col("mn") + (
        F.col("bin")
        + (F.col("q") * F.col("n") - (F.col("c") - F.col("cnt"))) / F.col("cnt")
    ) * F.col("w")
    return hit.select(
        "event_type",
        "q",
        F.col("n").cast("bigint").alias("n"),
        F.round(est, 6).alias("estimate"),
    )


@register(
    "quantile_histogram_events",
    oracle=_QH_ORACLE,
    doc=f"Streaming-friendly quantile estimation: a fixed {N_BINS}-"
    "uniform-bin histogram between broadcast global min/max, linear "
    "interpolation inside the crossing bin for p50/p90/p99 per "
    "event_type. THE scale alternative to exact percentiles: exact "
    "needs a per-key sort of all values; this shuffles only keys x "
    f"{N_BINS} integer rows and is mergeable across shards/batches. "
    "Guarantee: the estimate lies within one bin width of the "
    "CROSSING ORDER STATISTIC (k-th smallest, k = ceil(q*n)) — "
    "property-checked on random distributions in "
    "tests/test_properties.py; on dense data it also tracks "
    "quantile_cont within a bin (tests/test_sketches_quantile.py). "
    "All arithmetic is integer counts plus a fixed chain of double "
    "ops — engine-exact.",
)
def quantile_histogram_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return quantiles_from_histogram(histogram_bin_counts(ev))


# ------------------------------------- join-size estimation (sampled)
JS_SAMPLE_MOD = 8  #: key-sample rate 1/8 via md5(key) % 8 == 0


@register(
    "join_size_estimate_sampled",
    oracle=f"""
    WITH fa AS (SELECT user_id AS k, count(*) AS na FROM events GROUP BY 1),
    fb AS (SELECT o_custkey AS k, count(*) AS nb FROM orders GROUP BY 1),
    j AS (
        SELECT fa.k, na, nb,
               {H.sql_md5_long('fa.k::VARCHAR')} % {JS_SAMPLE_MOD} = 0 AS samp
        FROM fa JOIN fb ON fa.k = fb.k)
    SELECT CAST((SELECT count(*) FROM fa) AS BIGINT) AS n_keys_a,
           CAST((SELECT count(*) FROM fb) AS BIGINT) AS n_keys_b,
           CAST(count(*) AS BIGINT) AS n_keys_joined,
           CAST(count_if(samp) AS BIGINT) AS n_keys_sampled,
           CAST(SUM(na * nb) AS BIGINT) AS true_join_rows,
           CAST({JS_SAMPLE_MOD} * COALESCE(SUM(CASE WHEN samp THEN na * nb END), 0)
                AS BIGINT) AS est_join_rows,
           -- '+ 0.0' normalizes IEEE -0.0 (estimate just under truth
           -- rounds to zero from below: DuckDB keeps -0.0, Spark
           -- does not, and the driver hash is repr-sensitive)
           CAST(ROUND(100.0 * ({JS_SAMPLE_MOD} *
                COALESCE(SUM(CASE WHEN samp THEN na * nb END), 0)
                - SUM(na * nb)) / SUM(na * nb), 6) AS DOUBLE) + 0.0
                AS err_pct
    FROM j
    """,
    doc="Sketch-based join cardinality estimation: |events JOIN "
    "orders ON user_id = o_custkey| = sum over shared keys of "
    "f_a(k)*f_b(k), estimated from a deterministic 1/8 KEY sample "
    "(include k iff md5(k) %% 8 == 0 — correlated sampling: BOTH "
    "sides keep the same keys, the property uniform row-sampling "
    "lacks and the reason row samples estimate joins so badly). "
    "Reported next to the exact count and the signed relative "
    "error. Estimator is integer-exact (scale-up by 8, no float "
    "accumulation). At 100 TB only the sampled branch runs: the "
    "key-hash filter pushes BELOW each side's frequency aggregate, "
    "so the optimizer's estimate touches 1/8 of the key space "
    "end-to-end (this audit computes the true value too, to report "
    "err_pct). The classic end-biased/correlated-sampling join "
    "estimator (Vitter/Ganguly lineage), md5-keyed like every other "
    "deterministic sketch in this module.",
)
def join_size_estimate_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    od = _t(spark, sf_dir, "orders")
    fa = ev.groupBy(F.col("user_id").alias("k")).agg(
        F.count(F.lit(1)).alias("na")
    )
    fb = od.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).alias("nb")
    )
    samp = (
        H.md5_long(F.col("k").cast("string")) % JS_SAMPLE_MOD == 0
    ).alias("samp")
    j = fa.join(fb, "k").select("k", "na", "nb", samp)
    prod = F.col("na") * F.col("nb")
    agg = j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys_joined"),
        F.count_if("samp").cast("bigint").alias("n_keys_sampled"),
        F.sum(prod).cast("bigint").alias("true_join_rows"),
        (
            F.lit(JS_SAMPLE_MOD)
            * F.coalesce(F.sum(F.when(F.col("samp"), prod)), F.lit(0))
        )
        .cast("bigint")
        .alias("est_join_rows"),
    ).withColumn(
        "err_pct",
        F.round(
            100.0
            * (F.col("est_join_rows") - F.col("true_join_rows"))
            / F.col("true_join_rows"),
            6,
        ).cast("double")
        + F.lit(0.0),
    )
    na_tot = fa.agg(F.count(F.lit(1)).cast("bigint").alias("n_keys_a"))
    nb_tot = fb.agg(F.count(F.lit(1)).cast("bigint").alias("n_keys_b"))
    return (
        agg.crossJoin(F.broadcast(na_tot))
        .crossJoin(F.broadcast(nb_tot))
        .select(
            "n_keys_a", "n_keys_b", "n_keys_joined", "n_keys_sampled",
            "true_join_rows", "est_join_rows", "err_pct",
        )
    )
