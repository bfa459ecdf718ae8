"""Feature-engineering operators over ``events`` — the tabular-side
preparation a training pipeline does next to the text/dedup work:
outlier winsorization and per-entity feature vectors.

Scale notes (100 TB):

- ``winsorize_event_values`` is two passes: a per-key exact-percentile
  aggregate (5 keys -> a broadcast-sized bounds table) and a map-only
  clip+aggregate pass. Exact percentile sorts each key's values; at
  100 TB swap ``F.percentile`` for ``F.approx_percentile`` (KLL-style
  mergeable sketch, no sort) — the clip pass is unchanged. The bounds
  join is an explicit broadcast, so the event stream shuffles once
  (the final per-key aggregate), with map-side combine.
- ``user_feature_vector`` is ONE hash aggregate keyed by user_id:
  every feature (counts, pivoted per-type counts, recency bounds,
  decimal-exact sums) is a map-side-combinable aggregate, so the
  shuffle carries one partial row per (map partition, user). No
  windows, no joins, no second scan.

Determinism: clip bounds come from ``F.percentile`` == DuckDB
``quantile_cont`` (bit-identical, pinned by ``exact_percentiles``);
clipping is least/greatest selection (no float arithmetic); sums go
through DECIMAL(18,6) like every monetary aggregate in this repo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.plans.registry import register
from kinesis_analytics_demo_spark.session import read_table as _t

WINSOR_LO = 0.01
WINSOR_HI = 0.99

#: The five changelog event types, pivoted to fixed feature columns
#: (a dynamic pivot would make the output schema data-dependent).
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "winsorize_event_values",
    oracle=f"""
    WITH bounds AS (
        SELECT event_type,
               quantile_cont(value, {WINSOR_LO}) AS lo,
               quantile_cont(value, {WINSOR_HI}) AS hi
        FROM events GROUP BY event_type
    ),
    clipped AS (
        SELECT e.event_type,
               e.value,
               greatest(b.lo, least(b.hi, e.value)) AS cv,
               b.lo, b.hi
        FROM events e JOIN bounds b ON e.event_type = b.event_type
    )
    SELECT event_type,
           ROUND(lo, 6) AS p01,
           ROUND(hi, 6) AS p99,
           count(*) AS n,
           CAST(sum(CASE WHEN value < lo THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clipped_low,
           CAST(sum(CASE WHEN value > hi THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clipped_high,
           CAST(ROUND(SUM(CAST(cv AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS sum_winsorized
    FROM clipped
    GROUP BY event_type, lo, hi
    """,
    doc="Outlier winsorization: per-key exact p01/p99 bounds "
    "(F.percentile == quantile_cont bit-for-bit), values clipped by "
    "least/greatest selection (no float arithmetic), decimal-exact "
    "winsorized sum. Two passes: a 5-row broadcast bounds table, then "
    "a map-only clip feeding one combined aggregate. At 100 TB the "
    "exact percentile becomes approx_percentile (mergeable KLL "
    "sketch, no per-key sort); everything downstream is unchanged.",
)
def winsorize_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    bounds = ev.groupBy("event_type").agg(
        F.percentile("value", WINSOR_LO).alias("lo"),
        F.percentile("value", WINSOR_HI).alias("hi"),
    )
    cv = F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("value")))
    return (
        ev.join(F.broadcast(bounds), "event_type")
        .select(
            "event_type",
            "lo",
            "hi",
            "value",
            cv.cast("decimal(18,6)").alias("cv_dec"),
        )
        .groupBy("event_type", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("value") < F.col("lo"), 1).otherwise(0)
            ).alias("n_clipped_low"),
            F.sum(
                F.when(F.col("value") > F.col("hi"), 1).otherwise(0)
            ).alias("n_clipped_high"),
            F.round(F.sum("cv_dec"), 2).cast("double").alias("sum_winsorized"),
        )
        .select(
            "event_type",
            F.round("lo", 6).alias("p01"),
            F.round("hi", 6).alias("p99"),
            "n",
            "n_clipped_low",
            "n_clipped_high",
            "sum_winsorized",
        )
    )


def _sql_type_counts() -> str:
    return ",\n           ".join(
        f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS n_{t}"
        for t in EVENT_TYPES
    )


@register(
    "user_feature_vector",
    oracle=f"""
    SELECT user_id,
           count(*) AS n_events,
           min(ts) AS first_ts,
           max(ts) AS last_ts,
           {_sql_type_counts()},
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
               AS total_value,
           count(DISTINCT CAST(ts AS DATE)) AS n_active_days
    FROM events
    GROUP BY user_id
    """,
    doc="Per-entity feature vector (the RFM-style tabular features a "
    "training pipeline joins onto its examples): event counts, "
    "first/last activity, per-type counts pivoted to FIXED columns "
    "(schema independent of the data), decimal-exact value total, "
    "active-day count. One hash-aggregate chain keyed by user_id — "
    "no windows, no joins. The exact count(DISTINCT day) makes it the "
    "planner's two-phase distinct aggregate (partial on (user_id, "
    "day), final on user_id: two exchanges, both map-side combined); "
    "swapping in approx_count_distinct collapses it to a single "
    "exchange when 2% day-count error is acceptable at 100 TB.",
)
def user_feature_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    type_counts = [
        F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"n_{t}")
        for t in EVENT_TYPES
    ]
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        *type_counts,
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("total_value"),
        F.count_distinct(F.col("ts").cast("date")).alias("n_active_days"),
    )


# ------------------------------------- embedding-space quality audit
EMB_DIM = 64
OUTLIERS_PER_LABEL = 3


@register(
    "embedding_outliers_centroid",
    oracle=f"""
    WITH ex AS (
        SELECT vec_id, label, dim, embedding[dim] AS v
        FROM embeddings CROSS JOIN generate_series(1, {EMB_DIM}) t(dim)
    ),
    sums AS (
        SELECT label, dim,
               SUM(CAST(v AS DECIMAL(24,10))) AS s,
               count(*) AS n
        FROM ex GROUP BY label, dim
    ),
    cent AS (
        SELECT label, list(CAST(s AS DOUBLE) / n ORDER BY dim) AS cv
        FROM sums GROUP BY label
    ),
    d AS (
        SELECT e.vec_id, e.label,
               list_sum([(CAST(e.embedding[i] AS DOUBLE) - c.cv[i])
                         * (CAST(e.embedding[i] AS DOUBLE) - c.cv[i])
                         for i in generate_series(1, {EMB_DIM})]) AS dist2
        FROM embeddings e JOIN cent c ON e.label = c.label
    ),
    r AS (
        SELECT vec_id, label, dist2,
               row_number() OVER (PARTITION BY label
                                  ORDER BY dist2 DESC, vec_id) AS outlier_rank
        FROM d
    )
    SELECT vec_id, label, ROUND(dist2, 6) AS dist2, outlier_rank
    FROM r WHERE outlier_rank <= {OUTLIERS_PER_LABEL}
    """,
    doc="Embedding-space quality audit: squared L2 distance of every "
    "vector to its label's centroid; the top-3 farthest per label are "
    "the mislabeled/corrupt-vector candidates a curation pipeline "
    "reviews. Centroids are DECIMAL-exact per-dimension sums (float "
    "summation order can never leak in), divided to double once; "
    "distances accumulate left-to-right over fixed array indices "
    "(the verified sql_dot pattern). Scale: the posexplode stream "
    "combines map-side to labels x 64 decimal partials, centroids "
    "broadcast back, the distance pass is one scan, and the per-label "
    "top-k plans as WindowGroupLimit — no global sort, no N^2.",
)
def embedding_outliers_centroid(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    ex = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("dim0", "v")
    )
    sums = ex.groupBy("label", "dim0").agg(
        F.sum(F.col("v").cast("decimal(24,10)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    cent = (
        sums.select(
            "label",
            F.struct("dim0", (F.col("s").cast("double") / F.col("n")).alias("c")).alias(
                "dc"
            ),
        )
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list("dc")), lambda x: x["c"]
            ).alias("cv")
        )
    )
    diff2 = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("cv"),
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    d = emb.join(F.broadcast(cent), "label").select(
        "vec_id", "label", diff2.alias("dist2")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("label").orderBy(F.desc("dist2"), F.asc("vec_id"))
    return (
        d.withColumn("outlier_rank", F.row_number().over(w))
        .filter(F.col("outlier_rank") <= OUTLIERS_PER_LABEL)
        .select(
            "vec_id", "label", F.round("dist2", 6).alias("dist2"), "outlier_rank"
        )
    )


# ---------------------------------------- quantile normalization
QN_BUCKETS = 20  #: equi-depth buckets for the global reference
#: bucket fractions as Python doubles — repr'd into the oracle so both
#: engines interpolate at bit-identical points
QN_FRACTIONS = [k / QN_BUCKETS for k in range(QN_BUCKETS)]


@register(
    "quantile_normalize_sources",
    oracle=f"""
    WITH qs AS (
        SELECT quantile_cont(n_chars, {QN_FRACTIONS!r}) AS q FROM documents),
    r AS (
        SELECT source, n_chars,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_chars, doc_id) AS rn,
               count(*) OVER (PARTITION BY source) AS ns
        FROM documents),
    m AS (
        SELECT source, n_chars,
               ((rn - 1) * {QN_BUCKETS}) // ns AS k
        FROM r),
    v AS (
        SELECT m.source, m.n_chars,
               CAST(ROUND(qs.q[m.k + 1], 6) AS DECIMAL(18,6)) AS nv
        FROM m, qs)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(ROUND(SUM(CAST(n_chars AS DECIMAL(18,6))) / count(*), 6)
                AS DOUBLE) AS mean_raw,
           CAST(ROUND(SUM(nv) / count(*), 6) AS DOUBLE) AS mean_norm
    FROM v GROUP BY source
    """,
    doc="Quantile normalization across sources (batch-effect "
    "correction): each document's n_chars is replaced by the GLOBAL "
    "equi-depth quantile at its within-source rank bucket — after "
    "normalization every source shares the global length "
    "distribution (the mean_norm column converges across sources "
    "while mean_raw differs). Rank windows are PER-SOURCE "
    "(partition-parallel — no global sort/row_number); the global "
    "reference is one 20-entry percentile aggregate, broadcast; the "
    "bucket map is integer arithmetic; means accumulate in exact "
    "DECIMAL over 6-digit-quantized normalized values, order-free. "
    "percentile() == quantile_cont bit-parity per "
    "exact_percentiles; interpolation points are repr'd Python "
    "doubles shared by both engines.",
)
def quantile_normalize_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    qs = docs.agg(
        F.percentile("n_chars", QN_FRACTIONS).alias("q")
    )
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    wc = Window.partitionBy("source")
    m = docs.select(
        "source",
        "n_chars",
        (
            ((F.row_number().over(w) - 1) * QN_BUCKETS)
            / F.count(F.lit(1)).over(wc)
        )
        .cast("long")
        .alias("k"),
    )
    v = m.crossJoin(F.broadcast(qs)).select(
        "source",
        "n_chars",
        F.round(F.element_at("q", (F.col("k") + 1).cast("int")), 6)
        .cast("decimal(18,6)")
        .alias("nv"),
    )
    return v.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(
            F.sum(F.col("n_chars").cast("decimal(18,6)"))
            / F.count(F.lit(1)),
            6,
        )
        .cast("double")
        .alias("mean_raw"),
        F.round(F.sum("nv") / F.count(F.lit(1)), 6)
        .cast("double")
        .alias("mean_norm"),
    )
