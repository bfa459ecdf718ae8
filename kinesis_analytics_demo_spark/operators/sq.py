"""Scalar quantization (SQ8) over the ``embeddings`` table: per-
dimension int8 codes, a reconstruction-error audit, and approximate
top-k search over dequantized vectors — the simplest vector-
compression path (FAISS ``SQ8``, Milvus/ES "int8 scalar
quantization"), complementing the PQ family in ``operators/pq.py``.

Per-dimension min/max over the corpus define an affine grid:
``code_i = round((x_i - min_i) / (max_i - min_i) * 255)`` (0 when the
dimension is constant), ``x̂_i = min_i + code_i/255 * (max_i -
min_i)``. The stats are ONE aggregate row (128 min/max expressions,
map-side combined — no explode, no shuffle of vector rows) broadcast
back to the corpus scan.

Scale story: codes are 64 bytes/vector vs 256 for float32 — a 4x scan
shrink with far better fidelity than PQ's 32x, the standard first rung
on the compression ladder. Quantize + search stay one corpus scan;
nothing but the 1-row stats table moves.

Determinism: quantize/dequantize are per-element IEEE-754 double ops
(identical on both engines — round() is half-away-from-zero for the
non-negative grid positions on both); the search dot products fold
left-to-right over fixed indices (the verified ``sql_dot`` pattern);
the error aggregate sums in DECIMAL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.functions import vectors as V
from kinesis_analytics_demo_spark.plans.registry import register
from kinesis_analytics_demo_spark.session import read_table as _t

DIM = 64
LEVELS = 255
N_QUERIES = 10  # query set: vec_id < 10, matching the similarity family
TOP_K = 10

#: DuckDB: one-row per-dimension min/max lists (ORDER BY i pins order)
_SQL_STATS = f"""
    stats AS (
        SELECT i,
               min(CAST(embedding[i] AS DOUBLE)) AS mn,
               max(CAST(embedding[i] AS DOUBLE)) AS mx
        FROM embeddings, (SELECT unnest(generate_series(1, {DIM})) AS i) t
        GROUP BY i),
    sl AS (
        SELECT list(mn ORDER BY i) AS mns,
               list(mx - mn ORDER BY i) AS spans
        FROM stats)
"""

#: DuckDB: dequantized corpus (xh = reconstructed vector list)
_SQL_DEQ = f"""
    deq AS (
        SELECT vec_id, label,
               [CASE WHEN spans[i] = 0 THEN mns[i]
                     ELSE mns[i]
                          + ROUND((CAST(embedding[i] AS DOUBLE) - mns[i])
                                  / spans[i] * {LEVELS}) / {LEVELS} * spans[i]
                END
                for i in generate_series(1, {DIM})] AS xh
        FROM embeddings, sl)
"""


def _stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: (mns array<double>, spans array<double>)."""
    emb = _t(spark, sf_dir, "embeddings")
    x = lambda i: F.element_at("embedding", i).cast("double")  # noqa: E731
    return emb.agg(
        F.array(*[F.min(x(i)) for i in range(1, DIM + 1)]).alias("mns"),
        F.array(
            *[(F.max(x(i)) - F.min(x(i))) for i in range(1, DIM + 1)]
        ).alias("spans"),
    )


def _dequantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, label, xh array<double>) — quantize-then-reconstruct,
    one corpus scan with the 1-row stats broadcast in."""
    emb = _t(spark, sf_dir, "embeddings")
    stats = _stats(spark, sf_dir)
    mn = lambda i: F.element_at("mns", i + 1)  # noqa: E731 (0-based lambda idx)
    span = lambda i: F.element_at("spans", i + 1)  # noqa: E731
    xh = F.transform(
        "embedding",
        lambda x, i: F.when(span(i) == 0, mn(i)).otherwise(
            mn(i)
            + F.round((x.cast("double") - mn(i)) / span(i) * LEVELS)
            / LEVELS
            * span(i)
        ),
    )
    return emb.crossJoin(F.broadcast(stats)).select(
        "vec_id", "label", xh.alias("xh")
    )


@register(
    "embedding_sq8_error",
    oracle=f"""
    WITH {_SQL_STATS},
    {_SQL_DEQ},
    err AS (
        SELECT d.label,
               list_sum([(CAST(e.embedding[i] AS DOUBLE) - d.xh[i])
                         * (CAST(e.embedding[i] AS DOUBLE) - d.xh[i])
                         for i in generate_series(1, {DIM})]) AS sq
        FROM deq d JOIN embeddings e ON e.vec_id = d.vec_id)
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(ROUND(SUM(CAST(sq AS DECIMAL(18,9))), 6) AS DOUBLE)
               AS total_sq_err
    FROM err GROUP BY label
    """,
    doc="SQ8 reconstruction-error audit: per-label total squared "
    "error between original and dequantized vectors — the fidelity "
    "check that says whether 4x scalar compression suffices before "
    "reaching for PQ's 32x. One corpus scan + a 1-row broadcast "
    "stats table; the error sum runs in DECIMAL.",
)
def embedding_sq8_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    deq = _dequantized(spark, sf_dir)
    j = deq.join(emb.select("vec_id", "embedding"), "vec_id")
    sq = F.aggregate(
        F.zip_with(
            "embedding",
            "xh",
            lambda x, h: (x.cast("double") - h) * (x.cast("double") - h),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        j.select("label", sq.alias("sq"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.sum(F.col("sq").cast("decimal(18,9)")), 6)
            .cast("double")
            .alias("total_sq_err"),
        )
    )


@register(
    "similarity_sq8_topk",
    oracle=f"""
    WITH {_SQL_STATS},
    {_SQL_DEQ},
    q AS (SELECT vec_id AS query_id, embedding AS qv
          FROM embeddings WHERE vec_id < {N_QUERIES}),
    sims AS (
        SELECT q.query_id, d.vec_id AS neighbor_id,
               {V.sql_cosine('d.xh', 'q.qv', DIM)} AS sim
        FROM deq d, q
        WHERE d.vec_id != q.query_id),
    ranked AS (
        SELECT query_id, neighbor_id, sim,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rank
        FROM sims)
    SELECT query_id, neighbor_id, sim, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
    doc="Approximate cosine top-k over SQ8-dequantized corpus vectors "
    "(float queries, int8 corpus — the asymmetric search FAISS calls "
    "QT_8bit): same brute-force shape as similarity_cosine_topk but "
    "the corpus scan reads 4x fewer bytes at scale. Ties broken by "
    "neighbor id; dot products fold left-to-right, so rank order is "
    "engine-exact.",
)
def similarity_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    deq = _dequantized(spark, sf_dir)
    sims = (
        deq.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            V.cosine(F.col("xh"), F.col("qv")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.col("neighbor_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "sim", F.col("rank").cast("int"))
    )


@register(
    "embedding_drift_by_label",
    oracle=f"""
    WITH h AS (
        SELECT label, vec_id % 2 = 0 AS old_half, embedding
        FROM embeddings),
    cn AS (SELECT label, old_half, count(*) AS n
           FROM h GROUP BY label, old_half),
    dims AS (
        SELECT label, old_half, i,
               CAST(ROUND(SUM(CAST(ROUND(CAST(embedding[i] AS DOUBLE), 6)
                                   AS DECIMAL(18,6))), 6) AS DOUBLE)
                   / count(*) AS c
        FROM h, (SELECT unnest(generate_series(1, {DIM})) AS i) t
        GROUP BY label, old_half, i),
    cent AS (
        SELECT label, old_half, list(c ORDER BY i) AS c
        FROM dims GROUP BY label, old_half),
    p AS (
        SELECT a.label,
               list_sum([(a.c[i] - b.c[i]) * (a.c[i] - b.c[i])
                         for i in generate_series(1, {DIM})]) AS d2
        FROM cent a JOIN cent b
          ON a.label = b.label AND a.old_half AND NOT b.old_half)
    SELECT p.label,
           CAST(na.n AS BIGINT) AS n_old,
           CAST(nb.n AS BIGINT) AS n_new,
           ROUND(sqrt(p.d2), 6) AS centroid_l2_drift
    FROM p
    JOIN cn na ON na.label = p.label AND na.old_half
    JOIN cn nb ON nb.label = p.label AND NOT nb.old_half
    """,
    doc="Embedding drift monitor: per-label L2 distance between the "
    "centroids of two corpus halves (vec_id parity standing in for "
    "an old/new ingest split) — the embedding-space health number a "
    "retraining trigger watches. Centroid sums run in DECIMAL over "
    "6-digit-rounded components (order-free, the "
    "embedding_outliers_centroid discipline); the distance fold is "
    "left-to-right over fixed indices.",
)
def embedding_drift_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    h = emb.select(
        "label", (F.col("vec_id") % 2 == 0).alias("old_half"), "embedding"
    )
    comp = [
        (
            F.sum(
                F.round(F.element_at("embedding", i).cast("double"), 6).cast(
                    "decimal(18,6)"
                )
            )
        )
        for i in range(1, DIM + 1)
    ]
    cent = h.groupBy("label", "old_half").agg(
        F.array(
            *[
                (F.round(c, 6).cast("double") / F.count(F.lit(1)))
                for c in comp
            ]
        ).alias("c"),
        F.count(F.lit(1)).alias("n"),
    )
    a = cent.filter(F.col("old_half")).select(
        "label", F.col("c").alias("ca"), F.col("n").alias("n_old")
    )
    b = cent.filter(~F.col("old_half")).select(
        "label", F.col("c").alias("cb"), F.col("n").alias("n_new")
    )
    d2 = F.aggregate(
        F.zip_with("ca", "cb", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return a.join(b, "label").select(
        "label",
        F.col("n_old").cast("bigint").alias("n_old"),
        F.col("n_new").cast("bigint").alias("n_new"),
        F.round(F.sqrt(d2), 6).alias("centroid_l2_drift"),
    )
