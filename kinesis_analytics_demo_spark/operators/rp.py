"""Johnson-Lindenstrauss random projection over the ``embeddings``
table: 64 -> 48 dims with a deterministic md5-seeded sign matrix,
plus the production search pattern built on it — coarse top-C in the
projected space, exact re-rank of the shortlist.

Rademacher (+-1) projections satisfy JL: with ``k = 48`` output dims
the pairwise cosines are preserved to ~1/sqrt(k), so the projected
space is good enough to FIND candidates but not to rank them — hence
the rerank stage. This mirrors the IVF-PQ composition
(``similarity_ivfpq_adc_rerank``) one rung simpler: no codebooks to
train, just a fixed sign matrix every executor derives locally.

Scale: the projection is a zero-shuffle scan (48 codegen'd dot
products per row) cutting the bytes the search stage scans by 25%;
the candidate stage is the same broadcast-queries brute-force shape
as ``similarity_cosine_topk`` but over narrower vectors; the exact
rerank touches only ``SHORTLIST`` rows per query. On an easier (real)
embedding distribution a harder projection (64->16) buys more — the
48/100 setting is tuned for this deliberately near-random corpus.

Determinism: the sign matrix is a compile-time constant derived from
md5 (same literals land in both engines' plans — the proven
``_plane_weight`` pattern from the LSH family); all folds run
left-to-right over fixed indices.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.functions import vectors as V
from kinesis_analytics_demo_spark.plans.registry import register
from kinesis_analytics_demo_spark.session import read_table as _t

DIM = 64
RP_DIM = 48
N_QUERIES = 10  # query set: vec_id < 10, matching the similarity family
TOP_K = 10
SHORTLIST = 100  #: candidates per query from the projected space

_INV = 1.0 / math.sqrt(RP_DIM)


def _sign(j: int, i: int) -> int:
    h = hashlib.md5(f"rp{j}_{i}".encode()).hexdigest()
    return 1 if int(h[:8], 16) % 2 == 0 else -1


SIGNS: list[list[int]] = [
    [_sign(j, i) for i in range(DIM)] for j in range(RP_DIM)
]


def _project(emb_col) -> F.Column:
    """array<double> of the RP_DIM projections (constant sign matrix,
    left-to-right fold per output dim)."""
    outs = []
    for j in range(RP_DIM):
        w = F.array(*[F.lit(float(s)) for s in SIGNS[j]])
        outs.append(V.dot(emb_col, w) * F.lit(_INV))
    return F.array(*outs)


def _sql_project(emb: str) -> str:
    outs = []
    for j in range(RP_DIM):
        wlist = "[" + ", ".join(f"{s}.0" for s in SIGNS[j]) + "]"
        outs.append(
            f"(list_sum([CAST({emb}[i] AS DOUBLE) * ({wlist})[i] "
            f"for i in generate_series(1, {DIM})]) * {_INV!r})"
        )
    return "[" + ", ".join(outs) + "]"


@register(
    "embedding_random_projection",
    oracle=f"""
    WITH rp AS (SELECT vec_id, {_sql_project('embedding')} AS xp
                FROM embeddings)
    SELECT vec_id, i - 1 AS rp_dim, ROUND(xp[i], 6) AS val
    FROM rp, (SELECT unnest(generate_series(1, {RP_DIM})) AS i) t
    """,
    doc="JL random projection 64->48 dims with a deterministic "
    "Rademacher sign matrix (md5-seeded compile-time constant): "
    "zero-shuffle scan, 48 codegen dot products per row, cuts "
    "downstream scan bytes 25% while preserving pairwise cosines to "
    "~1/sqrt(48). Emitted as (vec_id, rp_dim, val) rows.",
)
def embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    proj = emb.select("vec_id", _project(F.col("embedding")).alias("xp"))
    return proj.select(
        "vec_id", F.posexplode("xp").alias("rp_dim", "v")
    ).select("vec_id", "rp_dim", F.round("v", 6).alias("val"))


_SQL_RP_CTES = f"""
    rp AS (SELECT vec_id, {_sql_project('embedding')} AS xp
           FROM embeddings),
    q AS (SELECT vec_id AS query_id, xp AS qp FROM rp
          WHERE vec_id < {N_QUERIES}),
    cand AS (
        SELECT q.query_id, r.vec_id AS neighbor_id,
               row_number() OVER (
                   PARTITION BY q.query_id
                   ORDER BY {V.sql_cosine('r.xp', 'q.qp', RP_DIM)} DESC,
                            r.vec_id) AS crank
        FROM rp r, q
        WHERE r.vec_id != q.query_id),
    short AS (SELECT query_id, neighbor_id FROM cand
              WHERE crank <= {SHORTLIST})
"""


@register(
    "similarity_rp_topk_rerank",
    oracle=f"""
    WITH {_SQL_RP_CTES},
    exact AS (
        SELECT s.query_id, s.neighbor_id,
               {V.sql_cosine('e.embedding', 'qe.embedding', DIM)} AS sim
        FROM short s
        JOIN embeddings e ON e.vec_id = s.neighbor_id
        JOIN embeddings qe ON qe.vec_id = s.query_id),
    ranked AS (
        SELECT query_id, neighbor_id, sim,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rank
        FROM exact)
    SELECT query_id, neighbor_id, sim, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
    doc="RP-filtered ANN: top-100 candidates by cosine in the 48-dim "
    "projected space, exact 64-dim cosine re-rank to top-10 — the "
    "codebook-free coarse-filter + rerank composition. Recall@10 "
    "0.86 on this deliberately near-random corpus (pinned in "
    "tests/test_rp.py); the exact stage touches only 100 rows per "
    "query.",
)
def similarity_rp_topk_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    rp = emb.select(
        "vec_id", "embedding", _project(F.col("embedding")).alias("xp")
    )
    q = rp.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("xp").alias("qp"),
        F.col("embedding").alias("qe"),
    )
    cw = Window.partitionBy("query_id").orderBy(
        F.desc("psim"), F.col("neighbor_id")
    )
    short = (
        rp.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            V.cosine(F.col("xp"), F.col("qp")).alias("psim"),
            "embedding",
            "qe",
        )
        .withColumn("crank", F.row_number().over(cw))
        .filter(F.col("crank") <= SHORTLIST)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.col("neighbor_id"))
    return (
        short.select(
            "query_id",
            "neighbor_id",
            V.cosine(F.col("embedding"), F.col("qe")).alias("sim"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "sim", F.col("rank").cast("int"))
    )


@register(
    "embedding_covariance_upper",
    oracle=f"""
    WITH base AS (
        SELECT vec_id, i,
               CAST(round(CAST(embedding[i] AS DOUBLE), 6)
                    AS DECIMAL(18,6)) AS q
        FROM embeddings, generate_series(1, {DIM}) AS t(i)),
    s AS (SELECT i, sum(q) AS si, count(*) AS n FROM base GROUP BY i),
    p AS (SELECT a.i AS i, b.i AS j, sum(a.q * b.q) AS sij
          FROM base a JOIN base b
            ON a.vec_id = b.vec_id AND b.i >= a.i
          GROUP BY 1, 2)
    SELECT CAST(p.i AS INT) AS i, CAST(p.j AS INT) AS j,
           CAST(sa.n AS BIGINT) AS n,
           -- + 0.0 normalizes IEEE negative zero (DuckDB's ROUND can
           -- yield -0.0 where Spark yields 0.0 — repr-sensitive hashes
           -- diverge on a value that compares equal)
           ROUND((sa.n * CAST(p.sij AS DOUBLE)
                  - CAST(sa.si AS DOUBLE) * CAST(sb.si AS DOUBLE))
                 / sa.n / (sa.n - 1), 6) + 0.0 AS cov
    FROM p JOIN s sa ON sa.i = p.i JOIN s sb ON sb.i = p.j
    """,
    doc="Empirical covariance matrix of the embedding dimensions "
    "(upper triangle, d(d+1)/2 = 2080 entries at d=64) — the PCA "
    "prep that feeds whitening / OPQ rotation ahead of the PQ/SQ "
    "compression ladder. Components quantized to 6 digits then "
    "summed in exact DECIMAL (the embedding_outliers_centroid "
    "discipline, order-free), cross-moments from one posexplode + "
    "vec_id-local self-join that map-side-combines to d^2 groups — "
    "the corpus shuffles d(d+1)/2 partial sums per partition, never "
    "rows. Mean products follow the Welch double-cast rule (never "
    "square a wide decimal).",
)
def embedding_covariance_upper(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id",
        F.posexplode(
            F.transform(
                "embedding",
                lambda x: F.round(x.cast("double"), 6).cast("decimal(18,6)"),
            )
        ).alias("i0", "q"),
    ).select("vec_id", (F.col("i0") + 1).alias("i"), "q")
    s = base.groupBy("i").agg(
        F.sum("q").alias("si"), F.count(F.lit(1)).alias("n")
    )
    a = base.select("vec_id", F.col("i").alias("i"), F.col("q").alias("qa"))
    b = base.select("vec_id", F.col("i").alias("j"), F.col("q").alias("qb"))
    p = (
        a.join(b, "vec_id")
        .filter(F.col("j") >= F.col("i"))
        .groupBy("i", "j")
        .agg(F.sum(F.col("qa") * F.col("qb")).alias("sij"))
    )
    sa = s.select(F.col("i"), F.col("si").alias("sia"), "n")
    sb = s.select(F.col("i").alias("j"), F.col("si").alias("sib"))
    return (
        p.join(F.broadcast(sa), "i")
        .join(F.broadcast(sb), "j")
        .select(
            F.col("i").cast("int"),
            F.col("j").cast("int"),
            F.col("n").cast("bigint"),
            (
                F.round(
                    (
                        F.col("n") * F.col("sij").cast("double")
                        - F.col("sia").cast("double")
                        * F.col("sib").cast("double")
                    )
                    / F.col("n")
                    / (F.col("n") - 1),
                    6,
                )
                + 0.0
            ).alias("cov"),
        )
    )
