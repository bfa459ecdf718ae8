"""Similarity search over the ``embeddings`` table (vec_id BIGINT,
embedding ARRAY<FLOAT> dim=64, label INT) — BASELINE.json's
"similarity search" operator family.

Two paths, as SURVEY.md §7 step 5 prescribes:

- ``similarity_cosine_topk`` — brute-force exact top-k: every query
  vector against the whole corpus. Scale shape: Q broadcast query
  vectors x N corpus rows, dot products inside whole-stage codegen,
  then one shuffle of only the per-partition top-k survivors
  (window row_number over query_id). The baseline any ANN variant is
  measured against.

- ``similarity_ann_lsh`` (canonical, multi-table OR-construction) —
  12 independent 6-plane random-hyperplane tables with Hamming-1
  multiprobe; candidates are the union of collisions, then exact
  cosine re-rank. Recall@10 0.95 on this deliberately hard
  near-random corpus. The hyperplane weights are md5-derived
  integers — fixed, reproducible, embedded identically in the Spark
  plan and the oracle SQL. At 100 TB: #planes grows with corpus
  (buckets ~ N/target bucket size), bucketing is one cheap scan +
  equi-join shuffle on bucket id; recall is traded for never
  touching all N per query.

- ``similarity_ann_lsh_baseline`` — the single-table single-probe
  variant (4 planes, 16 buckets, recall@10 0.15 here): kept as the
  pedagogy/ablation baseline the multi-probe/multi-table variants
  are measured against. Not a production path — pick the canonical
  name for real answers.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.functions import hashing as H
from kinesis_analytics_demo_spark.functions import vectors as V
from kinesis_analytics_demo_spark.plans.registry import register
from kinesis_analytics_demo_spark.session import read_table as _t

DIM = 64
N_QUERIES = 10  # query set: vec_id < 10
TOP_K = 10
N_PLANES = 4  # 16 buckets; scale with corpus size


def _plane_weight(plane: int, dim: int) -> int:
    """Deterministic integer weight in [-1000, 1000] from md5 — same
    literal lands in both engines' plans."""
    h = hashlib.md5(f"plane{plane}_{dim}".encode()).hexdigest()
    return int(h[:15], 16) % 2001 - 1000


PLANES: list[list[int]] = [
    [_plane_weight(p, j) for j in range(DIM)] for p in range(N_PLANES)
]


def _bucket_expr(emb_col):
    """LSH bucket id: sign bits of the 4 integer-plane projections."""
    bucket = F.lit(0)
    for p, weights in enumerate(PLANES):
        w = F.array(*[F.lit(float(x)) for x in weights])
        proj = V.dot(emb_col, w)
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(0)
    return bucket


def _sql_bucket(emb: str) -> str:
    parts = []
    for p, weights in enumerate(PLANES):
        wlist = "[" + ", ".join(f"{x}.0" for x in weights) + "]"
        proj = (
            f"list_sum([CAST({emb}[i] AS DOUBLE) * ({wlist})[i] "
            f"for i in generate_series(1, {DIM})])"
        )
        parts.append(f"(CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(parts) + ")"


@register(
    "udf_vector_norms",
    oracle=f"""
    SELECT vec_id,
           sqrt({V.sql_dot('embedding', 'embedding', DIM)}) AS l2_norm
    FROM embeddings
    """,
    doc="UDF surface (SURVEY §2 U1): an Arrow-vectorized pandas_udf "
    "registered via spark.udf.register and invoked through spark.sql "
    "— LTR f64 accumulation keeps it bit-identical to the JVM fold "
    "and the DuckDB oracle.",
)
def udf_vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_analytics_demo_spark.functions.udfs import register_udfs

    register_udfs(spark)
    _t(spark, sf_dir, "embeddings").createOrReplaceTempView("emb_udf")
    return spark.sql("SELECT vec_id, vector_norm(embedding) AS l2_norm FROM emb_udf")


@register(
    "similarity_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv
               FROM embeddings WHERE vec_id < {N_QUERIES}),
    sims AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               {V.sql_cosine('e.embedding', 'q.qv', DIM)} AS sim
        FROM embeddings e, q
        WHERE e.vec_id != q.query_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, sim,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rank
        FROM sims
    )
    SELECT query_id, neighbor_id, sim, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
    doc="Brute-force exact cosine top-k: 10 query vectors vs the whole "
    "corpus, rank ties broken by neighbor id (deterministic).",
)
def similarity_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    sims = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            V.cosine(F.col("embedding"), F.col("qv")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


NPROBE = 2


@register(
    "similarity_ivf",
    oracle=f"""
    WITH cent AS (
        SELECT min(vec_id) AS cid FROM embeddings GROUP BY label
    ),
    centv AS (
        SELECT c.cid, e.embedding AS cv
        FROM cent c JOIN embeddings e ON e.vec_id = c.cid
    ),
    assign AS (
        SELECT e.vec_id, e.embedding, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY {V.sql_cosine('e.embedding', 'c.cv', DIM)} DESC, c.cid)
                   AS crank
        FROM embeddings e, centv c
    ),
    lists AS (SELECT vec_id, embedding, cid FROM assign WHERE crank = 1),
    qprobe AS (
        SELECT vec_id AS query_id, embedding AS qv, cid
        FROM assign WHERE vec_id < {N_QUERIES} AND crank <= {NPROBE}
    ),
    sims AS (
        SELECT q.query_id, l.vec_id AS neighbor_id,
               {V.sql_cosine('l.embedding', 'q.qv', DIM)} AS sim
        FROM lists l JOIN qprobe q ON l.cid = q.cid
        WHERE l.vec_id != q.query_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, sim,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rank
        FROM sims
    )
    SELECT query_id, neighbor_id, sim, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
    doc="ANN via IVF (inverted-file) coarse quantization: one "
    "deterministic representative per label cluster as centroid, "
    "nearest-centroid assignment, queries probe their nprobe=2 "
    "nearest lists and exact-re-rank only those. At 100 TB: centroid "
    "count ~ sqrt(N) (k-means in production), lists hash-partitioned "
    "by centroid id, per-query work is O(nprobe * list), not O(N).",
)
def similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    cids = emb.groupBy("label").agg(F.min("vec_id").alias("cid")).select("cid")
    cent = cids.join(emb, F.col("cid") == F.col("vec_id")).select(
        "cid", F.col("embedding").alias("cv")
    )
    assign = (
        emb.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "embedding",
            "cid",
            V.cosine(F.col("embedding"), F.col("cv")).alias("csim"),
        )
        .withColumn(
            "crank",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(F.desc("csim"), F.col("cid"))
            ),
        )
    )
    lists = assign.filter(F.col("crank") == 1).select("vec_id", "embedding", "cid")
    qprobe = assign.filter(
        (F.col("vec_id") < N_QUERIES) & (F.col("crank") <= NPROBE)
    ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"), "cid"
    )
    sims = (
        lists.join(F.broadcast(qprobe), "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            V.cosine(F.col("embedding"), F.col("qv")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


@register(
    "similarity_ann_lsh_baseline",
    oracle=f"""
    WITH b AS (
        SELECT vec_id, embedding, {_sql_bucket('embedding')} AS bucket
        FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, embedding AS qv, bucket
          FROM b WHERE vec_id < {N_QUERIES}),
    sims AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               {V.sql_cosine('e.embedding', 'q.qv', DIM)} AS sim
        FROM b e JOIN q ON e.bucket = q.bucket
        WHERE e.vec_id != q.query_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, sim,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rank
        FROM sims
    )
    SELECT query_id, neighbor_id, sim, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
    doc="Single-probe single-table LSH ANN BASELINE (recall@10 0.15 "
    "on this near-random corpus): 4 signed md5-derived integer "
    "projections -> 16 buckets; each query scans only its bucket, "
    "then exact cosine re-rank. Kept as the ablation baseline for "
    "the multiprobe/multitable variants; the canonical "
    "similarity_ann_lsh is the multi-table path (recall 0.86).",
)
def similarity_ann_lsh_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    b = emb.select("vec_id", "embedding", _bucket_expr(F.col("embedding")).alias("bucket"))
    q = b.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("bucket").alias("qbucket"),
    )
    sims = (
        b.join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            V.cosine(F.col("embedding"), F.col("qv")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


# ------------------------------------------------------------- k-means IVF
KMEANS_K = 10
KMEANS_ITERS = 3
KMEANS_NPROBE = 4  # measured recall@10: 0.82 @ nprobe=2 -> 0.93 @ nprobe=4


def kmeans_centroids(
    emb: DataFrame, k: int = KMEANS_K, iters: int = KMEANS_ITERS
) -> DataFrame:
    """Deterministic Lloyd iterations, pure DataFrame ops.

    - init: the k lowest vec_ids (deterministic seed — production
      would use k-means|| with a fixed RNG seed).
    - assign: broadcast the k centroids, per-vector argmax cosine
      (row_number tie-broken by cid).
    - update: element-wise mean via posexplode + groupBy(cid, pos).
      Sums run in DECIMAL(28,12) (exact, order-insensitive) and the
      mean is rounded before casting back to double, so centroids are
      BIT-IDENTICAL regardless of partitioning — the property that
      makes the downstream ANN result reproducible.

    Scale: per iteration one broadcast join (k x dim is KBs) and one
    shuffle of N*dim (cid, pos, val) rows — the standard distributed
    Lloyd step; lineage is truncated per iteration with an eager
    localCheckpoint so the plan stays flat for any iteration count.
    A lost centroid (empty cluster) simply drops out: k' <= k.
    """
    cent = (
        emb.orderBy("vec_id")
        .limit(k)
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    )
    for _ in range(iters):
        assign = (
            emb.crossJoin(F.broadcast(cent))
            .select(
                "vec_id",
                "embedding",
                "cid",
                V.cosine(F.col("embedding"), F.col("cv")).alias("csim"),
            )
            .withColumn(
                "crank",
                F.row_number().over(
                    Window.partitionBy("vec_id").orderBy(F.desc("csim"), F.col("cid"))
                ),
            )
            .filter(F.col("crank") == 1)
        )
        ex = assign.select("cid", F.posexplode("embedding").alias("pos", "val"))
        # mean = (exact decimal sum -> double) / count, ONE IEEE
        # division then ROUND(9): canonical on both engines. (The
        # previous decimal-division form round-tripped through
        # Spark's decimal(38,22) quotient scale — a double-rounding
        # DuckDB cannot reproduce, 237/640 ninth-digit mismatches.)
        means = ex.groupBy("cid", "pos").agg(
            F.round(
                F.sum(F.col("val").cast("decimal(28,12)")).cast("double")
                / F.count(F.lit(1)),
                9,
            )
            .cast("double")
            .alias("m")
        )
        cent = (
            means.groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"].cast("float"),
                ).alias("cv")
            )
            .localCheckpoint(eager=True)
        )
    return cent


_KM_COS_ER = V.sql_cosine("e.embedding", "r.cv", DIM)
_KM_COS_EC = V.sql_cosine("e.embedding", "c.cv", DIM)
_KM_COS_EQ = V.sql_cosine("e.embedding", "q.qv", DIM)

#: the trained-kmeans CTE chain (recursive Lloyd iterations ->
#: final centroids -> ranked assignment -> coarse lists), shared
#: VERBATIM between the similarity_ivf_kmeans oracle and the
#: ivf_kmeans_balance_audit oracle — one training definition, two
#: readouts.
_KM_TRAIN_SQL = f"""
    WITH RECURSIVE rec AS (
        SELECT 0 AS it, vec_id AS cid, embedding AS cv
        FROM (SELECT vec_id, embedding FROM embeddings
              ORDER BY vec_id LIMIT {KMEANS_K})
        UNION ALL
        SELECT m.it + 1, m.cid,
               CAST(list(CAST(m.m AS REAL) ORDER BY m.pos) AS REAL[]) AS cv
        FROM (
            SELECT x.it, x.cid, x.pos,
                   ROUND(CAST(SUM(CAST(x.val AS DECIMAL(28,12))) AS DOUBLE)
                         / COUNT(*), 9) AS m
            FROM (
                SELECT a.it, -(a.best.c) AS cid, i - 1 AS pos,
                       a.embedding[i] AS val
                FROM (
                    SELECT r.it, e.vec_id, e.embedding,
                           max({{'s': {_KM_COS_ER}, 'c': -r.cid}}) AS best
                    FROM embeddings e, rec r
                    WHERE r.it < {KMEANS_ITERS}
                    GROUP BY r.it, e.vec_id, e.embedding
                ) a, (SELECT unnest(generate_series(1, {DIM})) AS i)
            ) x
            GROUP BY x.it, x.cid, x.pos
        ) m
        GROUP BY m.it, m.cid
    ),
    cent AS (SELECT cid, cv FROM rec WHERE it = {KMEANS_ITERS}),
    assign AS (
        SELECT e.vec_id, e.embedding, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY {_KM_COS_EC} DESC, c.cid) AS crank
        FROM embeddings e, cent c),
    lists AS (
        SELECT vec_id, embedding, cid FROM assign WHERE crank = 1)"""


@register(
    "similarity_ivf_kmeans",
    # Lloyd's algorithm IS SQL-expressible: a recursive CTE carries
    # the k centroid rows per iteration — assignment is a struct-max
    # argmax over the working table, the update is the same
    # decimal-sum -> one-IEEE-division -> ROUND(9) -> REAL chain as
    # the Spark side (an earlier decimal-DIVISION form was NOT
    # reproducible: Spark's decimal(38,22) quotient double-rounds).
    # Determinism + recall-vs-exact stay pinned in
    # tests/test_similarity_kmeans.py.
    oracle=f"""{_KM_TRAIN_SQL},
    qprobe AS (
        SELECT vec_id AS query_id, embedding AS qv, cid
        FROM assign WHERE vec_id < {N_QUERIES} AND crank <= {KMEANS_NPROBE}),
    sims AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               {_KM_COS_EQ} AS sim
        FROM lists e JOIN qprobe q USING (cid)
        WHERE e.vec_id != q.query_id),
    ranked AS (
        SELECT query_id, neighbor_id, sim,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rank
        FROM sims)
    SELECT query_id, neighbor_id, sim, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
    doc="ANN via IVF with TRAINED coarse centroids: 3 deterministic "
    "Lloyd iterations (decimal-exact element-wise means -> "
    "partitioning-independent centroids), then an nprobe=4 probe / "
    "exact re-rank (recall@10 0.93 vs 0.82 at nprobe=2 — scan cost "
    "nprobe/k of the corpus per query, still never O(N)). The "
    "production path at 100 TB: train on a sample, broadcast "
    "k~sqrt(N) centroids, lists hash-partitioned by cid.",
)
def similarity_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    cent = kmeans_centroids(emb)
    assign = (
        emb.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "embedding",
            "cid",
            V.cosine(F.col("embedding"), F.col("cv")).alias("csim"),
        )
        .withColumn(
            "crank",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(F.desc("csim"), F.col("cid"))
            ),
        )
    )
    lists = assign.filter(F.col("crank") == 1).select("vec_id", "embedding", "cid")
    qprobe = assign.filter(
        (F.col("vec_id") < N_QUERIES) & (F.col("crank") <= KMEANS_NPROBE)
    ).select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"), "cid")
    sims = (
        lists.join(F.broadcast(qprobe), "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            V.cosine(F.col("embedding"), F.col("qv")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


# ---------------------------------------------------------- multi-probe LSH
def _probe_buckets_expr(bucket_col):
    """Query-side probe set: own bucket + every Hamming-distance-1
    bucket (one hyperplane sign flipped) = N_PLANES+1 probes. The
    standard multi-probe trade: recall of a 5-bucket scan for the
    index cost of one."""
    return F.array(bucket_col, *[
        bucket_col.bitwiseXOR(F.lit(1 << p)) for p in range(N_PLANES)
    ])


@register(
    "similarity_ann_lsh_multiprobe",
    oracle=f"""
    WITH b AS (
        SELECT vec_id, embedding, {_sql_bucket('embedding')} AS bucket
        FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, embedding AS qv,
                 unnest([bucket, {", ".join(f"xor(bucket, {1 << p})" for p in range(N_PLANES))}])
                     AS probe
          FROM b WHERE vec_id < {N_QUERIES}),
    sims AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               {V.sql_cosine('e.embedding', 'q.qv', DIM)} AS sim
        FROM b e JOIN q ON e.bucket = q.probe
        WHERE e.vec_id != q.query_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, sim,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rank
        FROM sims
    )
    SELECT query_id, neighbor_id, sim, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
    doc="Multi-probe LSH ANN: each query scans its own bucket plus "
    "all Hamming-1 neighbors (5 of 16 buckets) — the classic "
    "multi-probe recall fix (measured here: 0.15 single-probe -> "
    "0.47 multi-probe recall@10) at ~5x single-probe cost, still "
    "O(probes * bucket) per query, never O(N).",
)
def similarity_ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    b = emb.select("vec_id", "embedding", _bucket_expr(F.col("embedding")).alias("bucket"))
    q = (
        b.filter(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qv"),
            F.explode(_probe_buckets_expr(F.col("bucket"))).alias("probe"),
        )
    )
    sims = (
        b.join(F.broadcast(q), F.col("bucket") == F.col("probe"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            V.cosine(F.col("embedding"), F.col("qv")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


# --------------------------------------------------- multi-TABLE LSH (OR)
# OR-construction: T independent hash tables of R planes each; a
# neighbor is a candidate if it collides with the query in ANY table
# (own bucket or a Hamming-1 probe). Measured recall@10 on this
# corpus: 0.86 at T=8, R=6 (vs 0.47 for the single-table multiprobe)
# with ~59% of the corpus scanned per query — this corpus's true
# top-10 sims are only 0.24-0.49 (near-random vectors), the hardest
# regime for LSH; at real embedding similarity (>=0.8) the same
# tables prune far harder.
#: 12 tables x 6 planes: recall@10 0.95 offline (0.86 at the round-2
#: 8x6 config) on this deliberately hard near-random corpus; the
#: extra 4 tables cost +50% of the code computation, which the fused
#: one-pass aggregate made cheap. At 100 TB, planes-per-table controls
#: bucket size (grow with corpus); tables control recall.
N_TABLES = 12
PLANES_PER_TABLE = 6
QUANT = 1_000_000  # micro-unit quantization: integer projections are
# exactly order-insensitive, so the explode/aggregate shape (codegen'd
# sums, no per-row interpreted array folds) is bit-deterministic.

MT_PLANES: list[tuple[int, int, int, int]] = [
    (pos, t, p, _plane_weight(t * 100 + p + 1000, pos))
    for t in range(N_TABLES)
    for p in range(PLANES_PER_TABLE)
    for pos in range(DIM)
]


def _sql_mt_code(t: int) -> str:
    """DuckDB code expression for table t over the quantized vector
    column ``q`` (list of BIGINT micro-units)."""
    parts = []
    for p in range(PLANES_PER_TABLE):
        w = [wt for (pos, tt, pp, wt) in MT_PLANES if tt == t and pp == p]
        wlist = "[" + ", ".join(str(x) for x in w) + "]"
        proj = f"list_sum([q[i] * ({wlist})[i] for i in generate_series(1, {DIM})])"
        parts.append(f"(CASE WHEN {proj} > 0 THEN {1 << p} ELSE 0 END)")
    return "(" + " + ".join(parts) + ")"


def _mt_codes(spark: SparkSession, emb: DataFrame) -> DataFrame:
    """(vec_id, t, code) for every vector x table.

    Shape: posexplode the quantized vector (N*DIM rows) and compute
    ALL T*P projections as fused aggregate expressions in ONE
    groupBy — each projection is sum(qval * element_at(<64-literal
    weight array>, pos+1)), all codegen'd integer arithmetic. The
    earlier broadcast-join formulation materialized N*DIM*T*P
    (~150M at sf0.1) multiply rows through the join; this computes
    the same T*P multiply-adds per exploded row without widening the
    row stream — the shuffle carries N rows x 48 long partials.
    Integer arithmetic end-to-end: order-insensitive, bit-equal to
    the DuckDB fold regardless of partitioning."""
    ex = emb.select(
        "vec_id",
        F.posexplode(
            F.transform(
                "embedding",
                lambda x: F.round(x.cast("double") * QUANT).cast("bigint"),
            )
        ).alias("pos", "qval"),
    )
    aggs = []
    for t in range(N_TABLES):
        for p in range(PLANES_PER_TABLE):
            w = [wt for (pos, tt, pp, wt) in MT_PLANES if tt == t and pp == p]
            warr = F.array(*[F.lit(int(x)).cast("long") for x in w])
            aggs.append(
                F.sum(
                    F.col("qval") * F.element_at(warr, F.col("pos") + 1)
                ).alias(f"pr_{t}_{p}")
            )
    proj = ex.groupBy("vec_id").agg(*aggs)
    tables = F.array(
        *[
            F.struct(
                F.lit(t).alias("t"),
                sum(
                    (
                        F.when(F.col(f"pr_{t}_{p}") > 0, F.lit(1 << p)).otherwise(
                            F.lit(0)
                        )
                        for p in range(PLANES_PER_TABLE)
                    ),
                    start=F.lit(0),
                )
                .cast("long")
                .alias("code"),
            )
            for t in range(N_TABLES)
        ]
    )
    return proj.select("vec_id", F.explode(tables).alias("tc")).select(
        "vec_id", F.col("tc.t").alias("t"), F.col("tc.code").alias("code")
    )


@register(
    "similarity_ann_lsh",
    oracle=f"""
    WITH qd AS (
        SELECT vec_id,
               [CAST(round(CAST(embedding[i] AS DOUBLE) * {QUANT}) AS BIGINT)
                for i in generate_series(1, {DIM})] AS q
        FROM embeddings
    ),
    codes AS (
        {" UNION ALL ".join(f"SELECT vec_id, {t} AS t, {_sql_mt_code(t)} AS code FROM qd" for t in range(N_TABLES))}
    ),
    probes AS (
        SELECT vec_id AS query_id, t,
               unnest([code, {", ".join(f"xor(code, {1 << p})" for p in range(PLANES_PER_TABLE))}])
                   AS probe
        FROM codes WHERE vec_id < {N_QUERIES}
    ),
    cand AS (
        SELECT DISTINCT p.query_id, e.vec_id AS neighbor_id
        FROM codes e JOIN probes p ON e.t = p.t AND e.code = p.probe
        WHERE e.vec_id != p.query_id
    ),
    sims AS (
        SELECT c.query_id, c.neighbor_id,
               {V.sql_cosine('ev.embedding', 'qv.embedding', DIM)} AS sim
        FROM cand c
        JOIN embeddings ev ON ev.vec_id = c.neighbor_id
        JOIN embeddings qv ON qv.vec_id = c.query_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, sim,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rank
        FROM sims
    )
    SELECT query_id, neighbor_id, sim, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
    doc="CANONICAL LSH ANN (multi-table OR-construction; formerly "
    "registered as similarity_ann_lsh_multitable): 12 independent "
    "6-plane tables, Hamming-1 multiprobe in each, candidates = "
    "union of collisions, exact cosine re-rank. Projections are "
    "integer-quantized (micro-units) so the explode/aggregate "
    "codegen shape is order-insensitive and bit-equal to the oracle. "
    "Recall@10 0.95 vs 0.47 single-table on this near-random corpus; "
    "per-query work stays O(T * probes * bucket), never O(N).",
)
def similarity_ann_lsh_multitable(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    codes = _mt_codes(spark, emb)
    # Codes are computed per-vector, so the query side is derived from
    # a pre-filtered scan rather than from `codes`: Spark does not
    # share subplans across the two sides of a join, and deriving both
    # from `codes` recomputes the full-corpus explode/aggregate twice.
    # Filtering first pushes vec_id < N_QUERIES into the parquet scan
    # and makes the query-side code computation O(queries), not O(N).
    qcodes = _mt_codes(spark, emb.filter(F.col("vec_id") < N_QUERIES)).select(
        F.col("vec_id").alias("query_id"),
        "t",
        F.explode(
            F.array(
                F.col("code"),
                *[
                    F.col("code").bitwiseXOR(F.lit(1 << p))
                    for p in range(PLANES_PER_TABLE)
                ],
            )
        ).alias("probe"),
    )
    cand = (
        codes.join(
            F.broadcast(qcodes),
            (codes["t"] == qcodes["t"]) & (codes["code"] == qcodes["probe"]),
        )
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    ev = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("nv"))
    qv = emb.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    sims = (
        cand.join(ev, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            V.cosine(F.col("nv"), F.col("qv")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


# ------------------------------------------- incremental list assignment
#: "Yesterday's embeddings": the shard being ingested (1 in 10 vectors
#: by id hash), assigned to the FROZEN IVF lists built from the
#: already-indexed corpus — the ANN twin of dedup_incremental_minhash.
INCREMENTAL_SHARD_MOD = 10
INCREMENTAL_SHARD_SLOT = 9


@register(
    "similarity_incremental_assign",
    oracle=f"""
    WITH old AS (
        SELECT * FROM embeddings
        WHERE vec_id % {INCREMENTAL_SHARD_MOD} != {INCREMENTAL_SHARD_SLOT}
    ),
    cent AS (SELECT min(vec_id) AS cid FROM old GROUP BY label),
    centv AS (
        SELECT c.cid, e.embedding AS cv
        FROM cent c JOIN embeddings e ON e.vec_id = c.cid
    ),
    nw AS (
        SELECT vec_id, embedding FROM embeddings
        WHERE vec_id % {INCREMENTAL_SHARD_MOD} = {INCREMENTAL_SHARD_SLOT}
    ),
    assign AS (
        SELECT n.vec_id, c.cid,
               {V.sql_cosine('n.embedding', 'c.cv', DIM)} AS sim,
               row_number() OVER (PARTITION BY n.vec_id
                   ORDER BY {V.sql_cosine('n.embedding', 'c.cv', DIM)} DESC,
                            c.cid) AS crank
        FROM nw n, centv c
    )
    SELECT vec_id, cid AS assigned_list, sim FROM assign WHERE crank = 1
    """,
    doc="Incremental ANN index maintenance (continuous-ingest shape): "
    "a new shard of vectors is assigned to the FROZEN coarse lists "
    "built from the already-indexed corpus — the per-ingest-batch "
    "step a production IVF index runs (the dedup twin is "
    "dedup_incremental_minhash). Centroids derive from the OLD rows "
    "only, so assignments never shift under re-ingest; the new shard "
    "crossJoins the broadcast centroid table (k rows) and keeps the "
    "argmax-cosine list per vector — O(shard x k) work, no corpus "
    "re-scan, same plan at any corpus size.",
)
def similarity_incremental_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    is_new = emb.vec_id % INCREMENTAL_SHARD_MOD == INCREMENTAL_SHARD_SLOT
    old = emb.filter(~is_new)
    cent = (
        old.groupBy("label")
        .agg(F.min("vec_id").alias("cid"))
        .join(emb, F.col("cid") == F.col("vec_id"))
        .select("cid", F.col("embedding").alias("cv"))
    )
    new = emb.filter(is_new).select("vec_id", "embedding")
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cid"))
    return (
        new.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "cid",
            V.cosine(F.col("embedding"), F.col("cv")).alias("sim"),
        )
        .withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") == 1)
        .select("vec_id", F.col("cid").alias("assigned_list"), "sim")
    )


@register(
    "similarity_hard_negatives",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS ql
               FROM embeddings WHERE vec_id < {N_QUERIES}),
    sims AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
               {V.sql_cosine('e.embedding', 'q.qv', DIM)} AS sim
        FROM embeddings e, q
        WHERE e.vec_id != q.query_id AND e.label != q.ql),
    ranked AS (
        SELECT query_id, neighbor_id, sim,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rank
        FROM sims)
    SELECT query_id, neighbor_id, sim, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 5
    """,
    doc="Hard-negative mining for contrastive training: per query "
    "vector, the top-5 most similar vectors with a DIFFERENT label — "
    "the negatives that actually teach the model something (random "
    "negatives are trivially easy). Same broadcast brute-force shape "
    "as similarity_cosine_topk with the label anti-filter pushed "
    "below the top-k; at 100 TB generate candidates with the "
    "IVF/LSH paths first and anti-filter the shortlist.",
)
def similarity_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("ql"),
    )
    sims = (
        emb.crossJoin(F.broadcast(q))
        .filter(
            (F.col("vec_id") != F.col("query_id"))
            & (F.col("label") != F.col("ql"))
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            V.cosine(F.col("embedding"), F.col("qv")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "sim", F.col("rank").cast("int"))
    )


# ------------------------------------------ diversified retrieval
LABEL_QUOTA = 2  #: max neighbors per label in the diversified top-k


@register(
    "similarity_topk_label_quota",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv
               FROM embeddings WHERE vec_id < {N_QUERIES}),
    sims AS (
        SELECT q.query_id, e.vec_id AS neighbor_id, e.label,
               {V.sql_cosine('e.embedding', 'q.qv', DIM)} AS sim
        FROM embeddings e, q
        WHERE e.vec_id != q.query_id),
    lr AS (
        SELECT *,
               row_number() OVER (PARTITION BY query_id, label
                                  ORDER BY sim DESC, neighbor_id)
                   AS label_rank
        FROM sims),
    capped AS (
        SELECT query_id, neighbor_id, label, sim,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, neighbor_id) AS rank
        FROM lr WHERE label_rank <= {LABEL_QUOTA})
    SELECT query_id, neighbor_id, label,
           CAST(ROUND(sim, 6) AS DOUBLE) AS sim,
           CAST(rank AS INT) AS rank
    FROM capped WHERE rank <= {TOP_K}
    """,
    doc="Diversified top-k by per-label quota: exact cosine "
    "neighbors, but at most 2 per label reach the final top-10 — "
    "the cheap, fully-declarative diversity guarantee (quota "
    "filtering), complementing the greedy relevance-diversity "
    "trade-off of similarity_mmr_diversified. Two stacked "
    "row_number windows (within-label cap, then global rank among "
    "survivors), both WindowGroupLimit-prunable; the corpus is "
    "scanned once against the broadcast query set and never "
    "shuffles raw vectors beyond the per-query candidate stream.",
)
def similarity_topk_label_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    sims = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "label",
            V.cosine(F.col("embedding"), F.col("qv")).alias("sim"),
        )
    )
    wl = Window.partitionBy("query_id", "label").orderBy(
        F.desc("sim"), "neighbor_id"
    )
    wg = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        sims.withColumn("label_rank", F.row_number().over(wl))
        .filter(F.col("label_rank") <= LABEL_QUOTA)
        .withColumn("rank", F.row_number().over(wg))
        .filter(F.col("rank") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            "label",
            F.round("sim", 6).cast("double").alias("sim"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


MMR_LAMBDA = 0.7  #: relevance weight; 1-lambda penalizes redundancy
MMR_CAND = 20  #: relevance-ranked candidate pool per query
MMR_K = 5  #: diversified picks per query

_MMR_SEL_T = (
    "array<struct<neighbor_id:bigint,sim:double,norm:double,"
    "emb:array<double>,mmr:double>>"
)


_MMR_L = repr(MMR_LAMBDA)
_MMR_1L = repr(1 - MMR_LAMBDA)  #: the exact double Spark's F.lit(1 - 0.7) uses

@register(
    "similarity_mmr_diversified",
    # The greedy selection IS SQL-expressible after all: a recursive
    # CTE carries the picked-id list and a LATERAL argmax picks the
    # next candidate — pairwise candidate cosines are precomputed (a
    # bounded 20x20-per-query table), so each step is one correlated
    # MAX over the picked set. Doubly verified: this oracle at the
    # driver plus the pure-Python golden in tests/test_mmr.py.
    oracle=f"""
    WITH RECURSIVE q AS (
        SELECT vec_id AS query_id, embedding AS qv
        FROM embeddings WHERE vec_id < {N_QUERIES}),
    sims AS (
        SELECT q.query_id, e.vec_id AS nid, e.embedding AS emb,
               {V.sql_cosine('e.embedding', 'q.qv', DIM)} AS rel
        FROM embeddings e, q
        WHERE e.vec_id != q.query_id),
    cands AS (
        SELECT query_id, nid, emb, rel FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                          ORDER BY rel DESC, nid) AS r
            FROM sims) WHERE r <= {MMR_CAND}),
    pairs AS (
        SELECT a.query_id, a.nid AS a, b.nid AS b,
               {V.sql_cosine('a.emb', 'b.emb', DIM)} AS s
        FROM cands a JOIN cands b
          ON a.query_id = b.query_id AND a.nid != b.nid),
    rec AS (
        SELECT query_id, 1 AS k, nid, rel,
               {_MMR_L}::DOUBLE * rel AS mmr, [nid] AS picks
        FROM (SELECT query_id, nid, rel,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY rel DESC, nid) AS r
              FROM cands) WHERE r = 1
        UNION ALL
        SELECT s.query_id, s.k + 1, b.nid, b.rel, b.mmr,
               list_append(s.picks, b.nid)
        FROM rec s, LATERAL (
            SELECT c.nid, c.rel,
                   {_MMR_L}::DOUBLE * c.rel
                   - {_MMR_1L}::DOUBLE * (
                       SELECT MAX(p.s) FROM pairs p
                       WHERE p.query_id = s.query_id AND p.a = c.nid
                         AND list_contains(s.picks, p.b)) AS mmr
            FROM cands c
            WHERE c.query_id = s.query_id
              AND NOT list_contains(s.picks, c.nid)
            ORDER BY mmr DESC, c.nid LIMIT 1) b
        WHERE s.k < {MMR_K})
    SELECT query_id, CAST(k AS INT) AS select_rank, nid AS neighbor_id,
           CAST(ROUND(rel, 6) AS DOUBLE) AS relevance,
           CAST(ROUND(mmr, 6) AS DOUBLE) AS mmr_score
    FROM rec
    """,
    doc="Maximal Marginal Relevance (Carbonell & Goldstein 1998) "
    "diversified top-5: from each query's top-20 cosine candidates, "
    "greedily pick argmax of lambda*relevance - "
    "(1-lambda)*max_sim_to_already_selected. The dedup-aware "
    "retrieval step for training-data curation: near-duplicate "
    "candidates cannibalize each other's marginal score, so the "
    "final 5 cover distinct regions. Plan: the candidate pool is the "
    "same broadcast-query brute-force scan as similarity_cosine_topk "
    "(WindowGroupLimit caps it at 20 rows/query); the greedy loop "
    "then runs INSIDE one row per query as a fixed-order aggregate() "
    "fold over collected candidate structs — no driver collect, no "
    "per-iteration shuffles, and at 100 TB the only scan-scale work "
    "is the candidate generation. Ties on the MMR score break to the "
    "smallest neighbor_id via the negated-id struct-max trick.",
)
def similarity_mmr_diversified(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    sims = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            V.cosine(F.col("embedding"), F.col("qv")).alias("sim"),
            V.norm(F.col("embedding")).alias("norm"),
            F.transform("embedding", lambda x: x.cast("double")).alias(
                "emb"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    cand = sims.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= MMR_CAND
    )
    pools = cand.groupBy("query_id").agg(
        F.sort_array(
            F.collect_list(
                F.struct("rank", "neighbor_id", "sim", "norm", "emb")
            )
        ).alias("arr")
    )

    def _dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    def _step(sel, _):
        remaining = F.filter(
            F.col("arr"),
            lambda c: ~F.exists(
                sel, lambda s: s["neighbor_id"] == c["neighbor_id"]
            ),
        )
        scored = F.transform(
            remaining,
            lambda c: F.struct(
                (
                    F.lit(MMR_LAMBDA) * c["sim"]
                    - F.lit(1 - MMR_LAMBDA)
                    * F.coalesce(
                        F.array_max(
                            F.transform(
                                sel,
                                lambda s: _dot(c["emb"], s["emb"])
                                / (c["norm"] * s["norm"]),
                            )
                        ),
                        F.lit(0.0),
                    )
                ).alias("mmr"),
                (-c["neighbor_id"]).alias("negid"),
                c["neighbor_id"].alias("neighbor_id"),
                c["sim"].alias("sim"),
                c["norm"].alias("norm"),
                c["emb"].alias("emb"),
            ),
        )
        best = F.array_max(scored)
        # Pool exhausted (fewer than MMR_K candidates): stop growing
        # instead of appending a null-field struct each remaining step
        # — matches the recursive-CTE oracle, which terminates early
        # and emits fewer than MMR_K rows for degenerate pools.
        return F.when(
            F.size(remaining) > 0,
            F.concat(
                sel,
                F.array(
                    F.struct(
                        best["neighbor_id"].alias("neighbor_id"),
                        best["sim"].alias("sim"),
                        best["norm"].alias("norm"),
                        best["emb"].alias("emb"),
                        best["mmr"].alias("mmr"),
                    )
                ),
            ),
        ).otherwise(sel)

    selected = F.aggregate(
        F.sequence(F.lit(1), F.lit(MMR_K)),
        F.expr(f"CAST(array() AS {_MMR_SEL_T})"),
        _step,
    )
    out = pools.select(
        "query_id", F.posexplode(selected).alias("pos", "s")
    )
    return out.select(
        "query_id",
        (F.col("pos") + 1).cast("int").alias("select_rank"),
        F.col("s.neighbor_id").alias("neighbor_id"),
        F.round(F.col("s.sim"), 6).cast("double").alias("relevance"),
        F.round(F.col("s.mmr"), 6).cast("double").alias("mmr_score"),
    )


# ------------------------------------- IVF list-balance audit
@register(
    "ivf_kmeans_balance_audit",
    oracle=f"""{_KM_TRAIN_SQL},
    sz AS (SELECT cid, count(*) AS n FROM lists GROUP BY cid)
    SELECT CAST(count(*) AS BIGINT) AS n_lists,
           CAST(SUM(n) AS BIGINT) AS n_vectors,
           CAST(MIN(n) AS BIGINT) AS min_list,
           CAST(MAX(n) AS BIGINT) AS max_list,
           CAST(ROUND(CAST(count(*) * SUM(CAST(n AS DECIMAL(19,0))
                                          * CAST(n AS DECIMAL(19,0)))
                           AS DOUBLE)
                / (CAST(SUM(n) AS DOUBLE) * SUM(n)), 6) AS DOUBLE)
               AS imbalance_factor
    FROM sz
    """,
    doc="IVF coarse-list balance audit over the TRAINED k-means "
    "quantizer (same Lloyd training CTE as similarity_ivf_kmeans, "
    "shared verbatim): list-size min/max and the imbalance factor "
    "phi = K * sum(sz^2) / N^2 (Jegou et al.'s probe-cost variance "
    "measure — phi = 1 is perfectly balanced; expected probe cost "
    "scales with phi). THE operational readout before shipping an "
    "IVF index at 100 TB: a hot list turns nprobe into a scan. "
    "Integer-exact: sz^2 sums in DECIMAL(19,0) products, one final "
    "division chain; assignment/training reuse the broadcast-"
    "centroid argmax (one corpus scan per Lloyd iteration, lists "
    "never shuffle raw vectors for the audit itself).",
)
def ivf_kmeans_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    cent = kmeans_centroids(emb)
    assign = (
        emb.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "cid",
            V.cosine(F.col("embedding"), F.col("cv")).alias("csim"),
        )
        .withColumn(
            "crank",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(
                    F.desc("csim"), F.col("cid")
                )
            ),
        )
        .filter(F.col("crank") == 1)
    )
    sz = assign.groupBy("cid").agg(F.count(F.lit(1)).alias("n"))
    nd = F.col("n").cast("decimal(19,0)")
    return sz.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lists"),
        F.sum("n").cast("bigint").alias("n_vectors"),
        F.min("n").cast("bigint").alias("min_list"),
        F.max("n").cast("bigint").alias("max_list"),
        F.round(
            (F.count(F.lit(1)) * F.sum(nd * nd)).cast("double")
            / (F.sum("n").cast("double") * F.sum("n")),
            6,
        )
        .cast("double")
        .alias("imbalance_factor"),
    )


# --------------------------- mutual nearest neighbors (alignment)
MNN_LABEL_A = 0  #: "source space" partition
MNN_LABEL_B = 1  #: "target space" partition

_MNN_COS = V.sql_cosine("a.embedding", "b.embedding", DIM)


@register(
    "mutual_nearest_neighbors",
    oracle=f"""
    WITH sim AS (
        SELECT a.vec_id AS a_id, b.vec_id AS b_id,
               {_MNN_COS} AS sim
        FROM embeddings a JOIN embeddings b
          ON a.label = {MNN_LABEL_A} AND b.label = {MNN_LABEL_B}),
    ab AS (
        SELECT a_id, b_id, sim FROM (
            SELECT a_id, b_id, sim,
                   row_number() OVER (PARTITION BY a_id
                                      ORDER BY sim DESC, b_id) AS rk
            FROM sim) WHERE rk = 1),
    ba AS (
        SELECT a_id, b_id FROM (
            SELECT a_id, b_id,
                   row_number() OVER (PARTITION BY b_id
                                      ORDER BY sim DESC, a_id) AS rk
            FROM sim) WHERE rk = 1)
    SELECT ab.a_id, ab.b_id,
           CAST(ROUND(ab.sim, 6) AS DOUBLE) AS sim
    FROM ab JOIN ba ON ba.a_id = ab.a_id AND ba.b_id = ab.b_id
    """,
    doc=f"Mutual nearest neighbors between the label-{MNN_LABEL_A} "
    f"and label-{MNN_LABEL_B} embedding partitions: a pair (a, b) "
    "survives only when b is a's cosine top-1 in B AND a is b's "
    "top-1 in A — the standard high-precision seed-pair criterion "
    "for unsupervised embedding-space alignment (Artetxe et al. "
    "2018; used for bitext mining and cross-encoder distillation "
    "pair selection). Ties break (sim DESC, id) under a total "
    "order. This is the labeled exact O(|A| x |B|) baseline, same "
    "contract as dedup_embedding_cosine — the scale-path DEFAULT is "
    "mutual_nearest_neighbors_bucketed (IVF coarse lists, measured "
    "recall 0.85-0.96); the mutual check itself is two "
    "WindowGroupLimit row_number passes + one hash self-join, "
    "shuffle-keyed by vector id.",
)
def mutual_nearest_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    a = emb.where(F.col("label") == MNN_LABEL_A).select(
        F.col("vec_id").alias("a_id"), F.col("embedding").alias("ea")
    )
    b = emb.where(F.col("label") == MNN_LABEL_B).select(
        F.col("vec_id").alias("b_id"), F.col("embedding").alias("eb")
    )
    sim = a.crossJoin(F.broadcast(b)).select(
        "a_id",
        "b_id",
        V.cosine(F.col("ea"), F.col("eb")).alias("sim"),
    )
    ab = (
        sim.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("a_id").orderBy(F.desc("sim"), "b_id")
            ),
        )
        .where(F.col("rk") == 1)
        .select("a_id", "b_id", "sim")
    )
    ba = (
        sim.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("b_id").orderBy(F.desc("sim"), "a_id")
            ),
        )
        .where(F.col("rk") == 1)
        .select("a_id", "b_id")
    )
    return ab.join(ba, ["a_id", "b_id"]).select(
        "a_id",
        "b_id",
        F.round(F.col("sim"), 6).cast("double").alias("sim"),
    )


MNN_NPROBE = 5  #: coarse lists probed per side — the recall dial (below)
MNN_SEL_GRID = 4096  #: md5 grid for the deterministic centroid draw

_MNN_BCOS = V.sql_cosine("ea.embedding", "eb.embedding", DIM)


@register(
    "mutual_nearest_neighbors_bucketed",
    oracle=f"""
    WITH sel AS (
        SELECT n, k, ({MNN_SEL_GRID} * k + n - 1) // greatest(n, 1) AS thr,
               mn
        FROM (SELECT count(*) AS n,
                     greatest(CAST(floor(sqrt(
                         CAST((count(*) * 9) // 100 AS DOUBLE))) AS BIGINT),
                         1) AS k,
                     min(vec_id) AS mn
              FROM embeddings)
    ),
    cent AS (
        SELECT e.vec_id AS cid, e.embedding AS cv
        FROM embeddings e, sel s
        WHERE ({H.sql_md5_long("e.vec_id::VARCHAR")} % {MNN_SEL_GRID}) < s.thr
           OR e.vec_id = s.mn
    ),
    assign AS (
        SELECT e.vec_id, e.label, e.embedding, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY {V.sql_cosine('e.embedding', 'c.cv', DIM)} DESC, c.cid)
                   AS crank
        FROM embeddings e, cent c
    ),
    a AS (SELECT vec_id AS a_id, cid FROM assign
          WHERE label = {MNN_LABEL_A} AND crank <= {MNN_NPROBE}),
    b AS (SELECT vec_id AS b_id, cid FROM assign
          WHERE label = {MNN_LABEL_B} AND crank <= {MNN_NPROBE}),
    sim AS (
        SELECT DISTINCT a.a_id, b.b_id, {_MNN_BCOS} AS sim
        FROM a JOIN b USING (cid)
        JOIN embeddings ea ON ea.vec_id = a.a_id
        JOIN embeddings eb ON eb.vec_id = b.b_id),
    ab AS (
        SELECT a_id, b_id, sim FROM (
            SELECT a_id, b_id, sim,
                   row_number() OVER (PARTITION BY a_id
                                      ORDER BY sim DESC, b_id) AS rk
            FROM sim) WHERE rk = 1),
    ba AS (
        SELECT a_id, b_id FROM (
            SELECT a_id, b_id,
                   row_number() OVER (PARTITION BY b_id
                                      ORDER BY sim DESC, a_id) AS rk
            FROM sim) WHERE rk = 1)
    SELECT ab.a_id, ab.b_id,
           CAST(ROUND(ab.sim, 6) AS DOUBLE) AS sim
    FROM ab JOIN ba ON ba.a_id = ab.a_id AND ba.b_id = ab.b_id
    """,
    doc=f"Scale-path default for MNN seed-pair mining: both label "
    "partitions coarse-quantize onto K = "
    "max(1, floor(sqrt((9n) div 100))) IVF lists — the argmin of "
    "assign(nK) + probe(nprobe^2 |A||B| / K) work for the two "
    f"n/10-sized sides — with each side probing its {MNN_NPROBE} "
    "nearest lists; candidate pairs must share a probed list, and "
    "the mutual top-1 check runs only on candidates, so total work "
    "is O(n^1.5), never O(|A| x |B|). Centroids are drawn "
    "deterministically on both engines (vec_id md5 mod "
    f"{MNN_SEL_GRID} under ceil(grid*K/n) — no global sort, no "
    "trained state; IVF-flat seeding), and the n x K assign frame "
    "is persisted so its cosines run once. Measured vs the exact "
    "twin on the near-isotropic synthetic corpus (the HARD case "
    "for data-point quantization): recall 1.0 / 1.0 / 0.979 at "
    "sf0.001/0.01/0.1 and 0.807 on the 10x 20k-vector corpus; "
    "nprobe is the recall dial (0.47 / 0.81 / 0.98 at nprobe "
    "3/5/8, numpy-audited at 10x). At these toy scales the exact "
    "broadcast cross join is still the FASTER plan (11.4s vs 25s "
    "at 10x — candidate work 2.7M rows vs 4M, but across more "
    "stages); the bucketed path exists for the asymptotics, "
    "projected ~4x less work at 100x and widening as n^1.5 vs "
    "n^2. Candidate sims are computed once per (a,b) via DISTINCT "
    "(the cosine is deterministic, so multi-list duplicates are "
    "bit-identical on both engines); the mutual check is the exact "
    "twin's two WindowGroupLimit passes + hash join, shuffle-keyed "
    "by vector id. The exact mutual_nearest_neighbors stays "
    "registered as the labeled quadratic oracle baseline (the "
    "dedup_embedding_cosine / _bucketed contract).",
)
def mutual_nearest_neighbors_bucketed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from kinesis_analytics_demo_spark.caching import tracked_persist

    emb = _t(spark, sf_dir, "embeddings")
    # mn = fallback centroid (min vec_id): the probabilistic md5 draw
    # can come up empty for small non-empty corpora, which would
    # silently drop every candidate pair; riding mn on the 1-row stats
    # agg keeps the plan's only SinglePartition exchange on the
    # partial count (ADVICE r8, same fix as the kNN-audit twin).
    sel = (
        emb.agg(
            F.count(F.lit(1)).alias("n"), F.min("vec_id").alias("mn")
        )
        .select(
            "n",
            "mn",
            F.greatest(
                F.floor(F.sqrt(F.expr("CAST((n * 9) div 100 AS DOUBLE)"))),
                F.lit(1).cast("bigint"),
            ).alias("k"),
        )
        # greatest(n, 1): empty corpus -> empty result, not ANSI
        # div-by-zero (ADVICE r8)
        .select(
            F.expr(
                f"({MNN_SEL_GRID} * k + n - 1) div greatest(n, 1)"
            ).alias("thr"),
            "mn",
        )
    )
    cent = (
        emb.crossJoin(F.broadcast(sel))
        .filter(
            (
                H.md5_long(F.col("vec_id").cast("string")) % MNN_SEL_GRID
                < F.col("thr")
            )
            | (F.col("vec_id") == F.col("mn"))
        )
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    )
    # both label-side probe sets consume assign — persist so the
    # n x K assign cosines run once
    assign = tracked_persist(
        emb.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "label",
            "embedding",
            "cid",
            V.cosine(F.col("embedding"), F.col("cv")).alias("csim"),
        )
        .withColumn(
            "crank",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(
                    F.desc("csim"), F.col("cid")
                )
            ),
        )
    )
    a = assign.filter(
        (F.col("label") == MNN_LABEL_A) & (F.col("crank") <= MNN_NPROBE)
    ).select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("ea"), "cid")
    b = assign.filter(
        (F.col("label") == MNN_LABEL_B) & (F.col("crank") <= MNN_NPROBE)
    ).select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("eb"), "cid")
    sim = (
        a.join(b, "cid")
        .select(
            "a_id", "b_id", V.cosine(F.col("ea"), F.col("eb")).alias("sim")
        )
        .distinct()
    )
    ab = (
        sim.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("a_id").orderBy(F.desc("sim"), "b_id")
            ),
        )
        .where(F.col("rk") == 1)
        .select("a_id", "b_id", "sim")
    )
    ba = (
        sim.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("b_id").orderBy(F.desc("sim"), "a_id")
            ),
        )
        .where(F.col("rk") == 1)
        .select("a_id", "b_id")
    )
    return ab.join(ba, ["a_id", "b_id"]).select(
        "a_id",
        "b_id",
        F.round(F.col("sim"), 6).cast("double").alias("sim"),
    )
