"""Similarity search, part 2: diversified retrieval and mutual
nearest neighbors (split from ``similarity.py`` in round 9 — the file
had outgrown the repo's 1,300-line module cap; same surgery
``temporal.py``/``timeseries.py`` got in round 7).

Registration order is load-bearing only for the first 50 registry
entries (the driver's sample); this module is imported immediately
after ``similarity`` in ``registry._load_all_modules``, so the global
registration order is IDENTICAL to the pre-split single file.

Sections:
- diversified retrieval: per-label quota top-k and MMR re-ranking
  (Carbonell & Goldstein 1998) as JVM higher-order-function folds;
- IVF list-balance audit over the trained k-means quantizer;
- mutual nearest neighbors: the labeled exact O(|A| x |B|) baseline
  and the IVF-bucketed scale twin (adaptive sqrt-n centroid draw,
  deterministic md5-mod-grid selection on both engines; assign
  O(n^1.5), candidate work ~n^1.75 at constant recall under the
  round-10 measured collision law).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.config import env_coef
from kinesis_analytics_demo_spark.functions import hashing as H
from kinesis_analytics_demo_spark.functions import vectors as V
from kinesis_analytics_demo_spark.operators.similarity import (
    DIM,
    N_QUERIES,
    TOP_K,
    _KM_TRAIN_SQL,
    kmeans_centroids,
)
from kinesis_analytics_demo_spark.plans.registry import register
from kinesis_analytics_demo_spark.session import read_table as _t


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
    # argmax assignment as a max_by aggregate (struct(csim, -cid) max
    # == row_number's csim DESC, cid ASC): map-side partial
    # aggregation sends one reduced row per vec_id to the exchange
    # instead of shuffling+sorting the N x K centroid cross product.
    assign = (
        emb.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "cid",
            V.cosine(F.col("embedding"), F.col("cv")).alias("csim"),
        )
        .groupBy("vec_id")
        .agg(F.max_by("cid", F.struct(F.col("csim"), -F.col("cid"))).alias("cid"))
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


def _mutual_top1(sim: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Per-side top-1 of an (a_id, b_id, sim) stream as max_by
    aggregates: max over struct(sim, -id) IS the row_number
    (sim DESC, id ASC) pick, and the aggregates partial-combine
    map-side — one reduced row per a_id (resp. b_id) reaches each
    exchange instead of the full candidate cross product the two
    window formulations shuffled AND sorted. Returns (ab, ba): a's
    top b with the sim value, and b's top a."""
    ab = (
        sim.groupBy("a_id")
        .agg(
            F.max_by(
                F.struct("b_id", "sim"),
                F.struct(F.col("sim"), -F.col("b_id")),
            ).alias("s")
        )
        .select(
            "a_id",
            F.col("s.b_id").alias("b_id"),
            F.col("s.sim").alias("sim"),
        )
    )
    ba = (
        sim.groupBy("b_id")
        .agg(
            F.max_by(
                "a_id", F.struct(F.col("sim"), -F.col("a_id"))
            ).alias("a_id")
        )
        .select("a_id", "b_id")
    )
    return ab, ba


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
    "recall 0.86 at 10x / 0.97 at 100x at the frontier-knee default, "
    "0.98-1.0 at test SFs); the mutual check itself is two map-side-"
    "combining max_by top-1 aggregates + one hash self-join, "
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
    ab, ba = _mutual_top1(sim)
    return ab.join(ba, ["a_id", "b_id"]).select(
        "a_id",
        "b_id",
        F.round(F.col("sim"), 6).cast("double").alias("sim"),
    )


#: MINIMUM coarse lists probed per side. The effective nprobe is
#: ADAPTIVE — max(MNN_NPROBE, ceil(MNN_NP_COEF * sqrt(K))) — because
#: a fixed probe count over a sqrt(n)-growing list count covers a
#: shrinking fraction of the space: measured recall vs the exact twin
#: slid 0.979 (sf0.1, K=13, np=5) -> 0.785 (10x, K=42) -> 0.688
#: (100x, K=134) under fixed np=5, and the round-8 dial audit
#: (0.47/0.81/0.98 at np 3/5/8 at 10x) shows the knob works.
MNN_NPROBE = 5
#: Coefficient of the adaptive probe rule np = max(MNN_NPROBE,
#: ceil(coef * sqrt(K))), chosen from the MEASURED 100x recall/wall
#: frontier (round 10; full exact-numpy ground truth, 8,550 true
#: pairs at 200k vectors): np 5/8/10/12/14 -> recall 0.688/0.907/
#: 0.965/0.988/0.997 at wall 263/445/604/830/1198s. The round-9
#: default 1.2 (np=14) ran past the knee — a 2x wall premium over
#: np=10 for the last ~0.03 recall; 0.86 lands np=10, the knee the
#: round-9 verdict asked for (~0.95 recall at half the cost). At 10x
#: (K=42) the default gives np=6 -> recall 0.859 on the 135-pair
#: exact set (np 5/6/7/8 -> 0.785/0.859/0.933/0.970; wall is nearly
#: FLAT there, 25-42s — probe cost only dominates from ~10^5 vectors
#: up, exactly where the knee calibration was measured). Recall-
#: critical callers set SPARK_GRAFT_MNN_NP_COEF=1.2 to restore the
#: round-9 maximal-recall point. Any coefficient in [0.69, 1.38]
#: keeps np=5 at every test SF (the MNN_NPROBE floor binds for
#: K <= 13), so driver rows are bit-identical across the whole dial
#: range; the oracle SQL embeds the same value at import, so both
#: engines always agree.
#: Parsed defensively (ADVICE r10): a malformed value falls back to
#: the default instead of crashing registry import; an out-of-range
#: finite value is honored with a warning (see ``config.env_coef``).
MNN_NP_COEF = env_coef("SPARK_GRAFT_MNN_NP_COEF", 0.86, 0.69, 1.38)
MNN_SEL_GRID = 4096  #: md5 grid for the deterministic centroid draw

_MNN_BCOS = V.sql_cosine("ea.embedding", "eb.embedding", DIM)


@register(
    "mutual_nearest_neighbors_bucketed",
    oracle=f"""
    WITH sel AS (
        SELECT n, k, ({MNN_SEL_GRID} * k + n - 1) // greatest(n, 1) AS thr,
               greatest({MNN_NPROBE},
                        CAST(ceil({MNN_NP_COEF} * sqrt(CAST(k AS DOUBLE)))
                             AS BIGINT)) AS np,
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
    a AS (SELECT vec_id AS a_id, cid FROM assign, sel
          WHERE label = {MNN_LABEL_A} AND crank <= sel.np),
    b AS (SELECT vec_id AS b_id, cid FROM assign, sel
          WHERE label = {MNN_LABEL_B} AND crank <= sel.np),
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
    "n/10-sized sides — with each side probing its np = "
    f"max({MNN_NPROBE}, ceil({MNN_NP_COEF}*sqrt(K))) nearest lists "
    "(ADAPTIVE, round 9: a fixed probe count over sqrt(n) lists "
    "covers a shrinking fraction of the space — fixed np=5 recall "
    "slid 0.979/0.785/0.688 at sf0.1/10x/100x; the coefficient was "
    "then set AT THE MEASURED 100x FRONTIER KNEE in round 10: np "
    "5/8/10/12/14 -> recall 0.688/0.907/0.965/0.988/0.997 at wall "
    "263/445/604/830/1198s, so the default 0.86 -> np=10 buys "
    "0.965 recall at HALF the maximal-recall wall, and the bucketed "
    "path is ~2x cheaper than the exact twin already at 200k "
    "vectors; the dial is "
    "SPARK_GRAFT_MNN_NP_COEF, 1.2 restores maximal recall). "
    "SCALING LAW, measured not claimed (round 10): the assign stage "
    "is O(nK) = O(n^1.5); the candidate stage evaluates exactly "
    "npa*npb/K of |A|x|B| (verified to 1-2 percent against the "
    "uniform-collision model at 10x AND 100x), so at a FIXED probe "
    "count it is O(n^1.5) but at CONSTANT RECALL the required "
    "collision budget q(r) shrinks only ~2x per corpus decade "
    "(q at recall~0.97: 1.33 -> 0.69 -> 0.386 across 10x/100x/1000x "
    "— three measured decades, the last in the faithful numpy "
    "replica at 2M vectors) — net pair work ~n^1.73 on this "
    "near-isotropic worst case, "
    "NOT n^1.5; the probe split (symmetric vs query-side-only) is "
    "efficiency-neutral at equal q (measured 0.966@q0.69 sym vs "
    "0.958@q0.63 asym at 100x), so recall is bought with q alone. "
    "Above ~10^6 vectors at high recall the right registry tool is "
    "the trained IVF-PQ rerank ladder, whose per-query probe cost "
    "is corpus-size-independent. Centroids are drawn "
    "deterministically on both engines (vec_id md5 mod "
    f"{MNN_SEL_GRID} under ceil(grid*K/n) — no global sort, no "
    "trained state; IVF-flat seeding), and the n x K assign frame "
    "is persisted so its cosines run once. Measured vs the exact "
    "twin on the near-isotropic synthetic corpus (the HARD case "
    "for data-point quantization): recall 1.0 / 1.0 / 0.979 at "
    "sf0.001/0.01/0.1 (np floor active everywhere); the round-8 "
    "fixed-np dial audit (0.47 / 0.81 / 0.98 at nprobe "
    "3/5/8, numpy-audited at 10x) is what the adaptive rule is "
    "fitted to. At these toy scales the exact "
    "broadcast cross join is still the FASTER plan (11.4s vs 25s "
    "at 10x — candidate work 2.7M rows vs 4M, but across more "
    "stages); the bucketed path exists for the asymptotics — "
    "measured at 100x: 604s vs the exact twin's ~1200s projection, "
    "a gap that widens as ~n^0.25 under the collision law above. "
    "Candidate sims are computed once per (a,b) via DISTINCT "
    "(the cosine is deterministic, so multi-list duplicates are "
    "bit-identical on both engines); the mutual check is the exact "
    "twin's two max_by top-1 aggregates + hash join, shuffle-keyed "
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
    # persisted (ADVICE r9): sel feeds two independent broadcasts
    # (full sel into the centroid draw, sel.np into assign) — without
    # the persist each broadcast re-runs the full-corpus count scan
    sel = tracked_persist(
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
            # adaptive probe count (see MNN_NP_COEF note): np = 5 at
            # every test SF; at the default coefficient, 6 at 10x
            # and 10 at 100x (the measured frontier knee)
            F.greatest(
                F.lit(MNN_NPROBE).cast("bigint"),
                F.ceil(
                    F.lit(MNN_NP_COEF) * F.sqrt(F.col("k").cast("double"))
                ),
            ).alias("np"),
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
    # n x K assign cosines run once; np rides along as a 1-row
    # broadcast so the probe filter can be data-adaptive
    assign = tracked_persist(
        emb.crossJoin(F.broadcast(cent))
        .crossJoin(F.broadcast(sel.select("np")))
        .select(
            "vec_id",
            "label",
            "embedding",
            "cid",
            "np",
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
        (F.col("label") == MNN_LABEL_A) & (F.col("crank") <= F.col("np"))
    ).select(F.col("vec_id").alias("a_id"), F.col("embedding").alias("ea"), "cid")
    b = assign.filter(
        (F.col("label") == MNN_LABEL_B) & (F.col("crank") <= F.col("np"))
    ).select(F.col("vec_id").alias("b_id"), F.col("embedding").alias("eb"), "cid")
    sim = (
        a.join(b, "cid")
        .select(
            "a_id", "b_id", V.cosine(F.col("ea"), F.col("eb")).alias("sim")
        )
        .distinct()
    )
    ab, ba = _mutual_top1(sim)
    return ab.join(ba, ["a_id", "b_id"]).select(
        "a_id",
        "b_id",
        F.round(F.col("sim"), 6).cast("double").alias("sim"),
    )
