"""k-means IVF: determinism and recall pins. The operator has no SQL
oracle (iterative algorithm — driver records a rows-only check), so
these tests carry its correctness story instead:

- centroids are bit-deterministic across runs / partitioning;
- ANN recall@10 vs the exact brute-force top-k must beat the
  untrained label-centroid IVF's floor.
"""

from __future__ import annotations

from kinesis_analytics_demo_spark.plans.registry import all_queries
from tests.conftest import SF_MEDIUM


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def test_kmeans_centroids_deterministic(spark):
    from pyspark.sql import functions as F

    from kinesis_analytics_demo_spark.operators.similarity import kmeans_centroids
    from kinesis_analytics_demo_spark.session import read_table

    emb = read_table(spark, SF_MEDIUM, "embeddings")
    a = kmeans_centroids(emb).collect()
    # different partitioning must not change a single bit
    b = kmeans_centroids(emb.repartition(13, "vec_id")).collect()
    am = {r.cid: list(r.cv) for r in a}
    bm = {r.cid: list(r.cv) for r in b}
    assert am == bm
    assert len(am) >= 2  # clusters survived


def _recall(exact, approx):
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    return hits / sum(len(v) for v in exact.values())


def test_kmeans_ivf_recall_beats_floor(spark):
    qs = all_queries()
    exact = _topk_sets(qs["similarity_cosine_topk"].fn(spark, SF_MEDIUM))
    trained = _topk_sets(qs["similarity_ivf_kmeans"].fn(spark, SF_MEDIUM))
    recall = _recall(exact, trained)
    # trained centroids at nprobe=4 measure 0.93 (0.82 at nprobe=2);
    # pin a floor just under.
    assert recall >= 0.90, f"recall@10 = {recall:.2f}"


def test_multitable_lsh_recall_beats_floor(spark):
    """The CANONICAL ``similarity_ann_lsh`` name must return
    production-quality answers: it now points at the OR-construction
    multi-table variant (the round-1 single-table multiprobe sat at
    0.47 recall@10 — the 8x6-plane multi-table variant measures 0.86
    on this near-random corpus, true top-10 sims only 0.24-0.49).
    Pin a floor just under; a regression that re-points the canonical
    name at a low-recall variant fails here."""
    qs = all_queries()
    exact = _topk_sets(qs["similarity_cosine_topk"].fn(spark, SF_MEDIUM))
    mt = _topk_sets(qs["similarity_ann_lsh"].fn(spark, SF_MEDIUM))
    recall = _recall(exact, mt)
    # 12 tables x 6 planes measures 0.95 (8x6 measured 0.86)
    assert recall >= 0.93, f"recall@10 = {recall:.2f}"
