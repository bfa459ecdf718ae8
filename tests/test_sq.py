"""SQ8 scalar quantization: high-fidelity compression — recall vs the
exact search must be near-perfect, unlike the deliberately lossier PQ
path."""

from __future__ import annotations

from kinesis_analytics_demo_spark.plans.registry import get_query
from tests.conftest import SF_MEDIUM


def _topk(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_sq8_recall_vs_exact(spark):
    exact = _topk(get_query("similarity_cosine_topk").fn(spark, SF_MEDIUM))
    sq = _topk(get_query("similarity_sq8_topk").fn(spark, SF_MEDIUM))
    assert exact.keys() == sq.keys()
    hits = sum(len(exact[q] & sq[q]) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    recall = hits / total
    # int8 keeps ~2 decimal digits per dim: recall@10 should be near 1
    assert recall >= 0.9, f"SQ8 recall@10 {recall:.2f}"


def test_sq8_error_small_relative_to_norms(spark):
    from pyspark.sql import functions as F

    from kinesis_analytics_demo_spark.functions import vectors as V
    from kinesis_analytics_demo_spark.session import read_table

    err = {
        r["label"]: (r["total_sq_err"], r["n_vectors"])
        for r in get_query("embedding_sq8_error").fn(spark, SF_MEDIUM).collect()
    }
    emb = read_table(spark, SF_MEDIUM, "embeddings")
    norms = {
        r["label"]: r["s"]
        for r in emb.groupBy("label")
        .agg(F.sum(V.dot(F.col("embedding"), F.col("embedding"))).alias("s"))
        .collect()
    }
    for label, (e, _n) in err.items():
        # per-label squared error under 0.1% of the energy
        assert e < 1e-3 * norms[label], (label, e, norms[label])
