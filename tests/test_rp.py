"""Random-projection ANN: recall floor vs the exact search and the
JL distance-preservation property."""

from __future__ import annotations

from kinesis_analytics_demo_spark.plans.registry import get_query
from tests.conftest import SF_MEDIUM


def _topk(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_rp_rerank_recall_floor(spark):
    exact = _topk(get_query("similarity_cosine_topk").fn(spark, SF_MEDIUM))
    rp = _topk(get_query("similarity_rp_topk_rerank").fn(spark, SF_MEDIUM))
    hits = sum(len(exact[q] & rp[q]) for q in exact)
    total = sum(len(exact[q]) for q in exact)
    assert hits / total >= 0.8, f"RP rerank recall@10 {hits / total:.2f}"


def test_rp_preserves_norms_in_expectation(spark):
    """JL sanity: the projected squared norm concentrates around the
    original — mean ratio within 25% of 1 across the corpus."""
    import math

    from pyspark.sql import functions as F

    from kinesis_analytics_demo_spark.functions import vectors as V
    from kinesis_analytics_demo_spark.operators.rp import _project
    from kinesis_analytics_demo_spark.session import read_table

    emb = read_table(spark, SF_MEDIUM, "embeddings")
    row = (
        emb.select(
            (
                V.dot(_project(F.col("embedding")), _project(F.col("embedding")))
                / V.dot(F.col("embedding"), F.col("embedding"))
            ).alias("ratio")
        )
        .agg(F.avg("ratio").alias("m"))
        .collect()[0]
    )
    assert math.isfinite(row["m"])
    assert 0.75 < row["m"] < 1.25, row["m"]
