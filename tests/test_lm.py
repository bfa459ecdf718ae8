"""Bigram-LM cross-entropy: predictable text must score lower than
word salad, and scores are positive/finite."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from kinesis_analytics_demo_spark.plans.registry import get_query
from tests.conftest import SF_MEDIUM


def test_lm_scores_positive_finite(spark):
    import math

    rows = get_query("doc_lm_cross_entropy").fn(spark, SF_MEDIUM).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["cross_entropy"] > 0 and math.isfinite(r["cross_entropy"])


def test_lm_prefers_predictable_text(spark, tmp_path):
    """doc 0 repeats one phrase (bigrams the corpus has seen many
    times); doc 1 is a chain of words that each occur once — its
    smoothed bigram probabilities are tiny, so its cross-entropy must
    be higher."""
    repetitive = " ".join(["the cat sat"] * 30)
    salad = " ".join(f"w{i}" for i in range(90))
    table = pa.table(
        {
            "doc_id": pa.array([0, 1], type=pa.int64()),
            "text": pa.array([repetitive, salad]),
            "lang": pa.array(["en", "en"]),
            "source": pa.array(["a", "a"]),
            "n_chars": pa.array(
                [len(repetitive), len(salad)], type=pa.int64()
            ),
        }
    )
    pq.write_table(table, os.path.join(tmp_path, "documents.parquet"))
    rows = {
        r["doc_id"]: r["cross_entropy"]
        for r in get_query("doc_lm_cross_entropy").fn(spark, str(tmp_path)).collect()
    }
    assert rows[0] < rows[1]
