"""Semantic checks for curation part 2: DSIR weights must actually
steer toward the target domain, BPE pair counts must match a hand
count, and the k-anonymity audit must flag a planted singleton.
(Cross-engine value parity is covered by test_oracle_parity.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.operators.curation2 import (
    K_ANON,
    bpe_pair_counts,
    corpus_dsir_weights,
    k_anonymity_audit,
)
from kinesis_analytics_demo_spark.session import read_table
from tests.conftest import SF_MEDIUM


def test_dsir_weights_favor_target_domain(spark):
    """Mean log-weight of target-language (en) documents must exceed
    the mean over every other language — otherwise the importance
    weights would resample AWAY from the target domain."""
    w = corpus_dsir_weights(spark, SF_MEDIUM)
    docs = read_table(spark, SF_MEDIUM, "documents").select("doc_id", "lang")
    by_lang = {
        r["lang"]: r["mw"]
        for r in w.join(docs, "doc_id")
        .groupBy("lang")
        .agg(F.avg("log_weight").alias("mw"))
        .collect()
    }
    assert "en" in by_lang
    for lang, mw in by_lang.items():
        if lang != "en":
            assert by_lang["en"] > mw, (lang, mw, by_lang["en"])


def test_bpe_pair_counts_hand_verified(spark, tmp_path):
    rows = [(0, "abab abc", "en", "s", 8), (1, "abba", "en", "s", 4)]
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    path = str(tmp_path)
    df.write.mode("overwrite").parquet(path + "/documents.parquet")
    out = {
        (r["pair"], r["rank"]): r["n"]
        for r in bpe_pair_counts(spark, path).collect()
    }
    # abab: ab,ba,ab  abc: ab,bc  abba: ab,bb,ba  => ab:4 ba:2 bb:1 bc:1
    assert out[("ab", 1)] == 4
    assert out[("ba", 2)] == 2
    assert out[("bb", 3)] == 1
    assert out[("bc", 4)] == 1


def test_k_anonymity_flags_planted_singleton(spark, tmp_path):
    import datetime

    d = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [(i, d, 1, "view", 10.0, "{}") for i in range(K_ANON)] + [
        (99, d, 2, "purchase", 10.0, "{}")  # singleton QI group
    ]
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    path = str(tmp_path)
    df.write.mode("overwrite").parquet(path + "/events.parquet")
    out = k_anonymity_audit(spark, path).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["event_type"], r["value_band"], r["n"]) == ("purchase", 0, 1)
