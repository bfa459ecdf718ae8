"""Semantic checks for the training-boundary operators beyond oracle
parity: packing respects budgets, mixing flattens the distribution,
decontamination catches planted leaks."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.plans.registry import all_queries
from kinesis_analytics_demo_spark.session import read_table
from tests.conftest import SF_MEDIUM


def test_pack_sequences_matches_naive_model(spark):
    """Within each shard, pack assignment must equal the sequential
    greedy floor(prev_cumsum/budget) fold over doc_id order."""
    from kinesis_analytics_demo_spark.operators.training import PACK_TOKEN_BUDGET

    rows = all_queries()["pack_sequences"].fn(spark, SF_MEDIUM).collect()
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append((r.doc_id, r.n_tokens, r.pack_id))
    assert len(by_shard) > 1
    for shard, docs in by_shard.items():
        docs.sort()
        cum = 0
        for doc_id, n_tokens, pack_id in docs:
            assert pack_id == cum // PACK_TOKEN_BUDGET, (shard, doc_id)
            cum += n_tokens
        # pack ids are dense from 0
        packs = {p for _, _, p in docs}
        assert packs == set(range(max(packs) + 1))


def test_corpus_mix_flattens_language_distribution(spark):
    """T=2 mixing must shrink the dominant language's share toward the
    mean while keeping the smallest language intact."""
    docs = read_table(spark, SF_MEDIUM, "documents")
    before = Counter(
        {r.lang: r.n for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    )
    mixed = all_queries()["corpus_mix_temperature"].fn(spark, SF_MEDIUM)
    after = Counter(
        {r.lang: r.n for r in mixed.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    )
    assert set(after) == set(before)

    def spread(c):
        return max(c.values()) / min(c.values())

    assert spread(after) < spread(before)  # flatter
    smallest = min(before, key=before.get)
    assert after[smallest] == before[smallest]  # smallest kept whole
    dominant = max(before, key=before.get)
    assert after[dominant] < before[dominant]  # dominant downsampled


def test_decontamination_catches_planted_leak(spark):
    """A training doc sharing its text with a benchmark doc must be
    flagged; every flagged doc must genuinely share a 3-gram."""
    from kinesis_analytics_demo_spark.operators.training import (
        BENCHMARK_MAX_DOC_ID,
    )

    docs = read_table(spark, SF_MEDIUM, "documents")
    # plant: copy benchmark doc 0's text into a fake training doc
    bench_text = (
        docs.filter(F.col("doc_id") == 0).select("text").collect()[0][0]
    )
    planted_id = 10_000_000
    planted = docs.select("doc_id", "text").unionByName(
        spark.createDataFrame([(planted_id, bench_text)], "doc_id long, text string")
    )
    from kinesis_analytics_demo_spark.operators.dedup import _distinct_shingles

    dsh = _distinct_shingles(planted)
    bench = dsh.filter(F.col("doc_id") < BENCHMARK_MAX_DOC_ID).select(
        F.col("doc_id").alias("bench_doc"), "h"
    )
    train = dsh.filter(F.col("doc_id") >= BENCHMARK_MAX_DOC_ID)
    hits = (
        train.join(F.broadcast(bench), "h")
        .groupBy("doc_id")
        .agg(F.count_distinct("bench_doc").alias("n_benchmark_docs"))
    )
    flagged = {r.doc_id for r in hits.collect()}
    assert planted_id in flagged


def test_boilerplate_ngrams_hand_model(spark):
    """Hand-built corpus: a 3-gram shared by >= BOILERPLATE_MIN_DF docs
    counts as boilerplate for every doc containing it; unique grams
    don't; the keep flag flips at BOILERPLATE_MAX_FRAC."""
    from kinesis_analytics_demo_spark.operators.text import (
        BOILERPLATE_MAX_FRAC,
        BOILERPLATE_MIN_DF,
        text_boilerplate_ngrams,
    )
    from kinesis_analytics_demo_spark.operators import text as T
    from kinesis_analytics_demo_spark.session import read_table as real_read

    shared = "alpha beta gamma"  # one 3-gram, planted in MIN_DF docs
    carriers = [
        (i, f"{shared} u{i}a u{i}b u{i}c", "en", "s", 0)
        for i in range(BOILERPLATE_MIN_DF)
    ]
    # carrier grams: [shared, 'gamma u{i}a u{i}b'...] -> 4 grams each,
    # exactly 1 boilerplate -> frac 0.25
    clean = [(90, "x0 x1 x2 x3 x4", "en", "s", 0)]  # 3 grams, all unique
    hot = [
        (91, shared, "en", "s", 0)  # 1 gram, boilerplate -> frac 1.0
    ]
    docs = spark.createDataFrame(
        carriers + clean + hot,
        "doc_id long, text string, lang string, source string, n_chars long",
    )

    orig = T._t
    T._t = lambda spark, sf_dir, name: docs
    try:
        rows = {r.doc_id: r for r in text_boilerplate_ngrams(spark, "ignored").collect()}
    finally:
        T._t = orig

    for i in range(BOILERPLATE_MIN_DF):
        r = rows[i]
        assert (r.n_grams, r.n_boilerplate) == (4, 1), r
        assert abs(r.boilerplate_frac - 0.25) < 1e-12
        assert r.keep == (0.25 < BOILERPLATE_MAX_FRAC)
    assert (rows[90].n_boilerplate, rows[90].keep) == (0, True)
    r91 = rows[91]
    assert (r91.n_grams, r91.n_boilerplate, r91.keep) == (1, 1, False)


def test_pii_scan_and_redact_on_planted_pii(spark):
    """The corpus has no PII-shaped strings, so oracle parity alone is
    vacuous for the PII ops — plant every pattern class and check both
    the scan counts and the redaction transform against hand values."""
    from kinesis_analytics_demo_spark.operators import text as T

    docs = spark.createDataFrame(
        [
            (0, "contact bob.smith+x@example.co.uk or 555-123-4567 now", "en", "s", 0),
            (1, "ssn 078-05-1120 appears twice 078-05-1120 here", "en", "s", 0),
            (2, "clean text with no sensitive spans at all", "en", "s", 0),
            # phone-pattern and ssn-pattern overlap: 123-45-6789 is
            # SSN-shaped, 123-456-7890 is phone-shaped
            (3, "a@b.io 123-45-6789 123-456-7890", "en", "s", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    orig = T._t
    T._t = lambda spark, sf_dir, name: docs
    try:
        scan = {r.doc_id: r for r in T.text_pii_scan(spark, "ignored").collect()}
        red = {r.doc_id: r for r in T.text_pii_redact(spark, "ignored").collect()}
    finally:
        T._t = orig

    assert (scan[0].n_emails, scan[0].n_phones, scan[0].n_ssnish) == (1, 1, 0)
    assert (scan[1].n_emails, scan[1].n_phones, scan[1].n_ssnish) == (0, 0, 2)
    assert not scan[2].has_pii and scan[3].has_pii
    assert (scan[3].n_emails, scan[3].n_phones, scan[3].n_ssnish) == (1, 1, 1)

    assert red[0].n_redactions == 2
    assert red[1].n_redactions == 2
    assert (red[2].n_redactions, red[2].redacted_len) == (0, 41)
    assert red[3].n_redactions == 3
    # redaction really removes the spans: redacted text of doc 3 is
    # exactly the placeholders
    import hashlib

    expect = "<EMAIL> <ID> <PHONE>"
    assert red[3].redacted_md5 == hashlib.md5(expect.encode()).hexdigest()
    assert red[3].redacted_len == len(expect)


def test_weighted_sample_biases_toward_quality(spark):
    """corpus_sample_weighted must over-represent high-quality docs:
    the mean quality of the K sampled docs exceeds the corpus mean
    (Efraimidis-Spirakis with w = quality score)."""
    from pyspark.sql import functions as F

    from kinesis_analytics_demo_spark.operators.text import text_quality_score
    from kinesis_analytics_demo_spark.plans.registry import all_queries

    sample = all_queries()["corpus_sample_weighted"].fn(spark, SF_MEDIUM)
    sampled_mean = sample.agg(F.avg("quality_score")).collect()[0][0]
    corpus_mean = (
        text_quality_score(spark, SF_MEDIUM)
        .agg(F.avg("quality_score"))
        .collect()[0][0]
    )
    assert sampled_mean > corpus_mean


def test_leakage_safe_split_keeps_clusters_together(spark):
    """Every near-dup cluster lands ENTIRELY in one split (the whole
    point), and multi-doc clusters exist at this SF so the invariant
    is non-vacuous; per-doc splits would violate it with high
    probability on any cluster >= 2."""
    from pyspark.sql import functions as F

    from kinesis_analytics_demo_spark.plans.registry import all_queries

    df = all_queries()["corpus_split_leakage_safe"].fn(spark, SF_MEDIUM)
    per_cluster = df.groupBy("cluster_id").agg(
        F.countDistinct("split").alias("n_splits"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    assert per_cluster.filter(F.col("n_splits") > 1).count() == 0
    assert per_cluster.filter(F.col("n_docs") >= 2).count() > 0
