"""Semantic checks for dedup part 2: containment must catch a planted
truncation that symmetric Jaccard misses, the ordered-pair semantics
must hold (containment is asymmetric), and the cross-source matrix
must attribute a planted cross-source near-dup to the right cell.
(Cross-engine value parity — including the proof that rarest-prefix
candidate generation equals the exhaustive oracle — is covered by
test_oracle_parity.)"""

from __future__ import annotations

from kinesis_analytics_demo_spark.operators.dedup import JACCARD_THRESHOLD
from kinesis_analytics_demo_spark.operators.dedup2 import (
    dedup_containment_pairs,
    dedup_cross_source_matrix,
)

_WORDS = [f"w{i}" for i in range(40)]


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    path = str(tmp_path)
    df.write.mode("overwrite").parquet(path + "/documents.parquet")
    return path


def test_containment_catches_truncation_jaccard_misses(spark, tmp_path):
    """doc 1 is the first quarter of doc 0: containment(1 -> 0) = 1.0
    while Jaccard is ~0.25 (far below the 0.8 dup threshold). Unique
    filler docs keep every shingle under the df cap."""
    long_text = " ".join(_WORDS)
    short_text = " ".join(_WORDS[:10])
    rows = [
        (0, long_text, "en", "a", len(long_text)),
        (1, short_text, "en", "b", len(short_text)),
    ] + [
        (i, " ".join(f"u{i}x{j}" for j in range(12)), "en", "c", 60)
        for i in range(2, 120)
    ]
    path = _write_docs(spark, tmp_path, rows)
    out = {
        (r["src_doc"], r["dst_doc"]): r["containment"]
        for r in dedup_containment_pairs(spark, path).collect()
    }
    assert out[(1, 0)] == 1.0  # the truncation, caught
    # asymmetric: the long doc is NOT contained in its excerpt
    assert (0, 1) not in out
    # and the SYMMETRIC near-dup machinery would have missed it:
    # shared/union = 8 / (38 + 8) ~ 0.17 << 0.8
    n_short, n_long = 10 - 2, 40 - 2  # 3-gram shingle counts
    shared = n_short
    jac = shared / (n_long + n_short - shared)
    assert jac < JACCARD_THRESHOLD


def test_containment_df_cap_vetoes_boilerplate(spark, tmp_path):
    """A 3-gram pasted into >2% of documents is boilerplate and must
    not create containment pairs: a tiny doc consisting ONLY of the
    boilerplate gram has an empty capped shingle set and vanishes."""
    boiler = "all rights reserved"
    rows = [(0, boiler, "en", "a", len(boiler))] + [
        (
            i,
            " ".join(f"u{i}x{j}" for j in range(10)) + " " + boiler,
            "en",
            "b",
            80,
        )
        for i in range(1, 60)
    ]
    path = _write_docs(spark, tmp_path, rows)
    out = dedup_containment_pairs(spark, path).collect()
    srcs = {r["src_doc"] for r in out}
    assert 0 not in srcs  # the boilerplate-only doc matches nothing


def test_cross_source_matrix_attributes_planted_pair(spark, tmp_path):
    """Two near-identical docs in different sources must produce
    exactly one (srcA, srcB) cell with one pair; order normalized."""
    base = " ".join(_WORDS)
    near = " ".join(_WORDS[:-1] + ["w39x"])  # one-word edit: jaccard > 0.8
    rows = [
        (0, base, "en", "zeta", len(base)),
        (1, near, "en", "alpha", len(near)),
    ] + [
        (i, " ".join(f"u{i}x{j}" for j in range(12)), "en", "filler", 60)
        for i in range(2, 40)
    ]
    path = _write_docs(spark, tmp_path, rows)
    out = dedup_cross_source_matrix(spark, path).collect()
    cells = {(r["src_a"], r["src_b"]): r["dup_pairs"] for r in out}
    assert cells == {("alpha", "zeta"): 1}
