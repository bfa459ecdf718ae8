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


def test_bpe_encode_matches_python_reference(spark):
    """Encoding with the trained merges must equal the pure-Python
    pipeline (train 5 merges, apply greedy leftmost, count subwords
    per doc) on the real sf0.001 corpus."""
    import collections
    import re

    from kinesis_analytics_demo_spark.operators.curation2 import (
        bpe_encode_tokens,
    )
    from kinesis_analytics_demo_spark.session import read_table
    from tests.conftest import SF_SMALL

    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens_bpe"])
        for r in bpe_encode_tokens(spark, SF_SMALL).collect()
    }

    texts = {
        r["doc_id"]: r["text"]
        for r in read_table(spark, SF_SMALL, "documents")
        .select("doc_id", "text").collect()
    }
    wc = collections.Counter(
        w for t in texts.values() for w in re.split(r"\s+", t) if w
    )
    words = {w: [list(w), n] for w, n in wc.items()}
    for _ in range(5):
        pc = collections.Counter()
        for syms, n in words.values():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += n
        if not pc:
            break
        (a, b), _cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        for v in words.values():
            out = []
            for s in v[0]:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            v[0] = out
    exp = {}
    for doc_id, t in texts.items():
        toks = [w for w in re.split(r"\s+", t) if w]
        if toks:
            exp[doc_id] = (
                len(toks), sum(len(words[w][0]) for w in toks)
            )
    assert got == exp


def test_bpe_train_ignores_empty_tokens(spark, tmp_path):
    """Leading/trailing whitespace makes F.split emit zero-length
    tokens; unguarded, Spark's descending sequence(1, 0) == [1, 0]
    turns each into syms == ["", ""] and a phantom ("", "") pair that
    outweighs every real merge (ADVICE r4). The trainer must elect
    the same merges as for the stripped corpus."""
    from kinesis_analytics_demo_spark.operators.curation2 import bpe_train

    rows = [(0, "  abab abc  ", "en", "s", 12), (1, " abba ", "en", "s", 6)]
    df = spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    )
    path = str(tmp_path)
    df.write.mode("overwrite").parquet(path + "/documents.parquet")
    merges, words_df = bpe_train(spark, path, n_merges=2)
    pairs = [(m[1], m[2]) for m in merges]
    assert ("", "") not in pairs, merges
    # "ab" is the true top pair (count 4) in both docs
    assert merges[0][1] + merges[0][2] == "ab", merges
    # no empty-word row survives into the trained word table
    assert words_df.filter(F.size("syms") == 0).count() == 0
    words_df.unpersist()


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


def test_knn_disagreement_flags_planted_mislabel(spark, tmp_path):
    """Three tight clusters; one cluster-0 vector carries a wrong
    label — its neighbors are all cluster-0, so it must be flagged
    suspect; correctly-labeled audit vectors must not be."""
    import random

    rng = random.Random(7)
    centers = {
        0: [1.0] * 64,
        1: [-1.0] * 64,
        2: [1.0] * 32 + [-1.0] * 32,
    }
    rows = []
    vid = 0
    for label, center in centers.items():
        for _ in range(12):
            vec = [c + rng.uniform(-0.01, 0.01) for c in center]
            rows.append((vid, vec, label))
            vid += 1
    # vec_id 0 is in the audit sample (0 % 10 == 0); mislabel it
    rows[0] = (0, rows[0][1], 9)
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    df.write.mode("overwrite").parquet(str(tmp_path) + "/embeddings.parquet")

    from kinesis_analytics_demo_spark.operators.curation2 import (
        label_knn_disagreement,
    )

    out = {
        r["vec_id"]: (r["frac_disagree"], r["suspect"])
        for r in label_knn_disagreement(spark, str(tmp_path)).collect()
    }
    assert out[0] == (1.0, True)
    for vid_, (frac, suspect) in out.items():
        if vid_ != 0:
            assert not suspect, (vid_, frac)


def test_l_diversity_flags_uniform_sensitive_group(spark, tmp_path):
    import datetime

    h0 = datetime.datetime(2024, 5, 1, 10, 0, 0)
    h1 = datetime.datetime(2024, 5, 1, 11, 0, 0)
    s = datetime.timedelta(seconds=10)
    rows = (
        # 10 views in hour h0, ALL the same value band: k-anonymous
        # (large group) yet l-diverse FAIL
        [(i, h0 + i * s, 1, "view", 10.0, "{}") for i in range(10)]
        # 10 views in hour h1 across 3 bands: passes
        + [
            (100 + i, h1 + i * s, 1, "view", float(v), "{}")
            for i, v in enumerate([10, 60, 110] * 4)
        ]
    )
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df.write.mode("overwrite").parquet(str(tmp_path) + "/events.parquet")

    from kinesis_analytics_demo_spark.operators.curation2 import (
        l_diversity_audit,
    )

    out = l_diversity_audit(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["event_type"], r["n"], r["n_sensitive"]) == ("view", 10, 1)
    assert r["qi_hour"] == h0


def test_bpe_train_matches_python_reference(spark):
    """The distributed 5-merge BPE trainer must equal a pure-Python
    reference implementation (greedy leftmost merge, (count desc,
    pair) argmax tiebreak) on the real sf0.001 corpus."""
    import collections
    import re

    from kinesis_analytics_demo_spark.operators.curation2 import (
        bpe_train_merges,
    )
    from kinesis_analytics_demo_spark.session import read_table
    from tests.conftest import SF_SMALL

    got = [
        tuple(r) for r in bpe_train_merges(spark, SF_SMALL).collect()
    ]

    texts = [
        r["text"]
        for r in read_table(spark, SF_SMALL, "documents")
        .select("text").collect()
    ]
    wc = collections.Counter(
        w for t in texts for w in re.split(r"\s+", t)
    )
    words = {w: [list(w), n] for w, n in wc.items()}
    exp = []
    for it in range(5):
        pc = collections.Counter()
        for syms, n in words.values():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += n
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merged = a + b
        exp.append((it, a, b, merged, cnt))
        for v in words.values():
            out = []
            for s in v[0]:
                if out and out[-1] == a and s == b:
                    out[-1] = merged
                else:
                    out.append(s)
            v[0] = out
    assert got == exp
    assert len(got) == 5


def test_rebalanced_shards_are_size_balanced(spark):
    """Every shard's byte total must be within one document of the
    target, shard ids must be contiguous from 0, and the assignment
    must be a pure function of the data (rerun-stable)."""
    from kinesis_analytics_demo_spark.operators.curation2 import (
        SHARD_TARGET_BYTES,
        corpus_rebalance_shards,
    )
    from kinesis_analytics_demo_spark.session import read_table
    from tests.conftest import SF_MEDIUM

    assign = corpus_rebalance_shards(spark, SF_MEDIUM)
    docs = read_table(spark, SF_MEDIUM, "documents").select(
        "doc_id", "n_chars"
    )
    per_shard = {
        r["shard_id"]: (r["bytes"], r["n_docs"])
        for r in assign.join(docs, "doc_id")
        .groupBy("shard_id")
        .agg(
            F.sum("n_chars").alias("bytes"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .collect()
    }
    ids = sorted(per_shard)
    assert ids == list(range(len(ids)))
    max_doc = max(r["n_chars"] for r in docs.collect())
    for sid in ids[:-1]:  # every full shard ends within one doc of target
        b, _ = per_shard[sid]
        assert b >= SHARD_TARGET_BYTES - max_doc, (sid, b)
        assert b < SHARD_TARGET_BYTES + max_doc, (sid, b)
    # rerun-stable
    again = {
        (r["doc_id"], r["shard_id"])
        for r in corpus_rebalance_shards(spark, SF_MEDIUM).collect()
    }
    assert again == {
        (r["doc_id"], r["shard_id"]) for r in assign.collect()
    }


def test_dp_noisy_counts_perturb_but_stay_close(spark):
    from kinesis_analytics_demo_spark.operators.curation2 import (
        dp_noisy_counts,
    )
    from tests.conftest import SF_MEDIUM

    rows = dp_noisy_counts(spark, SF_MEDIUM).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["noisy_count"] != r["true_count"], r
        # Laplace b=1: |noise| beyond 25 has probability e^-25
        assert abs(r["noisy_count"] - r["true_count"]) < 25, r
