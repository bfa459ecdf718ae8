"""N-gram language-model scoring: per-document cross-entropy under a
corpus-trained bigram model with add-one smoothing — the "perplexity
filter" from CCNet/CC-style pipelines (Wenzek et al. 2020 train a
KenLM and drop high-perplexity documents; the bigram MLE here is the
engine-native analog that needs no external model artifact).

    P(w2 | w1) = (c(w1 w2) + 1) / (c(w1 ·) + V)
    H(doc)     = -(1/m) * sum over bigram occurrences of ln P

where c(w1 w2) is the corpus bigram count, c(w1 ·) the count of
bigrams starting with w1, V the corpus vocabulary size, and m the
document's bigram count. Low H = text the corpus finds predictable;
documents with H far above the corpus median are word salad, far
below are boilerplate — both standard drop candidates.

Scale: the bigram stream is ONE `lead()`-shingle scan of the corpus;
model counts are two hash aggregates on that stream (map-side
combined); scoring re-joins the stream to the counts on md5-hashed 8-byte
bigram/context keys (the dedup-family shuffle-width discipline —
strings never leave the scan stage). The per-doc fold is bounded by
document length and ordered by the hash key on both engines.

Determinism: every ln() input is a ratio of exact integers (single
IEEE double division), each term multiplies by an integer tf, and the
per-doc sum folds LEFT-TO-RIGHT over the bigram-sorted term list on
both engines — the proven entropy/KL pattern (operators/text2.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.functions import hashing as H
from kinesis_analytics_demo_spark.plans.registry import register
from kinesis_analytics_demo_spark.session import read_table as _t

_SQL_TOKENS = "string_split_regex(text, '\\s+')"


@register(
    "doc_lm_cross_entropy",
    oracle=f"""
    WITH bg AS (
        SELECT doc_id, unnest({H.sql_word_shingles('text', 2)}) AS b
        FROM documents),
    hh AS (
        SELECT doc_id,
               {H.sql_md5_long('b')} AS bh,
               {H.sql_md5_long("string_split(b, ' ')[1]")} AS w1h
        FROM bg),
    vocab AS (
        SELECT count(DISTINCT w) AS v
        FROM (SELECT unnest({_SQL_TOKENS}) AS w FROM documents)),
    c12 AS (SELECT bh, count(*) AS c12 FROM hh GROUP BY bh),
    c1 AS (SELECT w1h, count(*) AS c1 FROM hh GROUP BY w1h),
    tf AS (SELECT doc_id, bh, w1h, count(*) AS tf
           FROM hh GROUP BY doc_id, bh, w1h),
    terms AS (
        SELECT tf.doc_id, tf.bh, tf.tf,
               ln((c12.c12 + 1) / (c1.c1 + (SELECT v FROM vocab))) AS lp
        FROM tf
        JOIN c12 ON tf.bh = c12.bh
        JOIN c1 ON tf.w1h = c1.w1h),
    l AS (
        SELECT doc_id,
               list(struct_pack(tf := CAST(tf AS DOUBLE), lp := lp)
                    ORDER BY bh) AS ts,
               sum(tf) AS m
        FROM terms GROUP BY doc_id)
    SELECT doc_id,
           CAST(m AS BIGINT) AS n_bigrams,
           ROUND(-(list_sum([s.tf * s.lp for s in ts]) / m), 6)
               AS cross_entropy
    FROM l
    """,
    doc="Per-document cross-entropy under a corpus bigram LM with "
    "add-one smoothing — the engine-native perplexity filter (CCNet-"
    "style). One lead()-shingle scan feeds the model counts and the "
    "scoring join; the only order-sensitive sum folds left-to-right "
    "over the bigram-sorted terms, and every ln() input is an exact "
    "integer ratio — bit-reproducible across engines.",
)
def doc_lm_cross_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    # hash the bigram and its first-word context to 8-byte keys at the
    # scan: model counts, the scoring joins, and the per-doc fold key
    # all carry longs — bigram STRINGS never shuffle (the dedup-family
    # discipline; md5 is engine-identical so any negligible collision
    # hits both sides equally)
    bg = docs.select(
        "doc_id", F.explode(H.word_shingles(F.col("text"), 2)).alias("b")
    ).select(
        "doc_id",
        H.md5_long(F.col("b")).alias("bh"),
        H.md5_long(F.split(F.col("b"), " ")[0]).alias("w1h"),
    )
    vocab = (
        docs.select(F.explode(H.words(F.col("text"))).alias("w"))
        .agg(F.count_distinct("w").alias("v"))
    )
    # ONE explode-scan: aggregate to per-doc term frequencies first,
    # then attach both model counts as WINDOW sums over the compact tf
    # stream — c12 = sum(tf) over partitionBy(bh), c1 = sum(tf) over
    # partitionBy(w1h). The earlier formulation persisted tf and ran
    # two groupBy aggregates joined back onto it (5 exchanges + 2
    # joins + a persist); the window form is the same single tf
    # derivation flowing through exactly two exchanges, no joins, no
    # cache (r11 optimization round: 16 jobs -> 11, min-of-5 wall
    # 2.04s -> 1.56s at sf0.1). Still one corpus scan for the bigram
    # stream, and the shuffles carry only O(doc x distinct-bigram)
    # hash-keyed rows (the dedup-family shuffle-width discipline).
    from pyspark.sql import Window

    tf = bg.groupBy("doc_id", "bh", "w1h").agg(
        F.count(F.lit(1)).alias("tf")
    )
    terms = (
        tf.withColumn("c12", F.sum("tf").over(Window.partitionBy("bh")))
        .withColumn("c1", F.sum("tf").over(Window.partitionBy("w1h")))
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            "bh",
            "tf",
            F.log((F.col("c12") + 1) / (F.col("c1") + F.col("v"))).alias("lp"),
        )
    )
    l = terms.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("bh"), F.col("tf"), F.col("lp")))
            ),
            lambda s: F.struct(
                s["tf"].cast("double").alias("tf"), s["lp"].alias("lp")
            ),
        ).alias("ts"),
        F.sum("tf").alias("m"),
    )
    fold = F.aggregate(
        F.col("ts"),
        F.lit(0.0),
        lambda acc, s: acc + s["tf"] * s["lp"],
    )
    return l.select(
        "doc_id",
        F.col("m").cast("bigint").alias("n_bigrams"),
        F.round(-(fold / F.col("m")), 6).alias("cross_entropy"),
    )


# ---------------------------- interpolated Kneser-Ney bigram model
KN_D = 0.75  #: absolute discount
KN_TOP = 50  #: highest-count bigrams reported


@register(
    "kneser_ney_bigram_probs",
    oracle=f"""
    WITH bg AS (
        SELECT unnest({H.sql_word_shingles('text', 2)}) AS b
        FROM documents),
    sp AS (
        SELECT string_split(b, ' ')[1] AS w1,
               string_split(b, ' ')[2] AS w2
        FROM bg),
    c12 AS (SELECT w1, w2, COUNT(*) AS c FROM sp GROUP BY w1, w2),
    c1 AS (
        SELECT w1, SUM(c) AS c1, COUNT(*) AS n1p
        FROM c12 GROUP BY w1),
    r2 AS (SELECT w2, COUNT(*) AS n1pr FROM c12 GROUP BY w2),
    tt AS (SELECT COUNT(*) AS nbt FROM c12)
    SELECT c12.w1, c12.w2,
           CAST(c12.c AS BIGINT) AS c,
           CAST(ROUND(GREATEST(c12.c - {KN_D}, 0.0) / c1.c1
                      + {KN_D} * c1.n1p / c1.c1
                        * (CAST(r2.n1pr AS DOUBLE) / (SELECT nbt FROM tt)),
                      6) AS DOUBLE) AS p_kn
    FROM c12 JOIN c1 ON c1.w1 = c12.w1
    JOIN r2 ON r2.w2 = c12.w2
    ORDER BY c12.c DESC, c12.w1, c12.w2
    LIMIT {KN_TOP}
    """,
    doc=f"Interpolated Kneser-Ney bigram probabilities (Kneser & Ney "
    "1995; Chen & Goodman 1999) for the corpus's top-"
    f"{KN_TOP} bigrams: P(w2|w1) = max(c - D, 0)/c(w1) + "
    "D * N1+(w1,.)/c(w1) * Pcont(w2), with the continuation "
    "probability Pcont(w2) = N1+(.,w2) / (distinct bigram types) — "
    "the smoothing that scores words by how many CONTEXTS they "
    f"follow, not how often (D = {KN_D}). Complements "
    "doc_lm_cross_entropy's add-one model with the production-grade "
    "smoother. All counts are exact integers from one bigram-shingle "
    "scan; each probability is a single IEEE expression in identical "
    "operand order. Scale: three hash aggregates over bigram / "
    "context / right-context keys (the dedup shuffle-width "
    "discipline — hashes, never raw text, would key the shuffles at "
    "100 TB); the top-K cut is WindowGroupLimit-able.",
)
def kneser_ney_bigram_probs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    bg = docs.select(
        F.explode(H.word_shingles(F.col("text"), 2)).alias("b")
    )
    sp = bg.select(
        F.split(F.col("b"), " ").getItem(0).alias("w1"),
        F.split(F.col("b"), " ").getItem(1).alias("w2"),
    )
    # FOUR DataFrames derive from c12 (itself, c1, r2, tt) and Spark
    # will not ReusedExchange across them — their pruned projections
    # differ — so without a persist the corpus is scanned and shingled
    # four times (r11 before-plan: 4 Scan parquet, 0 ReusedExchange).
    # Persisting the compact bigram-type table collapses that to ONE
    # scan; c1/r2/tt are then cheap map-side-combined aggregates over
    # the cache and re-attach as broadcasts, so the big table itself
    # never shuffles again (vs window-sum attachment, which would move
    # the full c12 stream through two more exchanges — the opposite
    # trade from doc_lm_cross_entropy above, where the "aggregates"
    # were the same width as the stream).
    from kinesis_analytics_demo_spark.caching import tracked_persist

    c12 = tracked_persist(
        sp.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    )
    c1 = c12.groupBy("w1").agg(
        F.sum("c").alias("c1"), F.count(F.lit(1)).alias("n1p")
    )
    r2 = c12.groupBy("w2").agg(F.count(F.lit(1)).alias("n1pr"))
    tt = c12.agg(F.count(F.lit(1)).alias("nbt"))
    pkn = F.round(
        F.greatest(F.col("c") - KN_D, F.lit(0.0)) / F.col("c1")
        + F.lit(KN_D)
        * F.col("n1p")
        / F.col("c1")
        * (F.col("n1pr").cast("double") / F.col("nbt")),
        6,
    )
    return (
        c12.join(c1, "w1")
        .join(r2, "w2")
        .crossJoin(F.broadcast(tt))
        .orderBy(F.desc("c"), "w1", "w2")
        .limit(KN_TOP)
        .select(
            "w1",
            "w2",
            F.col("c").cast("bigint").alias("c"),
            pkn.cast("double").alias("p_kn"),
        )
    )
