"""Text analysis over ``documents``, part 2: Gopher-style repetition
signals, fixed-window chunking, and tokenizer-vocabulary building —
the remaining pre-training corpus-audit family.

Scale notes: all three operators tokenize via one ``posexplode`` scan
and keep every aggregation keyed by ``doc_id`` (or the token itself),
so after the first hash-partition on the key the window + groupBy
chain is pipelined with no further shuffle. N-grams are built with
``lead()`` over the per-doc position order — all whole-stage codegen
(the interpreted ``transform(sequence...)`` slice form measured 1.5-2x
slower on this corpus). Repetition fractions are single f64 divisions
of exactly-counted integers, so Spark and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.functions import hashing as H
from kinesis_analytics_demo_spark.plans.registry import register
from kinesis_analytics_demo_spark.session import read_table as _t

_SQL_TOKENS = "string_split_regex(text, '\\s+')"


def _tokens_by_pos(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, w) rows — one posexplode scan."""
    return docs.select(
        "doc_id", F.posexplode(H.words(F.col("text"))).alias("pos", "w")
    )


# --------------------------------------------------------------------
# Gopher-style repetition: most-frequent-bigram fraction + fraction of
# trigram instances that are repeats (the duplicate-n-gram filters
# from the Gopher/MassiveText quality rules, word-level because this
# corpus is single-line).
# --------------------------------------------------------------------
@register(
    "text_repetition_gopher",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents),
    g2 AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks)),
                      i -> toks[i] || ' ' || toks[i+1])) AS gram
        FROM t
    ),
    c2 AS (SELECT doc_id, gram, count(*) AS cnt FROM g2 GROUP BY doc_id, gram),
    m2 AS (SELECT doc_id, max(cnt) AS top_cnt, sum(cnt) AS tot FROM c2
           GROUP BY doc_id),
    g3 AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(toks) - 1),
                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                   AS gram
        FROM t
    ),
    c3 AS (SELECT doc_id, gram, count(*) AS cnt FROM g3 GROUP BY doc_id, gram),
    m3 AS (SELECT doc_id,
                  sum(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS dup_cnt,
                  sum(cnt) AS tot FROM c3 GROUP BY doc_id)
    SELECT m2.doc_id,
           m2.top_cnt / m2.tot AS top_bigram_frac,
           m3.dup_cnt / m3.tot AS dup_trigram_frac
    FROM m2 JOIN m3 ON m2.doc_id = m3.doc_id
    """,
    doc="Gopher/MassiveText-style repetition signals: fraction of "
    "word-bigram instances taken by the single most frequent bigram, "
    "and fraction of word-trigram instances that are duplicates. "
    "lead()-built n-grams; every aggregate stays keyed by doc_id.",
)
def text_repetition_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = _tokens_by_pos(docs)
    w = Window.partitionBy("doc_id").orderBy("pos")
    grams = toks.select(
        "doc_id",
        F.concat_ws(" ", F.col("w"), F.lead("w", 1).over(w)).alias("g2"),
        F.concat_ws(
            " ", F.col("w"), F.lead("w", 1).over(w), F.lead("w", 2).over(w)
        ).alias("g3"),
        F.lead("w", 1).over(w).isNotNull().alias("has2"),
        F.lead("w", 2).over(w).isNotNull().alias("has3"),
    )
    c2 = (
        grams.filter("has2")
        .groupBy("doc_id", "g2")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("top_cnt"), F.sum("count").alias("tot2"))
    )
    c3 = (
        grams.filter("has3")
        .groupBy("doc_id", "g3")
        .count()
        .groupBy("doc_id")
        .agg(
            F.sum(F.when(F.col("count") > 1, F.col("count")).otherwise(0)).alias(
                "dup_cnt"
            ),
            F.sum("count").alias("tot3"),
        )
    )
    return c2.join(c3, "doc_id").select(
        "doc_id",
        (F.col("top_cnt") / F.col("tot2")).alias("top_bigram_frac"),
        (F.col("dup_cnt") / F.col("tot3")).alias("dup_trigram_frac"),
    )


CHUNK_TOKENS = 64  # fixed training-window width, in whitespace tokens


# --------------------------------------------------------------------
# Fixed-window chunking: split each document into consecutive
# CHUNK_TOKENS-token windows (the pre-tokenization sharding step that
# precedes sequence packing — pack_sequences handles the packing).
# --------------------------------------------------------------------
@register(
    "doc_chunks_fixed",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents),
    c AS (
        SELECT doc_id, toks,
               unnest(range(0, CAST(ceil(len(toks) / {CHUNK_TOKENS}.0) AS BIGINT)))
                   AS chunk_id
        FROM t
    )
    SELECT doc_id,
           CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(len(list_slice(toks, chunk_id * {CHUNK_TOKENS} + 1,
                               (chunk_id + 1) * {CHUNK_TOKENS})) AS BIGINT)
               AS n_tokens,
           array_to_string(list_slice(toks, chunk_id * {CHUNK_TOKENS} + 1,
                                      (chunk_id + 1) * {CHUNK_TOKENS}), ' ')
               AS chunk_text
    FROM c
    """,
    doc="Fixed-size token-window chunking: posexplode + floor(pos/W) "
    "chunk key, order restored inside each chunk via "
    "sort_array(collect_list(struct(pos, w))) — arrays never exceed "
    "W elements, and the groupBy key (doc_id, chunk_id) subsumes the "
    "explode's doc_id partitioning.",
)
def doc_chunks_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = _tokens_by_pos(docs)
    chunk = F.floor(F.col("pos") / CHUNK_TOKENS).cast("bigint")
    return (
        toks.select("doc_id", chunk.alias("chunk_id"), "pos", "w")
        .groupBy("doc_id", "chunk_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "w"))),
                    lambda s: s.w,
                ),
                " ",
            ).alias("chunk_text"),
        )
    )


VOCAB_SIZE = 100  # top-K tokens kept in the built vocabulary

#: Same public token classes as text_token_count_bpeish — letter runs,
#: digit runs, single other chars; Java-regex / RE2 compatible.
_BPE_ISH_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


# --------------------------------------------------------------------
# Vocabulary building: global token frequencies -> top-K vocab with
# deterministic ids (count desc, token asc).
# --------------------------------------------------------------------
@register(
    "vocab_top_tokens",
    oracle=f"""
    WITH tok AS (
        SELECT unnest(regexp_extract_all(text, '{_BPE_ISH_PATTERN}')) AS token
        FROM documents
    ),
    c AS (SELECT token, count(*) AS n_occurrences FROM tok GROUP BY token
          ORDER BY n_occurrences DESC, token LIMIT {VOCAB_SIZE})
    SELECT CAST(row_number() OVER (ORDER BY n_occurrences DESC, token) AS BIGINT)
               AS token_id,
           token, n_occurrences
    FROM c
    """,
    doc="Tokenizer-vocabulary building: BPE-ish token classes counted "
    "corpus-wide (map-side partial agg), top-K via "
    "TakeOrderedAndProject on the total order (count desc, token "
    "asc), then ids assigned by row_number over the K survivors only.",
)
def vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    counts = (
        docs.select(
            F.explode(
                F.expr(f"regexp_extract_all(text, '{_BPE_ISH_PATTERN}', 0)")
            ).alias("token")
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(VOCAB_SIZE)
    )
    # row_number over the <=VOCAB_SIZE survivors only — the single
    # partition the window implies is K rows, not the corpus.
    rank_w = Window.orderBy(F.desc("n_occurrences"), F.asc("token"))
    return counts.select(
        F.row_number().over(rank_w).cast("bigint").alias("token_id"),
        "token",
        "n_occurrences",
    )


LENGTH_Q_LO, LENGTH_Q_HI = 0.10, 0.90


# --------------------------------------------------------------------
# Quantile-based length filtering: keep documents inside the corpus's
# [p10, p90] token-length band (the data-driven variant of fixed
# min/max length rules).
# --------------------------------------------------------------------
@register(
    "length_quantile_filter",
    oracle=f"""
    WITH t AS (SELECT doc_id, source, len({_SQL_TOKENS}) AS n_tokens
               FROM documents),
    q AS (SELECT quantile_cont(n_tokens, {LENGTH_Q_LO}) AS lo,
                 quantile_cont(n_tokens, {LENGTH_Q_HI}) AS hi FROM t)
    SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens
    FROM t, q
    WHERE n_tokens >= lo AND n_tokens <= hi
    """,
    doc="Data-driven length filter: corpus p10/p90 token-count "
    "quantiles (Spark percentile == DuckDB quantile_cont bit-for-"
    "bit) broadcast back as a 1-row bound — the broadcast nested "
    "loop with a 1-row build side is a broadcast filter, whitelisted "
    "in tests/test_plans.py.",
)
def length_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "source",
        F.size(H.words(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    q = t.agg(
        F.percentile("n_tokens", LENGTH_Q_LO).alias("lo"),
        F.percentile("n_tokens", LENGTH_Q_HI).alias("hi"),
    )
    return t.join(
        F.broadcast(q),
        (F.col("n_tokens") >= F.col("lo")) & (F.col("n_tokens") <= F.col("hi")),
    ).select("doc_id", "source", "n_tokens")


OOV_VOCAB_K = 16  # deliberately smaller than the corpus token variety


# --------------------------------------------------------------------
# Tokenizer-coverage audit: rate of tokens OUTSIDE a fixed-size top-K
# vocabulary, per source. The pre-training question "how much of each
# source will an existing tokenizer shatter into unknowns" — run
# before committing a vocab size / data mix.
# --------------------------------------------------------------------
@register(
    "vocab_oov_rate",
    oracle=f"""
    WITH tok AS (
        SELECT source,
               unnest(regexp_extract_all(text, '{_BPE_ISH_PATTERN}')) AS token
        FROM documents
    ),
    vocab AS (
        SELECT token FROM tok GROUP BY token
        ORDER BY count(*) DESC, token LIMIT {OOV_VOCAB_K}
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov,
           sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) / count(*)
               AS oov_rate
    FROM tok t LEFT JOIN vocab v ON t.token = v.token
    GROUP BY source
    """,
    doc="Tokenizer-coverage audit: per-source out-of-vocabulary rate "
    "against a top-K corpus vocabulary (K deliberately under the "
    "corpus token variety so the signal is non-trivial here). The "
    "vocab is K rows by construction — broadcast to the token stream, "
    "so the whole audit is one corpus scan + one map-side-combined "
    "shuffle of source keys; the vocab build's own shuffle carries "
    "distinct tokens, not occurrences.",
)
def vocab_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "source",
        F.explode(
            F.expr(f"regexp_extract_all(text, '{_BPE_ISH_PATTERN}', 0)")
        ).alias("token"),
    )
    vocab = (
        tok.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(OOV_VOCAB_K)
        .select("token", F.lit(True).alias("in_vocab"))
    )
    n_oov = F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
    return (
        tok.join(F.broadcast(vocab), "token", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            n_oov.cast("bigint").alias("n_oov"),
            (n_oov / F.count(F.lit(1))).alias("oov_rate"),
        )
    )


@register(
    "text_token_entropy",
    oracle=f"""
    WITH t AS (SELECT doc_id, unnest({_SQL_TOKENS}) AS w FROM documents),
    tf AS (SELECT doc_id, w, count(*) AS tf FROM t GROUP BY doc_id, w),
    l AS (SELECT doc_id,
                 list(CAST(tf AS DOUBLE) ORDER BY tf, w) AS tfs,
                 sum(tf) AS n
          FROM tf GROUP BY doc_id)
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_tokens,
           ROUND(ln(CAST(n AS DOUBLE))
                 - (list_sum([x * ln(x) for x in tfs]) / n), 6) AS entropy
    FROM l
    """,
    doc="Per-document Shannon token entropy (nats) — the lexical-"
    "diversity quality signal (low entropy = repetitive/templated "
    "text). Float summation order is the classic cross-engine trap "
    "for entropy; here the per-token terms fold LEFT-TO-RIGHT over a "
    "SORTED (tf, token) list on both engines (the proven list_sum == "
    "F.aggregate LTR parity), and H = ln(n) - (1/n)*sum(tf*ln(tf)) "
    "keeps every input to ln() an exact integer — so the result is "
    "bit-reproducible with no decimal detour. Scale: one explode "
    "scan, two doc_id-keyed aggregates that reuse one partitioning; "
    "the per-doc tf list is bounded by document vocabulary.",
)
def text_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    tf = (
        _tokens_by_pos(docs)
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    l = tf.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("tf"), F.col("w")))
            ),
            lambda s: s["tf"].cast("double"),
        ).alias("tfs"),
        F.sum("tf").alias("n"),
    )
    fold = F.aggregate(
        F.col("tfs"),
        F.lit(0.0),
        lambda acc, x: acc + (x * F.log(x)),
    )
    return l.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_tokens"),
        F.round(
            F.log(F.col("n").cast("double")) - (fold / F.col("n")), 6
        ).alias("entropy"),
    )


@register(
    "source_token_kl",
    oracle=f"""
    WITH t AS (SELECT source, unnest({_SQL_TOKENS}) AS w FROM documents),
    sf AS (SELECT source, w, count(*) AS tf_s FROM t GROUP BY source, w),
    sn AS (SELECT source, sum(tf_s) AS n_s FROM sf GROUP BY source),
    cf AS (SELECT w, sum(tf_s) AS tf_c FROM sf GROUP BY w),
    cn AS (SELECT sum(tf_c) AS n_c FROM cf),
    j AS (SELECT sf.source, sf.w,
                 CAST(sf.tf_s AS DOUBLE) AS tf_s,
                 CAST(cf.tf_c AS DOUBLE) AS tf_c
          FROM sf JOIN cf ON sf.w = cf.w),
    l AS (SELECT source,
                 list(struct_pack(tf_s := tf_s, tf_c := tf_c) ORDER BY w)
                     AS terms
          FROM j GROUP BY source)
    SELECT l.source,
           CAST(sn.n_s AS BIGINT) AS n_tokens,
           ROUND(list_sum([
               (x.tf_s / sn.n_s)
               * ln((x.tf_s * cn.n_c) / (sn.n_s * x.tf_c))
               for x in l.terms]), 6) AS kl_nats
    FROM l JOIN sn ON l.source = sn.source CROSS JOIN cn
    """,
    doc="Distribution-shift audit: KL(P_source || P_corpus) over the "
    "token unigram distributions, per source — the signal a data-"
    "mixing pipeline watches to spot a crawl slice drifting from the "
    "corpus (and the weight temperature_mix decisions key off). "
    "Determinism: each term (tf_s/n_s)*ln((tf_s*n_c)/(n_s*tf_c)) "
    "takes only exact integers into ln(), and terms fold left-to-"
    "right over the token-SORTED list on both engines — the same "
    "structural fix as text_token_entropy, no decimal detour. "
    "Scale: token-keyed aggregates with map-side combine; the per-"
    "source term list is vocab-bounded (cap to a top-K vocab at web "
    "scale, as vocab_top_tokens does).",
)
def source_token_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(H.words(F.col("text"))).alias("w")
    )
    sf_ = toks.groupBy("source", "w").agg(F.count(F.lit(1)).alias("tf_s"))
    sn = sf_.groupBy("source").agg(F.sum("tf_s").alias("n_s"))
    cf = sf_.groupBy("w").agg(F.sum("tf_s").alias("tf_c"))
    cn = cf.agg(F.sum("tf_c").alias("n_c"))
    j = sf_.join(cf, "w").select(
        "source",
        "w",
        F.col("tf_s").cast("double").alias("tf_s"),
        F.col("tf_c").cast("double").alias("tf_c"),
    )
    l = j.groupBy("source").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("w"), F.col("tf_s"), F.col("tf_c")))
            ),
            lambda s: F.struct(s["tf_s"].alias("tf_s"), s["tf_c"].alias("tf_c")),
        ).alias("terms")
    )
    n_s = F.col("n_s").cast("double")
    n_c = F.col("n_c").cast("double")
    fold = F.aggregate(
        F.col("terms"),
        F.lit(0.0),
        lambda acc, x: acc
        + (
            (x["tf_s"] / n_s)
            * F.log((x["tf_s"] * n_c) / (n_s * x["tf_c"]))
        ),
    )
    return (
        l.join(sn, "source")
        .crossJoin(F.broadcast(cn))
        .select(
            "source",
            F.col("n_s").cast("bigint").alias("n_tokens"),
            F.round(fold, 6).alias("kl_nats"),
        )
    )


#: Zipf fit uses the top-K vocabulary by frequency (rank-frequency law
#: only holds over the head; also caps the fold list at web scale).
ZIPF_TOP_K = 1000


@register(
    "corpus_zipf_alpha",
    oracle=f"""
    WITH t AS (SELECT unnest({_SQL_TOKENS}) AS w FROM documents),
    cf AS (SELECT w, count(*) AS tf FROM t GROUP BY w),
    r AS (SELECT w, tf,
                 row_number() OVER (ORDER BY tf DESC, w) AS rnk
          FROM cf),
    topk AS (SELECT * FROM r WHERE rnk <= {ZIPF_TOP_K}),
    l AS (SELECT list(struct_pack(
                     x := ln(CAST(rnk AS DOUBLE)),
                     y := ln(CAST(tf AS DOUBLE))) ORDER BY rnk) AS pts,
                 count(*) AS n
          FROM topk),
    s AS (SELECT n,
                 list_sum([p.x for p in pts]) AS sx,
                 list_sum([p.y for p in pts]) AS sy,
                 list_sum([p.x * p.y for p in pts]) AS sxy,
                 list_sum([p.x * p.x for p in pts]) AS sxx
          FROM l)
    SELECT CAST(n AS BIGINT) AS n_vocab,
           ROUND(-(((n * sxy) - (sx * sy)) / ((n * sxx) - (sx * sx))), 6)
               AS zipf_alpha
    FROM s
    """,
    doc="Corpus Zipf exponent: least-squares slope of ln(frequency) "
    "on ln(rank) over the top-K vocabulary — natural text sits near "
    "alpha=1; a corpus drifting far off is template/spam-heavy (a "
    "crawl-health dashboard number). Regression sums (Sx, Sy, Sxy, "
    "Sxx) are LEFT-TO-RIGHT folds over the rank-SORTED point list on "
    "both engines, then one closed-form slope expression — covar/var "
    "built-ins would be partial-aggregation-order-dependent, folds "
    "are not. Token counting is map-side combined; only the top-K "
    "head (WindowGroupLimit-able rank) reaches the fold.",
)
def corpus_zipf_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    cf = (
        docs.select(F.explode(H.words(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    rnk = F.row_number().over(Window.orderBy(F.desc("tf"), F.asc("w")))
    topk = cf.withColumn("rnk", rnk).filter(F.col("rnk") <= ZIPF_TOP_K)
    pts = topk.agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("rnk"),
                        F.log(F.col("rnk").cast("double")).alias("x"),
                        F.log(F.col("tf").cast("double")).alias("y"),
                    )
                )
            ),
            lambda s: F.struct(s["x"].alias("x"), s["y"].alias("y")),
        ).alias("pts"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )

    def fold(expr):
        return F.aggregate(F.col("pts"), F.lit(0.0), expr)

    sx = fold(lambda acc, p: acc + p["x"])
    sy = fold(lambda acc, p: acc + p["y"])
    sxy = fold(lambda acc, p: acc + (p["x"] * p["y"]))
    sxx = fold(lambda acc, p: acc + (p["x"] * p["x"]))
    n = F.col("n")
    slope = ((n * sxy) - (sx * sy)) / ((n * sxx) - (sx * sx))
    return pts.select(
        n.cast("bigint").alias("n_vocab"),
        F.round(-slope, 6).alias("zipf_alpha"),
    )
