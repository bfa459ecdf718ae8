"""Text corpus curation, part 3: repeated-n-gram span dedup (the
exact-substring filter from "Deduplicating Training Data Makes
Language Models Better", Lee et al. 2022, re-expressed on word
5-grams), a C4-style heuristic filter battery, and chunk-level exact
dedup over disjoint fixed-width token windows.

Scale notes: every corpus-wide stage is a hash-keyed aggregate or
equi-join on 8-byte gram/chunk hashes — raw text never shuffles. The
per-doc rule battery is a single zero-shuffle column-expression scan.
Span coverage is computed by exploding each duplicated gram start into
its N covered positions and counting distinct (doc, pos) — integer
rows, two hash shuffles total, identical cost shape to the minhash
pipeline at 100 TB. All fractions are single f64 divisions of exactly
counted integers, so Spark and the DuckDB oracle agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.caching import tracked_persist
from kinesis_analytics_demo_spark.functions import hashing as H
from kinesis_analytics_demo_spark.operators.text import EN_STOPWORDS, _SQL_STOPLIST
from kinesis_analytics_demo_spark.plans.registry import register
from kinesis_analytics_demo_spark.session import read_table as _t

_SQL_TOKENS = "string_split_regex(text, '\\s+')"

SPAN_NGRAM = 5  #: repeated-span gram width, in words
SPAN_MAX_DUP_FRAC = 0.5  #: drop docs with more than half their tokens in dup spans


# --------------------------------------------------------------------
# Repeated n-gram span dedup (exact-substring dedup, word-gram form).
# A 5-gram is "duplicated" when it occurs >= 2 times corpus-wide
# (across OR within documents — Lee et al. count every occurrence).
# A token position is covered when any duplicated gram's 5-position
# span includes it; the doc-level signal is the covered fraction.
# --------------------------------------------------------------------
@register(
    "dedup_repeated_ngram_spans",
    oracle=f"""
    WITH t AS (SELECT doc_id, {H.sql_word_shingles('text', SPAN_NGRAM)} AS sh,
                      len({_SQL_TOKENS}) AS n_tokens
               FROM documents),
    g AS (SELECT doc_id,
                 unnest(generate_series(1, len(sh))) - 1 AS pos,
                 unnest([{H.sql_md5_long('s')} for s in sh]) AS gh
          FROM t WHERE len(sh) > 0),
    occ AS (SELECT gh, count(*) AS cnt FROM g GROUP BY gh),
    dup AS (SELECT g.doc_id, g.pos
            FROM g JOIN occ ON g.gh = occ.gh WHERE occ.cnt >= 2),
    ndup AS (SELECT doc_id, count(*) AS n_dup_grams FROM dup GROUP BY doc_id),
    cov AS (SELECT DISTINCT doc_id, pos + off AS cpos
            FROM dup, unnest(generate_series(0, {SPAN_NGRAM - 1})) AS u(off)),
    ncov AS (SELECT doc_id, count(*) AS covered_tokens FROM cov GROUP BY doc_id)
    SELECT t.doc_id,
           t.n_tokens,
           COALESCE(d.n_dup_grams, 0) AS n_dup_grams,
           COALESCE(c.covered_tokens, 0) AS covered_tokens,
           COALESCE(c.covered_tokens, 0) / t.n_tokens AS dup_span_frac,
           COALESCE(c.covered_tokens, 0) / t.n_tokens <= {SPAN_MAX_DUP_FRAC}
               AS keep
    FROM t LEFT JOIN ndup d ON t.doc_id = d.doc_id
           LEFT JOIN ncov c ON t.doc_id = c.doc_id
    """,
    doc="Exact-substring (repeated n-gram span) dedup, Lee et al. "
    "2022 style on word 5-grams: corpus-wide occurrence count per "
    "gram hash, then per-doc fraction of token positions covered by "
    "any >= 2x gram. Contrast with text_boilerplate_ngrams (distinct "
    "doc frequency, 3-grams, no span union): this counts every "
    "occurrence and unions overlapping spans. At 100 TB: two "
    "hash-keyed shuffles on 8-byte keys; the explode to covered "
    "positions multiplies integer rows by the constant gram width "
    "only for the duplicated subset.",
)
def dedup_repeated_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.posexplode(H.word_shingles(F.col("text"), SPAN_NGRAM)).alias("pos", "gram"),
    ).select("doc_id", "pos", H.md5_long(F.col("gram")).alias("gh"))
    # Every downstream aggregate reads these gram rows; persist so the
    # occurrence count and the coverage join share one tokenize scan.
    g = tracked_persist(base)
    occ = g.groupBy("gh").agg(F.count(F.lit(1)).alias("cnt"))
    dup = g.join(occ.filter(F.col("cnt") >= 2), "gh").select("doc_id", "pos")
    ndup = dup.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_dup_grams"))
    cov = (
        dup.select(
            "doc_id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + (SPAN_NGRAM - 1))).alias(
                "cpos"
            ),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("covered_tokens"))
    )
    tot = docs.select(
        "doc_id", F.size(H.words(F.col("text"))).cast("bigint").alias("n_tokens")
    )
    n_dup = F.coalesce(F.col("n_dup_grams"), F.lit(0)).cast("bigint")
    n_cov = F.coalesce(F.col("covered_tokens"), F.lit(0)).cast("bigint")
    frac = n_cov / F.col("n_tokens")
    return (
        tot.join(ndup, "doc_id", "left")
        .join(cov, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            n_dup.alias("n_dup_grams"),
            n_cov.alias("covered_tokens"),
            frac.alias("dup_span_frac"),
            (frac <= SPAN_MAX_DUP_FRAC).alias("keep"),
        )
    )


# C4/Gopher-style rule thresholds, tuned to this corpus's word-salad
# documents (~10-100 words, no punctuation) so both keep and drop
# outcomes occur at every scale factor.
C4_MIN_WORDS = 20
C4_MAX_WORDS = 1000
C4_MIN_MEAN_WORD_LEN = 2.0
C4_MAX_MEAN_WORD_LEN = 12.0
C4_MIN_STOPWORD_FRAC = 0.01
C4_MAX_TOP_TOKEN_FRAC = 0.2


# --------------------------------------------------------------------
# C4-style heuristic filter battery: one boolean column per rule plus
# the conjunction, so downstream consumers can audit which rule fired.
# --------------------------------------------------------------------
@register(
    "text_c4_filters",
    oracle=f"""
    WITH t AS (SELECT doc_id, text, {_SQL_TOKENS} AS toks FROM documents),
    s AS (SELECT doc_id, text, toks,
                 len(toks) AS n,
                 list_sum([len(w) for w in toks]) / len(toks) AS mwl,
                 len(list_filter(toks, w -> list_contains({_SQL_STOPLIST}, w)))
                     / len(toks) AS stop_frac,
                 list_max([len(list_filter(toks, x -> x = w))
                           for w in list_distinct(toks)]) / len(toks)
                     AS top_token_frac
          FROM t)
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_tokens,
           mwl AS mean_word_len,
           stop_frac AS stopword_frac,
           top_token_frac,
           n BETWEEN {C4_MIN_WORDS} AND {C4_MAX_WORDS} AS ok_word_count,
           mwl BETWEEN {C4_MIN_MEAN_WORD_LEN} AND {C4_MAX_MEAN_WORD_LEN}
               AS ok_mean_word_len,
           stop_frac >= {C4_MIN_STOPWORD_FRAC} AS ok_stopwords,
           top_token_frac <= {C4_MAX_TOP_TOKEN_FRAC} AS ok_top_token,
           NOT (contains(text, '{{') OR contains(text, 'lorem ipsum'))
               AS ok_no_boilerplate,
           (n BETWEEN {C4_MIN_WORDS} AND {C4_MAX_WORDS})
               AND (mwl BETWEEN {C4_MIN_MEAN_WORD_LEN} AND {C4_MAX_MEAN_WORD_LEN})
               AND stop_frac >= {C4_MIN_STOPWORD_FRAC}
               AND top_token_frac <= {C4_MAX_TOP_TOKEN_FRAC}
               AND NOT (contains(text, '{{') OR contains(text, 'lorem ipsum'))
               AS keep
    FROM s
    """,
    doc="C4/Gopher-style quality-rule battery: word-count bounds, "
    "mean-word-length bounds, stopword-density floor, "
    "max-single-token-share ceiling, and a boilerplate-marker check "
    "('{{', 'lorem ipsum'), each surfaced as its own audit flag plus "
    "the conjunctive keep. Single zero-shuffle scan of pure column "
    "expressions (whole-stage codegen, no UDFs) — at 100 TB this is "
    "one pass at parquet read throughput.",
)
def text_c4_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = H.words(F.col("text"))
    n = F.size(toks).cast("bigint")
    mwl = (
        F.aggregate(
            F.transform(toks, lambda w: F.length(w)),
            F.lit(0).cast("bigint"),
            lambda a, x: a + x,
        )
        / n
    )
    stoplist = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    stop_frac = (
        F.size(F.filter(toks, lambda w: F.array_contains(stoplist, w))).cast("bigint")
        / n
    )
    top_frac = (
        F.array_max(
            F.transform(
                F.array_distinct(toks),
                lambda w: F.size(F.filter(toks, lambda x: x == w)),
            )
        ).cast("bigint")
        / n
    )
    no_boiler = ~(
        F.col("text").contains("{") | F.col("text").contains("lorem ipsum")
    )
    ok_words = (F.col("n_tokens") >= C4_MIN_WORDS) & (
        F.col("n_tokens") <= C4_MAX_WORDS
    )
    ok_mwl = (F.col("mean_word_len") >= C4_MIN_MEAN_WORD_LEN) & (
        F.col("mean_word_len") <= C4_MAX_MEAN_WORD_LEN
    )
    ok_stop = F.col("stopword_frac") >= C4_MIN_STOPWORD_FRAC
    ok_top = F.col("top_token_frac") <= C4_MAX_TOP_TOKEN_FRAC
    return (
        docs.select(
            "doc_id",
            n.alias("n_tokens"),
            mwl.alias("mean_word_len"),
            stop_frac.alias("stopword_frac"),
            top_frac.alias("top_token_frac"),
            no_boiler.alias("ok_no_boilerplate"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "mean_word_len",
            "stopword_frac",
            "top_token_frac",
            ok_words.alias("ok_word_count"),
            ok_mwl.alias("ok_mean_word_len"),
            ok_stop.alias("ok_stopwords"),
            ok_top.alias("ok_top_token"),
            "ok_no_boilerplate",
            (ok_words & ok_mwl & ok_stop & ok_top & F.col("ok_no_boilerplate")).alias(
                "keep"
            ),
        )
    )


DEDUP_CHUNK_TOKENS = 16  #: disjoint chunk width for chunk-level dedup
CHUNK_MAX_DUP_FRAC = 0.5


# --------------------------------------------------------------------
# Chunk-level exact dedup: disjoint 16-token windows hashed and
# counted corpus-wide; a doc's signal is the fraction of its chunks
# that appear elsewhere verbatim. The disjoint-window complement to
# dedup_repeated_ngram_spans' sliding grams.
# --------------------------------------------------------------------
@register(
    "dedup_chunk_exact",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents),
    c AS (SELECT doc_id,
                 unnest(generate_series(0,
                     CAST(ceil(len(toks) / {DEDUP_CHUNK_TOKENS}.0) AS BIGINT) - 1))
                     AS chunk_id,
                 toks
          FROM t),
    h AS (SELECT doc_id, chunk_id,
                 {H.sql_md5_long(
                     f"array_to_string(list_slice(toks, chunk_id * {DEDUP_CHUNK_TOKENS} + 1, "
                     f"(chunk_id + 1) * {DEDUP_CHUNK_TOKENS}), ' ')"
                 )} AS ch
          FROM c),
    occ AS (SELECT ch, count(*) AS cnt FROM h GROUP BY ch),
    d AS (SELECT h.doc_id,
                 count(*) AS n_chunks,
                 CAST(sum(CASE WHEN occ.cnt >= 2 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_dup_chunks
          FROM h JOIN occ ON h.ch = occ.ch GROUP BY h.doc_id)
    SELECT doc_id,
           n_chunks,
           n_dup_chunks,
           n_dup_chunks / n_chunks AS dup_chunk_frac,
           n_dup_chunks / n_chunks <= {CHUNK_MAX_DUP_FRAC} AS keep
    FROM d
    """,
    doc="Chunk-level exact dedup: disjoint 16-token windows (the "
    "training-example granularity), md5-hashed and counted "
    "corpus-wide; per doc the duplicated-chunk fraction and a keep "
    "flag. At 100 TB: chunk hashes are 8-byte keys, the occurrence "
    "count is a map-side-combining aggregate, and the doc rollup "
    "joins hash-to-hash — raw chunk text never shuffles.",
)
def dedup_chunk_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = H.words(F.col("text"))
    n_chunks = F.ceil(F.size(toks) / F.lit(float(DEDUP_CHUNK_TOKENS))).cast("bigint")
    chunks = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0).cast("bigint"), n_chunks - 1),
                lambda cid: F.concat_ws(
                    " ",
                    F.slice(
                        toks,
                        (cid * DEDUP_CHUNK_TOKENS + 1).cast("int"),
                        DEDUP_CHUNK_TOKENS,
                    ),
                ),
            )
        ).alias("chunk_text"),
    ).select("doc_id", H.md5_long(F.col("chunk_text")).alias("ch"))
    h = tracked_persist(chunks)
    occ = h.groupBy("ch").agg(F.count(F.lit(1)).alias("cnt"))
    per_doc = (
        h.join(occ, "ch")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("cnt") >= 2, 1).otherwise(0)).alias("n_dup_chunks"),
        )
    )
    frac = F.col("n_dup_chunks") / F.col("n_chunks")
    return per_doc.select(
        "doc_id",
        "n_chunks",
        "n_dup_chunks",
        frac.alias("dup_chunk_frac"),
        (frac <= CHUNK_MAX_DUP_FRAC).alias("keep"),
    )


# ------------------------------------------- collocation detection
COLL_MIN_COUNT = 5  #: bigram support floor
COLL_TOP = 30  #: report the strongest collocations


@register(
    "collocation_lift_bigrams",
    oracle=f"""
    WITH ws AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                           x -> x != '') AS ws
        FROM documents),
    bi AS (
        SELECT ws[i] AS a, ws[i+1] AS b, count(*) AS cab
        FROM ws, LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i)
        GROUP BY 1, 2
        HAVING count(*) >= {COLL_MIN_COUNT}),
    uni AS (
        SELECT w AS word, count(*) AS c
        FROM (SELECT unnest(ws) AS w FROM ws) GROUP BY 1),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni)
    SELECT bi.a, bi.b, CAST(bi.cab AS BIGINT) AS n_pair,
           ROUND(CAST(tot.n * bi.cab AS DOUBLE)
                 / CAST(ua.c * ub.c AS DOUBLE), 6) AS lift
    FROM bi JOIN uni ua ON ua.word = bi.a
            JOIN uni ub ON ub.word = bi.b, tot
    ORDER BY lift DESC, bi.a, bi.b
    LIMIT {COLL_TOP}
    """,
    doc="Collocation detection by association lift: adjacent-word "
    "bigrams with support >= 5 scored by n * c(ab) / (c(a) * c(b)) "
    "— the word2vec phrase-merge preprocessing signal ('new york' "
    "-> 'new_york'), reported as the RAW LIFT RATIO rather than PMI "
    "because ln() is not bit-reproducible across libm "
    "implementations while the ratio is one exact integer product "
    "per side and a single IEEE division (the bootstrap no-ln "
    "lesson). Unigram table broadcasts; bigram expansion is one "
    "in-doc transform (no shuffle before the count); top-30 via "
    "TakeOrderedAndProject with a total-order tiebreak.",
)
def collocation_lift_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    ws = docs.select(
        F.filter(
            F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != ""
        ).alias("ws")
    )
    ws = tracked_persist(ws)
    pairs = ws.select(
        F.explode(
            F.when(
                F.size("ws") >= 2,
                F.transform(
                    F.sequence(F.lit(1), F.size("ws") - 1),
                    lambda i: F.struct(
                        F.element_at("ws", i).alias("a"),
                        F.element_at("ws", i + 1).alias("b"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        ).alias("p")
    ).select("p.a", "p.b")
    bi = (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cab"))
        .filter(F.col("cab") >= COLL_MIN_COUNT)
    )
    # THREE frames derive from uni (ua, ub, tot) and each F.broadcast
    # collect re-runs its full lineage — without a persist the cached
    # word arrays are exploded and re-aggregated three times (r11
    # before-plan: the unigram HashAggregate appears 3x with no
    # ReusedExchange). Persisting the vocabulary-sized count table
    # collapses that to one explode pass.
    uni = tracked_persist(
        ws.select(F.explode("ws").alias("word")).groupBy("word").agg(
            F.count(F.lit(1)).alias("c")
        )
    )
    tot = uni.agg(F.sum("c").cast("bigint").alias("n"))
    ua = uni.select(F.col("word").alias("a"), F.col("c").alias("ca"))
    ub = uni.select(F.col("word").alias("b"), F.col("c").alias("cb"))
    return (
        bi.join(F.broadcast(ua), "a")
        .join(F.broadcast(ub), "b")
        .crossJoin(F.broadcast(tot))
        .select(
            "a",
            "b",
            F.col("cab").cast("bigint").alias("n_pair"),
            F.round(
                (F.col("n") * F.col("cab")).cast("double")
                / (F.col("ca") * F.col("cb")).cast("double"),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "a", "b")
        .limit(COLL_TOP)
    )


# ------------------------------------------- TextRank keyword extraction
TEXTRANK_TOP = 15  #: strongest keywords reported

_TR_GRAPH_CTES = """
WITH ws AS (
    SELECT list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                       x -> x != '') AS ws
    FROM documents),
adj AS (
    SELECT ws[i] AS a, ws[i+1] AS b
    FROM ws, LATERAL (SELECT unnest(generate_series(1, len(ws) - 1)) AS i)
    WHERE ws[i] != ws[i+1]),
edges AS (
    SELECT DISTINCT a AS src, b AS dst FROM adj
    UNION
    SELECT DISTINCT b, a FROM adj),
nodes AS (SELECT DISTINCT unnest(ws) AS node_id FROM ws),
outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
base AS (
    SELECT n.node_id, o.outdeg
    FROM nodes n LEFT JOIN outdeg o ON n.node_id = o.src),
nn AS (SELECT count(*) AS n FROM base),
r0 AS (
    SELECT node_id, outdeg,
           CAST(ROUND(1.0 / (SELECT n FROM nn), 12)
                AS DECIMAL(28,12)) AS rank
    FROM base)"""


def _tr_oracle() -> str:
    from kinesis_analytics_demo_spark.operators.graph import (
        PR_ITERS,
        pr_unrolled_oracle,
    )

    tail = f"""
SELECT node_id AS word, CAST(rank AS DOUBLE) AS rank
FROM r{PR_ITERS}
ORDER BY rank DESC, node_id
LIMIT {TEXTRANK_TOP}"""
    return pr_unrolled_oracle(_TR_GRAPH_CTES, tail)


@register(
    "textrank_keywords",
    oracle=_tr_oracle(),
    doc="TextRank keyword extraction (Mihalcea & Tarau 2004): "
    "PageRank over the corpus-wide word co-occurrence graph — nodes "
    "are distinct lowercased words, undirected edges link ADJACENT "
    "word pairs (window 2, both directions, self-loops dropped) — "
    "top-15 words by rank. Unsupervised keyword signal for corpus "
    "labeling/routing without a model. Reuses the repo's "
    "fixed-iteration decimal PageRank (operators/graph.py pagerank: "
    "5 iterations, damping 0.85, dangling-mass redistribution, "
    "12-digit decimal state) against the SAME unrolled-CTE oracle "
    "chain via pr_unrolled_oracle — bit-exact on both engines. "
    "Scale: the edge build is one in-document transform + a distinct "
    "over (word, word) pairs (bounded by vocabulary^2 observed "
    "adjacencies, NOT corpus size); per-iteration state is one row "
    "per vocabulary word, broadcast into the persisted edge list — "
    "at 100 TB the scan-scale work is the single tokenize pass.",
)
def textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_analytics_demo_spark.operators.graph import pagerank

    docs = _t(spark, sf_dir, "documents")
    ws = tracked_persist(
        docs.select(
            F.filter(
                F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: x != ""
            ).alias("ws")
        )
    )
    pairs = (
        ws.select(
            F.explode(
                F.when(
                    F.size("ws") >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size("ws") - 1),
                        lambda i: F.struct(
                            F.element_at("ws", i).alias("a"),
                            F.element_at("ws", i + 1).alias("b"),
                        ),
                    ),
                ).otherwise(
                    F.array().cast("array<struct<a:string,b:string>>")
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .filter(F.col("a") != F.col("b"))
    )
    edges = pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).union(pairs.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    nodes = ws.select(F.explode("ws").alias("node_id")).distinct()
    ranks = pagerank(nodes, edges)
    return (
        ranks.orderBy(F.desc("rank"), "node_id")
        .limit(TEXTRANK_TOP)
        .select(F.col("node_id").alias("word"), "rank")
    )
