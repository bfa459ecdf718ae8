"""Text corpus curation, part 4: winnowing fingerprint matching
(Schleimer, Wilkerson & Aiken, SIGMOD 2003 — the MOSS local
fingerprinting scheme), an n-gram novelty-decay curve over ingestion
batches, and a language-ID confusion audit.

Scale notes: winnowing selects O(len/w) fingerprints per document in
ONE in-document pass (window minima over the rolling k-gram hash
list — whole-stage codegen, no shuffle), and the match join is
hash-keyed on fingerprints with the same document-frequency veto as
the containment join, so a boilerplate fingerprint can never fan out
past df_cap. Novelty decay is two hash aggregates over gram hashes
(raw text never shuffles). The confusion audit is a single zero-join
grouped scan. All ratios are single f64 divisions of exact integers.

Reference anchor: no text surface exists in the reference
(flink/tumbling_window.py, sliding_window.py); extends the
LLM-curation battery of operators/text.py .. text3.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.caching import tracked_persist
from kinesis_analytics_demo_spark.functions import hashing as H
from kinesis_analytics_demo_spark.operators.text import (
    _SQL_TOKENS,
    lang_pred_col,
    sql_lang_pred,
)
from kinesis_analytics_demo_spark.plans.registry import register
from kinesis_analytics_demo_spark.session import read_table as _t

# ------------------------------------------- winnowing fingerprints
WIN_K = 8  #: character k-gram width
WIN_W = 8  #: winnowing window (guarantee: any match >= K+W-1 chars shares a fp)
WIN_DF_CAP_INV = 100  #: veto fingerprints in > 1% of documents
#: ABSOLUTE df veto alongside the relative 1% one (round 9): a purely
#: relative cap grows with the corpus — at the 100x probe (500k docs)
#: it admitted df=5,000 fingerprints (replica-tag common-word grams)
#: whose pair fan-out is df^2 each: measured sum(df^2) under the
#: relative cap alone was 48.5e9 pair rows, which spilled ~70 GB of
#: shuffle and filled the disk. df <= 200 bounds the same sum to 78e6
#: (DuckDB-measured on the probe corpus). The relative cap is the
#: tighter one below 20k docs, so every test SF is bit-unchanged; a
#: fingerprint in >200 documents is boilerplate that localizes
#: nothing (the MOSS frequent-fingerprint veto, Schleimer et al.
#: 2003 §4).
WIN_DF_ABS_CAP = 200
WIN_MIN_SHARED = 5  #: report pairs sharing at least this many fps


@register(
    "winnowing_fingerprint_matches",
    oracle=f"""
    WITH g AS (
        SELECT doc_id,
               [{H.sql_md5_long('substr(text, i, ' + str(WIN_K) + ')')}
                for i in generate_series(1, length(text) - {WIN_K} + 1)]
                   AS hs
        FROM documents
        WHERE length(text) >= {WIN_K + WIN_W - 1}),
    sel AS (
        SELECT doc_id,
               list_distinct([
                   list_min(hs[i : i + {WIN_W - 1}])
                   for i in generate_series(1, len(hs) - {WIN_W} + 1)])
                   AS fps
        FROM g),
    e AS (SELECT doc_id, unnest(fps) AS fp FROM sel),
    df AS (SELECT fp, count(*) AS df FROM e GROUP BY fp),
    nd AS (SELECT count(*) AS n_docs FROM documents),
    cap AS (
        SELECT e.doc_id, e.fp
        FROM e JOIN df USING (fp), nd
        WHERE {WIN_DF_CAP_INV} * df.df <= nd.n_docs
          AND df.df <= {WIN_DF_ABS_CAP}),
    sz AS (SELECT doc_id, count(*) AS n FROM cap GROUP BY doc_id)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(count(*) AS BIGINT) AS shared,
           CAST(MAX(sa.n) AS BIGINT) AS n_fps_a,
           CAST(MAX(sb.n) AS BIGINT) AS n_fps_b,
           CAST(ROUND(CAST(count(*) AS DOUBLE)
                / least(MAX(sa.n), MAX(sb.n)), 6) AS DOUBLE)
               AS overlap
    FROM cap a JOIN cap b ON a.fp = b.fp AND a.doc_id < b.doc_id
    JOIN sz sa ON sa.doc_id = a.doc_id
    JOIN sz sb ON sb.doc_id = b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING count(*) >= {WIN_MIN_SHARED}
    """,
    doc=f"Winnowing document fingerprint matching (Schleimer et al. "
    f"2003): each doc's fingerprints are the DISTINCT minima of "
    f"every {WIN_W}-wide window over its rolling {WIN_K}-char-gram "
    f"md5 hashes — the scheme guarantees any shared substring of "
    f">= {WIN_K + WIN_W - 1} chars contributes at least one common "
    f"fingerprint, with only ~2/(w+1) of grams retained. Pairs "
    f"sharing >= {WIN_MIN_SHARED} capped fingerprints are reported "
    "with the containment-style overlap ratio — the plagiarism/"
    "near-copy detector that LOCALIZES matches where MinHash only "
    "estimates global Jaccard. Fingerprints in > 1% of docs OR > "
    f"{WIN_DF_ABS_CAP} docs absolute are df-vetoed before the pair "
    "join (the containment fan-out bound; the absolute veto is the "
    "MOSS frequent-fingerprint rule and caps pair work at "
    f"O(n_fps * {WIN_DF_ABS_CAP}^2) regardless of corpus size — the "
    "100x probe measured the relative-only cap admitting 48.5e9 "
    "pair rows); "
    "selection itself is one in-document higher-order expression, no "
    "UDFs, no shuffle until the fingerprint equi-join.",
)
def winnowing_fingerprint_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    # substring needs the expr form for a column start position
    # (text_fingerprint precedent); the conv/md5 chain is H.md5_long
    # inlined for the same reason
    hs = F.expr(
        f"transform(sequence(1, length(text) - {WIN_K} + 1), "
        f"i -> CAST(conv(substring(md5(substring(text, i, {WIN_K})), 1, 15),"
        f" 16, 10) AS BIGINT))"
    )
    g = docs.filter(F.length("text") >= WIN_K + WIN_W - 1).select(
        "doc_id", hs.alias("hs")
    )
    fps = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("hs") - WIN_W + 1),
            lambda i: F.array_min(F.slice(F.col("hs"), i, WIN_W)),
        )
    )
    from pyspark.sql import Window

    e = g.select("doc_id", F.explode(fps).alias("fp"))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    # Document frequency as a window count over one fp-exchange: the
    # earlier groupBy(fp) + equi-join shuffled the fingerprint stream
    # twice and paid a join build (the containment-pair df-cap shape,
    # optimized the same way in r11). The persisted e intermediate is
    # no longer needed — cap is the single consumer of the exploded
    # stream and is itself persisted for the pair join + sz branches.
    cap = tracked_persist(
        e.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("fp"))
        )
        .crossJoin(F.broadcast(n_docs))
        .filter(
            (F.lit(WIN_DF_CAP_INV) * F.col("df") <= F.col("n_docs"))
            & (F.col("df") <= WIN_DF_ABS_CAP)
        )
        .select("doc_id", "fp")
    )
    sz = cap.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = cap.select(F.col("doc_id").alias("doc_a"), "fp")
    b = cap.select(F.col("doc_id").alias("doc_b"), "fp")
    pairs = (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("shared"))
        .filter(F.col("shared") >= WIN_MIN_SHARED)
    )
    sa = sz.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_fps_a"))
    sb = sz.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_fps_b"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "shared",
            F.col("n_fps_a").cast("bigint").alias("n_fps_a"),
            F.col("n_fps_b").cast("bigint").alias("n_fps_b"),
            F.round(
                F.col("shared").cast("double")
                / F.least("n_fps_a", "n_fps_b"),
                6,
            )
            .cast("double")
            .alias("overlap"),
        )
    )


# ------------------------------------------- n-gram novelty decay
NOVELTY_BATCH_DOCS = 50  #: docs per ingestion batch (doc_id order)
NOVELTY_GRAM = 5  #: word n-gram width


@register(
    "ngram_novelty_decay",
    oracle=f"""
    WITH t AS (
        SELECT doc_id // {NOVELTY_BATCH_DOCS} AS batch,
               {H.sql_word_shingles('text', NOVELTY_GRAM)} AS sh
        FROM documents),
    g AS (
        SELECT DISTINCT batch, {H.sql_shingle_hash('s')} AS gh
        FROM (SELECT batch, unnest(sh) AS s FROM t)),
    fb AS (SELECT gh, MIN(batch) AS first_batch FROM g GROUP BY gh),
    nb AS (SELECT batch, count(*) AS n_docs
           FROM (SELECT doc_id // {NOVELTY_BATCH_DOCS} AS batch
                 FROM documents) GROUP BY batch)
    SELECT g.batch,
           CAST(MAX(nb.n_docs) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_distinct_grams,
           CAST(SUM(CASE WHEN fb.first_batch = g.batch THEN 1 ELSE 0 END)
                AS BIGINT) AS n_new_grams,
           CAST(ROUND(CAST(SUM(CASE WHEN fb.first_batch = g.batch
                                    THEN 1 ELSE 0 END) AS DOUBLE)
                / count(*), 6) AS DOUBLE) AS novelty
    FROM g JOIN fb USING (gh) JOIN nb ON nb.batch = g.batch
    GROUP BY g.batch
    """,
    doc=f"N-gram novelty decay over ingestion batches ({NOVELTY_BATCH_DOCS}"
    f" docs per batch in doc_id order): per batch, the fraction of its "
    f"distinct word {NOVELTY_GRAM}-gram hashes never seen in any "
    "earlier batch — the corpus-freshness curve that tells a curation "
    "pipeline when additional ingestion stops adding new content "
    "(the empirical basis for dedup ROI and data-mixing decisions). "
    "Two hash-keyed aggregates over gram hashes: first-batch per gram "
    "(min — order-free), then the per-batch new/total counts; raw "
    "text never shuffles, and at 100 TB the gram->first_batch table "
    "is the only wide state (hash-partitioned, bounded by distinct "
    "grams, the same key space every dedup operator already carries).",
)
def ngram_novelty_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    # integer division on BOTH engines (oracle uses //); float-divide
    # then cast would truncate toward zero and lose exactness guarantees
    batch = F.expr(f"doc_id div {NOVELTY_BATCH_DOCS}")
    sh = H.shingle_hashes(F.col("text"), k=NOVELTY_GRAM)
    g = (
        docs.select(batch.alias("batch"), F.explode(sh).alias("gh"))
        .distinct()
    )
    # first_batch as a window min instead of a groupBy(gh) aggregate
    # joined back: the join shape shuffled the gram table by gh TWICE
    # (once into the aggregate, once into the join) on top of the
    # distinct's own exchange, and needed the table persisted to avoid
    # recomputing the explode. The window needs ONE gh exchange, the
    # table is consumed once (no persist), and the distinct keeps its
    # map-side partial dedupe — the property that matters at 100 TB,
    # where gram occurrences >> distinct (batch, gram) pairs.
    from pyspark.sql import Window

    nb = docs.select(batch.alias("batch")).groupBy("batch").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    return (
        g.withColumn(
            "first_batch", F.min("batch").over(Window.partitionBy("gh"))
        )
        .groupBy("batch")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_distinct_grams"),
            F.sum(
                F.when(F.col("first_batch") == F.col("batch"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_new_grams"),
        )
        .join(F.broadcast(nb), "batch")
        .select(
            "batch",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            "n_distinct_grams",
            "n_new_grams",
            F.round(
                F.col("n_new_grams").cast("double")
                / F.col("n_distinct_grams"),
                6,
            )
            .cast("double")
            .alias("novelty"),
        )
    )


# ------------------------------------------- language-ID confusion
@register(
    "langid_confusion_audit",
    oracle=f"""
    WITH t AS (
        SELECT source, lang, {_SQL_TOKENS} AS toks FROM documents),
    p AS (
        SELECT source, lang AS metadata_lang,
               {sql_lang_pred('toks')} AS predicted_lang
        FROM t),
    c AS (
        SELECT source, metadata_lang, predicted_lang,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM p GROUP BY 1, 2, 3),
    tot AS (
        SELECT source, metadata_lang, SUM(n_docs) AS n
        FROM c GROUP BY 1, 2)
    SELECT c.source, c.metadata_lang, c.predicted_lang, c.n_docs,
           CAST(ROUND(CAST(c.n_docs AS DOUBLE) / tot.n, 6) AS DOUBLE)
               AS rate
    FROM c JOIN tot USING (source, metadata_lang)
    """,
    doc="Language-ID confusion audit: per (source, metadata lang, "
    "predicted lang) document counts and the within-(source, lang) "
    "rate — the disagreement matrix between the corpus's lang "
    "metadata and the heuristic predictor, the signal for routing "
    "sources to per-language cleaning or distrusting their metadata. "
    "Shares the ONE prediction fragment with text_lang_id "
    "(sql_lang_pred / lang_pred_col — the sql_quality_score "
    "no-desync discipline). One grouped scan plus a bounded "
    "(sources x langs) totals join; zero shuffles on raw text.",
)
def langid_confusion_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = H.words(F.col("text"))
    p = docs.select(
        "source",
        F.col("lang").alias("metadata_lang"),
        lang_pred_col(toks).alias("predicted_lang"),
    )
    c = p.groupBy("source", "metadata_lang", "predicted_lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    tot = c.groupBy("source", "metadata_lang").agg(
        F.sum("n_docs").alias("n")
    )
    return c.join(F.broadcast(tot), ["source", "metadata_lang"]).select(
        "source",
        "metadata_lang",
        "predicted_lang",
        "n_docs",
        F.round(F.col("n_docs").cast("double") / F.col("n"), 6)
        .cast("double")
        .alias("rate"),
    )


# ------------------------------------ Flesch readability scoring
@register(
    "readability_flesch_docs",
    oracle="""
    WITH m AS (
        SELECT doc_id,
               len(string_split_regex(text, '\\s+')) AS n_words,
               GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1)
                   AS n_sentences,
               len(regexp_extract_all(lower(text), '[aeiouy]+'))
                   AS n_syllables
        FROM documents)
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_sentences AS BIGINT) AS n_sentences,
           CAST(n_syllables AS BIGINT) AS n_syllables,
           CAST(ROUND(206.835
                      - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
                      - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words),
                      6) AS DOUBLE) + 0.0 AS flesch_ease,
           CAST(ROUND(0.39 * (CAST(n_words AS DOUBLE) / n_sentences)
                      + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words)
                      - 15.59, 6) AS DOUBLE) + 0.0 AS fk_grade
    FROM m WHERE n_words > 0
    """,
    doc="Flesch reading-ease and Flesch-Kincaid grade level (Kincaid "
    "et al. 1975) per document — the readability axis of the quality "
    "battery (complements the C4/Gopher filters): words by the "
    "corpus-wide whitespace tokenizer, sentences by terminal-"
    "punctuation runs (floored at 1), syllables approximated by "
    "vowel-group runs [aeiouy]+ (the standard regex proxy; "
    "vowelless tokens count 0). All three counts are exact integers "
    "from the same regexes on both engines; the two formulas are "
    "single IEEE expressions rounded once, negative-zero "
    "normalized (fk_grade goes negative for trivial text). Scale: "
    "embarrassingly parallel single scan, no shuffle at all.",
)
def readability_flesch_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    m = docs.select(
        "doc_id",
        F.size(H.words(F.col("text"))).alias("n_words"),
        F.greatest(
            F.size(F.expr(r"regexp_extract_all(text, '[.!?]+', 0)")),
            F.lit(1),
        ).alias("n_sentences"),
        F.size(
            F.expr(r"regexp_extract_all(lower(text), '[aeiouy]+', 0)")
        ).alias("n_syllables"),
    ).where(F.col("n_words") > 0)
    wps = F.col("n_words").cast("double") / F.col("n_sentences")
    spw = F.col("n_syllables").cast("double") / F.col("n_words")
    return m.select(
        "doc_id",
        F.col("n_words").cast("bigint").alias("n_words"),
        F.col("n_sentences").cast("bigint").alias("n_sentences"),
        F.col("n_syllables").cast("bigint").alias("n_syllables"),
        (
            F.round(
                F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw, 6
            ).cast("double")
            + F.lit(0.0)
        ).alias("flesch_ease"),
        (
            F.round(
                F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59), 6
            ).cast("double")
            + F.lit(0.0)
        ).alias("fk_grade"),
    )
