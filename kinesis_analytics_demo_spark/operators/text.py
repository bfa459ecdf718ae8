"""Text analysis over the ``documents`` table — BASELINE.json's
"text analysis at scale" family: token statistics, quality scoring,
language-ID heuristic, document fingerprinting.

All operators are single-scan, zero-shuffle column expressions
(split / transform / aggregate — whole-stage codegen; no UDFs), so at
100 TB each costs exactly one pass over the corpus. Float outputs are
single f64 divisions of exactly-computed integers — bit-identical on
Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.functions import hashing as H
from kinesis_analytics_demo_spark.plans.registry import register
from kinesis_analytics_demo_spark.session import read_table as _t

#: Tiny English function-word profile for the n-gram/stopword
#: language-ID heuristic. Fixed list, embedded in both engines' plans.
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for", "on", "it")
LANG_ID_THRESHOLD = 0.03  # en if stopword ratio >= 3%

_SQL_TOKENS = "string_split_regex(text, '\\s+')"


@register(
    "text_token_stats",
    oracle=f"""
    WITH t AS (SELECT doc_id, n_chars, {_SQL_TOKENS} AS toks FROM documents)
    SELECT doc_id,
           n_chars,
           len(toks) AS n_tokens,
           len(list_distinct(toks)) AS n_distinct_tokens,
           list_sum([len(w) for w in toks]) / len(toks) AS avg_token_len,
           len(list_distinct(toks)) / len(toks) AS type_token_ratio
    FROM t
    """,
    doc="Token counting + lexical stats: whitespace tokenization, "
    "distinct count, mean token length, type-token ratio.",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = H.words(F.col("text"))
    n = F.size(toks).cast("bigint")
    n_distinct = F.size(F.array_distinct(toks)).cast("bigint")
    char_sum = F.aggregate(
        F.transform(toks, lambda w: F.length(w)), F.lit(0).cast("bigint"), lambda a, x: a + x
    )
    return docs.select(
        "doc_id",
        "n_chars",
        n.alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        (char_sum / n).alias("avg_token_len"),
        (n_distinct / n).alias("type_token_ratio"),
    )


_SQL_STOPLIST = "[" + ", ".join(f"'{w}'" for w in EN_STOPWORDS) + "]"


def sql_lang_pred(toks: str = "toks") -> str:
    """DuckDB fragment: the heuristic language prediction over a
    token-list column — the ONE definition shared by text_lang_id and
    langid_confusion_audit (the sql_quality_score no-desync rule)."""
    dens = (
        f"len(list_filter({toks}, w -> list_contains({_SQL_STOPLIST}, w)))"
        f" / len({toks})"
    )
    return (
        f"CASE WHEN {dens} >= {LANG_ID_THRESHOLD} THEN 'en'"
        f" ELSE 'unknown' END"
    )


def lang_pred_col(toks):
    """Spark twin of :func:`sql_lang_pred`."""
    stoplist = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n_stop = F.size(
        F.filter(toks, lambda w: F.array_contains(stoplist, w))
    ).cast("bigint")
    score = n_stop / F.size(toks).cast("bigint")
    return F.when(score >= LANG_ID_THRESHOLD, "en").otherwise("unknown")


@register(
    "text_lang_id",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, {_SQL_TOKENS} AS toks FROM documents)
    SELECT doc_id,
           len(list_filter(toks, w -> list_contains({_SQL_STOPLIST}, w)))
               / len(toks) AS en_score,
           {sql_lang_pred('toks')} AS predicted_lang,
           lang AS metadata_lang
    FROM t
    """,
    doc="Language-ID heuristic: English function-word density over "
    "whitespace tokens (n-gram-profile style), compared against the "
    "metadata lang column. Prediction fragment shared with "
    "langid_confusion_audit via sql_lang_pred/lang_pred_col.",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = H.words(F.col("text"))
    stoplist = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stoplist, w))).cast(
        "bigint"
    )
    n = F.size(toks).cast("bigint")
    score = n_stop / n
    return docs.select(
        "doc_id",
        score.alias("en_score"),
        lang_pred_col(toks).alias("predicted_lang"),
        F.col("lang").alias("metadata_lang"),
    )


def sql_quality_score(toks: str = "toks") -> str:
    """DuckDB fragment: the C4/Gopher-style quality score over a
    token-list column. The ONE definition every oracle that needs the
    score builds from (ADVICE r2 item 4: dedup_keep_best_quality used
    to hand-duplicate the formula and stoplist inline — an edit to the
    scorer or EN_STOPWORDS would have silently desynchronized it)."""
    return (
        f"(0.4 * least(len({toks}) / 100.0, 1.0)\n"
        f"            + 0.3 * (len(list_distinct({toks})) / len({toks}))\n"
        f"            + 0.3 * least((len(list_filter({toks}, "
        f"w -> list_contains({_SQL_STOPLIST}, w))) / len({toks})) / 0.1, 1.0))"
    )


@register(
    "text_quality_score",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           {sql_quality_score('toks')} AS quality_score
    FROM t
    """,
    doc="Quality scoring: length saturation + lexical diversity + "
    "function-word density, combined with fixed weights (the "
    "C4/Gopher-style heuristic family).",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = H.words(F.col("text"))
    stoplist = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n = F.size(toks).cast("bigint")
    nd = F.size(F.array_distinct(toks)).cast("bigint")
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stoplist, w))).cast(
        "bigint"
    )
    score = (
        F.lit(0.4) * F.least(n / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * (nd / n)
        + F.lit(0.3) * F.least((n_stop / n) / F.lit(0.1), F.lit(1.0))
    )
    return docs.select(
        "doc_id", n.alias("n_tokens"), score.alias("quality_score")
    )


@register(
    "text_fingerprint",
    oracle=f"""
    WITH t AS (SELECT doc_id, text,
               [substr(text, i, 8) for i in generate_series(1, greatest(length(text) - 7, 1))]
                   AS grams
               FROM documents)
    SELECT doc_id,
           list_min([{H.sql_md5_long('g')} for g in grams]) AS fingerprint
    FROM t
    """,
    doc="Document fingerprinting: min-hash over all 8-char rolling "
    "grams (winnowing-style content fingerprint, robust to "
    "reordering of large blocks).",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    # substring() needs a column start position -> SQL expression form.
    grams = F.expr(
        "transform(sequence(1, greatest(length(text) - 7, 1)), i -> substring(text, i, 8))"
    )
    fp = F.array_min(F.transform(grams, lambda g: H.md5_long(g)))
    return docs.select("doc_id", fp.alias("fingerprint"))


#: Top English character bigrams (public frequency tables) — the
#: n-gram language profile. Fixed list, embedded in both engines.
EN_BIGRAMS = ("th", "he", "in", "er", "an", "re", "on", "at", "en", "nd")
_SQL_BIGRAM_LIST = "[" + ", ".join(f"'{b}'" for b in EN_BIGRAMS) + "]"


@register(
    "text_ngram_lang_profile",
    oracle=f"""
    WITH g AS (
        SELECT doc_id, lang,
               [substr(text, i, 2) for i in generate_series(1, greatest(length(text) - 1, 0))]
                   AS bigrams
        FROM documents
    )
    SELECT doc_id,
           len(list_filter(bigrams, b -> list_contains({_SQL_BIGRAM_LIST}, b)))
               / len(bigrams) AS en_bigram_score,
           CASE WHEN len(list_filter(bigrams, b -> list_contains({_SQL_BIGRAM_LIST}, b)))
                     / len(bigrams) >= 0.04
                THEN 'en' ELSE 'unknown' END AS predicted_lang,
           lang AS metadata_lang
    FROM g
    """,
    doc="Character-n-gram language profiling: density of top English "
    "bigrams over all character bigrams (the classic n-gram-profile "
    "lang-ID heuristic, complementing the stopword scorer).",
)
def text_ngram_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    bigrams = F.expr(
        "transform(sequence(1, greatest(length(text) - 1, 0)), i -> substring(text, i, 2))"
    )
    profile = F.array(*[F.lit(b) for b in EN_BIGRAMS])
    n_hit = F.size(F.filter(bigrams, lambda b: F.array_contains(profile, b))).cast(
        "bigint"
    )
    n = F.size(bigrams).cast("bigint")
    score = n_hit / n
    return docs.select(
        "doc_id",
        score.alias("en_bigram_score"),
        F.when(score >= 0.04, "en").otherwise("unknown").alias("predicted_lang"),
        F.col("lang").alias("metadata_lang"),
    )


_BPE_ISH_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"


@register(
    "text_token_count_bpeish",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{_BPE_ISH_PATTERN}')) AS n_bpeish_tokens,
           len({_SQL_TOKENS}) AS n_ws_tokens
    FROM documents
    """,
    doc="Token counting, BPE-ish: regex token classes (letter runs / "
    "digit runs / other) vs whitespace tokens — the cheap proxy for "
    "tokenizer-cost estimation over a corpus.",
)
def text_token_count_bpeish(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(_BPE_ISH_PATTERN)).cast("bigint").alias(
            "n_bpeish_tokens"
        ),
        F.size(H.words(F.col("text"))).cast("bigint").alias("n_ws_tokens"),
    )


#: Conservative PII patterns sharing Java-regex / RE2 syntax (no
#: backrefs, no lookaround) so both engines match identically.
PII_EMAIL = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
PII_PHONE = "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"
PII_SSNISH = "[0-9]{3}-[0-9]{2}-[0-9]{4}"


@register(
    "text_pii_scan",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) AS BIGINT)
               AS n_emails,
           CAST(len(regexp_extract_all(text, '{PII_PHONE}')) AS BIGINT)
               AS n_phones,
           CAST(len(regexp_extract_all(text, '{PII_SSNISH}')) AS BIGINT)
               AS n_ssnish,
           (len(regexp_extract_all(text, '{PII_EMAIL}')) > 0
            OR len(regexp_extract_all(text, '{PII_PHONE}')) > 0
            OR len(regexp_extract_all(text, '{PII_SSNISH}')) > 0)
               AS has_pii
    FROM documents
    """,
    doc="PII scan (pre-training scrubbing audit): per-document counts "
    "of email-, phone-, and SSN-shaped matches plus a has_pii flag. "
    "Pure JVM regexp_count expressions — one scan, no shuffle; the "
    "patterns avoid backrefs/lookaround so Java regex and RE2 match "
    "identically.",
)
def text_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    n_emails = F.regexp_count(F.col("text"), F.lit(PII_EMAIL)).cast("bigint")
    n_phones = F.regexp_count(F.col("text"), F.lit(PII_PHONE)).cast("bigint")
    n_ssnish = F.regexp_count(F.col("text"), F.lit(PII_SSNISH)).cast("bigint")
    return docs.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        n_ssnish.alias("n_ssnish"),
        ((n_emails > 0) | (n_phones > 0) | (n_ssnish > 0)).alias("has_pii"),
    )


HIST_BUCKET_TOKENS = 32  # fixed-width token-count histogram buckets


@register(
    "text_length_histogram",
    oracle=f"""
    WITH t AS (
        SELECT source,
               len({_SQL_TOKENS}) AS n_tokens,
               len({_SQL_TOKENS}) // {HIST_BUCKET_TOKENS} AS bucket
        FROM documents
    )
    SELECT source,
           CAST(bucket AS BIGINT) AS bucket,
           CAST(bucket * {HIST_BUCKET_TOKENS} AS BIGINT) AS bucket_lo,
           count(*) AS n_docs,
           CAST(min(n_tokens) AS BIGINT) AS min_tokens,
           CAST(max(n_tokens) AS BIGINT) AS max_tokens
    FROM t
    GROUP BY source, bucket
    """,
    doc="Corpus length distribution: fixed-width token-count histogram "
    "per source — the pre-training length audit (truncation budgets, "
    "mix weighting). One scan + one shuffle of source x bucket keys.",
)
def text_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    n = F.size(H.words(F.col("text"))).cast("bigint")
    bucket = F.floor(n / HIST_BUCKET_TOKENS).cast("bigint")
    return (
        docs.select("source", n.alias("n_tokens"), bucket.alias("bucket"))
        .groupBy("source", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
        .select(
            "source",
            "bucket",
            (F.col("bucket") * HIST_BUCKET_TOKENS).alias("bucket_lo"),
            "n_docs",
            "min_tokens",
            "max_tokens",
        )
    )


# ------------------------------------------------- cross-doc boilerplate
#: A word 3-gram is "boilerplate" when it appears in at least this many
#: DISTINCT documents. On real web corpora this catches navigation
#: chrome, license headers, and templated spans (the cross-document
#: analogue of C4's line dedup — this corpus's synthetic text has no
#: line structure, so the span unit is the same word 3-gram the minhash
#: pipeline shingles on). df>=4 sits above this corpus's chance-collision
#: floor (its ~30-word vocab makes df=2..3 mostly coincidence): it flags
#: ~4% of grams and the frac<0.2 keep rule drops ~8% of docs at sf0.01.
BOILERPLATE_MIN_DF = 4
BOILERPLATE_MAX_FRAC = 0.2


@register(
    "text_boilerplate_ngrams",
    oracle=f"""
    WITH w AS (SELECT doc_id, {H.sql_word_shingles('text')} AS sh
               FROM documents),
    dsh AS (SELECT DISTINCT doc_id,
                   unnest([{H.sql_shingle_hash('s')} for s in sh]) AS h
            FROM w WHERE len(sh) > 0),
    dfq AS (SELECT h, count(*) AS df FROM dsh GROUP BY h),
    tot AS (SELECT doc_id, count(*) AS n_grams FROM dsh GROUP BY doc_id),
    com AS (SELECT d.doc_id, count(*) AS n_boilerplate
            FROM dsh d JOIN dfq ON d.h = dfq.h
            WHERE dfq.df >= {BOILERPLATE_MIN_DF}
            GROUP BY d.doc_id)
    SELECT t.doc_id,
           t.n_grams,
           COALESCE(c.n_boilerplate, 0) AS n_boilerplate,
           COALESCE(c.n_boilerplate, 0) / t.n_grams AS boilerplate_frac,
           COALESCE(c.n_boilerplate, 0) / t.n_grams < {BOILERPLATE_MAX_FRAC}
               AS keep
    FROM tot t LEFT JOIN com c ON t.doc_id = c.doc_id
    """,
    doc="Cross-document boilerplate signal: corpus-wide document "
    "frequency of distinct word 3-grams; per doc, the fraction of its "
    "grams shared with >= BOILERPLATE_MIN_DF documents, and a keep "
    "flag below BOILERPLATE_MAX_FRAC. The RefinedWeb/C4 repeated-span "
    "filter re-expressed on gram hashes: every stage is a hash-keyed "
    "aggregate or equi-join on 8-byte keys (shingle text never "
    "shuffles), so the cost at 100 TB is the same two shuffles as the "
    "minhash pipeline it shares the shingle scan shape with. At high "
    "DF thresholds the surviving gram table is small enough to "
    "broadcast; at df>=2 it stays a shuffle join — both skew-safe "
    "because gram hashes distribute uniformly.",
)
def text_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_analytics_demo_spark.operators.dedup import _distinct_shingles

    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    # Per-gram document frequency as a window count over the gram hash,
    # folded straight into ONE per-doc aggregate: count(*) is n_grams
    # and sum(df >= MIN_DF) is n_boilerplate, so the df table, both
    # joins, the left-join NULL patch, and the persist of the shingle
    # rows all disappear (the before-plan ran dfq + the dfq-join as two
    # gram-table passes over the cache). Every doc has >= 1 gram row,
    # so the conditional sum is 0 (never NULL) where the old left join
    # produced the coalesced 0 — identical results.
    dsh = _distinct_shingles(docs)
    dfd = dsh.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("h")))
    agg = dfd.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(F.when(F.col("df") >= BOILERPLATE_MIN_DF, 1).otherwise(0))
        .cast("bigint")
        .alias("n_boilerplate"),
    )
    frac = F.col("n_boilerplate") / F.col("n_grams")
    return agg.select(
        "doc_id",
        "n_grams",
        "n_boilerplate",
        frac.alias("boilerplate_frac"),
        (frac < BOILERPLATE_MAX_FRAC).alias("keep"),
    )


@register(
    "text_pii_redact",
    oracle=f"""
    WITH r AS (
        SELECT doc_id,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(text, '{PII_SSNISH}', '<ID>', 'g'),
                       '{PII_PHONE}', '<PHONE>', 'g'),
                   '{PII_EMAIL}', '<EMAIL>', 'g') AS red,
               CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) AS BIGINT)
                   AS n_emails,
               CAST(len(regexp_extract_all(text, '{PII_PHONE}')) AS BIGINT)
                   AS n_phones,
               CAST(len(regexp_extract_all(text, '{PII_SSNISH}')) AS BIGINT)
                   AS n_ssnish
        FROM documents
    )
    SELECT doc_id,
           n_emails + n_phones + n_ssnish AS n_redactions,
           CAST(length(red) AS BIGINT) AS redacted_len,
           md5(red) AS redacted_md5
    FROM r
    """,
    doc="PII redaction (the transform the scan audits): SSN-shaped, "
    "then phone-shaped, then email-shaped spans replaced with typed "
    "placeholders — same fixed order in both engines so overlapping "
    "matches resolve identically. Result carries counts + the md5 of "
    "the redacted text (scalar columns for the driver's canonicalizer; "
    "the full redacted column is what a production job would write). "
    "Pure row-local regexp_replace — one scan, zero shuffle.",
)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    red = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), PII_SSNISH, "<ID>"),
            PII_PHONE,
            "<PHONE>",
        ),
        PII_EMAIL,
        "<EMAIL>",
    )
    n_redactions = (
        F.regexp_count(F.col("text"), F.lit(PII_EMAIL))
        + F.regexp_count(F.col("text"), F.lit(PII_PHONE))
        + F.regexp_count(F.col("text"), F.lit(PII_SSNISH))
    ).cast("bigint")
    return docs.select(
        "doc_id",
        n_redactions.alias("n_redactions"),
        F.length(red).cast("bigint").alias("redacted_len"),
        F.md5(red).alias("redacted_md5"),
    )
