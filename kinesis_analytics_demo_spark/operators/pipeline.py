"""End-to-end training-data corpus preparation — the composition the
individual operators exist for: quality filter -> language filter ->
exact dedup -> near-dup dedup -> per-source corpus stats, as ONE
declarative plan.

This is the query a 100 TB ingest actually runs nightly. Because every
stage is a column expression or a keyed aggregate, the whole pipeline
is: one corpus scan, one shuffle per dedup stage (on an 8/16-byte
hash, never on text), one final stats shuffle — no UDFs, no driver
round-trips, fully whole-stage-codegen'd. Filters run FIRST so the
dedup shuffles only carry surviving documents (selectivity here:
~500 -> ~270 docs; at 100 TB that ordering is the difference between
shuffling 40 TB and 100 TB).

Determinism: "keep the lowest doc_id" at both dedup stages; stats are
counts/integer sums/min/max only (no float accumulation), so results
are partitioning-independent and oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.functions import hashing as H
from kinesis_analytics_demo_spark.operators.text import (
    EN_STOPWORDS,
    LANG_ID_THRESHOLD,
    _SQL_TOKENS as _TOKS,
    sql_quality_score,
)

_QSCORE = sql_quality_score("toks")
from kinesis_analytics_demo_spark.plans.registry import register
from kinesis_analytics_demo_spark.session import read_table as _t

QUALITY_THRESHOLD = 0.5

_SQL_TOKENS = "string_split_regex(text, '\\s+')"
_SQL_STOPLIST = "[" + ", ".join(f"'{w}'" for w in EN_STOPWORDS) + "]"


def _sql_pipeline_ctes() -> str:
    """Oracle CTE chain mirroring the Spark plan stage-for-stage."""
    shingles = H.sql_word_shingles("text")
    mh = ",\n               ".join(
        f"{e} AS mh{i}"
        for i, e in enumerate(H.sql_minhash_select("hashes"))
    )
    concat = " || ',' || ".join(f"mh{i}::VARCHAR" for i in range(len(H.MINHASH_PERMS)))
    return f"""
    scored AS (
        SELECT doc_id, text, source,
               len({_SQL_TOKENS}) AS n_tokens,
               (0.4 * least(len({_SQL_TOKENS}) / 100.0, 1.0)
                + 0.3 * (len(list_distinct({_SQL_TOKENS})) / len({_SQL_TOKENS}))
                + 0.3 * least((len(list_filter({_SQL_TOKENS},
                        w -> list_contains({_SQL_STOPLIST}, w))) /
                        len({_SQL_TOKENS})) / 0.1, 1.0)) AS quality,
               (len(list_filter({_SQL_TOKENS},
                    w -> list_contains({_SQL_STOPLIST}, w)))
                    / len({_SQL_TOKENS})) AS en_score
        FROM documents
    ),
    kept AS (
        SELECT * FROM scored
        WHERE quality >= {QUALITY_THRESHOLD} AND en_score >= {LANG_ID_THRESHOLD}
    ),
    exact AS (
        SELECT * FROM kept
        QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
    ),
    hashed AS (
        SELECT *, {shingles} AS sh_list FROM exact
    ),
    sigs AS (
        SELECT doc_id, source, n_tokens, quality,
               CASE WHEN len(sh_list) = 0 THEN md5(text) ELSE (
                   SELECT md5({concat}) FROM (
                       SELECT {mh}
                       FROM (SELECT [{H.sql_shingle_hash('s')} for s in sh_list]
                                 AS hashes)
                   )
               ) END AS sig
        FROM hashed
    ),
    uniq AS (
        SELECT * FROM sigs
        QUALIFY row_number() OVER (PARTITION BY sig ORDER BY doc_id) = 1
    )"""


@register(
    "corpus_prep_pipeline",
    oracle=f"""
    WITH {_sql_pipeline_ctes()}
    SELECT source,
           count(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           min(quality) AS min_quality,
           max(quality) AS max_quality
    FROM uniq GROUP BY source
    """,
    doc="END-TO-END corpus prep: quality filter (length saturation + "
    "diversity + stopword density >= 0.5) -> language filter "
    "(en_score >= 0.03) -> exact dedup (md5, keep lowest doc_id) -> "
    "near-dup dedup (16-perm minhash signature; short docs fall back "
    "to exact identity) -> per-source doc/token stats. One scan, "
    "hash-keyed dedup shuffles only, filters pushed ahead of both "
    "shuffles.",
)
def corpus_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    uniq = _prep_uniq_small(spark, sf_dir)
    return uniq.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("quality").alias("min_quality"),
        F.max("quality").alias("max_quality"),
    )


def _prep_uniq_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surviving documents as SMALL rows (doc_id, source, n_tokens,
    quality, en_score) — the whole filter -> exact-dedup -> near-dedup
    decision chain runs on hashes and per-doc scalars, never moving
    text through an exchange.

    The pre-r11 shape shuffled full document rows three times (the
    exact-dedup window keyed on md5(text), the signature join keyed on
    doc_id, the near-dup window keyed on sig) and, with two unpersisted
    consumers of the exact frame, ran the md5 window twice. Here both
    dedup stages are min_by aggregates over narrow frames (doc_id is
    unique, so "lowest doc_id per key" is the same winner row_number
    picked), the signature pass runs on the FILTERED corpus before
    exact dedup (identical signatures for the surviving docs; losers
    drop in the join), and text's only uses are the one scan computing
    md5/shingles — the guide-§8 'decide with small rows' shape."""
    docs = _t(spark, sf_dir, "documents")
    toks = H.words(F.col("text"))
    stoplist = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n = F.size(toks).cast("bigint")
    nd = F.size(F.array_distinct(toks)).cast("bigint")
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stoplist, w))).cast(
        "bigint"
    )
    quality = (
        F.lit(0.4) * F.least(n / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * (nd / n)
        + F.lit(0.3) * F.least((n_stop / n) / F.lit(0.1), F.lit(1.0))
    )
    en_score = n_stop / n

    scored = docs.select(
        "doc_id",
        "text",
        "source",
        n.alias("n_tokens"),
        quality.alias("quality"),
        en_score.alias("en_score"),
    )
    kept = scored.filter(
        (F.col("quality") >= QUALITY_THRESHOLD)
        & (F.col("en_score") >= LANG_ID_THRESHOLD)
    )

    # near-dup signatures; <3-word docs fall back to exact text
    # identity (their shingle set is empty -> left-join miss below).
    # Signatures use the explode -> codegen'd-min-aggregate shape
    # (dedup.py::_minhash_banded): per-row higher-order array
    # transforms are interpreted per element and re-derive the
    # shingle array 16x — measured 40x slower on this corpus. Shingle
    # rows come from the lead-window shape (dedup._shingle_hash_rows),
    # all-JVM and pre-partitioned by doc_id for the groupBy below.
    from kinesis_analytics_demo_spark.operators.dedup import _shingle_hash_rows

    sh_rows = _shingle_hash_rows(kept)
    mins = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % H.MERSENNE_P).alias(f"mh{i}")
        for i, (a, b) in enumerate(H.MINHASH_PERMS)
    ]
    sig16 = sh_rows.groupBy("doc_id").agg(*mins)
    mh_sig = F.md5(
        F.concat_ws(
            ",", *[F.col(f"mh{i}").cast("string") for i in range(len(H.MINHASH_PERMS))]
        )
    )
    sig_by_doc = sig16.select("doc_id", mh_sig.alias("mh_sig"))

    # exact dedup on (md5, small scalars) only: winner = lowest doc_id
    meta = kept.select(
        "doc_id", "source", "n_tokens", "quality", "en_score",
        F.md5("text").alias("h"),
    )
    winner = F.min_by(
        F.struct("doc_id", "source", "n_tokens", "quality", "en_score"),
        F.col("doc_id"),
    )
    exact = (
        meta.groupBy("h").agg(winner.alias("s")).select("h", "s.*")
    )

    sigs = exact.join(sig_by_doc, "doc_id", "left").withColumn(
        "sig", F.coalesce(F.col("mh_sig"), F.col("h"))
    )
    return (
        sigs.groupBy("sig").agg(winner.alias("s")).select("s.*")
    )


def corpus_prep_kept_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-level output of the prep pipeline (library surface — the
    registered query aggregates the small rows directly; callers like
    ``examples/corpus_prep.py`` write these rows out as the training
    corpus): documents surviving quality filter -> language filter ->
    exact dedup -> minhash near-dedup, with their token count and
    quality score. Text is re-attached by ONE doc_id join at the end —
    the single payload move of the guide-§8 shape."""
    small = _prep_uniq_small(spark, sf_dir)
    docs = _t(spark, sf_dir, "documents")
    return small.join(docs.select("doc_id", "text"), "doc_id").select(
        "doc_id", "text", "source", "n_tokens", "quality", "en_score"
    )


# --------------------------------------------------------------------
# Deterministic stratified sampling — the data-mixing primitive a
# training pipeline runs after prep: per-source keep rates applied as
# a pure hash predicate. No RNG state, no sort, no shuffle: a row is
# kept iff md5(doc_id) lands under its source's threshold, so the
# sample is reproducible across runs, engines, partitionings, and
# even retries of individual tasks (the property RAND()-based
# sampling lacks), and composes with predicate pushdown.
# --------------------------------------------------------------------
#: keep-rate percent per source bucket (sources hash into 4 tiers to
#: keep the literal map small at any source cardinality)
SAMPLE_TIER_PCT = (100, 50, 25, 10)


@register(
    "corpus_stratified_sample",
    oracle=f"""
    WITH tiered AS (
        SELECT doc_id, source,
               (('0x' || substr(md5(source), 1, 15))::BIGINT % 4) AS tier,
               (('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT % 100)
                   AS slot
        FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_sampled
    FROM tiered
    WHERE slot < CASE tier WHEN 0 THEN 100 WHEN 1 THEN 50
                           WHEN 2 THEN 25 ELSE 10 END
    GROUP BY source
    """,
    doc="Deterministic stratified sampling: per-source keep rates "
    "(tiered 100/50/25/10%) applied as an md5-hash predicate — "
    "reproducible across runs/engines/partitionings and task "
    "retries, unlike RAND() sampling; zero shuffle before the "
    "final count.",
)
def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    # md5-derived tier and slot, both engine-agnostic (H.md5_long)
    tier = H.md5_long(F.col("source")) % 4
    slot = H.md5_long(F.col("doc_id").cast("string")) % 100
    rate = (
        F.when(tier == 0, 100)
        .when(tier == 1, 50)
        .when(tier == 2, 25)
        .otherwise(10)
    )
    return (
        docs.select("doc_id", "source", tier.alias("tier"), slot.alias("slot"),
                    rate.alias("rate"))
        .filter(F.col("slot") < F.col("rate"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )


# --------------------------------------------------------------------
# Exact-k deterministic global sample: order the corpus by an md5 of
# the key and take the first K. Spark plans TakeOrderedAndProject —
# per-partition top-K heaps, then a K-row merge on the driver-side
# reducer — so no global sort ever materializes; cost is one scan +
# K*partitions rows of shuffle regardless of corpus size. The hash
# order makes the "random" K reproducible across runs, engines, and
# partitionings (RAND()-based LIMIT sampling is none of those).
# --------------------------------------------------------------------
SAMPLE_EXACT_K = 100


@register(
    "corpus_sample_exact_k",
    oracle=f"""
    SELECT doc_id, source
    FROM documents
    ORDER BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 15))::BIGINT, doc_id
    LIMIT {SAMPLE_EXACT_K}
    """,
    doc="Exact-k uniform sample: global top-K by md5(doc_id) — "
    "TakeOrderedAndProject (per-partition heaps + K-row merge, no "
    "full sort), deterministic across runs/engines/partitionings.",
)
def corpus_sample_exact_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id", "source", H.md5_long(F.col("doc_id").cast("string")).alias("__h")
        )
        .orderBy(F.asc("__h"), F.asc("doc_id"))
        .limit(SAMPLE_EXACT_K)
        .drop("__h")
    )


# --------------------------------------------------------------------
# Deterministic train/validation/test assignment: hash each doc into
# 1000 slots and carve fixed bands (980/10/10). A pure row-local
# expression — no shuffle, no RNG; membership survives reruns,
# repartitioning, and incremental ingest (a new shard's docs join the
# same splits they would have joined in a full rebuild, because the
# assignment depends only on doc_id).
# --------------------------------------------------------------------
SPLIT_SLOTS = 1000
SPLIT_VALID_LO = 980  # [980, 990) -> validation
SPLIT_TEST_LO = 990  # [990, 1000) -> test


@register(
    "corpus_train_split",
    oracle=f"""
    WITH s AS (
        SELECT source,
               (('0x' || substr(md5('split:' || doc_id::VARCHAR), 1, 15))::BIGINT
                   % {SPLIT_SLOTS}) AS slot
        FROM documents
    )
    SELECT source,
           CASE WHEN slot >= {SPLIT_TEST_LO} THEN 'test'
                WHEN slot >= {SPLIT_VALID_LO} THEN 'validation'
                ELSE 'train' END AS split,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM s
    GROUP BY source, split
    """,
    doc="Deterministic train/validation/test split: md5('split:'||id) "
    "into 1000 slots, fixed 98/1/1 bands. Row-local "
    "assignment (zero shuffle before the audit count) that is stable "
    "under reruns, repartitioning, and incremental ingest; the "
    "'split:' salt decorrelates it from every other hash decision "
    "(sampling tiers, shard assignment) derived from the same ids.",
)
def corpus_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    slot = H.md5_long(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))) % SPLIT_SLOTS
    split = (
        F.when(slot >= SPLIT_TEST_LO, "test")
        .when(slot >= SPLIT_VALID_LO, "validation")
        .otherwise("train")
    )
    return (
        docs.select("source", split.alias("split"))
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# ------------------------------------- quality-weighted sampling
#: Efraimidis-Spirakis weighted reservoir: priority = u^(1/w) with u a
#: deterministic per-doc hash uniform — the top-K priorities ARE a
#: weighted-without-replacement sample. Fully deterministic (hash
#: randomness), so the SAMPLE ITSELF is oracle-checked.
WEIGHTED_SAMPLE_K = 100
_WS_HASH_SPACE = 1 << 60  # md5_long draws 60 bits


@register(
    "corpus_sample_weighted",
    oracle=f"""
    WITH t AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents),
    q AS (SELECT doc_id, source, {_QSCORE} AS w FROM t),
    pr AS (
        SELECT doc_id, source, w,
               pow((CAST({H.sql_md5_long("'wsample:' || doc_id::VARCHAR")}
                         AS DOUBLE) + 0.5) / {float(_WS_HASH_SPACE)},
                   1.0 / w) AS priority
        FROM q
    )
    SELECT doc_id, source, w AS quality_score,
           ROUND(priority, 6) AS priority
    FROM pr
    ORDER BY priority DESC, doc_id
    LIMIT {WEIGHTED_SAMPLE_K}
    """,
    doc="Quality-WEIGHTED corpus sampling (Efraimidis-Spirakis): "
    "priority = u^(1/quality) with u = md5('wsample:'||id)/2^60; the "
    "global top-K priorities are a weighted sample without "
    "replacement, biased toward high-quality documents. Deterministic "
    "hash randomness makes the sample itself oracle-checkable; "
    "TakeOrderedAndProject (per-partition heaps) keeps the top-K "
    "selection shuffle at K rows per partition — no global sort at "
    "100 TB. The 'wsample:' salt decorrelates it from the split / "
    "shard / tier hashes on the same ids.",
)
def corpus_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_analytics_demo_spark.operators.text import text_quality_score

    q = text_quality_score(spark, sf_dir).select("doc_id", "quality_score")
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    u = (
        H.md5_long(F.concat(F.lit("wsample:"), F.col("doc_id").cast("string")))
        .cast("double")
        + F.lit(0.5)
    ) / F.lit(float(_WS_HASH_SPACE))
    pr = docs.join(q, "doc_id").select(
        "doc_id",
        "source",
        "quality_score",
        F.pow(u, F.lit(1.0) / F.col("quality_score")).alias("__p"),
    )
    return (
        pr.orderBy(F.desc("__p"), F.asc("doc_id"))
        .limit(WEIGHTED_SAMPLE_K)
        .select(
            "doc_id",
            "source",
            "quality_score",
            F.round("__p", 6).alias("priority"),
        )
    )
