"""Corpus curation economics: token-budget selection and soft-dedup
weighting — the two knobs a training-data pipeline turns after the
hard filters have run.

``corpus_token_budget_select`` answers "which documents fit the
training budget": rank by quality (desc, doc_id tiebreak) and keep
the prefix whose cumulative token count stays within a fixed FRACTION
of the corpus (scale-invariant budget). At 100 TB the prefix scan
runs on the tiny (doc_id, n_tokens, quality) projection — raw text
never reaches the ordered window; the global order is a single-range
sort of O(docs) small rows (range-partition + prefix-sum of
partition totals on a real cluster).

``corpus_soft_dedup_weights`` is the soft alternative to dropping
near-duplicates (used when dedup would starve a domain): every doc
keeps weight 1/|its near-dup cluster|, so each duplicated passage
contributes ~once in expectation. Reuses the MinHash-LSH cluster
machinery; the weight join touches only (doc_id, cluster_id) pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.functions import hashing as H
from kinesis_analytics_demo_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    _sql_minhash_cte,
    dedup_minhash_clusters,
)
from kinesis_analytics_demo_spark.operators.text import sql_quality_score
from kinesis_analytics_demo_spark.plans.registry import register
from kinesis_analytics_demo_spark.session import read_table as _t

_SQL_TOKENS = "string_split_regex(text, '\\s+')"

BUDGET_FRAC = 0.5  #: keep the best docs up to half the corpus tokens


@register(
    "corpus_token_budget_select",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents),
    q AS (SELECT doc_id,
                 CAST(len(toks) AS BIGINT) AS n_tokens,
                 {sql_quality_score('toks')} AS quality_score
          FROM t),
    tot AS (SELECT SUM(n_tokens) AS total FROM q),
    c AS (SELECT doc_id, n_tokens, quality_score,
                 SUM(n_tokens) OVER (ORDER BY quality_score DESC, doc_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS cum_tokens
          FROM q)
    SELECT c.doc_id, c.n_tokens,
           ROUND(c.quality_score, 9) AS quality_score,
           CAST(c.cum_tokens AS BIGINT) AS cum_tokens,
           c.cum_tokens <= {BUDGET_FRAC} * tot.total AS kept
    FROM c, tot
    """,
    doc="Token-budget selection: rank the corpus by quality (doc_id "
    "tiebreak) and keep the best-first prefix holding half the "
    "corpus tokens — the data-mixing budget cut. The ordered prefix "
    "sum runs over the tiny (doc_id, n_tokens, quality) projection; "
    "cumulative counts are exact integers, so the keep frontier is "
    "engine-exact.",
)
def corpus_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_analytics_demo_spark.operators.text import EN_STOPWORDS

    docs = _t(spark, sf_dir, "documents")
    toks = H.words(F.col("text"))
    stoplist = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n = F.size(toks).cast("bigint")
    nd = F.size(F.array_distinct(toks)).cast("bigint")
    n_stop = F.size(
        F.filter(toks, lambda w: F.array_contains(stoplist, w))
    ).cast("bigint")
    score = (
        F.lit(0.4) * F.least(n / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * (nd / n)
        + F.lit(0.3) * F.least((n_stop / n) / F.lit(0.1), F.lit(1.0))
    )
    q = docs.select(
        "doc_id", n.alias("n_tokens"), score.alias("quality_score")
    )
    tot = q.agg(F.sum("n_tokens").alias("total"))
    w = Window.orderBy(F.desc("quality_score"), F.asc("doc_id")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        q.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "n_tokens",
            F.round("quality_score", 9).alias("quality_score"),
            F.col("cum_tokens").cast("bigint").alias("cum_tokens"),
            (F.col("cum_tokens") <= BUDGET_FRAC * F.col("total")).alias(
                "kept"
            ),
        )
    )


@register(
    "corpus_soft_dedup_weights",
    oracle=f"""
    WITH RECURSIVE {_sql_minhash_cte()},
    dup AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= {JACCARD_THRESHOLD}),
    edges AS (
        SELECT doc_a AS src, doc_b AS dst FROM dup
        UNION ALL
        SELECT doc_b AS src, doc_a AS dst FROM dup
    ),
    reach(doc_id, root) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.doc_id
    ),
    cl AS (SELECT doc_id, min(root) AS cluster_id FROM reach GROUP BY doc_id),
    sz AS (SELECT cluster_id, count(*) AS cluster_size FROM cl GROUP BY 1)
    SELECT cl.doc_id, cl.cluster_id,
           CAST(sz.cluster_size AS BIGINT) AS cluster_size,
           ROUND(1.0 / sz.cluster_size, 9) AS weight
    FROM cl JOIN sz ON cl.cluster_id = sz.cluster_id
    """,
    doc="Soft dedup: instead of dropping near-duplicates, weight "
    "every document by 1/|near-dup cluster| so duplicated passages "
    "contribute ~once in expectation — the down-weighting used when "
    "hard dedup would starve a domain. Built on the MinHash-LSH "
    "connected components; the weight join moves only (doc_id, "
    "cluster_id) integer pairs.",
)
def corpus_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    clusters = dedup_minhash_clusters(spark, sf_dir)
    sz = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return clusters.join(sz, "cluster_id").select(
        "doc_id",
        "cluster_id",
        F.col("cluster_size").cast("bigint").alias("cluster_size"),
        F.round(F.lit(1.0) / F.col("cluster_size"), 9).alias("weight"),
    )


@register(
    "source_quality_report",
    oracle=f"""
    WITH t AS (SELECT source, {_SQL_TOKENS} AS toks FROM documents),
    q AS (SELECT source,
                 CAST(len(toks) AS BIGINT) AS n_tokens,
                 {sql_quality_score('toks')} AS quality_score
          FROM t)
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           ROUND(CAST(SUM(CAST(ROUND(quality_score, 9) AS DECIMAL(12,9)))
                      AS DOUBLE) / count(*), 6) AS mean_quality,
           CAST(SUM(CASE WHEN quality_score >= 0.5 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_above_half
    FROM q GROUP BY source
    """,
    doc="Per-source corpus quality report: document and token "
    "counts, mean quality score, and the above-threshold tally — "
    "the one-row-per-source management summary steering mixing "
    "weights. The mean folds 9-digit-rounded scores through a "
    "DECIMAL sum (order-free) before one double division; built on "
    "the shared quality-score fragment so it can never drift from "
    "the scorer.",
)
def source_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_analytics_demo_spark.operators.text import EN_STOPWORDS

    docs = _t(spark, sf_dir, "documents")
    toks = H.words(F.col("text"))
    stoplist = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n = F.size(toks).cast("bigint")
    nd = F.size(F.array_distinct(toks)).cast("bigint")
    n_stop = F.size(
        F.filter(toks, lambda w: F.array_contains(stoplist, w))
    ).cast("bigint")
    score = (
        F.lit(0.4) * F.least(n / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * (nd / n)
        + F.lit(0.3) * F.least((n_stop / n) / F.lit(0.1), F.lit(1.0))
    )
    q = docs.select(
        "source", n.alias("n_tokens"), score.alias("quality_score")
    )
    return q.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.round(
            F.sum(
                F.round(F.col("quality_score"), 9).cast("decimal(12,9)")
            ).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_quality"),
        F.sum(
            F.when(F.col("quality_score") >= 0.5, 1).otherwise(0)
        ).cast("bigint").alias("n_above_half"),
    )
