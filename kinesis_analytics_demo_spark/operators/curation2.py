"""Corpus curation, part 2 — target-domain importance weighting
(DSIR), tokenizer-training pair statistics (one BPE merge iteration),
and a k-anonymity privacy audit.

``corpus_dsir_weights`` implements Data Selection via Importance
Resampling (Xie et al. 2023, NeurIPS): score every document by the
log-likelihood ratio between a TARGET-domain hashed-unigram model and
the raw-corpus model; resampling by these weights shifts the training
mixture toward the target domain without hand-written rules. Both
models live in B=256 hashed buckets (DSIR's hashed n-gram trick), so
model state is two 256-row tables no matter how large the corpus —
they broadcast everywhere.

``bpe_pair_counts`` is the inner loop of byte-pair-encoding tokenizer
training: corpus-wide frequencies of adjacent symbol pairs (here, the
character-pair iteration-0 step), returning the top merge candidates.
One explode + one hash aggregate with map-side combine; at 100 TB the
shuffle carries (pair, partial_count) rows only.

``k_anonymity_audit`` flags quasi-identifier groups with fewer than K
rows — the re-identification risk audit run before a dataset leaves
the curation pipeline (Sweeney 2002). A single hash aggregate over
the QI projection; the report is only the violating groups.

Determinism: ln() inputs are exact integer ratios and the per-doc
weight folds left-to-right over the bucket-sorted term list (the
proven pattern of operators/lm.py); everything else is integer counts
with order-insensitive aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.functions import hashing as H
from kinesis_analytics_demo_spark.plans.registry import register
from kinesis_analytics_demo_spark.session import read_table as _t

_SQL_TOKENS = "string_split_regex(text, '\\s+')"

DSIR_BUCKETS = 256  #: hashed-unigram model size (broadcast-tiny)
DSIR_TARGET_LANG = "en"  #: the target domain for the demo weighting
BPE_TOP = 20  #: merge candidates returned per iteration
K_ANON = 5  #: minimum group size for the k-anonymity audit


@register(
    "corpus_dsir_weights",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, lang,
               ({H.sql_md5_long('w')} % {DSIR_BUCKETS}) AS b
        FROM (SELECT doc_id, lang, unnest({_SQL_TOKENS}) AS w
              FROM documents)),
    tgt AS (SELECT b, count(*) AS tb FROM tok
            WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY b),
    corp AS (SELECT b, count(*) AS rb FROM tok GROUP BY b),
    tot AS (SELECT
        (SELECT count(*) FROM tok WHERE lang = '{DSIR_TARGET_LANG}') AS t,
        (SELECT count(*) FROM tok) AS r),
    lam AS (
        SELECT corp.b,
               ln((COALESCE(tb, 0) + 1) / (t + {DSIR_BUCKETS}))
                 - ln((rb + 1) / (r + {DSIR_BUCKETS})) AS lam
        FROM corp LEFT JOIN tgt ON corp.b = tgt.b, tot),
    tf AS (SELECT doc_id, b, count(*) AS tf FROM tok GROUP BY doc_id, b),
    l AS (
        SELECT doc_id,
               list(struct_pack(tf := CAST(tf AS DOUBLE), lam := lam)
                    ORDER BY tf.b) AS ts,
               sum(tf) AS m
        FROM tf JOIN lam ON tf.b = lam.b GROUP BY doc_id)
    SELECT doc_id,
           CAST(m AS BIGINT) AS n_tokens,
           ROUND(list_sum([s.tf * s.lam for s in ts]), 6) AS log_weight
    FROM l
    """,
    doc="DSIR importance weights (Xie et al. 2023): per-doc "
    "log-likelihood ratio between a target-domain (lang=en) and the "
    "raw-corpus hashed-unigram model, 256 buckets with add-one "
    "smoothing. Model state is two broadcast 256-row tables; the "
    "per-doc fold runs left-to-right over bucket-sorted terms with "
    "exact integer ratios entering ln() — bit-reproducible.",
)
def corpus_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang", F.explode(H.words(F.col("text"))).alias("w")
    ).select(
        "doc_id", "lang", (H.md5_long(F.col("w")) % DSIR_BUCKETS).alias("b")
    )
    tgt = (
        tok.filter(F.col("lang") == DSIR_TARGET_LANG)
        .groupBy("b").agg(F.count(F.lit(1)).alias("tb"))
    )
    corp = tok.groupBy("b").agg(F.count(F.lit(1)).alias("rb"))
    tot = tok.agg(
        F.sum(F.when(F.col("lang") == DSIR_TARGET_LANG, 1).otherwise(0))
        .alias("t"),
        F.count(F.lit(1)).alias("r"),
    )
    lam = (
        corp.join(tgt, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            (
                F.log(
                    (F.coalesce(F.col("tb"), F.lit(0)) + 1)
                    / (F.col("t") + DSIR_BUCKETS)
                )
                - F.log((F.col("rb") + 1) / (F.col("r") + DSIR_BUCKETS))
            ).alias("lam"),
        )
    )
    tf = tok.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("tf"))
    l = (
        tf.join(F.broadcast(lam), "b")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(F.col("b"), F.col("tf"), F.col("lam"))
                    )
                ),
                lambda s: F.struct(
                    s["tf"].cast("double").alias("tf"),
                    s["lam"].alias("lam"),
                ),
            ).alias("ts"),
            F.sum("tf").alias("m"),
        )
    )
    fold = F.aggregate(
        F.col("ts"), F.lit(0.0), lambda acc, s: acc + s["tf"] * s["lam"]
    )
    return l.select(
        "doc_id",
        F.col("m").cast("bigint").alias("n_tokens"),
        F.round(fold, 6).alias("log_weight"),
    )


@register(
    "bpe_pair_counts",
    oracle=f"""
    WITH w AS (SELECT unnest({_SQL_TOKENS}) AS w FROM documents),
    pairs AS (
        SELECT unnest([substr(w, i, 2)
                       for i in generate_series(1, len(w) - 1)]) AS pair
        FROM w WHERE len(w) >= 2),
    c AS (SELECT pair, count(*) AS n FROM pairs GROUP BY pair),
    r AS (SELECT pair, n,
                 row_number() OVER (ORDER BY n DESC, pair) AS rank
          FROM c)
    SELECT pair, n, CAST(rank AS INT) AS rank
    FROM r WHERE rank <= {BPE_TOP}
    """,
    doc="One BPE tokenizer-training merge iteration: corpus-wide "
    "adjacent character-pair frequencies, top-20 merge candidates "
    "with deterministic (count desc, pair) tiebreak. Explode + "
    "map-side-combined hash aggregate; the shuffle carries (pair, "
    "partial count) rows, never text.",
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    w = docs.select(F.explode(H.words(F.col("text"))).alias("w")).filter(
        F.length("w") >= 2
    )
    pairs = w.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("w") - 1),
                lambda i: F.col("w").substr(i, F.lit(2)),
            )
        ).alias("pair")
    )
    c = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("n"))
    rw = Window.orderBy(F.desc("n"), F.col("pair"))
    return (
        c.withColumn("rank", F.row_number().over(rw).cast("int"))
        .filter(F.col("rank") <= BPE_TOP)
    )


@register(
    "k_anonymity_audit",
    oracle=f"""
    WITH qi AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(floor(value / 50) AS INT) AS value_band,
               count(*) AS n
        FROM events GROUP BY 1, 2, 3)
    SELECT event_type, day, value_band, CAST(n AS BIGINT) AS n
    FROM qi WHERE n < {K_ANON}
    """,
    doc="k-anonymity audit (Sweeney 2002): quasi-identifier groups "
    "(event_type, day, coarse value band) holding fewer than k=5 "
    "rows — the re-identification risk report a dataset release "
    "gate reads. One hash aggregate over the 3-column QI projection; "
    "only violating groups are emitted.",
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    qi = (
        ev.select(
            "event_type",
            F.to_date("ts").alias("day"),
            F.floor(F.col("value") / 50).cast("int").alias("value_band"),
        )
        .groupBy("event_type", "day", "value_band")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return qi.filter(F.col("n") < K_ANON)
