"""Training-data pipeline operators beyond cleaning/dedup: benchmark
decontamination and sequence packing — the two steps between a cleaned
corpus and a training run.

- ``decontamination_ngram_overlap`` — flag training documents that
  share any word 3-gram with a held-out benchmark set (the standard
  n-gram-overlap decontamination used for LLM eval hygiene). The whole
  check is ONE hash equi-join on 60-bit shingle hashes: the benchmark
  side is tiny (broadcast), the training side streams — at 100 TB the
  corpus pays one scan and shuffles nothing (broadcast join), and the
  shuffle-free shingle hashing reuses the dedup layer's expressions
  (operators/dedup.py, functions/hashing.py).

- ``pack_sequences`` — deterministic greedy packing of documents into
  fixed-token-budget training sequences. Documents are hash-sharded
  (packing is per-shard, the way per-worker packing works in real
  loaders — a GLOBAL running sum would serialize on one partition at
  100 TB), then within a shard a running token total assigns each doc
  to batch floor(prev_cumsum / budget). One shuffle on the shard id;
  the window runs partition-parallel.

Both have exact DuckDB oracle twins (same hashes, same window
arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.functions import hashing as H
from kinesis_analytics_demo_spark.operators.dedup import _distinct_shingles
from kinesis_analytics_demo_spark.plans.registry import register
from kinesis_analytics_demo_spark.session import read_table as _t

#: Held-out "benchmark" slice of the corpus: doc_id < 50 stands in for
#: an eval set (MMLU/GSM-style) whose n-grams must not leak into
#: training data.
BENCHMARK_MAX_DOC_ID = 50

_SQL_SHINGLES = H.sql_word_shingles("text")


@register(
    "decontamination_ngram_overlap",
    oracle=f"""
    WITH sh AS (
        SELECT doc_id, unnest({_SQL_SHINGLES}) AS s FROM documents
    ),
    dsh AS (
        SELECT DISTINCT doc_id, {H.sql_shingle_hash('s')} AS h FROM sh
    ),
    bench AS (
        SELECT doc_id AS bench_doc, h FROM dsh
        WHERE doc_id < {BENCHMARK_MAX_DOC_ID}
    ),
    train AS (
        SELECT doc_id, h FROM dsh WHERE doc_id >= {BENCHMARK_MAX_DOC_ID}
    ),
    hits AS (
        SELECT t.doc_id,
               count(DISTINCT t.h) AS n_shared_shingles,
               count(DISTINCT b.bench_doc) AS n_benchmark_docs
        FROM train t JOIN bench b ON t.h = b.h
        GROUP BY t.doc_id
    )
    SELECT d.doc_id,
           COALESCE(n_shared_shingles, 0) AS n_shared_shingles,
           COALESCE(n_benchmark_docs, 0) AS n_benchmark_docs,
           n_shared_shingles IS NOT NULL AS contaminated
    FROM (SELECT doc_id FROM documents
          WHERE doc_id >= {BENCHMARK_MAX_DOC_ID}) d
    LEFT JOIN hits ON d.doc_id = hits.doc_id
    """,
    doc="Benchmark decontamination: training docs sharing any word "
    "3-gram (60-bit md5 shingle hash) with the held-out benchmark "
    "slice. One broadcast hash join on shingle hashes — the benchmark "
    "side is small by construction; the corpus side never shuffles.",
)
def decontamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    dsh = _distinct_shingles(docs)
    bench = dsh.filter(F.col("doc_id") < BENCHMARK_MAX_DOC_ID).select(
        F.col("doc_id").alias("bench_doc"), "h"
    )
    train = dsh.filter(F.col("doc_id") >= BENCHMARK_MAX_DOC_ID)
    hits = (
        train.join(F.broadcast(bench), "h")
        .groupBy("doc_id")
        .agg(
            F.count_distinct("h").alias("n_shared_shingles"),
            F.count_distinct("bench_doc").alias("n_benchmark_docs"),
        )
    )
    return (
        docs.filter(F.col("doc_id") >= BENCHMARK_MAX_DOC_ID)
        .select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shared_shingles", F.lit(0)).alias("n_shared_shingles"),
            F.coalesce("n_benchmark_docs", F.lit(0)).alias("n_benchmark_docs"),
            F.col("n_shared_shingles").isNotNull().alias("contaminated"),
        )
    )


MIX_TEMPERATURE = 2.0  # T>1 flattens the source distribution


@register(
    "corpus_mix_temperature",
    oracle=f"""
    WITH stats AS (
        SELECT lang, count(*) AS n FROM documents GROUP BY lang
    ),
    rates AS (
        SELECT lang, n,
               pow(n, 1.0 / {MIX_TEMPERATURE}) / n AS raw_q
        FROM stats
    ),
    normed AS (
        SELECT lang, n,
               round(raw_q / max(raw_q) OVER (), 9) AS keep_q
        FROM rates
    )
    SELECT d.doc_id, d.lang, nm.keep_q
    FROM documents d JOIN normed nm ON d.lang = nm.lang
    WHERE ({H.sql_md5_long('d.doc_id::VARCHAR')} % 1000000) / 1000000.0
          < nm.keep_q
    """,
    doc="Temperature-based corpus mixing (the multilingual rebalancing "
    "step): per-language keep probability proportional to n^(1/T)/n "
    "(T=2 downsamples the dominant language toward a flatter mix — "
    "here en keeps ~54%, the smallest language 100%), applied as a "
    "deterministic md5 hash predicate — reproducible across runs, "
    "engines, and task retries, unlike RAND() sampling. Language "
    "stats aggregate in one tiny shuffle, then broadcast back; the "
    "corpus itself is filtered in place, no second shuffle.",
)
def corpus_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    stats = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    rates = stats.select(
        "lang",
        (F.pow(F.col("n"), 1.0 / MIX_TEMPERATURE) / F.col("n")).alias("raw_q"),
    )
    # keep_q rounded to 9 decimals: libm pow can differ by an ulp
    # between engines; rounding makes the rate (an output column and
    # the filter bound) bit-stable cross-engine
    normed = rates.select(
        "lang",
        F.round(
            F.col("raw_q") / F.max("raw_q").over(Window.partitionBy()), 9
        ).alias("keep_q"),
    )
    frac = (
        H.md5_long(F.col("doc_id").cast("string")) % 1_000_000
    ) / 1_000_000.0
    return (
        docs.join(F.broadcast(normed), "lang")
        .filter(frac < F.col("keep_q"))
        .select("doc_id", "lang", "keep_q")
    )


SHUFFLE_SEED = "epoch0"
SHUFFLE_SHARDS = 8


@register(
    "shuffle_deterministic",
    oracle=f"""
    WITH k AS (
        SELECT doc_id,
               {H.sql_md5_long("doc_id::VARCHAR || '" + SHUFFLE_SEED + "'")} AS key
        FROM documents
    )
    SELECT doc_id,
           CAST(key % {SHUFFLE_SHARDS} AS INT) AS shard,
           CAST(row_number() OVER (
               PARTITION BY key % {SHUFFLE_SHARDS}
               ORDER BY key, doc_id
           ) AS BIGINT) AS shuffle_rank
    FROM k
    """,
    doc="Seeded deterministic corpus shuffle (training-order "
    "randomization): md5(doc_id || seed) both assigns a shard and "
    "orders documents within it — the per-shard shuffle real data "
    "loaders use (a GLOBAL rank window would serialize on one "
    "reducer). Per-shard windows run partition-parallel; changing the "
    "seed string reshuffles every epoch reproducibly.",
)
def shuffle_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    key = H.md5_long(F.concat(F.col("doc_id").cast("string"), F.lit(SHUFFLE_SEED)))
    t = docs.select(
        "doc_id",
        key.alias("key"),
        (key % SHUFFLE_SHARDS).cast("int").alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("key", "doc_id")
    return t.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("bigint").alias("shuffle_rank"),
    )


PACK_TOKEN_BUDGET = 512  # tokens per packed training sequence
PACK_SHARDS = 8  # packing parallelism (one packer per shard)


@register(
    "pack_sequences",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               {H.sql_md5_long('doc_id::VARCHAR')} % {PACK_SHARDS} AS shard,
               len(string_split_regex(text, '\\s+')) AS n_tokens
        FROM documents
    )
    SELECT doc_id, CAST(shard AS INT) AS shard,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
                    PARTITION BY shard ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ), 0) / {PACK_TOKEN_BUDGET}) AS BIGINT) AS pack_id
    FROM t
    """,
    doc="Deterministic greedy sequence packing: hash-shard documents "
    "(md5 of doc_id — reproducible), then within each shard assign "
    "doc -> pack floor(preceding-token-cumsum / budget). Per-shard "
    "packing windows run partition-parallel (a global cumsum would "
    "serialize); one shuffle on the shard id.",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        (H.md5_long(F.col("doc_id").cast("string")) % PACK_SHARDS)
        .cast("int")
        .alias("shard"),
        F.size(H.words(F.col("text"))).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_cum = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return t.select(
        "doc_id",
        "shard",
        "n_tokens",
        F.floor(prev_cum / PACK_TOKEN_BUDGET).alias("pack_id"),
    )


# ------------------------------------- leakage-safe train/test split
from kinesis_analytics_demo_spark.operators.dedup import (
    JACCARD_THRESHOLD as _JT,
    _sql_minhash_cte as _mh_cte,
)
from kinesis_analytics_demo_spark.operators.pipeline import (
    SPLIT_SLOTS as _SLOTS,
    SPLIT_TEST_LO as _TEST_LO,
    SPLIT_VALID_LO as _VALID_LO,
)


@register(
    "corpus_split_leakage_safe",
    oracle=f"""
    WITH RECURSIVE {_mh_cte()},
    dup AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= {_JT}),
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
    clusters AS (SELECT doc_id, min(root) AS cluster_id FROM reach GROUP BY doc_id),
    slots AS (
        SELECT doc_id, cluster_id,
               (('0x' || substr(md5('split:' || cluster_id::VARCHAR), 1, 15))::BIGINT
                   % {_SLOTS}) AS slot
        FROM clusters
    )
    SELECT doc_id, cluster_id,
           CASE WHEN slot >= {_TEST_LO} THEN 'test'
                WHEN slot >= {_VALID_LO} THEN 'validation'
                ELSE 'train' END AS split
    FROM slots
    """,
    doc="LEAKAGE-SAFE train/validation/test split: the split hash is "
    "taken on the NEAR-DUP CLUSTER id, not the document id, so a "
    "document and its near-duplicates always land in the same split — "
    "the standard guard against train/test contamination that a "
    "per-doc split cannot give (a doc in train with its 0.9-Jaccard "
    "twin in test is leakage). Composition: MinHash-LSH clusters "
    "(connected components, lineage-checkpointed label propagation) "
    "+ the same salted md5 slot bands as corpus_train_split; adding "
    "documents never moves an existing cluster between splits.",
)
def corpus_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_analytics_demo_spark.operators.dedup import dedup_minhash_clusters
    from kinesis_analytics_demo_spark.operators.pipeline import (
        SPLIT_SLOTS,
        SPLIT_TEST_LO,
        SPLIT_VALID_LO,
    )

    clusters = dedup_minhash_clusters(spark, sf_dir)
    slot = (
        H.md5_long(F.concat(F.lit("split:"), F.col("cluster_id").cast("string")))
        % SPLIT_SLOTS
    )
    split = (
        F.when(slot >= SPLIT_TEST_LO, "test")
        .when(slot >= SPLIT_VALID_LO, "validation")
        .otherwise("train")
    )
    return clusters.select("doc_id", "cluster_id", split.alias("split"))


# ------------------------------------- fuzzy (minhash) decontamination
#: Contamination bar — deliberately below the dedup bar (0.8): a train
#: doc sharing half its 3-grams with a benchmark doc is contaminated
#: even though it is not a near-duplicate.
FUZZY_CONTAM_THRESHOLD = 0.5


@register(
    "decontamination_minhash",
    oracle=f"""
    WITH {_mh_cte()}
    SELECT doc_b AS doc_id,
           count(DISTINCT doc_a) AS n_contaminating_bench,
           max(jaccard) AS max_jaccard
    FROM jac
    WHERE doc_a < {BENCHMARK_MAX_DOC_ID}
      AND doc_b >= {BENCHMARK_MAX_DOC_ID}
      AND jaccard >= {FUZZY_CONTAM_THRESHOLD}
    GROUP BY doc_b
    """,
    doc="Fuzzy benchmark decontamination: training documents whose "
    "3-gram Jaccard similarity to any held-out benchmark document is "
    f">= {FUZZY_CONTAM_THRESHOLD}, found via the SAME banded-minhash "
    "LSH as the dedup family (16 perms / 4 bands) rather than a "
    "train-x-bench similarity scan. The benchmark band table is tiny "
    "by construction and broadcast, so the training corpus is touched "
    "exactly once (shingle scan -> band signatures, map-side "
    "combined); the exact Jaccard verify runs only on LSH candidate "
    "pairs, carrying 8-byte gram hashes. Complements "
    "decontamination_ngram_overlap (exact ANY-shared-gram, high "
    "recall / low precision) with a similarity-thresholded variant "
    "(the Llama/GPT-style fuzzy contamination rule). Note the "
    "LSH-candidate restriction is the same recall trade the dedup "
    "pipeline makes: pairs below ~0.5 Jaccard rarely share a band, "
    "which is exactly why the bar sits at 0.5.",
)
def decontamination_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_analytics_demo_spark.caching import tracked_persist
    from kinesis_analytics_demo_spark.operators.dedup import (
        _minhash_banded,
        jaccard_verify,
    )

    docs = _t(spark, sf_dir, "documents")
    dsh = tracked_persist(_distinct_shingles(docs))
    bands = _minhash_banded(dsh)
    bench_b = bands.filter(F.col("doc_id") < BENCHMARK_MAX_DOC_ID).select(
        "band", "sig", F.col("doc_id").alias("doc_a")
    )
    train_b = bands.filter(F.col("doc_id") >= BENCHMARK_MAX_DOC_ID)
    cand = (
        train_b.join(F.broadcast(bench_b), ["band", "sig"])
        .select("doc_a", F.col("doc_id").alias("doc_b"))
        .distinct()
    )
    jac = jaccard_verify(docs, cand, dsh=dsh)
    return (
        jac.filter(F.col("jaccard") >= FUZZY_CONTAM_THRESHOLD)
        .groupBy(F.col("doc_b").alias("doc_id"))
        .agg(
            F.count_distinct("doc_a").alias("n_contaminating_bench"),
            F.max("jaccard").alias("max_jaccard"),
        )
    )


# ------------------------------------------------- temporal split
EMBARGO_S = 86400  #: 1 day between train end and test start


@register(
    "temporal_split_embargo",
    oracle=f"""
    WITH c AS (SELECT quantile_cont(epoch(ts), 0.8) AS cut FROM events),
    a AS (
        SELECT CASE WHEN epoch(ts) <= c.cut THEN 'train'
                    WHEN epoch(ts) <= c.cut + {EMBARGO_S} THEN 'embargo'
                    ELSE 'test' END AS split,
               ts
        FROM events, c)
    SELECT split,
           CAST(count(*) AS BIGINT) AS n_events,
           min(ts) AS min_ts,
           max(ts) AS max_ts
    FROM a GROUP BY split
    """,
    doc="Time-based train/test split with an EMBARGO window: train = "
    "first 80% of event time (exact p80 cutoff), then one full day "
    "is DROPPED before test begins — the leakage guard for "
    "time-series features with lookback windows (a feature computed "
    "at test start must not see label-period rows; de Prado's "
    "purged/embargoed split). Contrast with corpus_train_split "
    "(hash-based, exchangeable rows). One tiny percentile aggregate "
    "broadcast into a single scan.",
)
def temporal_split_embargo(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    sec = F.col("ts").cast("timestamp").cast("double")
    cut = ev.agg(F.percentile(sec, 0.8).alias("cut"))
    split = (
        F.when(sec <= F.col("cut"), "train")
        .when(sec <= F.col("cut") + EMBARGO_S, "embargo")
        .otherwise("test")
    )
    return (
        ev.crossJoin(F.broadcast(cut))
        .select(split.alias("split"), "ts")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("min_ts"),
            F.max("ts").alias("max_ts"),
        )
    )


# ---------------------------- in-engine classifier training (full GD)
GD_ITERS = 5  #: fixed full-batch gradient-descent iterations
GD_LR = 0.1  #: learning rate
GD_SCALE = 12  #: decimal digits carried in gradient sums / weight state

#: shared feature construction: three bounded, libm-free quality
#: signals per document and the is-English label
_GD_FEAT_SQL = """
    feat AS (
        SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
               len(toks) / 100.0 AS x1,
               (CAST(list_sum([len(w) for w in toks]) AS DOUBLE)
                / len(toks)) / 10.0 AS x2,
               CAST(len(list_distinct(toks)) AS DOUBLE)
                   / len(toks) AS x3
        FROM (SELECT lang, text,
                     string_split_regex(text, '\\s+') AS toks
              FROM documents)
        WHERE len(toks) > 0 AND length(text) > 0),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM feat),
    w0 AS (SELECT 0.0 AS b, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3)"""


def _gd_z(w: str) -> str:
    """The fixed left-to-right logit chain."""
    return f"{w}.b + {w}.w1 * x1 + {w}.w2 * x2 + {w}.w3 * x3"


def _gd_oracle() -> str:
    """Unrolled GD iteration chain (the pagerank oracle discipline):
    per iteration one CTE of 12-digit-rounded DECIMAL gradient sums
    and one 1-row weight CTE; hard-sigmoid activation keeps the whole
    computation inside exact IEEE arithmetic — no exp/ln anywhere, so
    every per-row contribution is bit-identical across engines BEFORE
    the rounding, not merely close to it."""
    parts = [f"WITH {_GD_FEAT_SQL}"]
    for t in range(1, GD_ITERS + 1):
        p = t - 1
        sig = f"greatest(0.0, least(1.0, 0.25 * ({_gd_z('w')}) + 0.5))"
        parts.append(f"""
    s{t} AS (
        SELECT y, x1, x2, x3, {sig} AS p
        FROM feat, w{p} w),
    g{t} AS (
        SELECT SUM(CAST(ROUND(p - y, {GD_SCALE})
                        AS DECIMAL(28,{GD_SCALE}))) AS gb,
               SUM(CAST(ROUND((p - y) * x1, {GD_SCALE})
                        AS DECIMAL(28,{GD_SCALE}))) AS g1,
               SUM(CAST(ROUND((p - y) * x2, {GD_SCALE})
                        AS DECIMAL(28,{GD_SCALE}))) AS g2,
               SUM(CAST(ROUND((p - y) * x3, {GD_SCALE})
                        AS DECIMAL(28,{GD_SCALE}))) AS g3
        FROM s{t}),
    w{t} AS (
        SELECT ROUND(w.b - {GD_LR} * (CAST(g.gb AS DOUBLE) / nn.n),
                     {GD_SCALE}) AS b,
               ROUND(w.w1 - {GD_LR} * (CAST(g.g1 AS DOUBLE) / nn.n),
                     {GD_SCALE}) AS w1,
               ROUND(w.w2 - {GD_LR} * (CAST(g.g2 AS DOUBLE) / nn.n),
                     {GD_SCALE}) AS w2,
               ROUND(w.w3 - {GD_LR} * (CAST(g.g3 AS DOUBLE) / nn.n),
                     {GD_SCALE}) AS w3
        FROM w{p} w, g{t} g, nn)""")
    final = GD_ITERS
    parts.append(f"""
    scored AS (
        SELECT y, {_gd_z('w')} AS z,
               greatest(0.0, least(1.0, 0.25 * ({_gd_z('w')}) + 0.5)) AS p
        FROM feat, w{final} w),
    m AS (
        SELECT CAST(SUM(CASE WHEN (z > 0) = (y = 1.0) THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_correct,
               SUM(CAST(ROUND((p - y) * (p - y), {GD_SCALE})
                        AS DECIMAL(28,{GD_SCALE}))) AS sse
        FROM scored)
    SELECT nn.n AS n_docs,
           ROUND(w.b, 6) + 0.0 AS bias,
           ROUND(w.w1, 6) + 0.0 AS w_tokens,
           ROUND(w.w2, 6) + 0.0 AS w_wordlen,
           ROUND(w.w3, 6) + 0.0 AS w_ttr,
           ROUND(100.0 * m.n_correct / nn.n, 6) + 0.0 AS train_acc_pct,
           ROUND(CAST(m.sse AS DOUBLE) / nn.n, 6) + 0.0 AS train_mse
    FROM w{final} w, m, nn""")
    return ",".join(parts)


@register(
    "gd_quality_classifier_train",
    oracle=_gd_oracle(),
    doc=f"In-engine training of a linear quality/language classifier "
    f"by {GD_ITERS} full-batch gradient-descent iterations — the "
    "distributed-ML-training shape (one map-side-combinable gradient "
    "aggregate per iteration, broadcast weight state) expressed as "
    "pure DataFrame ops, the pagerank iteration discipline applied "
    "to model fitting. Features: token count/100, mean word "
    "length/10, type-token ratio; label: is-English. Activation is "
    "the HARD sigmoid clamp(0.25 z + 0.5, 0, 1) (the quantized-"
    "network surrogate, Courbariaux et al. 2016) with the logistic-"
    "form gradient (p - y) x, so the ENTIRE computation is exact "
    "IEEE arithmetic — no exp/ln anywhere; per-row contributions "
    "are bit-identical across engines before the 12-digit rounding "
    "into order-free DECIMAL sums (the pagerank state discipline). "
    "Reports final weights, training accuracy, and MSE. Scale: per "
    "iteration = one scan of the persisted feature table with a "
    "4-term combinable aggregate + a 1-row broadcast; iterations "
    "are a fixed constant; weight state localCheckpoints per round "
    "(lineage discipline).",
)
def gd_quality_classifier_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_analytics_demo_spark.caching import tracked_persist

    docs = _t(spark, sf_dir, "documents")
    toks = H.words(F.col("text"))
    sumlen = F.aggregate(
        F.transform(toks, F.length), F.lit(0), lambda a, x: a + x
    )
    feat = tracked_persist(
        docs.filter((F.size(toks) > 0) & (F.length("text") > 0)).select(
            F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
            (F.size(toks) / F.lit(100.0)).alias("x1"),
            (
                (sumlen.cast("double") / F.size(toks)) / F.lit(10.0)
            ).alias("x2"),
            (
                F.size(F.array_distinct(toks)).cast("double")
                / F.size(toks)
            ).alias("x3"),
        )
    )
    n_df = feat.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    w_df = spark.range(1).select(
        F.lit(0.0).alias("b"),
        F.lit(0.0).alias("w1"),
        F.lit(0.0).alias("w2"),
        F.lit(0.0).alias("w3"),
    )
    z = (
        F.col("b")
        + F.col("w1") * F.col("x1")
        + F.col("w2") * F.col("x2")
        + F.col("w3") * F.col("x3")
    )
    sig = F.greatest(
        F.lit(0.0), F.least(F.lit(1.0), F.lit(0.25) * z + F.lit(0.5))
    )
    dec = f"decimal(28,{GD_SCALE})"

    def gsum(expr):
        return F.sum(F.round(expr, GD_SCALE).cast(dec))

    for _ in range(GD_ITERS):
        s = feat.crossJoin(F.broadcast(w_df))
        g = (
            s.withColumn("p", sig)
            .agg(
                gsum(F.col("p") - F.col("y")).alias("gb"),
                gsum((F.col("p") - F.col("y")) * F.col("x1")).alias("g1"),
                gsum((F.col("p") - F.col("y")) * F.col("x2")).alias("g2"),
                gsum((F.col("p") - F.col("y")) * F.col("x3")).alias("g3"),
            )
        )
        w_df = (
            g.crossJoin(F.broadcast(w_df))
            .crossJoin(F.broadcast(n_df))
            .select(
                F.round(
                    F.col("b")
                    - F.lit(GD_LR) * (F.col("gb").cast("double") / F.col("n")),
                    GD_SCALE,
                ).alias("b"),
                F.round(
                    F.col("w1")
                    - F.lit(GD_LR) * (F.col("g1").cast("double") / F.col("n")),
                    GD_SCALE,
                ).alias("w1"),
                F.round(
                    F.col("w2")
                    - F.lit(GD_LR) * (F.col("g2").cast("double") / F.col("n")),
                    GD_SCALE,
                ).alias("w2"),
                F.round(
                    F.col("w3")
                    - F.lit(GD_LR) * (F.col("g3").cast("double") / F.col("n")),
                    GD_SCALE,
                ).alias("w3"),
            )
            .localCheckpoint()  # 1 row; resets the per-iteration lineage
        )
    scored = feat.crossJoin(F.broadcast(w_df)).select(
        "y", z.alias("z"), sig.alias("p")
    )
    m = scored.agg(
        F.sum(
            F.when((F.col("z") > 0) == (F.col("y") == 1.0), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_correct"),
        gsum((F.col("p") - F.col("y")) * (F.col("p") - F.col("y"))).alias(
            "sse"
        ),
    )
    return (
        w_df.crossJoin(m)
        .crossJoin(n_df)
        .select(
            F.col("n").alias("n_docs"),
            (F.round(F.col("b"), 6) + F.lit(0.0)).alias("bias"),
            (F.round(F.col("w1"), 6) + F.lit(0.0)).alias("w_tokens"),
            (F.round(F.col("w2"), 6) + F.lit(0.0)).alias("w_wordlen"),
            (F.round(F.col("w3"), 6) + F.lit(0.0)).alias("w_ttr"),
            (
                F.round(
                    F.lit(100.0) * F.col("n_correct") / F.col("n"), 6
                )
                + F.lit(0.0)
            ).alias("train_acc_pct"),
            (
                F.round(F.col("sse").cast("double") / F.col("n"), 6)
                + F.lit(0.0)
            ).alias("train_mse"),
        )
    )


# ----------------------------------- stratified k-fold assignment
KFOLD_K = 5  #: folds
KFOLD_SEED = "fold0"  #: change to re-deal reproducibly


@register(
    "stratified_kfold_assignment",
    oracle=f"""
    WITH cnts AS (
        SELECT user_id,
               COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS np
        FROM events GROUP BY user_id),
    med AS (SELECT median(np) AS m FROM cnts),
    lab AS (
        SELECT user_id, CASE WHEN np > m THEN 1 ELSE 0 END AS pos
        FROM cnts, med),
    dealt AS (
        SELECT user_id, pos,
               (row_number() OVER (
                    PARTITION BY pos
                    ORDER BY {H.sql_md5_long(
                        "user_id::VARCHAR || '" + KFOLD_SEED + "'")},
                             user_id) - 1) % {KFOLD_K} AS fold
        FROM lab)
    SELECT CAST(fold AS INT) AS fold,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(SUM(pos) AS BIGINT) AS n_pos,
           CAST(SUM(1 - pos) AS BIGINT) AS n_neg,
           ROUND(CAST(SUM(pos) AS DOUBLE) / count(*), 6) + 0.0
               AS pos_rate
    FROM dealt GROUP BY fold
    """,
    doc=f"Stratified {KFOLD_K}-fold cross-validation assignment on "
    "the heavy-buyer label (shared definition with the evaluation "
    "battery): within each label stratum, users are dealt to folds "
    "round-robin in seeded-md5-hash order, so every fold's positive "
    "rate matches the population to within one user per stratum — "
    "the variance-reducing split sklearn's StratifiedKFold provides, "
    "expressed as one window over users. Deterministic and "
    "re-dealable by seed (the Poisson-bootstrap discipline: swap "
    "the seed, never the engine's RNG). Scale: one map-side "
    "rollup to user grain; the per-stratum rank is a window over "
    "users — beyond ~10^9 users per stratum, deal by hash RANGE "
    "buckets instead of a global rank (same guarantee, no global "
    "window); emitted here as the audit rollup (fold x counts), "
    "the assignment itself being the `dealt` intermediate.",
)
def stratified_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    cnts = ev.groupBy("user_id").agg(
        F.count(F.when(F.col("event_type") == "purchase", 1)).alias("np")
    )
    med = cnts.agg(F.percentile("np", 0.5).alias("m"))
    lab = cnts.crossJoin(F.broadcast(med)).select(
        "user_id",
        F.when(F.col("np") > F.col("m"), 1).otherwise(0).alias("pos"),
    )
    key = H.md5_long(
        F.concat(F.col("user_id").cast("string"), F.lit(KFOLD_SEED))
    )
    dealt = lab.select(
        "pos",
        (
            (
                F.row_number().over(
                    Window.partitionBy("pos").orderBy(key, F.col("user_id"))
                )
                - 1
            )
            % KFOLD_K
        ).alias("fold"),
    )
    return dealt.groupBy("fold").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("pos").cast("bigint").alias("n_pos"),
        F.sum(F.lit(1) - F.col("pos")).cast("bigint").alias("n_neg"),
        (
            F.round(
                F.sum("pos").cast("double") / F.count(F.lit(1)), 6
            )
            + F.lit(0.0)
        ).alias("pos_rate"),
    ).select(
        F.col("fold").cast("int").alias("fold"),
        "n_users",
        "n_pos",
        "n_neg",
        "pos_rate",
    )


# -------------------------- largest-remainder sampling quotas
LR_SLOTS = 1000  #: total sample slots to apportion across sources


@register(
    "largest_remainder_quota",
    oracle=f"""
    WITH st AS (
        SELECT source,
               SUM(len(string_split_regex(text, '\\s+'))) AS tokens
        FROM documents GROUP BY source),
    tot AS (SELECT SUM(tokens) AS t FROM st),
    q AS (
        SELECT source, tokens,
               ({LR_SLOTS} * tokens) // (SELECT t FROM tot) AS base_slots,
               ({LR_SLOTS} * tokens) % (SELECT t FROM tot) AS rem
        FROM st),
    k AS (SELECT {LR_SLOTS} - SUM(base_slots) AS extras FROM q),
    r AS (
        SELECT source, tokens, base_slots,
               CASE WHEN row_number() OVER (ORDER BY rem DESC, source)
                         <= (SELECT extras FROM k)
                    THEN 1 ELSE 0 END AS extra
        FROM q)
    SELECT source,
           CAST(tokens AS BIGINT) AS tokens,
           CAST(ROUND({LR_SLOTS} * CAST(tokens AS DOUBLE)
                      / (SELECT CAST(t AS DOUBLE) FROM tot), 6)
                AS DOUBLE) AS exact_quota,
           CAST(base_slots AS BIGINT) AS base_slots,
           CAST(extra AS INT) AS extra,
           CAST(base_slots + extra AS BIGINT) AS slots
    FROM r
    """,
    doc=f"Largest-remainder (Hamilton) apportionment of a fixed "
    f"budget of {LR_SLOTS} sample slots across document sources, "
    "proportional to token counts — the exact integer quota a "
    "corpus-mixing pass needs (corpus_sample_weighted draws the "
    "rows; this fixes the PER-SOURCE counts so they sum EXACTLY to "
    "the budget). Pure integer arithmetic: floor quotas by integer "
    "division, remainders ranked as exact integer modulos (never a "
    "float fraction), ties broken by source — sum(slots) == budget "
    "by construction. Scale: one hash aggregate to source grain; "
    "the apportionment itself touches O(sources) rows.",
)
def largest_remainder_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    st = docs.groupBy("source").agg(
        F.sum(F.size(H.words(F.col("text")))).alias("tokens")
    )
    tot = st.agg(F.sum("tokens").alias("t"))
    q = st.crossJoin(F.broadcast(tot)).select(
        "source",
        "tokens",
        "t",
        F.expr(f"({LR_SLOTS} * tokens) div t").alias("base_slots"),
        ((F.lit(LR_SLOTS) * F.col("tokens")) % F.col("t")).alias("rem"),
    )
    k = q.agg((F.lit(LR_SLOTS) - F.sum("base_slots")).alias("extras"))
    r = q.crossJoin(F.broadcast(k)).select(
        "source",
        "tokens",
        "t",
        "base_slots",
        F.when(
            F.row_number().over(Window.orderBy(F.desc("rem"), "source"))
            <= F.col("extras"),
            1,
        )
        .otherwise(0)
        .alias("extra"),
    )
    return r.select(
        "source",
        F.col("tokens").cast("bigint").alias("tokens"),
        F.round(
            F.lit(LR_SLOTS) * F.col("tokens").cast("double")
            / F.col("t").cast("double"),
            6,
        )
        .cast("double")
        .alias("exact_quota"),
        F.col("base_slots").cast("bigint").alias("base_slots"),
        F.col("extra").cast("int").alias("extra"),
        (F.col("base_slots") + F.col("extra")).cast("bigint").alias("slots"),
    )


# ----------------------- leave-one-source-out data valuation
@register(
    "source_loo_influence",
    oracle="""
    WITH d AS (
        SELECT source,
               len(string_split_regex(text, '\\s+')) AS n_tok
        FROM documents),
    g AS (
        SELECT source, COUNT(*) AS n_docs,
               SUM(n_tok) AS toks
        FROM d GROUP BY source),
    tot AS (SELECT SUM(n_docs) AS nd, SUM(toks) AS nt FROM g),
    tv AS (
        SELECT w, COUNT(DISTINCT source) AS ns
        FROM (SELECT source, unnest(string_split_regex(text, '\\s+')) AS w
              FROM documents)
        GROUP BY w),
    vtot AS (SELECT COUNT(*) AS v FROM tv),
    uniq AS (
        SELECT t.source, COUNT(*) AS vocab_unique
        FROM (SELECT DISTINCT source, unnest(
                  string_split_regex(text, '\\s+')) AS w
              FROM documents) t
        JOIN tv ON tv.w = t.w
        WHERE tv.ns = 1
        GROUP BY t.source)
    SELECT g.source,
           CAST(g.n_docs AS BIGINT) AS n_docs,
           CAST(g.toks AS BIGINT) AS tokens,
           CAST(ROUND(CAST(tot.nt AS DOUBLE) / tot.nd
                      - CAST(tot.nt - g.toks AS DOUBLE)
                        / (tot.nd - g.n_docs), 6) AS DOUBLE) + 0.0
               AS mean_len_delta,
           CAST(COALESCE(uniq.vocab_unique, 0) AS BIGINT)
               AS vocab_unique,
           CAST(ROUND(CAST(COALESCE(uniq.vocab_unique, 0) AS DOUBLE)
                      / (SELECT v FROM vtot), 6) AS DOUBLE)
               AS vocab_unique_share
    FROM g LEFT JOIN uniq ON uniq.source = g.source, tot
    """,
    doc="Leave-one-source-out data valuation: for each document "
    "source, what the corpus LOSES if the source is dropped — the "
    "shift in mean document length (computed exactly from global "
    "sufficient statistics minus the group's, never by rescanning "
    "N-1 corpora: the O(sources) trick that makes LOO viable at "
    "scale) and the vocabulary exclusive to the source (tokens whose "
    "distinct-source count is 1). The cheap first pass of "
    "Shapley-style data valuation (Ghorbani & Zou 2019) a mixing "
    "pipeline runs before corpus_mixing/largest_remainder_quota "
    "decisions. Exact integer counts end to end; one final double "
    "expression per row. Scale: one token scan feeding two hash "
    "rollups (token x source is the dedup shuffle-width caveat — "
    "hash the tokens at 100 TB); the influence arithmetic is "
    "O(sources).",
)
def source_loo_influence(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    d = docs.select(
        "source", F.size(H.words(F.col("text"))).alias("n_tok")
    )
    g = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("toks")
    )
    tot = g.agg(F.sum("n_docs").alias("nd"), F.sum("toks").alias("nt"))
    sw = docs.select(
        "source", F.explode(H.words(F.col("text"))).alias("w")
    ).distinct()
    tv = sw.groupBy("w").agg(F.count_distinct("source").alias("ns"))
    vtot = tv.agg(F.count(F.lit(1)).alias("v"))
    uniq = (
        sw.join(tv.where(F.col("ns") == 1), "w")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("vocab_unique"))
    )
    return (
        g.join(uniq, "source", "left")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(vtot))
        .select(
            "source",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("toks").cast("bigint").alias("tokens"),
            (
                F.round(
                    F.col("nt").cast("double") / F.col("nd")
                    - (F.col("nt") - F.col("toks")).cast("double")
                    / (F.col("nd") - F.col("n_docs")),
                    6,
                ).cast("double")
                + F.lit(0.0)
            ).alias("mean_len_delta"),
            F.coalesce(F.col("vocab_unique"), F.lit(0))
            .cast("bigint")
            .alias("vocab_unique"),
            F.round(
                F.coalesce(F.col("vocab_unique"), F.lit(0)).cast("double")
                / F.col("v"),
                6,
            )
            .cast("double")
            .alias("vocab_unique_share"),
        )
    )
