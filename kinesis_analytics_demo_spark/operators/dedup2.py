"""Dedup, part 2 — asymmetric containment detection and the
cross-source duplication matrix.

``dedup_containment_pairs`` finds ordered pairs (src, dst) where dst
CONTAINS src: |S_src ∩ S_dst| / |S_src| >= 0.8 over word-3-gram
shingle hashes. Symmetric Jaccard misses exactly this case — a long
document that swallowed a short one whole scores low Jaccard but
containment ~1.0, the truncation/excerpt/quote duplication mode a
curation pipeline must catch (Broder's containment measure,
SEQUENCES 1997). The distributed algorithm is the set-similarity-join
recipe (PPJoin family, Xiao et al., WWW 2008), adapted to the
one-sided threshold:

  1. the shingle universe is df-capped (50*df <= n_docs): a gram in
     >2% of documents is boilerplate, not content — the same veto as
     text_boilerplate_ngrams, and the bound that keeps any single
     shingle's join fan-out finite at 100 TB;
  2. candidate generation uses the RAREST-PREFIX pigeonhole: if
     |A∩B| >= 0.8|A| then fewer than 0.2|A|+1 of A's shingles lie
     outside B, so A's floor(|A|/5)+1 rarest shingles (global-df
     order) must intersect B. Only that prefix enters the candidate
     join — the Spark-only optimization whose completeness the
     quadratic oracle PROVES every round (a lost pair would be a
     driver-row mismatch);
  3. exact verify dedupes the candidate pairs and joins each against
     the per-doc SORTED shingle-hash arrays (one collect_set per doc,
     size bounded by document length); ``size(array_intersect(...))``
     counts shared hashes entirely inside whole-stage codegen — no
     per-shingle explode, no countDistinct aggregate — and the
     threshold is the integer cross-multiplication 10*shared >=
     8*n_src, no float boundary to disagree on. (Round-5 A/B at
     sf0.1: 2.88s vs 3.86s for the exploded-verify formulation,
     identical 512-pair output.)

``dedup_cross_source_matrix`` aggregates the MinHash near-duplicate
pairs (shared machinery with dedup_minhash_pairs: 16 perms/4 bands,
exact Jaccard >= 0.8 verify) by the owning sources of both endpoints
— the provenance-leakage report ("which sources copy from whom")
that steers source-level mixing weights. One extra broadcast-sized
join and a tiny aggregate on top of the already-verified pair table.

Reference anchor: the reference engine (flink/tumbling_window.py,
sliding_window.py) has no dedup surface; this extends the
LLM-curation mandate alongside operators/dedup.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.caching import tracked_persist
from kinesis_analytics_demo_spark.functions import hashing as H
from kinesis_analytics_demo_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    _distinct_shingles,
    _sql_minhash_cte,
    minhash_dup_pairs,
)
from kinesis_analytics_demo_spark.plans.registry import register
from kinesis_analytics_demo_spark.session import read_table as _t

#: containment threshold 0.8 as an integer cross-multiplication
CONTAIN_NUM = 8
CONTAIN_DEN = 10
#: boilerplate veto: keep shingles present in <= 1/DF_CAP_INV of docs
DF_CAP_INV = 50

#: partition count for the persisted per-doc shingle-array table (see
#: the persist site in dedup_containment_pairs). Values >= 1 are all
#: result-identical — the repartition feeds two doc_id equi-joins. At
#: production scale size this by corpus bytes / target partition size
#: (the table is one row per doc); the default right-sizes the test
#: SFs, where a cached plan would otherwise keep ~200 near-empty
#: static shuffle partitions through both verify joins.
try:
    _SETS_PARTS = max(
        1, int(os.environ.get("SPARK_GRAFT_CONTAIN_SETS_PARTS", "8"))
    )
except ValueError:
    _SETS_PARTS = 8

_SQL_CONTAIN_SH = f"""
    w AS (SELECT doc_id, {H.sql_word_shingles('text')} AS sh_list
          FROM documents),
    sh AS (SELECT DISTINCT doc_id, {H.sql_shingle_hash('s')} AS h
           FROM (SELECT doc_id, unnest(sh_list) AS s FROM w)),
    df AS (SELECT h, count(*) AS df FROM sh GROUP BY h),
    nd AS (SELECT count(*) AS n_docs FROM documents),
    cap AS (SELECT s.doc_id, s.h
            FROM sh s JOIN df USING (h), nd
            WHERE {DF_CAP_INV} * df.df <= nd.n_docs),
    sz AS (SELECT doc_id, count(*) AS n FROM cap GROUP BY doc_id)
"""


@register(
    "dedup_containment_pairs",
    oracle=f"""
    WITH {_SQL_CONTAIN_SH},
    inter AS (
        SELECT a.doc_id AS src_doc, b.doc_id AS dst_doc, count(*) AS shared
        FROM cap a JOIN cap b ON a.h = b.h AND a.doc_id != b.doc_id
        GROUP BY 1, 2
    )
    SELECT i.src_doc, i.dst_doc, i.shared, s.n AS n_src,
           CAST(i.shared AS DOUBLE) / s.n AS containment
    FROM inter i JOIN sz s ON s.doc_id = i.src_doc
    WHERE {CONTAIN_DEN} * i.shared >= {CONTAIN_NUM} * s.n
    """,
    doc="Asymmetric containment dedup: ordered (src, dst) pairs where "
    "dst holds >= 80% of src's df-capped 3-gram shingles — catches "
    "truncations/excerpts that symmetric Jaccard misses. Candidates "
    "come from the rarest-prefix pigeonhole (only floor(n/5)+1 "
    "shingles per source doc enter the join); the quadratic oracle "
    "proves the prefix loses nothing. Verify is codegen-side "
    "size(array_intersect) over per-doc sorted hash arrays; "
    "threshold applied as integer cross-multiplication.",
)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    dsh = tracked_persist(_distinct_shingles(docs))
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    # Document frequency as a window count over the SAME h-shuffle the
    # join would have needed: the earlier groupBy(h)+join formulation
    # shuffled dsh by h twice (partial-agg df, then the equi-join) and
    # paid a join build; count() over partitionBy(h) computes the
    # identical df with one exchange and no join (r11 optimization
    # round: 48 -> 35 plan exchanges with the sizes change below).
    cap = tracked_persist(
        dsh.withColumn(
            "df", F.count(F.lit(1)).over(Window.partitionBy("h"))
        )
        .crossJoin(F.broadcast(n_docs))
        .filter(F.lit(DF_CAP_INV) * F.col("df") <= F.col("n_docs"))
        .select("doc_id", "h", "df")
    )

    # Rarest-prefix candidate generation (Spark-side only — the oracle
    # is exhaustive): rank each doc's shingles by global rarity and
    # keep floor(n/5)+1; any containing pair must share one of these.
    # The per-doc capped size n rides the same doc_id window partition
    # as the rank (unordered count over the whole partition) instead
    # of a separate groupBy+join — one fewer shuffle and join.
    w = Window.partitionBy("doc_id").orderBy("df", "h")
    prefix = (
        cap.withColumn("rk", F.row_number().over(w))
        .withColumn(
            "n", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
        )
        .filter(F.col("rk") <= F.floor(F.col("n") / CONTAIN_DEN * 2) + 1)
        .select(F.col("doc_id").alias("src_doc"), "h")
    )
    cand = (
        prefix.join(
            cap.select(F.col("doc_id").alias("dst_doc"), "h"), "h"
        )
        .filter(F.col("src_doc") != F.col("dst_doc"))
        .select("src_doc", "dst_doc")
    )
    # Verify via per-doc sorted hash arrays: the candidate stream is
    # deduped (measured dup factor only 1.03 — the rarest prefix
    # rarely double-hits), then each (src, dst) pair picks up both
    # docs' arrays through two hash joins and the shared count is
    # size(array_intersect(...)) — all codegen, no explode back to
    # per-shingle rows, no countDistinct shuffle. Array size is
    # bounded by document length, so a candidate row stays O(doc)
    # bytes at any corpus scale; skewed dst fan-out splits under AQE.
    # Persist the per-doc array table: both verify joins re-ran the
    # full collect_set lineage before (r11 A/B: 3.3s vs 3.7-4.4s
    # min-of-5 alternating). The repartition right-sizes the cached
    # static partitioning (AQE cannot re-coalesce a cache read);
    # dial SPARK_GRAFT_CONTAIN_SETS_PARTS, see comment at definition.
    sets_ = tracked_persist(
        cap.groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("h")).alias("hs"))
        .repartition(_SETS_PARTS)
    )
    return (
        cand.distinct()
        .join(
            sets_.select(
                F.col("doc_id").alias("src_doc"), F.col("hs").alias("src_hs")
            ),
            "src_doc",
        )
        .join(
            sets_.select(
                F.col("doc_id").alias("dst_doc"), F.col("hs").alias("dst_hs")
            ),
            "dst_doc",
        )
        .select(
            "src_doc",
            "dst_doc",
            F.size(F.array_intersect("src_hs", "dst_hs")).alias("shared"),
            F.size("src_hs").alias("n_src"),
        )
        .filter(
            F.lit(CONTAIN_DEN) * F.col("shared")
            >= F.lit(CONTAIN_NUM) * F.col("n_src")
        )
        .select(
            "src_doc",
            "dst_doc",
            "shared",
            "n_src",
            (F.col("shared").cast("double") / F.col("n_src")).alias(
                "containment"
            ),
        )
    )


@register(
    "dedup_cross_source_matrix",
    oracle=f"""
    WITH {_sql_minhash_cte()}
    SELECT least(da.source, db.source) AS src_a,
           greatest(da.source, db.source) AS src_b,
           count(*) AS dup_pairs
    FROM jac
    JOIN documents da ON jac.doc_a = da.doc_id
    JOIN documents db ON jac.doc_b = db.doc_id
    WHERE jac.jaccard >= {JACCARD_THRESHOLD}
    GROUP BY 1, 2
    """,
    doc="Cross-source duplication matrix: MinHash near-dup pairs "
    "(Jaccard >= 0.8, shared verified machinery) aggregated by the "
    "unordered source pair of their endpoints — the provenance-"
    "leakage report that tells a mixing pipeline which sources "
    "duplicate each other. Two hash joins against the slim "
    "(doc_id, source) projection, then a tiny aggregate.",
)
def dedup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    src = docs.select("doc_id", "source")
    pairs = minhash_dup_pairs(docs, JACCARD_THRESHOLD)
    return (
        pairs.join(
            src.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa")),
            "doc_a",
        )
        .join(
            src.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb")),
            "doc_b",
        )
        .select(
            F.least("sa", "sb").alias("src_a"),
            F.greatest("sa", "sb").alias("src_b"),
        )
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("dup_pairs"))
    )
