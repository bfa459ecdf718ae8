"""Deduplication operators over the ``documents`` corpus — the
LLM-data-pipeline surface mandated by BASELINE.json (north star:
"dedup ... at 100 TB scale").

Five dedup families, all pure DataFrame expressions (no Python UDFs):

- exact          — md5-hash groupBy (one shuffle on the hash).
- MinHash + LSH  — shingle -> 16 minhashes (array ops, zero shuffle)
                   -> 4 band signatures -> candidate pairs via a
                   band-signature equi-join -> exact-Jaccard verify
                   restricted to candidates. The classic scale
                   pattern: the only O(corpus) shuffle is on band
                   signatures; the quadratic verify join only touches
                   LSH candidates.
- SimHash        — 60-bit fingerprints via array aggregation; near-dup
                   pairs via 15-bit-chunk banding (pigeonhole: hamming
                   <= 3 over 4 chunks guarantees one identical chunk)
                   + bit_count(xor) verify.
- n-gram Jaccard — the exact verify stage exposed as its own operator.
- embedding      — cosine near-dup pairs: exact blocked baseline, the
                   IVF-bucketed sub-quadratic twin, and SemDeDup-style
                   clusters — split into dedup_embedding.py in round
                   11 (imported mid-module below, preserving
                   registration order).

Cross-engine determinism: every hash/arithmetic step has a DuckDB
twin in functions/hashing.py; jaccard/cosine are single f64 divisions
of exactly-computed operands — bit-identical on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.caching import tracked_persist
from kinesis_analytics_demo_spark.functions import hashing as H
from kinesis_analytics_demo_spark.operators.text import (
    _SQL_TOKENS,
    sql_quality_score,
)
from kinesis_analytics_demo_spark.functions import vectors as V
from kinesis_analytics_demo_spark.plans.registry import register
from kinesis_analytics_demo_spark.session import read_table as _t

JACCARD_THRESHOLD = 0.8
SIMHASH_MAX_HAMMING = 3
EMBEDDING_NEAR_DUP_COSINE = 0.45  # corpus max pairwise is ~0.51


# --------------------------------------------------------------- exact dedup
@register(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS text_hash,
           min(doc_id) AS keep_doc_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
    doc="Exact dedup: hash-groupBy on document text, keep the lowest "
    "doc_id per identical text. One shuffle on the 128-bit hash "
    "(never on the raw text: at 100 TB the shuffle carries 32-byte "
    "keys, not documents).",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.groupBy(F.md5("text").alias("text_hash")).agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


# ----------------------------------------------------------- minhash helpers
def _minhash_banded(sh_rows: DataFrame) -> DataFrame:
    """(doc_id, band, sig): 4 LSH band signatures per document, from
    (doc_id, h) shingle-hash rows.

    Shape chosen for scale AND speed: shingle hashes are EXPLODED to
    rows and the 16 permutation minima run as codegen'd aggregate
    expressions (higher-order array functions are interpreted per
    element — 10x slower on wide arrays). Partial aggregation
    collapses map-side, so the shuffle carries only docs x 16 longs,
    never the shingle stream. min() is duplicate-insensitive, so the
    DISTINCT shingle rows work here too — letting one persisted
    intermediate feed both the LSH and the verify stage (one corpus
    scan total)."""
    mins = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % H.MERSENNE_P).alias(f"mh{i}")
        for i, (a, b) in enumerate(H.MINHASH_PERMS)
    ]
    sigs = sh_rows.groupBy("doc_id").agg(*mins)
    mh_cols = [F.col(f"mh{i}") for i in range(len(H.MINHASH_PERMS))]
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"), H.band_signature(mh_cols, b).alias("sig")
            )
            for b in range(H.MINHASH_BANDS)
        ]
    )
    return sigs.select("doc_id", F.explode(bands).alias("bs")).select(
        "doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig")
    )


def _shingle_hash_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, h): one row per word 3-gram. Shape: posexplode the
    token array, then build each shingle with lead() windows over
    (doc_id, pos) — every step (Generate, Window, concat, md5) is
    codegen'd JVM work, vs the interpreted per-shingle slice+concat of
    an array transform (measured 1.5x faster at sf0.1, identical
    hashes). Bonus: rows leave the window hash-partitioned by doc_id,
    so the downstream minhash groupBy(doc_id) reuses the partitioning
    instead of shuffling again."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    toks = docs.select(
        "doc_id", F.posexplode(H.words(F.col("text"))).alias("pos", "w")
    )
    sh = toks.select(
        "doc_id",
        F.concat_ws(
            " ", "w", F.lead("w", 1).over(w), F.lead("w", 2).over(w)
        ).alias("s"),
        F.lead("w", 2).over(w).alias("__full"),
    ).filter(F.col("__full").isNotNull())
    return sh.select("doc_id", (H.md5_long(F.col("s")) % H.MERSENNE_P).alias("h"))


def _distinct_shingles(docs: DataFrame) -> DataFrame:
    """Distinct (doc_id, shingle-hash) rows. Jaccard is computed over
    HASHES, not strings: md5 is identical on both engines, so any
    (negligible) collision affects both sides equally — results stay
    bit-identical while the verify join carries 8-byte keys instead of
    shingle strings (the 100 TB shuffle-width win).

    Dedup shape: collect_set per doc + explode instead of
    ``.distinct()`` — the shingle window already leaves rows
    hash-partitioned by doc_id, so the groupBy plans with NO new
    exchange (distinct() re-shuffled the full shingle stream on
    (doc_id, h)), and the exploded output keeps the doc_id
    partitioning that the banding/size groupBys downstream reuse.
    Per-doc set size is bounded by document length — safe at any
    corpus scale. Measured 2x faster cold at sf0.1."""
    return (
        _shingle_hash_rows(docs)
        .groupBy("doc_id")
        .agg(F.collect_set("h").alias("hs"))
        .select("doc_id", F.explode("hs").alias("h"))
    )


def minhash_candidate_pairs(docs: DataFrame, dsh: DataFrame | None = None) -> DataFrame:
    """LSH candidate pairs: documents sharing any band signature."""
    # Persist the band table before the self-join: Spark computes each
    # join side independently, so an unpersisted `bands` would run the
    # full shingle-stream aggregation twice. The table is tiny
    # (docs x MINHASH_BANDS rows), the aggregation it guards is the
    # heaviest stage of the pipeline.
    bands = tracked_persist(
        _minhash_banded(dsh if dsh is not None else _shingle_hash_rows(docs))
    )
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def minhash_dup_pairs(docs: DataFrame, threshold: float) -> DataFrame:
    """Full MinHash-LSH pipeline with ONE corpus scan: the persisted
    distinct-shingle rows feed banding, both verify sides, and the
    per-doc sizes (Spark doesn't share common subplans across joins;
    at 100 TB this persisted intermediate is what you'd checkpoint to
    cluster storage)."""
    dsh = tracked_persist(_distinct_shingles(docs))
    pairs = minhash_candidate_pairs(docs, dsh=dsh)
    return jaccard_verify(docs, pairs, dsh=dsh).filter(
        F.col("jaccard") >= threshold
    )


def jaccard_verify(
    docs: DataFrame, pairs: DataFrame, dsh: DataFrame | None = None
) -> DataFrame:
    """Exact n-gram Jaccard for the given candidate pairs."""
    if dsh is None:
        dsh = tracked_persist(_distinct_shingles(docs))
    sizes = dsh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = dsh.alias("sa")
    b = dsh.alias("sb")
    inter = (
        pairs.join(a, pairs.doc_a == F.col("sa.doc_id"))
        .join(b, (pairs.doc_b == F.col("sb.doc_id")) & (F.col("sa.h") == F.col("sb.h")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))).alias("jaccard"),
        )
    )


def _sql_minhash_cte() -> str:
    """Shared oracle CTEs: shingle hashes, minhashes, band signatures,
    candidate pairs, distinct shingles — mirrors the Spark pipeline
    value-for-value."""
    shingles = H.sql_word_shingles("text")
    mh_exprs = H.sql_minhash_select("hashes")
    mh_sel = ",\n           ".join(f"{e} AS mh{i}" for i, e in enumerate(mh_exprs))
    r = len(H.MINHASH_PERMS) // H.MINHASH_BANDS
    band_rows = "\n    UNION ALL\n".join(
        "    SELECT doc_id, {b} AS band, md5({concat}) AS sig FROM mh".format(
            b=b,
            concat=" || ',' || ".join(
                f"mh{b * r + j}::VARCHAR" for j in range(r)
            ),
        )
        for b in range(H.MINHASH_BANDS)
    )
    return f"""
    w AS (SELECT doc_id, {shingles} AS sh_list FROM documents),
    h AS (SELECT doc_id, sh_list,
                 [{H.sql_shingle_hash('s')} for s in sh_list] AS hashes
          FROM w WHERE len(sh_list) > 0),
    mh AS (SELECT doc_id,
           {mh_sel}
           FROM h),
    bands AS (
{band_rows}
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    ),
    dsh AS (SELECT DISTINCT doc_id, unnest(hashes) AS hv FROM h),
    sizes AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id),
    inter AS (
        SELECT c.doc_a, c.doc_b, count(*) AS c
        FROM cand c
        JOIN dsh a ON c.doc_a = a.doc_id
        JOIN dsh b ON c.doc_b = b.doc_id AND a.hv = b.hv
        GROUP BY c.doc_a, c.doc_b
    ),
    jac AS (
        SELECT i.doc_a, i.doc_b, i.c / (sa.n + sb.n - i.c) AS jaccard
        FROM inter i
        JOIN sizes sa ON i.doc_a = sa.doc_id
        JOIN sizes sb ON i.doc_b = sb.doc_id
    )"""


@register(
    "dedup_minhash_pairs",
    oracle=f"""
    WITH {_sql_minhash_cte()}
    SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= {JACCARD_THRESHOLD}
    """,
    doc="MinHash-LSH near-duplicate pairs: 16 perms / 4 bands, exact "
    "3-gram Jaccard verify on LSH candidates, threshold 0.8.",
)
def dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return minhash_dup_pairs(docs, JACCARD_THRESHOLD)


@register(
    "dedup_minhash_keep",
    oracle=f"""
    WITH {_sql_minhash_cte()}
    SELECT doc_id FROM documents
    WHERE doc_id NOT IN (
        SELECT doc_b FROM jac WHERE jaccard >= {JACCARD_THRESHOLD}
    )
    """,
    doc="MinHash-LSH dedup keep-list: drop any document near-duplicate "
    "of a lower doc_id (greedy min-id retention).",
)
def dedup_minhash_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    dups = minhash_dup_pairs(docs, JACCARD_THRESHOLD).select(
        F.col("doc_b").alias("doc_id")
    )
    return docs.join(dups, "doc_id", "left_anti").select("doc_id")


def label_propagation(
    labels: DataFrame, edges: DataFrame, max_rounds: int = 20
) -> DataFrame:
    """Min-label propagation to convergence: each round every node
    takes the min of its label and its neighbors' labels — connected
    components in O(diameter) distributed join rounds. ``labels`` is
    (doc_id, cluster_id) seeded with cluster_id = doc_id; ``edges`` is
    (src, dst) and must contain BOTH directions of every edge.

    Raises RuntimeError instead of returning silently-unconverged
    labels when the graph diameter exceeds ``max_rounds`` (a
    chain-shaped duplicate cluster would otherwise diverge from the
    recursive-CTE oracle). The raise and the diameter-at-the-cap
    convergence are both exercised by synthetic chain graphs in
    tests/test_bucketed_dedup.py (VERDICT r2 item 6)."""
    edges = edges.persist()

    # Iterative plans grow exponentially if each round's DataFrame
    # keeps full lineage (round N references round N-1 twice: in the
    # join and in the changed-count) — by round ~15 the driver OOMs
    # just BUILDING the plan, regardless of data size. Checkpointing
    # truncates lineage every round: reliable checkpoint (cluster
    # storage) when a checkpoint dir is configured — what you'd do at
    # 100 TB — else an executor-local checkpoint.
    def _materialize(df: DataFrame) -> DataFrame:
        sc = df.sparkSession.sparkContext
        if sc._jsc.sc().getCheckpointDir().isDefined():
            return df.checkpoint(eager=True)
        return df.localCheckpoint(eager=True)

    labels = _materialize(labels)
    changed = -1
    for _ in range(max_rounds):
        neighbor_min = (
            edges.join(labels, edges.src == labels.doc_id)
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("cluster_id").alias("nmin"))
        )
        new_labels = _materialize(
            labels.join(neighbor_min, "doc_id", "left").select(
                "doc_id",
                F.least(
                    F.col("cluster_id"), F.coalesce("nmin", F.col("cluster_id"))
                ).alias("cluster_id"),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    if changed != 0:
        raise RuntimeError(
            f"label propagation did not converge within {max_rounds} "
            f"rounds ({changed} labels still changing) — duplicate "
            "graph diameter exceeds the cap; raise max_rounds"
        )
    return labels.select("doc_id", "cluster_id")


@register(
    "dedup_minhash_clusters",
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
    )
    SELECT doc_id, min(root) AS cluster_id FROM reach GROUP BY doc_id
    """,
    doc="Near-duplicate CLUSTERS: connected components over the "
    "MinHash-LSH duplicate graph via iterative min-label propagation "
    "(each round: label = min(label, neighbors' labels); converges in "
    "O(diameter) distributed join rounds). The driver loop only "
    "checks a converged flag — all data work is distributed. Oracle: "
    "recursive-CTE reachability in DuckDB.",
)
def dedup_minhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    dup = minhash_dup_pairs(docs, JACCARD_THRESHOLD)
    edges = dup.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).union(dup.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")))
    labels = docs.select("doc_id", F.col("doc_id").alias("cluster_id"))
    return label_propagation(labels, edges, max_rounds=20)


_SQL_SIG_CTE = None  # built lazily below


def _sql_signature_cte() -> str:
    shingles = H.sql_word_shingles("text")
    mh_exprs = H.sql_minhash_select("hashes")
    mh_sel = ",\n           ".join(f"{e} AS mh{i}" for i, e in enumerate(mh_exprs))
    concat = " || ',' || ".join(f"mh{i}::VARCHAR" for i in range(len(H.MINHASH_PERMS)))
    return f"""
    w AS (SELECT doc_id, {shingles} AS sh_list FROM documents),
    h AS (SELECT doc_id,
                 [{H.sql_shingle_hash('s')} for s in sh_list] AS hashes
          FROM w WHERE len(sh_list) > 0),
    mh AS (SELECT doc_id,
           {mh_sel}
           FROM h),
    sig AS (SELECT doc_id, md5({concat}) AS minhash_sig FROM mh)"""


@register(
    "dedup_minhash_signature",
    oracle=f"""
    WITH {_sql_signature_cte()}
    SELECT minhash_sig, min(doc_id) AS keep_doc_id, count(*) AS n_docs
    FROM sig GROUP BY minhash_sig
    """,
    doc="Row-local minhash signatures (the streaming dedup key, "
    "streaming/dedup.py): near-exact dedup by full-signature "
    "equality, keep lowest doc_id. Computed as per-row array "
    "expressions — the form that works on an unbounded stream.",
)
def dedup_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_analytics_demo_spark.streaming.dedup import with_minhash_signature

    docs = _t(spark, sf_dir, "documents")
    sig = with_minhash_signature(docs.filter(F.size(H.word_shingles(F.col("text"))) > 0))
    return sig.groupBy("minhash_sig").agg(
        F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_docs")
    )


# ------------------------------------------------------------------- simhash
def _simhash_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode distinct-token hashes to rows, then 60 codegen'd
    conditional-sum aggregates (one per bit) — same values as the
    array fold, ~10x faster, and the shuffle after partial agg is
    docs x 60 ints."""
    docs = _t(spark, sf_dir, "documents")
    tokens = F.array_distinct(H.words(F.col("text")))
    th = docs.select("doc_id", F.explode(tokens).alias("t")).select(
        "doc_id", (H.md5_long(F.col("t"))).alias("h")
    )
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(
                -1
            )
        ).alias(f"b{i}")
        for i in range(H.SIMHASH_BITS)
    ]
    agg = th.groupBy("doc_id").agg(*bit_sums)
    fingerprint = None
    for i in range(H.SIMHASH_BITS):
        term = F.when(F.col(f"b{i}") > 0, F.lit(1 << i).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        fingerprint = term if fingerprint is None else fingerprint + term
    return agg.select("doc_id", fingerprint.alias("simhash"))


_SQL_SIMHASH_CTE = f"""
    toks AS (SELECT doc_id,
             list_distinct(string_split_regex(text, '\\s+')) AS tokens
             FROM documents),
    th AS (SELECT doc_id,
           [{H.sql_md5_long('t')} for t in tokens] AS hashes
           FROM toks),
    sh AS (SELECT doc_id, {H.sql_simhash('hashes')} AS simhash FROM th)"""


@register(
    "dedup_simhash_fingerprints",
    oracle=f"""
    WITH {_SQL_SIMHASH_CTE}
    SELECT doc_id, simhash FROM sh
    """,
    doc="SimHash 60-bit fingerprints over distinct tokens (array "
    "aggregation, zero shuffles beyond the scan).",
)
def dedup_simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _simhash_df(spark, sf_dir)


@register(
    "dedup_simhash_pairs",
    oracle=f"""
    WITH {_SQL_SIMHASH_CTE},
    chunks AS (
        SELECT doc_id, simhash, j, (simhash >> (15 * j)) & 32767 AS chunk
        FROM sh, generate_series(0, 3) AS g(j)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, a.simhash AS sh_a,
                        b.doc_id AS doc_b, b.simhash AS sh_b
        FROM chunks a JOIN chunks b
          ON a.j = b.j AND a.chunk = b.chunk AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming
    FROM cand
    WHERE bit_count(xor(sh_a, sh_b)) <= {SIMHASH_MAX_HAMMING}
    """,
    doc="SimHash near-duplicates: 4x15-bit chunk banding (pigeonhole "
    "guarantees recall for hamming <= 3) + exact hamming verify.",
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # docs x 1 row; persisted so the chunk self-join below doesn't run
    # the 60-bit-sum fingerprint aggregation once per side.
    sh = tracked_persist(_simhash_df(spark, sf_dir))
    chunks = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        F.shiftright(F.col("simhash"), 15 * j)
                        .bitwiseAND(F.lit(32767))
                        .alias("chunk"),
                    )
                    for j in range(4)
                ]
            )
        ).alias("jc"),
    ).select("doc_id", "simhash", F.col("jc.j").alias("j"), F.col("jc.chunk").alias("chunk"))
    a = chunks.alias("a")
    b = chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.j") == F.col("b.j"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select("doc_a", "doc_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= SIMHASH_MAX_HAMMING
    )


# ------------------------------------------------------- n-gram jaccard (all)
@register(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_sql_minhash_cte()}
    SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= 0.5
    """,
    doc="Exact n-gram Jaccard similarity (LSH-pruned candidate set, "
    "threshold 0.5) — the verify stage exposed as its own operator.",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return minhash_dup_pairs(docs, 0.5)


# ------------------------------------------------------- embedding near-dups
# The embedding near-dup family (exact blocked all-pairs, the
# IVF-bucketed sub-quadratic twin, SemDeDup-style clusters) lives in
# dedup_embedding.py — the round-11 split that keeps this file under
# the 1,300-line cap. The import sits MID-MODULE, at the family's
# original position, so fresh-process registration order is byte-for-
# byte unchanged (dedup is transitively imported early, so a position
# in registry._load_all_modules could not guarantee that).
#
# The bucketed family's CONSTANTS and shared oracle CTE builder stay
# HERE, above the import, so both import orders resolve: the hybrid
# query below embeds the CTE at ITS registration (dedup import time),
# and dedup_embedding pulls these names back whichever module loads
# first (this file accesses no dedup_embedding attribute at import
# time — that would break under a dedup_embedding-first import).
NEAR_DUP_NPROBE = 2
#: target max probed-list size. The 10 per-label centroids alone put
#: ALL corpus growth into list size — the round-8 100x probe crashed
#: a python worker materializing a 40k-member list's 13 GB sims
#: matrix. Above ~20k vectors, extra centroids are drawn
#: deterministically (vec_id md5-mod-grid threshold, the round-8
#: adaptive-K rule) so lists stay ~LIST_CAP and total verify work is
#: O(n * LIST_CAP) — linear in corpus size. At every test SF
#: (n <= 2000) the extra draw is empty and results are bit-identical
#: to the original 10-list construction.
NEAR_DUP_LIST_CAP = 4096
DEDUP_SEL_GRID = 4096  #: md5 grid for the deterministic extra-centroid draw


def _sql_bucketed_pair_ctes(prefix: str = "") -> str:
    """Shared oracle CTE chain ending in ``epairs(vec_a, vec_b, sim)``
    — the bucketed embedding near-dup pairs. One definition feeds the
    pair query's oracle, the cluster query built on top of it, and
    (via ``prefix``, which renames the intermediate CTEs) oracles that
    also embed the minhash CTE chain, whose names would otherwise
    collide on ``cand``/``assign``."""
    p = prefix
    return f"""{p}sel AS (
        SELECT n, ({DEDUP_SEL_GRID} * k + n - 1) // greatest(n, 1) AS thr
        FROM (SELECT count(*) AS n,
                     greatest(((count(*) * {NEAR_DUP_NPROBE}
                                + {NEAR_DUP_LIST_CAP - 1})
                               // {NEAR_DUP_LIST_CAP}) - 10, 0) AS k
              FROM embeddings)
    ),
    {p}cent AS (
        SELECT min(vec_id) AS cid FROM embeddings GROUP BY label
        UNION
        SELECT e.vec_id FROM embeddings e, {p}sel s
        WHERE ({H.sql_md5_long("e.vec_id::VARCHAR")}
               % {DEDUP_SEL_GRID}) < s.thr
    ),
    {p}centv AS (
        SELECT c.cid, e.embedding AS cv
        FROM {p}cent c JOIN embeddings e ON e.vec_id = c.cid
    ),
    {p}assign AS (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY {V.sql_cosine('e.embedding', 'c.cv', 64)} DESC, c.cid)
                   AS crank
        FROM embeddings e, {p}centv c
    ),
    {p}member AS (SELECT vec_id, cid FROM {p}assign WHERE crank <= {NEAR_DUP_NPROBE}),
    {p}cand AS (
        SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM {p}member a JOIN {p}member b
          ON a.cid = b.cid AND a.vec_id < b.vec_id
    ),
    epairs AS (
        SELECT c.vec_a, c.vec_b,
               {V.sql_cosine('ea.embedding', 'eb.embedding', 64)} AS sim
        FROM {p}cand c
        JOIN embeddings ea ON ea.vec_id = c.vec_a
        JOIN embeddings eb ON eb.vec_id = c.vec_b
        WHERE {V.sql_cosine('ea.embedding', 'eb.embedding', 64)}
              >= {EMBEDDING_NEAR_DUP_COSINE}
    )"""


from kinesis_analytics_demo_spark.operators import dedup_embedding  # noqa: E402,F401


# -------------------------------------------------- incremental dedup
#: "Yesterday's crawl": the shard being ingested, deduped against the
#: already-accepted corpus (all other sources).
INCREMENTAL_NEW_SOURCES = ("src18", "src19")


@register(
    "dedup_incremental_minhash",
    oracle=f"""
    WITH {_sql_minhash_cte()},
    side AS (SELECT doc_id,
                    source IN {INCREMENTAL_NEW_SOURCES} AS is_new
             FROM documents),
    cand2 AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN side sa ON a.doc_id = sa.doc_id
        JOIN bands b ON a.band = b.band AND a.sig = b.sig
        JOIN side sb ON b.doc_id = sb.doc_id
        WHERE sa.is_new AND NOT sb.is_new
    ),
    inter2 AS (
        SELECT c.doc_a, c.doc_b, count(*) AS c
        FROM cand2 c
        JOIN dsh a ON c.doc_a = a.doc_id
        JOIN dsh b ON c.doc_b = b.doc_id AND a.hv = b.hv
        GROUP BY c.doc_a, c.doc_b
    )
    SELECT i.doc_a AS new_doc_id,
           i.doc_b AS dup_of_doc_id,
           i.c / (sa.n + sb.n - i.c) AS jaccard
    FROM inter2 i
    JOIN sizes sa ON i.doc_a = sa.doc_id
    JOIN sizes sb ON i.doc_b = sb.doc_id
    WHERE i.c / (sa.n + sb.n - i.c) >= {JACCARD_THRESHOLD}
    """,
    doc="Incremental dedup (continuous-ingest shape): the new shard's "
    "band signatures join ONLY against the existing corpus's — the "
    "asymmetric version of dedup_minhash_pairs a production pipeline "
    "runs per ingest batch. In production the existing side's "
    "signatures are a persisted table keyed by (band, sig), so each "
    "batch costs O(new shard), never a corpus re-scan; here both "
    "sides derive from one shingle intermediate.",
)
def dedup_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    dsh = tracked_persist(_distinct_shingles(docs))
    bands = _minhash_banded(dsh)
    side = docs.select(
        "doc_id", F.col("source").isin(*INCREMENTAL_NEW_SOURCES).alias("is_new")
    )
    # docs x MINHASH_BANDS rows; persisted so the new/old split below
    # doesn't run the band aggregation once per side.
    b = tracked_persist(bands.join(side, "doc_id"))
    newb = b.filter("is_new").select(F.col("doc_id").alias("doc_a"), "band", "sig")
    oldb = b.filter(~F.col("is_new")).select(
        F.col("doc_id").alias("doc_b"), "band", "sig"
    )
    pairs = newb.join(oldb, ["band", "sig"]).select("doc_a", "doc_b").distinct()
    return (
        jaccard_verify(docs, pairs, dsh=dsh)
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select(
            F.col("doc_a").alias("new_doc_id"),
            F.col("doc_b").alias("dup_of_doc_id"),
            "jaccard",
        )
    )


# ------------------------------------------- quality-aware cluster keep
@register(
    "dedup_keep_best_quality",
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
    clusters AS (SELECT doc_id, min(root) AS cluster_id FROM reach GROUP BY doc_id),
    tq AS (SELECT doc_id, {_SQL_TOKENS} AS toks FROM documents),
    quality AS (
        SELECT doc_id, {sql_quality_score('toks')} AS quality_score
        FROM tq
    ),
    ranked AS (
        SELECT c.doc_id, c.cluster_id, q.quality_score,
               count(*) OVER (PARTITION BY c.cluster_id) AS cluster_size,
               row_number() OVER (PARTITION BY c.cluster_id
                                  ORDER BY q.quality_score DESC, c.doc_id) AS rn
        FROM clusters c JOIN quality q ON c.doc_id = q.doc_id
    )
    SELECT doc_id, cluster_id, CAST(cluster_size AS BIGINT) AS cluster_size,
           quality_score, rn = 1 AS kept
    FROM ranked
    """,
    doc="Quality-aware dedup retention: within each near-duplicate "
    "cluster keep the HIGHEST-quality document (C4/Gopher heuristic "
    "score; doc_id tiebreak) instead of the lowest id — what a "
    "production pipeline actually retains. Composition of the "
    "connected-component clusters and the quality scorer: one extra "
    "shuffle on cluster_id for the argmax window; quality is computed "
    "corpus-wide in the same scan that seeds the labels.",
)
def dedup_keep_best_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from kinesis_analytics_demo_spark.operators.text import text_quality_score

    clusters = dedup_minhash_clusters(spark, sf_dir)
    quality = text_quality_score(spark, sf_dir).select("doc_id", "quality_score")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    size_w = Window.partitionBy("cluster_id")
    return (
        clusters.join(quality, "doc_id")
        .withColumn("cluster_size", F.count(F.lit(1)).over(size_w))
        .withColumn("rn", F.row_number().over(w))
        .select(
            "doc_id",
            "cluster_id",
            "cluster_size",
            "quality_score",
            (F.col("rn") == 1).alias("kept"),
        )
    )


@register(
    "dedup_hybrid_clusters",
    oracle=f"""
    WITH RECURSIVE {_sql_minhash_cte()},
    {_sql_bucketed_pair_ctes(prefix='em_')},
    dup AS (SELECT doc_a, doc_b FROM jac WHERE jaccard >= {JACCARD_THRESHOLD}),
    hedges AS (
        SELECT doc_a AS src, doc_b AS dst FROM dup
        UNION ALL SELECT doc_b AS src, doc_a AS dst FROM dup
        UNION ALL SELECT vec_a AS src, vec_b AS dst FROM epairs
        UNION ALL SELECT vec_b AS src, vec_a AS dst FROM epairs
    ),
    hreach(doc_id, root) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.dst, r.root FROM hreach r JOIN hedges e ON e.src = r.doc_id
    ),
    hcl AS (SELECT doc_id, min(root) AS cluster_id FROM hreach GROUP BY doc_id)
    SELECT doc_id, cluster_id,
           CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT)
               AS cluster_size,
           doc_id = cluster_id AS kept
    FROM hcl
    """,
    doc="HYBRID dedup: near-duplicate clusters over the UNION of the "
    "lexical duplicate graph (banded-minhash pairs, exact Jaccard >= "
    "0.8) and the semantic one (IVF-bucketed embedding cosine pairs; "
    "vec_id IS the document's embedding id — a 1:1 correspondence in "
    "this corpus). A paraphrased copy (caught only semantically) and "
    "a boilerplate-edited copy (caught only lexically) land in ONE "
    "cluster, so keep-lowest-id retention never keeps both — the "
    "curation rule modern corpus pipelines apply (SemDeDup + MinHash "
    "stacked). Scale: both edge generators are the existing "
    "sub-quadratic paths; the union is edge-set concatenation; "
    "components run on the combined graph in O(diameter) rounds — "
    "nothing new shuffles beyond the two edge sets themselves.",
)
def dedup_hybrid_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    lex = minhash_dup_pairs(docs, JACCARD_THRESHOLD).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    sem = dedup_embedding.dedup_embedding_cosine_bucketed(spark, sf_dir).select(
        F.col("vec_a").alias("a"), F.col("vec_b").alias("b")
    )
    und = lex.union(sem)
    edges = und.select(F.col("a").alias("src"), F.col("b").alias("dst")).union(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    labels = docs.select("doc_id", F.col("doc_id").alias("cluster_id"))
    clusters = label_propagation(labels, edges, max_rounds=20)
    size_w = Window.partitionBy("cluster_id")
    return clusters.select(
        "doc_id",
        "cluster_id",
        F.count(F.lit(1)).over(size_w).cast("bigint").alias("cluster_size"),
        (F.col("doc_id") == F.col("cluster_id")).alias("kept"),
    )


# ---------------------------------------------------- LSH recall audit
@register(
    "dedup_lsh_recall_audit",
    oracle=f"""
    WITH {_sql_minhash_cte()},
    allinter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
        FROM dsh a JOIN dsh b ON a.hv = b.hv AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
    alljac AS (
        SELECT i.doc_a, i.doc_b,
               i.c / (sa.n + sb.n - i.c) AS jaccard
        FROM allinter i
        JOIN sizes sa ON i.doc_a = sa.doc_id
        JOIN sizes sb ON i.doc_b = sb.doc_id),
    truth AS (SELECT doc_a, doc_b FROM alljac
              WHERE jaccard >= {JACCARD_THRESHOLD}),
    verified AS (SELECT doc_a, doc_b FROM jac
                 WHERE jaccard >= {JACCARD_THRESHOLD}),
    missed AS (
        SELECT t.doc_a FROM truth t
        LEFT JOIN cand c ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
        WHERE c.doc_a IS NULL),
    wasted AS (
        SELECT 1 FROM jac WHERE jaccard < {JACCARD_THRESHOLD})
    SELECT CAST((SELECT count(*) FROM truth) AS BIGINT) AS n_true_pairs,
           CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_candidates,
           CAST((SELECT count(*) FROM verified) AS BIGINT)
               AS n_verified_true,
           CAST((SELECT count(*) FROM missed) AS BIGINT) AS n_missed,
           CAST((SELECT count(*) FROM wasted) AS BIGINT) AS n_wasted,
           ROUND(CASE WHEN (SELECT count(*) FROM truth) = 0 THEN 1.0
                      ELSE CAST((SELECT count(*) FROM verified) AS DOUBLE)
                           / (SELECT count(*) FROM truth) END, 6)
               AS recall
    """,
    doc="LSH self-audit: MEASURE the banding scheme's recall instead "
    "of trusting the s-curve. Ground truth = ALL pairs with exact "
    f"Jaccard >= {JACCARD_THRESHOLD} via the shared-shingle join "
    "(complete for any threshold > 0 — a pair with nonzero Jaccard "
    "shares a gram; the all-pairs intersection is the deliberately "
    "expensive eval twin, like the exact embedding baseline). "
    "Reports true/candidate/verified/missed/wasted pair counts and "
    "recall — the number that justifies the band/row configuration "
    "in production.",
)
def dedup_lsh_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    dsh = tracked_persist(_distinct_shingles(docs))
    sizes = dsh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = dsh.alias("ia")
    b = dsh.alias("ib")
    allinter = (
        a.join(
            b,
            (F.col("ia.h") == F.col("ib.h"))
            & (F.col("ia.doc_id") < F.col("ib.doc_id")),
        )
        .groupBy(
            F.col("ia.doc_id").alias("doc_a"),
            F.col("ib.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    alljac = (
        allinter.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))).alias(
                "jaccard"
            ),
        )
    )
    truth = tracked_persist(
        alljac.filter(F.col("jaccard") >= JACCARD_THRESHOLD).select(
            "doc_a", "doc_b"
        )
    )
    cand = tracked_persist(minhash_candidate_pairs(docs, dsh=dsh))
    verified = jaccard_verify(docs, cand, dsh=dsh)
    n_truth = truth.count()
    n_cand = cand.count()
    n_verified = verified.filter(
        F.col("jaccard") >= JACCARD_THRESHOLD
    ).count()
    n_missed = truth.join(cand, ["doc_a", "doc_b"], "left_anti").count()
    n_wasted = verified.filter(F.col("jaccard") < JACCARD_THRESHOLD).count()
    recall = 1.0 if n_truth == 0 else round(n_verified / n_truth, 6)
    return spark.range(1).select(
        F.lit(n_truth).cast("bigint").alias("n_true_pairs"),
        F.lit(n_cand).cast("bigint").alias("n_candidates"),
        F.lit(n_verified).cast("bigint").alias("n_verified_true"),
        F.lit(n_missed).cast("bigint").alias("n_missed"),
        F.lit(n_wasted).cast("bigint").alias("n_wasted"),
        F.lit(recall).alias("recall"),
    )
