"""Corpus curation, part 3 — entity resolution (record linkage),
Pareto-frontier document selection, and semantic-cluster topic
labeling.

``fuzzy_match_entity_names`` is the classic record-linkage shape:
dirty strings (here: supplier names with one deterministically-chosen
character deleted, so the ground truth is planted and auditable) are
matched back to the clean master table. The scale discipline is
block-then-verify: an equi-join on a stable blocking key (the digit
suffix the corruption cannot touch; in production a df-capped q-gram
key) produces O(1) candidates per dirty row, and the expensive
``levenshtein`` verify runs ONLY on candidates. The DuckDB oracle
deliberately does the opposite — an exhaustive all-pairs argmin — so
the parity gate doubles as a recall proof: blocked == brute force
(the same discipline as ``dedup_lsh_recall_audit``). At 100 TB the
candidate join is the only shuffle and it carries (block_key, name)
rows, never the cross product.

``pareto_quality_frontier`` selects the documents no other document
strictly dominates on (quality_score, n_chars) — the skyline
operator (Borzsony et al., ICDE 2001), used to pick "best of both"
curation candidates without committing to a weighting. Distributed
as local-skyline-then-global-skyline: each hash bucket computes its
own frontier with one running-max window (a bucket's skyline is a
superset of its contribution to the global one), and only the tiny
union of local survivors enters the final single-partition window.
At 100 TB the raw data is touched once, partitioned by bucket; the
global pass sees ~skyline-sized input (O(log N) points under mild
independence assumptions), never the corpus.

``cluster_topic_terms`` labels each embedding cluster with its top
distinctive tokens — the human-audit step after semantic clustering
(what IS list 7?). Vectors are assigned to their nearest
label-representative centroid (the similarity_ivf discipline:
broadcast centroids, argmin over k), joined to their documents
(vec_id == doc_id in the fixtures), and per-cluster tokens are
ranked by RELATIVE LIFT — (in-cluster rate) / (corpus rate),
computed as one IEEE-exact division of two exact bigint products so
both engines agree bit-for-bit (ln()-free tf-idf; the products stay
below 2^53 up to ~10^8 corpus tokens per side — beyond that, rank by
the cross-multiplied integer comparison instead). Counts aggregate
with map-side combine; the top-3 window is a WindowGroupLimit, so no
cluster's full term list is ever sorted.

Reference anchor: the reference engine has no linkage/skyline/topic
operators (its scope is flink/tumbling_window.py + sliding_window.py);
these extend the batch surface for the LLM-curation mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.caching import tracked_persist
from kinesis_analytics_demo_spark.functions import hashing as H
from kinesis_analytics_demo_spark.functions import vectors as V
from kinesis_analytics_demo_spark.operators.text import sql_quality_score
from kinesis_analytics_demo_spark.plans.registry import register
from kinesis_analytics_demo_spark.session import read_table as _t

_SQL_TOKENS = "string_split_regex(text, '\\s+')"

FUZZY_MAX_DIST = 2  #: accept a link only within this edit distance
FUZZY_PREFIX = 8  #: corruption deletes inside the 8-char alpha prefix
FUZZY_BLOCK = 9  #: blocking key: the 9-digit suffix (corruption-stable)
SKY_BUCKETS = 32  #: local-skyline fan-out
TOPIC_TOP = 3  #: distinctive terms kept per cluster
_DIM = 64  #: embedding dimensionality (matches operators/similarity.py)

# The deterministic corruption both engines apply to build the dirty
# side: delete one character of the alpha prefix, position seeded by
# md5 of the clean name.
_SQL_DIRTY = f"""
    SELECT s_suppkey AS dirty_id,
           substr(s_name, 1, pos - 1) || substr(s_name, pos + 1) AS dirty_name
    FROM (SELECT s_suppkey, s_name,
                 1 + ({H.sql_md5_long('s_name')} % {FUZZY_PREFIX}) AS pos
          FROM supplier)
"""


@register(
    "fuzzy_match_entity_names",
    oracle=f"""
    WITH dirty AS ({_SQL_DIRTY}),
    cand AS (
        SELECT d.dirty_id, d.dirty_name, s.s_suppkey,
               levenshtein(d.dirty_name, s.s_name) AS dist
        FROM dirty d, supplier s
    ),
    best AS (
        SELECT dirty_id, dirty_name, s_suppkey, dist,
               row_number() OVER (PARTITION BY dirty_id
                                  ORDER BY dist, s_suppkey) AS rn
        FROM cand
    )
    SELECT dirty_id, dirty_name, s_suppkey AS matched_suppkey,
           CAST(dist AS INT) AS edit_distance
    FROM best WHERE rn = 1 AND dist <= {FUZZY_MAX_DIST}
    """,
    doc="Record linkage / fuzzy entity matching: dirty name variants "
    "(one prefix character deleted, md5-seeded so the truth is "
    "planted) matched to the master table by blocking on the "
    "corruption-stable digit suffix, then levenshtein-verifying only "
    "the blocked candidates and keeping the per-dirty-row argmin. The "
    "oracle is the exhaustive all-pairs argmin, so green == the "
    "blocked plan loses nothing vs brute force.",
)
def fuzzy_match_entity_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = _t(spark, sf_dir, "supplier")
    pos = (F.lit(1) + H.md5_long(F.col("s_name")) % FUZZY_PREFIX).alias("pos")
    dirty = sup.select(
        F.col("s_suppkey").alias("dirty_id"), "s_name", pos
    ).select(
        "dirty_id",
        F.concat(
            F.expr("substring(s_name, 1, pos - 1)"),
            F.expr("substring(s_name, pos + 1)"),
        ).alias("dirty_name"),
    )
    # Block on the digit suffix: equi-join, O(1) candidates per row.
    d = dirty.withColumn("block", F.substring("dirty_name", -FUZZY_BLOCK, FUZZY_BLOCK))
    c = sup.select(
        "s_suppkey",
        "s_name",
        F.substring("s_name", -FUZZY_BLOCK, FUZZY_BLOCK).alias("block"),
    )
    cand = d.join(c, "block").select(
        "dirty_id",
        "dirty_name",
        "s_suppkey",
        F.levenshtein("dirty_name", "s_name").alias("dist"),
    )
    w = Window.partitionBy("dirty_id").orderBy("dist", "s_suppkey")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("dist") <= FUZZY_MAX_DIST))
        .select(
            "dirty_id",
            "dirty_name",
            F.col("s_suppkey").alias("matched_suppkey"),
            F.col("dist").cast("int").alias("edit_distance"),
        )
    )


@register(
    "pareto_quality_frontier",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, n_chars,
               {sql_quality_score(_SQL_TOKENS)} AS q
        FROM documents
    ),
    p AS (SELECT DISTINCT q, n_chars AS n FROM t),
    sky AS (
        SELECT q, n FROM p a
        WHERE NOT EXISTS (
            SELECT 1 FROM p b
            WHERE b.q >= a.q AND b.n >= a.n AND (b.q > a.q OR b.n > a.n))
    )
    SELECT t.doc_id, t.q AS quality_score, t.n_chars
    FROM t JOIN sky ON t.q = sky.q AND t.n_chars = sky.n
    """,
    doc="Pareto-frontier (skyline) document selection on "
    "(quality_score, n_chars): keep every document no other document "
    "strictly dominates. Distributed two-level: per-hash-bucket local "
    "skylines via ONE ordered running-max window each, then a global "
    "pass over only the tiny survivor union — the oracle is the "
    "quadratic NOT-EXISTS definition.",
)
def pareto_quality_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = H.words(F.col("text"))
    from kinesis_analytics_demo_spark.operators.text import EN_STOPWORDS

    stoplist = F.array(*[F.lit(w) for w in EN_STOPWORDS])
    n = F.size(toks).cast("bigint")
    nd = F.size(F.array_distinct(toks)).cast("bigint")
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stoplist, w))).cast(
        "bigint"
    )
    q = (
        F.lit(0.4) * F.least(n / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * (nd / n)
        + F.lit(0.3) * F.least((n_stop / n) / F.lit(0.1), F.lit(1.0))
    )
    t = docs.select("doc_id", F.col("n_chars").alias("n"), q.alias("q"))

    def _skyline(pts: DataFrame, part_cols: list[str]) -> DataFrame:
        """Keep points whose n exceeds every strictly-preceding n in
        (q desc, n desc) order — on DISTINCT points this is exactly
        strict-dominance filtering."""
        w = (
            Window.partitionBy(*part_cols)
            .orderBy(F.desc("q"), F.desc("n"))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        prev = F.max("n").over(w)
        return pts.withColumn("prev_n", prev).filter(
            F.col("prev_n").isNull() | (F.col("n") > F.col("prev_n"))
        ).drop("prev_n")

    pts = t.select("q", "n").distinct()
    local = _skyline(
        pts.withColumn("bucket", F.pmod(F.hash("q", "n"), F.lit(SKY_BUCKETS))),
        ["bucket"],
    ).drop("bucket")
    # Global pass: input is the union of per-bucket frontiers —
    # skyline-sized, so the single-partition window is safe.
    sky = _skyline(local, [])
    return t.join(sky, ["q", "n"]).select(
        "doc_id", F.col("q").alias("quality_score"), F.col("n").alias("n_chars")
    )


@register(
    "cluster_topic_terms",
    oracle=f"""
    WITH cent AS (SELECT min(vec_id) AS cid FROM embeddings GROUP BY label),
    centv AS (
        SELECT c.cid, e.embedding AS cv
        FROM cent c JOIN embeddings e ON e.vec_id = c.cid
    ),
    assign AS (
        SELECT e.vec_id, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY {V.sql_cosine('e.embedding', 'c.cv', _DIM)} DESC, c.cid)
                   AS crank
        FROM embeddings e, centv c
    ),
    members AS (SELECT vec_id, cid FROM assign WHERE crank = 1),
    tok AS (
        SELECT m.cid, unnest({_SQL_TOKENS}) AS term
        FROM members m JOIN documents d ON d.doc_id = m.vec_id
    ),
    cnts AS (SELECT cid, term, count(*) AS cnt FROM tok GROUP BY cid, term),
    tot AS (SELECT cid, sum(cnt) AS tok_c FROM cnts GROUP BY cid),
    g AS (SELECT term, sum(cnt) AS cnt_all FROM cnts GROUP BY term),
    n AS (SELECT sum(cnt) AS n_total FROM cnts),
    ranked AS (
        SELECT c.cid, c.term, c.cnt,
               CAST(c.cnt * n.n_total AS DOUBLE) / (g.cnt_all * t.tok_c)
                   AS lift,
               row_number() OVER (PARTITION BY c.cid
                   ORDER BY CAST(c.cnt * n.n_total AS DOUBLE)
                                / (g.cnt_all * t.tok_c) DESC, c.term)
                   AS rank
        FROM cnts c
        JOIN tot t ON c.cid = t.cid
        JOIN g ON c.term = g.term, n
    )
    SELECT cid, term, cnt, lift, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {TOPIC_TOP}
    """,
    doc="Semantic-cluster topic labeling: assign each vector to its "
    "nearest label-representative centroid (broadcast centroids, the "
    "similarity_ivf discipline), join the owning documents, and keep "
    "each cluster's top-3 tokens by relative lift (in-cluster rate / "
    "corpus rate — exact bigint products, ONE IEEE-exact division, no "
    "ln()) — WindowGroupLimit top-k, map-side-combined counts.",
)
def cluster_topic_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    docs = _t(spark, sf_dir, "documents")
    cids = emb.groupBy("label").agg(F.min("vec_id").alias("cid")).select("cid")
    cent = cids.join(emb, F.col("cid") == F.col("vec_id")).select(
        "cid", F.col("embedding").alias("cv")
    )
    # argmax assignment as a max_by aggregate (struct(csim, -cid) max
    # == row_number's csim DESC, cid ASC): map-side partial
    # aggregation sends one reduced row per vec_id to the exchange
    # instead of shuffling+sorting the N x K centroid cross product.
    members = (
        emb.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "cid",
            V.cosine(F.col("embedding"), F.col("cv")).alias("csim"),
        )
        .groupBy("vec_id")
        .agg(F.max_by("cid", F.struct(F.col("csim"), -F.col("cid"))).alias("cid"))
    )
    tok = (
        members.join(docs, members.vec_id == docs.doc_id)
        .select("cid", F.explode(H.words(F.col("text"))).alias("term"))
    )
    # Persist the compact (cid, term, cnt) aggregate: it feeds FOUR
    # consumers (tot, g, n, and the ranked join), each of which
    # otherwise re-runs the whole centroid-assign + doc-join +
    # token-explode lineage (before-plan: 16 embeddings/documents
    # scans, 64 exchanges). The cache is cluster-count x vocab rows —
    # tiny next to the token stream it summarizes at any corpus size.
    # The repartition right-sizes the cached static partitioning (a
    # cache read cannot be AQE-coalesced): without it each of the four
    # consumer passes schedules one task per near-empty shuffle
    # partition. Size by rows/partition at production scale.
    cnts = tracked_persist(
        tok.groupBy("cid", "term").agg(F.count("*").alias("cnt")).repartition(8)
    )
    tot = cnts.groupBy("cid").agg(F.sum("cnt").alias("tok_c"))
    g = cnts.groupBy("term").agg(F.sum("cnt").alias("cnt_all"))
    n = cnts.agg(F.sum("cnt").alias("n_total"))
    lift = (F.col("cnt") * F.col("n_total")).cast("double") / (
        F.col("cnt_all") * F.col("tok_c")
    )
    ranked = (
        cnts.join(tot, "cid")
        .join(F.broadcast(g), "term")
        .crossJoin(F.broadcast(n))
        .withColumn("lift", lift)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("cid").orderBy(F.desc("lift"), F.col("term"))
            ),
        )
        .filter(F.col("rank") <= TOPIC_TOP)
    )
    return ranked.select(
        "cid", "term", "cnt", "lift", F.col("rank").cast("int").alias("rank")
    )
