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
the curation pipeline (Sweeney 2002); ``l_diversity_audit`` is its
complement (Machanavajjhala et al. 2007): groups large enough for k
can still leak if the sensitive attribute takes too few values. Each
is a single hash aggregate over the QI projection; the report is only
the violating groups.

``label_knn_disagreement`` is the Confident-Learning-style label-noise
signal: a vector whose nearest neighbors overwhelmingly carry a
different label is a mislabel candidate. The deterministic 10% audit
sample broadcasts against one corpus scan; at production scale the
neighbor stage composes with the IVF candidate generator instead of
brute force.

Determinism: ln() inputs are exact integer ratios and the per-doc
weight folds left-to-right over the bucket-sorted term list (the
proven pattern of operators/lm.py); everything else is integer counts
with order-insensitive aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.config import env_coef
from kinesis_analytics_demo_spark.functions import hashing as H
from kinesis_analytics_demo_spark.functions import vectors as V
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
    # FOUR frames derived from the token stream (tgt, corp, tot, tf)
    # ran scan + explode + md5 four times (r11 before-plan: 4 corpus
    # scans, no reuse). All four are exact integer rollups of ONE
    # compact (doc_id, lang, bucket, tf) aggregate — lang is
    # functionally dependent on doc_id, so the grain equals tf's, and
    # count-of-instances = sum-of-tf at every coarser level. Persist
    # that table (<= docs x 256 rows) and derive the rest as cheap
    # map-side-combined sums over the cache.
    from kinesis_analytics_demo_spark.caching import tracked_persist

    base = tracked_persist(
        tok.groupBy("doc_id", "lang", "b").agg(
            F.count(F.lit(1)).alias("tf")
        )
    )
    tgt = (
        base.filter(F.col("lang") == DSIR_TARGET_LANG)
        .groupBy("b").agg(F.sum("tf").alias("tb"))
    )
    corp = base.groupBy("b").agg(F.sum("tf").alias("rb"))
    tot = base.agg(
        F.sum(F.when(F.col("lang") == DSIR_TARGET_LANG, F.col("tf")).otherwise(0))
        .alias("t"),
        F.sum("tf").alias("r"),
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
    tf = base.select("doc_id", "b", "tf")
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


# --------------------------------------------- label-noise kNN audit
KNN_K = 10  #: neighbors per audited vector
KNN_SAMPLE_MOD = 10  #: audit every 10th vec_id (deterministic sample)
KNN_SUSPECT_FRAC = 0.8  #: >=80% cross-label neighbors -> suspect
_EMB_DIM = 64


@register(
    "label_knn_disagreement",
    oracle=f"""
    WITH q AS (SELECT vec_id, embedding, label FROM embeddings
               WHERE vec_id % {KNN_SAMPLE_MOD} = 0),
    nn AS (
        SELECT q.vec_id, q.label, e.label AS nlabel,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {V.sql_cosine('e.embedding', 'q.embedding', _EMB_DIM)} DESC,
                            e.vec_id) AS rnk
        FROM q JOIN embeddings e ON e.vec_id != q.vec_id),
    top AS (SELECT vec_id, label, nlabel FROM nn WHERE rnk <= {KNN_K})
    SELECT vec_id, label,
           CAST(sum(CASE WHEN nlabel != label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_disagree,
           ROUND(sum(CASE WHEN nlabel != label THEN 1 ELSE 0 END)
                 / {KNN_K}.0, 4) AS frac_disagree,
           (sum(CASE WHEN nlabel != label THEN 1 ELSE 0 END)
            >= {KNN_SUSPECT_FRAC} * {KNN_K}) AS suspect
    FROM top GROUP BY vec_id, label
    """,
    doc="Label-noise detection by kNN disagreement (the Confident-"
    "Learning-style mislabel signal): for a deterministic 10% audit "
    "sample, the fraction of the 10 nearest neighbors (exact cosine, "
    "vec_id tiebreak) carrying a DIFFERENT label; >=80% flags a "
    "suspect. The audit sample broadcasts against one corpus scan. "
    "This is the labeled exact O(sample x N) baseline (77x wall for "
    "10x data in the round-8 smoke) — the benched scale path is "
    "label_knn_disagreement_bucketed (IVF candidate lists).",
)
def label_knn_disagreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_analytics_demo_spark.functions import vectors as V

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % KNN_SAMPLE_MOD == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("label").alias("qlabel"),
    )
    pairs = emb.crossJoin(F.broadcast(q)).filter(
        F.col("vec_id") != F.col("qid")
    )
    w = Window.partitionBy("qid").orderBy(
        F.desc("sim"), F.col("vec_id")
    )
    top = (
        pairs.select(
            "qid",
            "qlabel",
            F.col("label").alias("nlabel"),
            "vec_id",
            V.cosine(F.col("embedding"), F.col("qe")).alias("sim"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= KNN_K)
    )
    dis = F.sum(F.when(F.col("nlabel") != F.col("qlabel"), 1).otherwise(0))
    return top.groupBy(
        F.col("qid").alias("vec_id"), F.col("qlabel").alias("label")
    ).agg(
        dis.cast("bigint").alias("n_disagree"),
        F.round(dis / float(KNN_K), 4).alias("frac_disagree"),
        (dis >= KNN_SUSPECT_FRAC * KNN_K).alias("suspect"),
    )


#: MINIMUM coarse lists probed per audited vector. The effective
#: nprobe is ADAPTIVE — max(KNN_NPROBE, ceil(KNN_NP_COEF * sqrt(K)))
#: — the same rule (and rationale) as the MNN twin's coef*sqrt(K): a
#: fixed probe count over a sqrt(n)-growing list count covers a
#: shrinking fraction of the space (fixed np=3 suspect-recall vs the
#: numpy exact audit measured 0.879 at 100x). The rule keeps np=3 at
#: every test SF (K <= 24 — results and driver rows unchanged) and
#: gives np=6 at 10x / np=10 at 100x at the 0.6 coefficient.
KNN_NPROBE = 3
#: Coefficient of the adaptive probe rule, configurable like the MNN
#: twin's SPARK_GRAFT_MNN_NP_COEF (the oracle SQL embeds the same
#: value at import, so both engines always agree). Any coefficient in
#: (0, 0.61] keeps np=3 at every test SF (the KNN_NPROBE floor binds
#: for K <= 24) — driver rows bit-identical across the dial range.
#: Parsed defensively (ADVICE r10): a malformed value falls back to
#: the default instead of crashing registry import; an out-of-range
#: finite value is honored with a warning (see ``config.env_coef``).
#: The bit-stable range is (0, 0.61]; env_coef's closed lower bound
#: uses the smallest positive float as a stand-in for "> 0".
KNN_NP_COEF = env_coef("SPARK_GRAFT_KNN_NP_COEF", 0.6, 5e-324, 0.61)
KNN_SEL_GRID = 4096  #: md5 grid for the deterministic centroid draw
#: List-side assignment rank (IVF multi-assignment): every vector
#: sits in its top-KNN_CRANK centroid lists. Round 10 proved probes
#: are NOT the audit's accuracy bottleneck (recall flat 0.880-0.885
#: across np 6-10 at 100x, ceilinged by the crank=1 lists); round 11
#: measured the crank frontier on the same exact-numpy ground truth
#: (200k vectors, 12,513 true suspects, np=10) with a replica
#: faithful to 4 decimals at crank=1 (recall/precision/mad
#: 0.8849/0.7979/1.507 = the r10 real-operator figures exactly):
#: crank 1/2/3 -> recall 0.885/0.907/0.922, precision
#: 0.798/0.852/0.888, mean abs n_disagree error 1.51/1.11/0.85, at
#: exactly 1x/2x/3x candidate-pair work (165M/330M/495M joined rows)
#: — crank, not np, is the dial that buys accuracy here, linearly
#: and with no knee. Default stays 1 (the audit is a screening pass;
#: doubling its wall is a policy choice, not an obvious win), and
#: any other value warns via env_coef: crank > 1 changes results at
#: EVERY scale factor, so the bit-stable range is exactly [1, 1].
#: With crank > 1 a neighbor can reach a query through several
#: probed lists, so the candidate stage dedups (qid, vec_id) pairs
#: before ranking — bit-deterministic because duplicate rows carry
#: identical values; the default plan gains no such stage.
KNN_CRANK = int(env_coef("SPARK_GRAFT_KNN_CRANK", 1.0, 1.0, 1.0))
#: oracle fragment: dedup duplicated candidate pairs only when
#: multi-assignment can produce them (keeps the default oracle lean)
_KNN_DISTINCT = "DISTINCT " if KNN_CRANK > 1 else ""


@register(
    "label_knn_disagreement_bucketed",
    oracle=f"""
    WITH sel AS (
        SELECT n, k, ({KNN_SEL_GRID} * k + n - 1) // greatest(n, 1) AS thr,
               greatest({KNN_NPROBE},
                        CAST(ceil({KNN_NP_COEF} * sqrt(CAST(k AS DOUBLE)))
                             AS BIGINT)) AS np,
               mn
        FROM (SELECT count(*) AS n,
                     greatest(CAST(floor(sqrt(
                         CAST((count(*) * 3) // 10 AS DOUBLE)))
                         AS BIGINT), 1) AS k,
                     min(vec_id) AS mn
              FROM embeddings)
    ),
    cent AS (
        SELECT e.vec_id AS cid, e.embedding AS cv
        FROM embeddings e, sel s
        WHERE ({H.sql_md5_long("e.vec_id::VARCHAR")} % {KNN_SEL_GRID}) < s.thr
           OR e.vec_id = s.mn
    ),
    assign AS (
        SELECT e.vec_id, e.label, e.embedding, c.cid,
               row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY {V.sql_cosine('e.embedding', 'c.cv', _EMB_DIM)} DESC, c.cid)
                   AS crank
        FROM embeddings e, cent c
    ),
    lists AS (SELECT vec_id, label, embedding, cid FROM assign
              WHERE crank <= {KNN_CRANK}),
    q AS (SELECT vec_id, embedding, label, cid FROM assign, sel
          WHERE vec_id % {KNN_SAMPLE_MOD} = 0 AND crank <= sel.np),
    cand AS (
        SELECT {_KNN_DISTINCT}q.vec_id, q.label, e.label AS nlabel,
               e.vec_id AS nid,
               {V.sql_cosine('e.embedding', 'q.embedding', _EMB_DIM)} AS sim
        FROM q JOIN lists e ON e.cid = q.cid AND e.vec_id != q.vec_id),
    nn AS (
        SELECT vec_id, label, nlabel,
               row_number() OVER (
                   PARTITION BY vec_id
                   ORDER BY sim DESC, nid) AS rnk
        FROM cand),
    top AS (SELECT vec_id, label, nlabel FROM nn WHERE rnk <= {KNN_K})
    SELECT vec_id, label,
           CAST(sum(CASE WHEN nlabel != label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_disagree,
           ROUND(sum(CASE WHEN nlabel != label THEN 1 ELSE 0 END)
                 / {KNN_K}.0, 4) AS frac_disagree,
           (sum(CASE WHEN nlabel != label THEN 1 ELSE 0 END)
            >= {KNN_SUSPECT_FRAC} * {KNN_K}) AS suspect
    FROM top GROUP BY vec_id, label
    """,
    doc="Scale-path default for the kNN label-noise audit: the "
    "neighbor stage composes with IVF coarse lists exactly as "
    "label_knn_disagreement's docstring prescribes — every vector "
    f"sits in its top-1 centroid list, each audited vector probes "
    f"its np = max({KNN_NPROBE}, ceil({KNN_NP_COEF}*sqrt(K))) nearest lists "
    "(ADAPTIVE, round 9 — np=3 at every test SF, 6 at 10x, 10 at "
    "100x; vs a full numpy exact audit at 100x the adaptive np "
    "buys suspect-precision 0.745 -> 0.798 and 20% lower "
    "n_disagree error over fixed np=3, at 2.4x wall — recall "
    "0.885, bounded by the crank=1 candidate lists, still ~18x "
    "cheaper than the exact twin there; at 10x it removes both "
    "of fixed-np's false-positive suspects), and the 10-NN "
    "readout runs on probed-list candidates only. The centroid "
    "count ADAPTS to corpus size: K = floor(sqrt((3n) div 10)) "
    "centroids, the argmin of total work assign(nK) + "
    "probe(sample*nprobe*n/K) at sample=10%. At a FIXED nprobe "
    "both stages scale O(n^1.5), never O(n^2); the ADAPTIVE "
    "np = c*sqrt(K) spends the saved exponent on accuracy — probe "
    "work becomes ~n^1.75 (the round-10 collision law measured on "
    "the MNN sibling: candidate rows are exactly sample*np*n/K, "
    "and holding precision flat costs ~half the collision budget "
    "per corpus decade) — still strictly below the exact twin's "
    "n^2 (a fixed centroid set "
    "would put the whole growth into list size: the first cut of "
    "this query used the 10 per-label centroids and measured "
    "SLOWER than the exact twin at 10x, 91.8s vs ~71s). Centroids "
    f"are drawn deterministically on both engines: vec_id's md5 "
    f"mod {KNN_SEL_GRID} under a threshold of ceil(grid*K/n) — no "
    "global sort, no trained state; at 100 TB the same rule yields "
    "sqrt(N) random-data-point centroids (IVF-flat seeding) and "
    "the assign stays a bounded broadcast. The exact twin remains "
    "registered as the labeled quadratic oracle baseline (the "
    "dedup_embedding_cosine / mutual_nearest_neighbors_bucketed "
    "contract). The candidate stage is a PLAIN cid equi-join — the "
    "probe set is 10% of the corpus and may never carry a broadcast "
    "hint (it grows linearly with n); AQE upgrades it to a broadcast "
    "at runtime only when the measured sample is small. At the "
    "default KNN_CRANK=1 the lists are disjoint and the candidate "
    "stage is dedup-free by construction; the round-11 measured "
    "crank frontier (see KNN_CRANK) exposes IVF multi-assignment as "
    "the audit's accuracy dial (SPARK_GRAFT_KNN_CRANK, "
    "oracle-mirrored; crank>1 adds a value-deterministic pair "
    "dedup). Measured: oracle parity green at "
    "sf0.001/0.01/0.1 AND the 10x corpus; suspect-set agreement vs "
    "the exact twin recall 0.935/0.935/0.957, precision "
    "0.956/0.935/0.952 (at 10x both engines agree the replica "
    "corpus is clean: exact flags 0 suspects, bucketed 2); wall "
    "1.5s at sf0.1 and 7.4s at 10x vs the exact twin's ~71s — the "
    "sqrt-list asymptotics visible one decade up.",
)
def label_knn_disagreement_bucketed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from kinesis_analytics_demo_spark.caching import tracked_persist

    emb = _t(spark, sf_dir, "embeddings")
    # mn = fallback centroid (min vec_id): the probabilistic md5 draw
    # can come up empty for small non-empty corpora, silently emptying
    # the audit (ADVICE r8). Riding mn on the same 1-row stats agg
    # keeps the plan's only SinglePartition exchange on the partial
    # count (the pinned allowlisted idiom).
    # persisted (ADVICE r9): sel feeds two independent broadcasts
    # (full sel into the centroid draw, sel.np into assign) — without
    # the persist each broadcast re-runs the full-corpus count scan
    sel = tracked_persist(
        emb.agg(
            F.count(F.lit(1)).alias("n"), F.min("vec_id").alias("mn")
        )
        .select(
            "n",
            "mn",
            # k >= 1 floor (the MNN sibling's rule): without it n <= 3
            # gives k=0 -> thr=0 -> empty centroid draw -> a silently
            # empty audit while the exact twin returns rows (ADVICE r8)
            F.greatest(
                F.floor(F.sqrt(F.expr("CAST((n * 3) div 10 AS DOUBLE)"))),
                F.lit(1).cast("bigint"),
            ).alias("k"),
        )
        # greatest(n, 1): empty corpus -> empty result, not ANSI
        # div-by-zero (ADVICE r8)
        .select(
            F.expr(
                f"({KNN_SEL_GRID} * k + n - 1) div greatest(n, 1)"
            ).alias("thr"),
            # adaptive probe count (see KNN_NP_COEF note): np = 3 at
            # every test SF; at the 0.6 coefficient, 6 at 10x and 10
            # at 100x
            F.greatest(
                F.lit(KNN_NPROBE).cast("bigint"),
                F.ceil(
                    F.lit(KNN_NP_COEF) * F.sqrt(F.col("k").cast("double"))
                ),
            ).alias("np"),
            "mn",
        )
    )
    cent = (
        emb.crossJoin(F.broadcast(sel))
        .filter(
            (
                H.md5_long(F.col("vec_id").cast("string")) % KNN_SEL_GRID
                < F.col("thr")
            )
            | (F.col("vec_id") == F.col("mn"))
        )
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    )
    # both the probe set (broadcast collect) and the list side of the
    # candidate join consume assign — persist so the n x K assign
    # cosines run once
    assign = tracked_persist(
        emb.crossJoin(F.broadcast(cent))
        .crossJoin(F.broadcast(sel.select("np")))
        .select(
            "vec_id",
            "label",
            "embedding",
            "cid",
            "np",
            V.cosine(F.col("embedding"), F.col("cv")).alias("csim"),
        )
        .withColumn(
            "crank",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(
                    F.desc("csim"), F.col("cid")
                )
            ),
        )
    )
    lists = assign.filter(F.col("crank") <= KNN_CRANK).select(
        "vec_id", "label", "embedding", "cid"
    )
    q = assign.filter(
        (F.col("vec_id") % KNN_SAMPLE_MOD == 0)
        & (F.col("crank") <= F.col("np"))
    ).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qe"),
        F.col("label").alias("qlabel"),
        "cid",
    )
    # NO broadcast hint on q: the audit sample is 10% of the corpus x
    # nprobe (embeddings included) — it grows LINEARLY with the corpus
    # and cannot broadcast at the 100 TB target. A plain cid equi-join
    # co-partitions both sides on the list id (the MNN twin's shape);
    # AQE is still free to pick a broadcast at runtime when the actual
    # sample is small, which is the size-gate the scale contract wants
    # (VERDICT r8 item 2).
    cand = (
        lists.join(q, "cid")
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "qlabel",
            F.col("label").alias("nlabel"),
            "vec_id",
            V.cosine(F.col("embedding"), F.col("qe")).alias("sim"),
        )
    )
    if KNN_CRANK > 1:
        # multi-assignment can route one neighbor to a query through
        # several probed lists; duplicate rows are bit-identical
        # (same deterministic cosine of the same vectors), so the
        # pair-key dedup is value-deterministic
        cand = cand.dropDuplicates(["qid", "vec_id"])
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.col("vec_id"))
    top = cand.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= KNN_K
    )
    dis = F.sum(F.when(F.col("nlabel") != F.col("qlabel"), 1).otherwise(0))
    return top.groupBy(
        F.col("qid").alias("vec_id"), F.col("qlabel").alias("label")
    ).agg(
        dis.cast("bigint").alias("n_disagree"),
        F.round(dis / float(KNN_K), 4).alias("frac_disagree"),
        (dis >= KNN_SUSPECT_FRAC * KNN_K).alias("suspect"),
    )


# --------------------------------------------------- l-diversity audit
L_DIVERSITY = 3  #: minimum distinct sensitive values per QI group


@register(
    "l_diversity_audit",
    oracle=f"""
    WITH g AS (
        SELECT event_type, date_trunc('hour', ts) AS qi_hour,
               count(*) AS n,
               count(DISTINCT CAST(floor(value / 50) AS INT))
                   AS n_sensitive
        FROM events GROUP BY 1, 2)
    SELECT event_type, qi_hour,
           CAST(n AS BIGINT) AS n,
           CAST(n_sensitive AS BIGINT) AS n_sensitive
    FROM g WHERE n_sensitive < {L_DIVERSITY}
    """,
    doc="l-diversity audit (Machanavajjhala et al. 2007), the "
    "complement of k-anonymity: quasi-identifier groups (event_type, "
    "hour) whose SENSITIVE attribute (coarse value band) takes fewer "
    "than l=3 distinct values — a group can be large enough for k "
    "yet still leak the sensitive value. One distinct-count "
    "aggregate over the QI projection.",
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    g = (
        ev.select(
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("qi_hour"),
            F.floor(F.col("value") / 50).cast("int").alias("sv"),
        )
        .groupBy("event_type", "qi_hour")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("sv").alias("n_sensitive"),
        )
    )
    return g.filter(F.col("n_sensitive") < L_DIVERSITY)


# ------------------------------------------------ iterative BPE training
BPE_MERGES = 5  #: merge iterations for the demo trainer


def _merge_pair_expr(symbols, a: str, b: str, merged: str):
    """Greedy left-to-right merge of adjacent (a, b) inside a symbol
    array, as a pure fold: append each symbol unless the accumulator
    ends with `a` and the symbol is `b`, in which case replace the
    tail with the merged symbol. Overlaps resolve leftmost-first —
    the BPE convention."""
    return F.aggregate(
        symbols,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == a)
            & (s == b),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(spark: SparkSession, sf_dir: str, n_merges: int = BPE_MERGES):
    """Train ``n_merges`` BPE merges over the documents corpus.
    Returns (merge_table_rows, final_word_table DataFrame).

    Scale design: BPE trains on the DISTINCT-WORD frequency table,
    not the raw corpus — one corpus scan aggregates (word, n), and
    every iteration runs on that compact table (O(vocab) rows, not
    O(tokens)). Per iteration: one weighted pair-count aggregate
    (map-side combined, the bpe_pair_counts shape generalized to
    current symbols) picks the argmax pair on the driver (one 2-row
    collect — loop control, the k-means precedent), then one
    zero-shuffle fold rewrites the symbol arrays. The word table is
    re-persisted per iteration and lineage stays flat."""
    from kinesis_analytics_demo_spark.caching import tracked_persist

    docs = _t(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(H.words(F.col("text"))).alias("w"))
        # zero-length tokens (split on leading/trailing whitespace)
        # would hit Spark's descending sequence(1, 0) == [1, 0] and
        # fabricate syms == ["", ""] — a phantom ("", "") pair that
        # can outweigh a real merge. Same guard as bpe_pair_counts.
        .filter(F.length("w") >= 1)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "w",  # kept so bpe_encode_tokens can join words back on
            F.transform(
                F.sequence(F.lit(1), F.length("w")),
                lambda i: F.col("w").substr(i, F.lit(1)),
            ).alias("syms"),
            "n",
        )
    )
    words = tracked_persist(words)
    merges = []
    for it in range(n_merges):
        pairs = words.select(
            F.explode(
                F.when(
                    F.size("syms") >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size("syms") - 1),
                        lambda i: F.struct(
                            F.element_at(F.col("syms"), i).alias("a"),
                            F.element_at(F.col("syms"), i + 1).alias("b"),
                        ),
                    ),
                ).otherwise(F.array().cast(
                    "array<struct<a:string,b:string>>"
                ))
            ).alias("p"),
            "n",
        )
        top = (
            pairs.groupBy("p.a", "p.b")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), F.col("a"), F.col("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        merged = a + b
        merges.append((it, a, b, merged, cnt))
        nxt = tracked_persist(
            words.select(
                "w",
                _merge_pair_expr(F.col("syms"), a, b, merged).alias("syms"),
                "n",
            )
        )
        nxt.count()  # materialize before dropping the parent
        words.unpersist()
        words = nxt
    return merges, words


@register(
    "bpe_train_merges",
    oracle=None,  # iterative, data-dependent merge choices — not
    # SQL-expressible; rows-only driver check + a pure-Python golden
    # reference pinned in tests/test_curation2.py
    doc="Iterative BPE tokenizer training (5 merges): each round "
    "counts adjacent symbol pairs over the DISTINCT-WORD frequency "
    "table (one corpus scan total; iterations touch O(vocab) rows), "
    "picks the argmax pair with a (count desc, pair) tiebreak via a "
    "2-row driver collect, and rewrites symbol arrays with a "
    "zero-shuffle greedy leftmost fold. Emits (iteration, left, "
    "right, merged, pair_count).",
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges, _ = bpe_train(spark, sf_dir)
    return spark.createDataFrame(
        merges, "iteration int, left string, right string, "
        "merged string, pair_count bigint",
    )


@register(
    "bpe_encode_tokens",
    oracle=None,  # depends on the iteratively-trained merge table —
    # not SQL-expressible; rows-only driver check + the pure-Python
    # golden in tests/test_curation2.py pins per-doc values
    doc="The tokenizer-APPLY half of the BPE story (train exists as "
    "bpe_train_merges): encode every document with the trained merge "
    "table and report per-doc subword counts. Because merges rewrite "
    "the DISTINCT-WORD table, encoding is a join, not a re-run: "
    "explode docs to words, hash-join the (word -> merged symbol "
    "count) vocabulary — O(vocab) rows, broadcastable at small "
    "vocabularies, plain hash join at web scale — and aggregate per "
    "doc. Emits (doc_id, n_words, n_tokens_bpe, tokens_per_word); "
    "tokens_per_word < 1x char count shows the learned compression.",
)
def bpe_encode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, words = bpe_train(spark, sf_dir)
    vocab = words.select("w", F.size("syms").alias("n_sub"))
    docs = _t(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(H.words(F.col("text"))).alias("w")
    ).filter(F.length("w") >= 1)
    return (
        tok.join(vocab, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sub").alias("n_tokens_bpe"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_tokens_bpe",
            F.round(
                F.col("n_tokens_bpe").cast("double") / F.col("n_words"), 6
            ).alias("tokens_per_word"),
        )
    )


# -------------------------------------------- output shard rebalancing
SHARD_TARGET_BYTES = 4096  #: demo shard size (production: 256-512 MB)


@register(
    "corpus_rebalance_shards",
    oracle=f"""
    WITH h AS (
        SELECT doc_id, n_chars,
               {H.sql_md5_long('doc_id::VARCHAR')} AS hk
        FROM documents),
    c AS (
        SELECT doc_id, n_chars, hk,
               SUM(n_chars) OVER (ORDER BY hk, doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING) AS cum_before
        FROM h)
    SELECT doc_id,
           CAST(floor(COALESCE(cum_before, 0) / {SHARD_TARGET_BYTES})
                AS BIGINT) AS shard_id
    FROM c
    """,
    doc="Size-balanced output shard assignment — the final write step "
    "of a corpus pipeline: docs stream in deterministic md5-of-id "
    "order (a reproducible shuffle) and a running byte prefix-sum "
    "assigns shard_id = floor(bytes_before / target), so every shard "
    "lands within one document of the target size regardless of "
    "input skew. The ordered window runs on the (doc_id, n_chars) "
    "projection only — raw text never reaches the sort; on a cluster "
    "this is a range partition + per-partition prefix sums over "
    "partition totals (the standard distributed scan shape).",
)
def corpus_rebalance_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id",
        "n_chars",
        H.md5_long(F.col("doc_id").cast("string")).alias("hk"),
    )
    w = (
        Window.orderBy("hk", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return h.select(
        "doc_id",
        F.floor(
            F.coalesce(F.sum("n_chars").over(w), F.lit(0))
            / SHARD_TARGET_BYTES
        )
        .cast("bigint")
        .alias("shard_id"),
    )


# ----------------------------------------- DP noisy-count release
DP_EPSILON = 1.0  #: privacy budget for the count release
DP_SENSITIVITY = 1.0  #: adding/removing one event changes a count by 1
_DP_SCALE = DP_SENSITIVITY / DP_EPSILON  #: Laplace scale b
_HASH_SPACE = float(1 << 60)


@register(
    "dp_noisy_counts",
    oracle=f"""
    WITH c AS (
        SELECT event_type, count(*) AS n FROM events GROUP BY 1),
    u AS (
        SELECT event_type, n,
               ({H.sql_md5_long("'dp1_' || event_type")}
                / {_HASH_SPACE!r}) - 0.5 AS u
        FROM c)
    SELECT event_type,
           CAST(n AS BIGINT) AS true_count,
           ROUND(n - {_DP_SCALE!r}
                     * sign(u) * ln(1 - 2 * abs(u)), 6)
               AS noisy_count
    FROM u
    """,
    doc="Differentially-private count release (Dwork et al. 2006): "
    "per-group counts + Laplace(sensitivity/epsilon) noise via "
    "inverse-CDF sampling, noise = -b*sign(u)*ln(1-2|u|) with u "
    "uniform on (-0.5, 0.5). The uniform here is a SEEDED md5 hash "
    "of the group key so the release is oracle-checkable — a "
    "production release swaps in true randomness (one line); the "
    "mechanism, sensitivity accounting, and plan shape (one hash "
    "aggregate, noise as a scalar post-map) are exactly what ships. "
    "true_count is returned alongside ONLY for the oracle gate — a "
    "real release never emits it.",
)
def dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    c = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    u = (
        H.md5_long(F.concat(F.lit("dp1_"), F.col("event_type")))
        / F.lit(_HASH_SPACE)
    ) - 0.5
    noise = (
        F.lit(-_DP_SCALE)
        * F.signum(u)
        * F.log(1 - 2 * F.abs(u))
    )
    return c.select(
        "event_type",
        F.col("n").cast("bigint").alias("true_count"),
        F.round(F.col("n") + noise, 6).alias("noisy_count"),
    )
