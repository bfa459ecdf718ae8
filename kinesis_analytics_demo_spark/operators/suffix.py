"""Character-level repeated-substring audit via a capped-depth
suffix ordering — the ExactSubstr memorization/dedup diagnostic of
"Deduplicating Training Data Makes Language Models Better" (Lee et
al., ACL 2022), re-expressed as a distributed sort instead of a
suffix automaton.

The classical tool is a corpus suffix array + adjacent-LCP scan:
any substring repeated anywhere in the corpus shows up as two
adjacent suffixes sharing a long common prefix. A full suffix array
needs unbounded-depth comparisons; capping the comparison depth at
``SFX_DEPTH`` keeps every key fixed-width — which is exactly what
makes the construction distributable as ONE range-partitionable
sort of bounded strings (the suffix-array use-case collapses to the
engine's native sort machinery; no prefix-doubling loop needed).

Detection floor: only repeats of length >= ``SFX_MIN_REPEAT`` are
reported, so suffixes can be hash-partitioned by their first
``SFX_MIN_REPEAT`` characters — two suffixes witnessing a
qualifying repeat NECESSARILY share that prefix, hence land in the
same partition, hence are adjacent in the per-partition order. The
global sort therefore shuffles each partition independently; there
is no cross-partition adjacency to reconcile (the reason the floor
and the bucket width are the SAME constant).

LCP of two capped suffixes is computed by binary lifting — a
6-step descending-powers-of-two fold (32,16,8,4,2,1 sums to the
63-char cap): at each step, advance the matched length by ``step``
iff the next ``step`` characters agree. The fold state is a SCALAR
integer on both engines (the DuckDB list_reduce struct-state trap
does not apply), and every operation is exact string/int work — no
float discipline needed anywhere in this operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.plans.registry import register
from kinesis_analytics_demo_spark.session import read_table as _t

SFX_DEPTH = 63  #: LCP cap = 32+16+8+4+2+1 (binary-lifting steps)
SFX_MIN_REPEAT = 16  #: report floor AND partition-prefix width
_STEPS = (32, 16, 8, 4, 2, 1)


def _lcp_sql(a: str, b: str) -> str:
    """Exact LCP of two <=63-char strings as one scalar-state fold."""
    steps = ",".join(str(s) for s in _STEPS)
    return (
        f"least(list_reduce([0,{steps}], (acc, st) -> acc + "
        f"CASE WHEN substr({a}, acc + 1, st) = substr({b}, acc + 1, st) "
        f"THEN st ELSE 0 END), length({a}), length({b}))"
    )


def _lcp_col(a, b):
    """Spark twin of :func:`_lcp_sql` — same fold, same scalar state."""
    folded = F.aggregate(
        F.array(*[F.lit(s) for s in _STEPS]),
        F.lit(0),
        lambda acc, st: acc
        + F.when(
            a.substr(acc + 1, st) == b.substr(acc + 1, st), st
        ).otherwise(F.lit(0)),
    )
    return F.least(folded, F.length(a), F.length(b))


@register(
    "repeated_substring_audit",
    oracle=f"""
    WITH s0 AS (
        SELECT doc_id, unnest(generate_series(1, length(text))) AS pos,
               text
        FROM documents WHERE length(text) >= {SFX_MIN_REPEAT}),
    s AS (
        SELECT doc_id, pos, substr(text, pos, {SFX_DEPTH}) AS sfx
        FROM s0 WHERE length(text) - pos + 1 >= {SFX_MIN_REPEAT}),
    w AS (
        SELECT doc_id, pos, sfx,
               COALESCE(lag(sfx) OVER win, '') AS psfx,
               lag(doc_id) OVER win AS pdoc,
               COALESCE(lead(sfx) OVER win, '') AS nsfx,
               lead(doc_id) OVER win AS ndoc
        FROM s
        WINDOW win AS (PARTITION BY substr(sfx, 1, {SFX_MIN_REPEAT})
                       ORDER BY sfx, doc_id, pos)),
    l AS (
        SELECT doc_id, pdoc, ndoc,
               {_lcp_sql('sfx', 'psfx')} AS lp,
               {_lcp_sql('sfx', 'nsfx')} AS ln_
        FROM w)
    SELECT doc_id,
           CAST(MAX(GREATEST(lp, ln_)) AS INT) AS max_repeat_len,
           CAST(COUNT(*) FILTER (GREATEST(lp, ln_) >= {SFX_MIN_REPEAT})
                AS BIGINT) AS n_repeat_positions,
           CAST(MAX(CASE WHEN (lp >= {SFX_MIN_REPEAT} AND pdoc <> doc_id)
                           OR (ln_ >= {SFX_MIN_REPEAT} AND ndoc <> doc_id)
                     THEN 1 ELSE 0 END) AS INT) AS has_cross_doc
    FROM l GROUP BY doc_id
    HAVING MAX(GREATEST(lp, ln_)) >= {SFX_MIN_REPEAT}
    """,
    doc=f"Character-level repeated-substring audit (ExactSubstr, Lee "
    f"et al. ACL'22): for every document, the length of its longest "
    f"substring (capped at {SFX_DEPTH}) that occurs ANYWHERE else in "
    f"the corpus — itself included — provided it is at least "
    f"{SFX_MIN_REPEAT} chars, plus how many of its suffix positions "
    "witness such a repeat and whether any repeat partner lies in a "
    "DIFFERENT document (the contamination/memorization flag, vs "
    "mere internal boilerplate). Construction: one suffix per "
    "character position, keys capped at the depth, sorted within "
    f"{SFX_MIN_REPEAT}-char-prefix buckets; adjacent-suffix LCP by a "
    "6-step binary-lifting fold with scalar integer state. All "
    "exact string/integer work — no float discipline required. "
    "Scale: qualifying repeats share the bucket prefix by "
    "construction, so the sort is embarrassingly partition-parallel "
    "(hash on the prefix, sort locally); suffix keys are fixed-width "
    f"so the shuffle is O(corpus_chars x {SFX_DEPTH}) bytes — the "
    "reason the depth cap exists. The word-n-gram twin "
    "(dedup_repeated_ngram_spans) catches token-level spans; this "
    "one catches sub-token and whitespace-insensitive literals.",
)
def repeated_substring_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    s = (
        docs.filter(F.length("text") >= SFX_MIN_REPEAT)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.length("text"))).alias("pos"),
            "text",
        )
        .filter(F.length("text") - F.col("pos") + 1 >= SFX_MIN_REPEAT)
        .select(
            "doc_id",
            "pos",
            F.col("text").substr(F.col("pos"), F.lit(SFX_DEPTH)).alias("sfx"),
        )
    )
    win = Window.partitionBy(
        F.substring(F.col("sfx"), 1, SFX_MIN_REPEAT)
    ).orderBy("sfx", "doc_id", "pos")
    w = s.select(
        "doc_id",
        "pos",
        "sfx",
        F.coalesce(F.lag("sfx").over(win), F.lit("")).alias("psfx"),
        F.lag("doc_id").over(win).alias("pdoc"),
        F.lead("doc_id").over(win).alias("ndoc"),
    )
    # LCP is symmetric, so row i's next-neighbour LCP equals row i+1's
    # previous-neighbour LCP: ln_ = lead(lp) over the same window. That
    # halves the interpreted 6-step binary-lifting folds (the per-row
    # compute hotspot) — one fold per row instead of two — and the
    # second Window reuses the first one's exchange AND sort (the spec
    # is identical and the sort columns survive the projection). Last
    # row per partition: lead(lp) is NULL where lcp(sfx, '') was 0 —
    # coalesce restores the 0; the (sfx, doc_id, pos) order is total,
    # so the neighbour pairing is deterministic.
    lp_once = w.select(
        "doc_id",
        "pos",
        "sfx",
        "pdoc",
        "ndoc",
        _lcp_col(F.col("sfx"), F.col("psfx")).alias("lp"),
    )
    l = lp_once.select(
        "doc_id",
        "pdoc",
        "ndoc",
        "lp",
        F.coalesce(F.lead("lp").over(win), F.lit(0)).alias("ln_"),
    )
    best = F.greatest(F.col("lp"), F.col("ln_"))
    cross = (
        (F.col("lp") >= SFX_MIN_REPEAT) & (F.col("pdoc") != F.col("doc_id"))
    ) | (
        (F.col("ln_") >= SFX_MIN_REPEAT) & (F.col("ndoc") != F.col("doc_id"))
    )
    return (
        l.groupBy("doc_id")
        .agg(
            F.max(best).cast("int").alias("max_repeat_len"),
            F.sum(
                F.when(best >= SFX_MIN_REPEAT, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_repeat_positions"),
            F.max(F.when(cross, 1).otherwise(0))
            .cast("int")
            .alias("has_cross_doc"),
        )
        .filter(F.col("max_repeat_len") >= SFX_MIN_REPEAT)
    )
