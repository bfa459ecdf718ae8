"""Streaming deduplication — the LLM-data dedup family applied to an
unbounded document stream.

Batch dedup (operators/dedup.py) explodes shingles and aggregates;
on a stream each document must be fingerprinted ROW-LOCALLY (no
cross-row aggregation before the dedup state), so the minhash runs as
array expressions over the document's own shingle array, and
``dropDuplicatesWithinWatermark`` keeps first-arrival winners with
state bounded by the watermark horizon.

Semantics: two documents collide iff ALL 16 minhash values match —
near-exact dedup (Jaccard ~ 1). For looser thresholds, run the batch
LSH pipeline over micro-batched archives; per-row banding with
``dropDuplicates`` on a single band would dedup at the band's
s-curve threshold instead.

Scale: state is one (signature, expiry) entry per UNIQUE in-horizon
document — the signature is 16 longs, never the text; the dedup
shuffle is on the md5 of the signature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.functions import hashing as H


def with_minhash_signature(
    df: DataFrame, text_col: str = "text", out_col: str = "minhash_sig"
) -> DataFrame:
    """Row-local minhash signature (md5 of the 16 permutation minima)
    — pure array expressions, streaming-safe. Documents too short to
    shingle (< 3 tokens) fall back to exact-identity md5(text), the
    same convention as the batch pipeline's sigs stage
    (operators/pipeline.py::_sql_pipeline_ctes) so batch and stream
    dedup agree on every document."""
    hashes = H.shingle_hashes(F.col(text_col))
    mins = H.minhash_columns(hashes)
    sig = F.when(
        F.size(hashes) > 0,
        F.md5(F.concat_ws(",", *[m.cast("string") for m in mins])),
    ).otherwise(F.md5(F.col(text_col)))
    return df.withColumn(out_col, sig)


def streaming_minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Drop near-exact duplicate documents from a stream: first
    arrival per minhash signature wins; duplicates arriving within the
    watermark horizon are suppressed, state expires beyond it."""
    sig_df = with_minhash_signature(df, text_col)
    if df.isStreaming:
        from kinesis_analytics_demo_spark.streaming.windows import ensure_event_time

        sig_df = ensure_event_time(sig_df, ts_col)
        return sig_df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            ["minhash_sig"]
        )
    return sig_df.dropDuplicates(["minhash_sig"])


def streaming_corpus_prep(
    df: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming twin of operators/pipeline.py::corpus_prep_pipeline:
    quality filter -> language filter -> near-exact dedup, on an
    unbounded document stream.

    The filters are the same row-local column expressions as the batch
    plan (stateless, run before any state is touched, so dedup state
    only holds SURVIVING documents). Dedup is the watermarked minhash
    signature (first arrival wins). Row-local array expressions are
    interpreted per element — acceptable here because a stream pays
    per-record anyway; batch archives should use the explode/aggregate
    plan in operators/pipeline.py.
    """
    from kinesis_analytics_demo_spark.operators.pipeline import (
        LANG_ID_THRESHOLD,
        QUALITY_THRESHOLD,
    )
    from kinesis_analytics_demo_spark.operators.text import EN_STOPWORDS

    toks = H.words(F.col(text_col))
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
    kept = df.filter(
        (quality >= QUALITY_THRESHOLD) & ((n_stop / n) >= LANG_ID_THRESHOLD)
    )
    return streaming_minhash_dedup(kept, text_col=text_col, ts_col=ts_col,
                                   watermark=watermark)
