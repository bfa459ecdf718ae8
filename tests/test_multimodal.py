"""Multimodal plumbing tests: stub decoders raise clearly, the binary
frame is typed correctly, and the mapInPandas path produces the
declared schema (Arrow batch contract)."""

from __future__ import annotations

import pytest

from kinesis_analytics_demo_spark.operators.multimodal import (
    decode_audio,
    decode_image,
    multimodal_binary_features,
    with_binary_payload,
)
from tests.conftest import SF_SMALL


def test_decode_stubs_raise():
    with pytest.raises(NotImplementedError, match="image decode stub"):
        decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError, match="audio decode stub"):
        decode_audio(b"RIFF")


def test_binary_frame_types(spark):
    from kinesis_analytics_demo_spark.session import read_table

    docs = read_table(spark, SF_SMALL, "documents")
    frame = with_binary_payload(docs)
    kinds = dict(frame.dtypes)
    assert kinds["payload"] == "binary"
    assert kinds["media_type"] == "string"


def test_map_in_pandas_schema_and_values(spark):
    out = multimodal_binary_features(spark, SF_SMALL)
    assert [f.name for f in out.schema.fields] == [
        "doc_id",
        "n_bytes",
        "content_md5",
        "first_byte",
    ]
    rows = out.orderBy("doc_id").limit(3).collect()
    assert all(r.n_bytes > 0 and len(r.content_md5) == 32 for r in rows)


def test_audio_fingerprint_short_and_empty_docs(spark):
    """Docs shorter than 3 energy windows (or empty) must yield zero
    fingerprints without tripping Spark's descending-sequence trap —
    and identical twins must pair with every shared fingerprint."""
    import pandas as pd

    from kinesis_analytics_demo_spark.operators import multimodal as M

    long_text = "the quick brown fox jumps over a lazy dog " * 8
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": ["", "ab", long_text, long_text],
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": [0, 2, len(long_text), len(long_text)],
        }
    )
    docs = spark.createDataFrame(pdf)
    decoded = (
        M.with_binary_payload(docs)
        .select("doc_id", "payload")
        .mapInPandas(M._make_audio_energy_kernel(), schema=M.AUDIO_SCHEMA)
    )
    by_id = {r["doc_id"]: r["energy"] for r in decoded.collect()}
    assert by_id[0] == []
    assert len(by_id[1]) == 1  # one partial window
    assert by_id[2] == by_id[3] and len(by_id[2]) == M.AF_STRIP // M.AF_WIN
