"""Semantic pins for last-touch attribution and perceptual-hash
near-dup: window/exclusion rules on a hand-built event log, and the
pigeonhole recall guarantee of the 4x15-bit banding. (Cross-engine
parity is covered by test_oracle_parity.)"""

from __future__ import annotations

import datetime

from kinesis_analytics_demo_spark.operators.analytics import (
    attribution_last_touch,
)
from kinesis_analytics_demo_spark.operators.multimodal import (
    PHASH_BANDS,
    PHASH_BITS,
    PHASH_HAM_MAX,
)


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    df.write.mode("overwrite").parquet(str(tmp_path) + "/events.parquet")
    return str(tmp_path)


def test_attribution_rules(spark, tmp_path):
    t0 = datetime.datetime(2024, 3, 1, 12, 0, 0)
    s = datetime.timedelta(seconds=1)
    d = datetime.timedelta(days=1)
    rows = [
        # user 1: view -> click -> purchase: credited to the CLICK
        (1, t0, 1, "view", 1.0, "{}"),
        (2, t0 + s, 1, "click", 1.0, "{}"),
        (3, t0 + 2 * s, 1, "purchase", 1.0, "{}"),
        # user 2: purchase with NO prior touch: excluded
        (4, t0, 2, "purchase", 1.0, "{}"),
        # user 3: view 8 days before purchase: outside window, excluded
        (5, t0, 3, "view", 1.0, "{}"),
        (6, t0 + 8 * d, 3, "purchase", 1.0, "{}"),
        # user 4: touch AFTER the purchase does not count
        (7, t0, 4, "purchase", 1.0, "{}"),
        (8, t0 + s, 4, "click", 1.0, "{}"),
        # user 5: view exactly 7 days before: inside (<=) the window
        (9, t0, 5, "view", 1.0, "{}"),
        (10, t0 + 7 * d, 5, "purchase", 1.0, "{}"),
    ]
    path = _write_events(spark, tmp_path, rows)
    got = {
        r["conversion_id"]: (
            r["touch_event_id"],
            r["touch_type"],
            r["seconds_to_convert"],
        )
        for r in attribution_last_touch(spark, path).collect()
    }
    assert got == {
        3: (2, "click", 1),
        10: (9, "view", 7 * 24 * 3600),
    }


def test_phash_banding_geometry():
    """The pigeonhole guarantee behind recall 1.0: with 4 bands of 15
    bits, any pair within hamming PHASH_HAM_MAX must agree on at
    least one full band (ham_max < n_bands)."""
    assert PHASH_BITS % PHASH_BANDS == 0
    assert PHASH_HAM_MAX < PHASH_BANDS


def test_phash_lsh_equals_bruteforce(spark):
    """Banded candidates + verify must return EXACTLY the brute-force
    hamming<=t pair set (recall 1.0 by pigeonhole, precision 1.0 by
    the verify) — checked on the real corpus at the smallest SF."""
    from itertools import combinations

    from kinesis_analytics_demo_spark.operators.multimodal import (
        _make_phash_kernel,
        dedup_image_phash,
        with_binary_payload,
    )
    from kinesis_analytics_demo_spark.session import read_table
    from pyspark.sql import types as T
    from tests.conftest import SF_SMALL

    docs = read_table(spark, SF_SMALL, "documents")
    h = (
        with_binary_payload(docs)
        .select("doc_id", "payload")
        .mapInPandas(
            _make_phash_kernel(),
            schema=T.StructType(
                [
                    T.StructField("doc_id", T.LongType()),
                    T.StructField("ahash", T.LongType()),
                ]
            ),
        )
    )
    hashes = {r["doc_id"]: r["ahash"] for r in h.collect()}
    brute = {
        (a, b)
        for a, b in combinations(sorted(hashes), 2)
        if bin(hashes[a] ^ hashes[b]).count("1") <= PHASH_HAM_MAX
    }
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dedup_image_phash(spark, SF_SMALL).collect()
    }
    assert got == brute
    assert brute  # non-vacuous: the sf0.001 corpus has phash near-dups
