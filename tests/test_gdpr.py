"""Targeted deletion: doomed keys vanish, everything else is
byte-identical, and untouched partitions' FILES are not rewritten."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.session import read_table
from kinesis_analytics_demo_spark.sinks.gdpr import delete_keys_partitioned
from tests.conftest import SF_SMALL


def _file_set(path):
    out = {}
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                out[p] = os.path.getmtime(p)
    return out


def test_delete_rewrites_only_affected_partitions(spark, tmp_path):
    events = read_table(spark, SF_SMALL, "events")
    path = str(tmp_path / "lake")
    events.write.partitionBy("event_type").parquet(path)

    before = spark.read.parquet(path)
    doomed_users = [3, 7]
    # pick a user that only has rows in SOME event types to prove
    # untouched partitions survive byte-identically
    doomed_rows = before.filter(F.col("user_id").isin(doomed_users))
    affected_types = {
        r["event_type"]
        for r in doomed_rows.select("event_type").distinct().collect()
    }
    n_before = before.count()
    n_doomed = doomed_rows.count()
    assert n_doomed > 0
    # collect the expected survivor multiset BEFORE the rewrite (the
    # pre-delete DataFrame's file index goes stale afterwards)
    exp = sorted(
        r["event_id"]
        for r in before.filter(~F.col("user_id").isin(doomed_users)).collect()
    )
    files_before = _file_set(path)

    audit = delete_keys_partitioned(
        spark, path, key_col="user_id", keys=doomed_users,
        partition_col="event_type",
    )
    assert set(audit) == affected_types
    assert sum(audit.values()) == n_doomed

    after = spark.read.parquet(path)
    assert after.filter(F.col("user_id").isin(doomed_users)).count() == 0
    assert after.count() == n_before - n_doomed
    # survivors identical (multiset of event ids)
    got = sorted(r["event_id"] for r in after.collect())
    assert got == exp

    # untouched partitions keep their original files (same path+mtime)
    files_after = _file_set(path)
    for p, mtime in files_before.items():
        ptype = [seg for seg in p.split(os.sep) if seg.startswith("event_type=")]
        etype = ptype[0].split("=", 1)[1] if ptype else None
        if etype is not None and etype not in affected_types:
            assert p in files_after and files_after[p] == mtime, p


def test_delete_all_keys_of_one_partition(spark, tmp_path):
    """When EVERY row of a partition is doomed, there are no survivor
    rows for it, dynamic overwrite leaves it untouched — the directory
    itself must be deleted, or the erasure silently fails for exactly
    the subjects concentrated in that partition."""
    rows = [
        # partition 'error' holds ONLY users 1 and 2 → fully doomed
        (1, "error", 10.0), (2, "error", 11.0), (1, "error", 12.0),
        # partition 'view' holds users 1, 2 AND 3 → partially doomed
        (1, "view", 20.0), (2, "view", 21.0), (3, "view", 22.0),
        # partition 'click' holds only user 3 → untouched
        (3, "click", 30.0),
    ]
    df = spark.createDataFrame(rows, ["user_id", "event_type", "value"])
    path = str(tmp_path / "lake")
    df.write.partitionBy("event_type").parquet(path)

    audit = delete_keys_partitioned(
        spark, path, key_col="user_id", keys=[1, 2],
        partition_col="event_type",
    )
    assert audit == {"error": 3, "view": 2}

    # the fully-doomed partition's directory is GONE
    assert not os.path.isdir(os.path.join(path, "event_type=error"))
    after = spark.read.parquet(path)
    got = sorted(
        (r["user_id"], r["event_type"], r["value"]) for r in after.collect()
    )
    assert got == [(3, "click", 30.0), (3, "view", 22.0)]


def test_delete_missing_keys_is_noop(spark, tmp_path):
    events = read_table(spark, SF_SMALL, "events")
    path = str(tmp_path / "lake")
    events.write.partitionBy("event_type").parquet(path)
    files_before = _file_set(path)
    audit = delete_keys_partitioned(
        spark, path, key_col="user_id", keys=[10**12],
        partition_col="event_type",
    )
    assert audit == {}
    assert _file_set(path) == files_before
