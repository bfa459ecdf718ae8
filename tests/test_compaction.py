"""File-sink compaction: small files in, few range-clustered files
out, byte-identical data, streaming-manifest guard."""

from __future__ import annotations

import os

import pytest

from kinesis_analytics_demo_spark.sinks.compaction import (
    compact_parquet_dir,
    plan_compaction,
)
from kinesis_analytics_demo_spark.session import read_table
from tests.conftest import SF_MEDIUM


def _rows(spark, path):
    return sorted(
        tuple(r) for r in spark.read.parquet(path).select("event_id").collect()
    )


def test_compact_unpartitioned(spark, tmp_path):
    path = str(tmp_path / "events_small_files")
    events = read_table(spark, SF_MEDIUM, "events")
    events.repartition(64).write.parquet(path)
    before = plan_compaction(path, target_file_bytes=1 << 40)
    assert before.n_files == 64
    want = _rows(spark, path)
    after = compact_parquet_dir(spark, path, target_file_bytes=1 << 40)
    assert after.n_files == 1  # everything fits one target-sized file
    assert _rows(spark, path) == want


def test_compact_partitioned_with_sort_order(spark, tmp_path):
    path = str(tmp_path / "events_by_type")
    events = read_table(spark, SF_MEDIUM, "events")
    events.repartition(16).write.partitionBy("event_type").parquet(path)
    want = _rows(spark, path)
    plan = compact_parquet_dir(
        spark, path, target_file_bytes=1 << 40, sort_by=["ts"]
    )
    assert len(plan.partitions) > 1  # per-partition rewrite happened
    assert _rows(spark, path) == want
    # partition column survives the rewrite
    assert "event_type" in spark.read.parquet(path).columns
    # range clustering: per-file ts ranges within a partition dir are
    # disjoint (boundary ties aside), so footer stats prune files
    import duckdb

    con = duckdb.connect()
    for part in plan.partitions:
        pdir = os.path.join(path, part)
        spans = []
        for f in sorted(os.listdir(pdir)):
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                lo, hi = con.execute(
                    f"SELECT min(ts), max(ts) FROM read_parquet('{pdir}/{f}')"
                ).fetchone()
                spans.append((lo, hi))
        spans.sort()
        for (_, hi), (lo, _) in zip(spans, spans[1:]):
            assert hi <= lo


def test_compact_refuses_streaming_manifest(spark, tmp_path):
    path = str(tmp_path / "stream_owned")
    events = read_table(spark, SF_MEDIUM, "events").limit(10)
    events.write.parquet(path)
    os.makedirs(os.path.join(path, "_spark_metadata"))
    with pytest.raises(ValueError, match="_spark_metadata"):
        compact_parquet_dir(spark, path)
