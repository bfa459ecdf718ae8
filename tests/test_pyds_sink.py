"""jsonl_audit writer: atomic commit with manifest reconciliation,
no partial files, streaming per-batch manifests."""

from __future__ import annotations

import json
import os
import time

import pytest

from kinesis_analytics_demo_spark.sinks.pyds_sink import register_jsonl_audit


def _manifest_total(path, name="_manifest.json"):
    with open(os.path.join(path, name)) as fh:
        m = json.load(fh)
    return m["total_rows"], m["files"]


def test_batch_write_manifest_reconciles(spark, tmp_path):
    register_jsonl_audit(spark)
    out = str(tmp_path / "out")
    df = spark.range(1000).selectExpr("id", "id * 2 AS doubled")
    df.repartition(4).write.format("jsonl_audit").option("path", out).mode(
        "append"
    ).save()
    total, files = _manifest_total(out)
    assert total == 1000
    # every manifest file exists, no temp leftovers, counts add up
    n = 0
    for e in files:
        p = os.path.join(out, e["file"])
        assert os.path.exists(p)
        with open(p) as fh:
            rows = [json.loads(line) for line in fh]
        assert len(rows) == e["rows"]
        n += len(rows)
    assert n == 1000
    assert not [f for f in os.listdir(out) if f.endswith(".tmp")]


def test_streaming_write_per_batch_manifests(spark, tmp_path):
    from kinesis_analytics_demo_spark.sources.pyds import register_stock_ticks

    register_jsonl_audit(spark)
    register_stock_ticks(spark)
    out = str(tmp_path / "stream_out")
    stream = (
        spark.readStream.format("stock_ticks")
        .option("rows_per_batch", 60)
        .option("n_partitions", 2)
        .load()
    )
    q = (
        stream.writeStream.format("jsonl_audit")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            manifests = [
                f for f in os.listdir(out) if f.startswith("_manifest-")
            ] if os.path.exists(out) else []
            if len(manifests) >= 2:
                break
            time.sleep(0.5)
        else:
            pytest.fail("no streaming manifests appeared")
    finally:
        q.stop()
    manifests = sorted(f for f in os.listdir(out) if f.startswith("_manifest-"))
    manifested = set()
    for mf in manifests:
        total, files = _manifest_total(out, mf)
        assert total == 60, (mf, total)
        for e in files:
            assert os.path.exists(os.path.join(out, e["file"]))
            manifested.add(e["file"])
    # reader-visibility invariant: every VISIBLE data file is
    # manifest-committed (dot-prefixed temps from a batch aborted by
    # q.stop() are hidden from readers and swept by the next commit)
    visible = {f for f in os.listdir(out) if f.endswith(".jsonl")}
    assert visible == manifested, (visible - manifested, manifested - visible)


def _visible_rows(out):
    rows = []
    for f in sorted(os.listdir(out)):
        if f.endswith(".jsonl"):
            with open(os.path.join(out, f)) as fh:
                rows.extend(json.loads(line) for line in fh)
    return rows


def test_streaming_replayed_batch_is_idempotent(tmp_path):
    """A micro-batch replayed after commit() but before the checkpoint
    offset commit must replace — not duplicate — its output: final
    names are attempt-unique, the manifest swap is the commit point,
    and the prior attempt's files are reclaimed after it, so visible
    files == manifested files always holds post-commit."""
    from pyspark.sql import Row

    from kinesis_analytics_demo_spark.sinks.pyds_sink import (
        _JsonlStreamWriter,
    )

    out = str(tmp_path / "out")
    w = _JsonlStreamWriter({"path": out})

    def run_attempt(partitions):
        msgs = [w.write(iter(rows)) for rows in partitions]
        w.commit(msgs, 7)

    rows = [Row(a=1), Row(a=2), Row(a=3)]
    run_attempt([rows[:2], rows[2:]])
    first_files = {f for f in os.listdir(out) if f.endswith(".jsonl")}
    assert len(first_files) == 2
    # replay, same partitioning: new attempt-unique names, prior
    # attempt's files fully reclaimed after the manifest swap
    run_attempt([rows[:2], rows[2:]])
    second_files = {f for f in os.listdir(out) if f.endswith(".jsonl")}
    assert not (second_files & first_files)  # no name reuse across attempts
    total, files = _manifest_total(out, "_manifest-00000007.json")
    assert total == 3
    assert second_files == {e["file"] for e in files}
    assert sorted(r["a"] for r in _visible_rows(out)) == [1, 2, 3]

    # replay with a DIFFERENT partitioning: stale names from the prior
    # manifest are deleted, no orphan duplicates survive
    run_attempt([rows[:1], rows[1:2], rows[2:]])
    total, files = _manifest_total(out, "_manifest-00000007.json")
    assert total == 3
    visible = {f for f in os.listdir(out) if f.endswith(".jsonl")}
    assert visible == {e["file"] for e in files}
    assert sorted(r["a"] for r in _visible_rows(out)) == [1, 2, 3]


def test_replay_crash_before_manifest_swap_preserves_prior_commit(
    tmp_path, monkeypatch
):
    """ADVICE r5: with deterministic same-name finals, a replay with a
    different partitioning that crashed after some renames but before
    the manifest swap left old-manifest names holding NEW-split
    content — a mixed-content window. Attempt-unique names close it:
    crash anywhere before the swap leaves every file the current
    manifest references byte-for-byte intact, and the next successful
    commit sweeps the crashed attempt's orphans."""
    from pyspark.sql import Row

    from kinesis_analytics_demo_spark.sinks import pyds_sink
    from kinesis_analytics_demo_spark.sinks.pyds_sink import (
        _JsonlStreamWriter,
    )

    out = str(tmp_path / "out")
    w = _JsonlStreamWriter({"path": out})
    rows = [Row(a=1), Row(a=2), Row(a=3)]

    msgs = [w.write(iter(rows[:2])), w.write(iter(rows[2:]))]
    w.commit(msgs, 7)
    committed = {e["file"] for e in _manifest_total(out, "_manifest-00000007.json")[1]}
    baseline = {
        f: open(os.path.join(out, f)).read() for f in committed
    }

    # replay with a different partitioning, crashing AT the manifest
    # swap (data-file renames use os.replace; the swap uses os.rename)
    real_rename = os.rename

    def boom(src, dst):
        raise OSError("injected crash at manifest swap")

    monkeypatch.setattr(pyds_sink.os, "rename", boom)
    msgs = [
        w.write(iter(rows[:1])),
        w.write(iter(rows[1:2])),
        w.write(iter(rows[2:])),
    ]
    with pytest.raises(OSError, match="injected crash"):
        w.commit(msgs, 7)
    monkeypatch.setattr(pyds_sink.os, "rename", real_rename)

    # the committed manifest and every file it lists are untouched
    for f, content in baseline.items():
        assert open(os.path.join(out, f)).read() == content
    total, files = _manifest_total(out, "_manifest-00000007.json")
    assert total == 3
    assert {e["file"] for e in files} == committed
    # manifest-view rows are exactly the committed batch
    manifest_rows = []
    for e in files:
        with open(os.path.join(out, e["file"])) as fh:
            manifest_rows.extend(json.loads(line) for line in fh)
    assert sorted(r["a"] for r in manifest_rows) == [1, 2, 3]

    # the next successful replay commits cleanly and sweeps the
    # crashed attempt's orphans: visible == manifested again
    msgs = [w.write(iter(rows[:2])), w.write(iter(rows[2:]))]
    w.commit(msgs, 7)
    total, files = _manifest_total(out, "_manifest-00000007.json")
    assert total == 3
    visible = {f for f in os.listdir(out) if f.endswith(".jsonl")}
    assert visible == {e["file"] for e in files}
    assert sorted(r["a"] for r in _visible_rows(out)) == [1, 2, 3]
