"""Write-Audit-Publish: a clean batch promotes atomically, a dirty
batch stays quarantined in staging with its violation report, and the
published location never holds dirty data."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.session import read_table
from kinesis_analytics_demo_spark.sinks.wap import write_audit_publish
from tests.conftest import SF_SMALL


def _events_audit(spark):
    """Audit: no negative values, accepted event types — the
    expectation shapes, restricted to the staged batch."""

    def audit(staged_dir):
        df = spark.read.parquet(staged_dir)
        neg = df.agg(
            F.sum(F.when(F.col("value") < 0, 1).otherwise(0)).alias("v")
        ).select(
            F.lit("value_range").alias("check"),
            F.col("v").cast("bigint").alias("n_violations"),
            (F.col("v") == 0).alias("passed"),
        )
        types = df.agg(
            F.sum(
                F.when(
                    ~F.col("event_type").isin(
                        "view", "click", "purchase", "signup", "error"
                    ),
                    1,
                ).otherwise(0)
            ).alias("v")
        ).select(
            F.lit("accepted_values").alias("check"),
            F.col("v").cast("bigint").alias("n_violations"),
            (F.col("v") == 0).alias("passed"),
        )
        return neg.unionByName(types)

    return audit


def test_clean_batch_publishes(spark, tmp_path):
    events = read_table(spark, SF_SMALL, "events")
    table = str(tmp_path / "table")
    out = write_audit_publish(
        spark, events, table, _events_audit(spark), batch_name="b1"
    )
    assert out["published"] is True
    assert os.path.isdir(os.path.join(table, "b1"))
    assert not os.path.exists(os.path.join(table, "_staging", "b1"))
    # the promoted batch reads back whole, audit report travels with it
    assert spark.read.parquet(os.path.join(table, "b1")).count() == events.count()
    with open(os.path.join(table, "b1", "_audit.json")) as fh:
        assert json.load(fh)["published"] is True


def test_dirty_batch_quarantined(spark, tmp_path):
    events = read_table(spark, SF_SMALL, "events")
    dirty = events.withColumn(
        "value",
        F.when(F.col("event_id") % 97 == 0, -5.0).otherwise(F.col("value")),
    )
    table = str(tmp_path / "table")
    out = write_audit_publish(
        spark, dirty, table, _events_audit(spark), batch_name="b1"
    )
    assert out["published"] is False
    # nothing observable at the published location
    assert not os.path.exists(os.path.join(table, "b1"))
    staged = os.path.join(table, "_staging", "b1")
    assert os.path.isdir(staged)
    with open(os.path.join(staged, "_audit.json")) as fh:
        rep = json.load(fh)
    assert rep["published"] is False
    failed = [c for c in rep["checks"] if not c["passed"]]
    assert [c["check"] for c in failed] == ["value_range"]
    assert failed[0]["n_violations"] > 0


def test_clean_batch_publishes_past_quarantined_batch(spark, tmp_path):
    """A dirty batch left quarantined in _staging must not poison the
    audit of a later clean batch (the audit is scoped per-batch)."""
    events = read_table(spark, SF_SMALL, "events")
    dirty = events.withColumn(
        "value",
        F.when(F.col("event_id") % 97 == 0, -5.0).otherwise(F.col("value")),
    )
    table = str(tmp_path / "table")
    out1 = write_audit_publish(
        spark, dirty, table, _events_audit(spark), batch_name="b1"
    )
    assert out1["published"] is False
    assert os.path.isdir(os.path.join(table, "_staging", "b1"))
    # clean batch staged AFTER the quarantine: must publish green
    out2 = write_audit_publish(
        spark, events, table, _events_audit(spark), batch_name="b2"
    )
    assert out2["published"] is True
    assert os.path.isdir(os.path.join(table, "b2"))
    assert all(c["passed"] for c in out2["report"])
    # and its row count is ONLY its own batch (no double-count of b1)
    assert (
        spark.read.parquet(os.path.join(table, "b2")).count()
        == events.count()
    )


def test_double_publish_rejected(spark, tmp_path):
    events = read_table(spark, SF_SMALL, "events")
    table = str(tmp_path / "table")
    write_audit_publish(spark, events, table, _events_audit(spark), "b1")
    with pytest.raises(ValueError, match="already published"):
        write_audit_publish(spark, events, table, _events_audit(spark), "b1")
