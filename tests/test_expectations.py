"""Expectations suite: all-green on the driver data, and violations
actually detected on a corrupted batch (the gate must be able to
fail)."""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

from kinesis_analytics_demo_spark.plans.registry import get_query
from tests.conftest import SF_SMALL


def test_clean_data_passes_all(spark):
    rows = get_query("data_quality_expectations").fn(spark, SF_SMALL).collect()
    assert len(rows) == 7
    assert all(r["passed"] for r in rows)


def test_corrupted_batch_fails_the_right_checks(spark, tmp_path):
    """Copy sf0.001, break an FK, a document length, and an event
    value — exactly those checks must flip to failed."""
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        src = os.path.join(SF_SMALL, f"{t}.parquet")
        if os.path.exists(src):
            shutil.copy(src, os.path.join(tmp_path, f"{t}.parquet"))

    # orders: one row with a custkey no customer has
    op = os.path.join(tmp_path, "orders.parquet")
    t = pq.read_table(op)
    d = t.to_pydict()
    d["o_custkey"][0] = 99999999
    pq.write_table(pa.table(d, schema=t.schema), op)

    # documents: break the n_chars consistency on one row
    dp = os.path.join(tmp_path, "documents.parquet")
    t = pq.read_table(dp)
    d = t.to_pydict()
    d["n_chars"][0] = d["n_chars"][0] + 7
    pq.write_table(pa.table(d, schema=t.schema), dp)

    # events: one negative value
    ep = os.path.join(tmp_path, "events.parquet")
    t = pq.read_table(ep)
    d = t.to_pydict()
    d["value"][0] = -1.5
    pq.write_table(pa.table(d, schema=t.schema), ep)

    rows = {
        (r["table_name"], r["check"]): r
        for r in get_query("data_quality_expectations")
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert not rows[("orders", "foreign_key")]["passed"]
    assert rows[("orders", "foreign_key")]["n_violations"] == 1
    assert not rows[("documents", "consistent")]["passed"]
    assert not rows[("events", "value_range")]["passed"]
    # untouched checks still pass
    assert rows[("orders", "unique")]["passed"]
    assert rows[("events", "accepted_values")]["passed"]


def test_reconcile_conservation_and_detection(spark):
    """The planted corruption must be detected and the conservation
    law n_base - n_replica == n_missing - n_extra must hold on every
    flagged partition (drops explain the count gap; perturbations
    show up 1:1 as missing+extra)."""
    from kinesis_analytics_demo_spark.operators.expectations import (
        reconcile_partition_checksums,
    )
    from tests.conftest import SF_SMALL

    rows = reconcile_partition_checksums(spark, SF_SMALL).collect()
    assert rows, "planted ~2% corruption must flag some partitions"
    for r in rows:
        assert r["n_base"] - r["n_replica"] == r["n_missing"] - r["n_extra"], r
        assert r["n_missing"] > 0 or r["n_extra"] > 0, r
