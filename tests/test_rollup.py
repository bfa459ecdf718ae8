"""Hierarchical rollup: the cascade is lossless (oracle computes each
grain directly from raw) and scans the raw table exactly once."""

from __future__ import annotations

from kinesis_analytics_demo_spark.caching import release_tracked
from kinesis_analytics_demo_spark.operators.rollup import hierarchical_rollup
from kinesis_analytics_demo_spark.plans.registry import get_query
from kinesis_analytics_demo_spark.session import read_table
from tests.conftest import SF_MEDIUM, assert_matches_oracle


def test_rollup_matches_direct_oracle(spark, oracle_con):
    spec = get_query("rollup_hierarchy_events")
    try:
        assert_matches_oracle(spec.fn(spark, SF_MEDIUM), oracle_con, spec.oracle)
    finally:
        release_tracked()


def test_rollup_single_raw_scan(spark):
    """The coarser grains must re-aggregate partials, not rescan raw
    events: the analyzed plan contains exactly ONE parquet relation
    of the events table (the persisted finest level is shared)."""
    events = read_table(spark, SF_MEDIUM, "events")
    out = hierarchical_rollup(
        events, ts_col="ts", key_cols=["event_type"], value_col="value"
    )
    try:
        # After cache substitution every Union branch must bottom out
        # in an InMemoryRelation (a leaf node) — i.e. no branch reads
        # the parquet relation directly; the raw scan happens once,
        # inside the shared cached minute level.
        leaves = out._jdf.queryExecution().withCachedData().collectLeaves()
        names = [
            leaves.apply(i).getClass().getSimpleName()
            for i in range(leaves.size())
        ]
        assert names and all("InMemoryRelation" in n for n in names), names
    finally:
        release_tracked()


def test_rollup_grain_consistency(spark):
    """Each coarser grain's totals equal the sum of its children —
    the invariant incremental refresh relies on."""
    events = read_table(spark, SF_MEDIUM, "events")
    out = hierarchical_rollup(
        events, ts_col="ts", key_cols=["event_type"], value_col="value"
    )
    try:
        rows = out.collect()
    finally:
        release_tracked()
    by_grain = {}
    for r in rows:
        by_grain.setdefault(r["grain"], []).append(r)
    for grain in ("minute", "hour", "day"):
        total = sum(r["n_events"] for r in by_grain[grain])
        assert total == sum(r["n_events"] for r in by_grain["minute"])
