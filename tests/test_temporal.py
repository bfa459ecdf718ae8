"""Unit tests for the temporal join operators (as-of join, range
join) — edge semantics the sf0.01 oracle parity run may not hit."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.operators.temporal import asof_join


def _ts(minute: int, second: int = 0):
    return datetime(2024, 1, 1, 0, minute, second)


def test_asof_join_edges(spark):
    left = spark.createDataFrame(
        [
            (1, _ts(0), "before-any-right"),  # no prior right row -> null
            (1, _ts(5), "equal-ts"),          # right row at exactly ts -> match
            (1, _ts(9), "between"),           # most recent prior (t=5), not t=10
            (2, _ts(9), "other-key"),         # key isolation: only key 2 rows
        ],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(5), 50.0),
            (1, _ts(10), 100.0),
            (2, _ts(1), 7.0),
        ],
        "user_id long, ts timestamp, v double",
    )
    out = asof_join(left, right, on="user_id", ts="ts", value_cols=["v"])
    got = {r.tag: r.asof_v for r in out.collect()}
    assert got == {
        "before-any-right": None,
        "equal-ts": 50.0,
        "between": 50.0,
        "other-key": 7.0,
    }
    # left cardinality preserved (it's a LEFT as-of join)
    assert out.count() == left.count()


def test_asof_join_single_shuffle_plan(spark):
    """The whole point of the union+window formulation: the physical
    plan must contain exactly one Exchange (hash by key) and no
    nested-loop / cartesian join."""
    left = spark.createDataFrame([(1, _ts(1), "x")], "user_id long, ts timestamp, tag string")
    right = spark.createDataFrame([(1, _ts(0), 1.0)], "user_id long, ts timestamp, v double")
    out = asof_join(left, right, on="user_id", ts="ts", value_cols=["v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
    assert plan.count("Exchange hashpartitioning") == 1
