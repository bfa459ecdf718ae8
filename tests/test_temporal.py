"""Unit tests for the temporal join operators (as-of join, range
join) — edge semantics the sf0.01 oracle parity run may not hit."""

from __future__ import annotations

from datetime import datetime, timedelta

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


def test_interval_join_left_unmatched_not_duplicated(spark):
    """VERDICT r2 item 4 regression pin: under how='left' an interval
    with NO in-window point must appear EXACTLY once (null-extended),
    even when same-key points exist in both of its candidate buckets
    but fail the exact range re-check — the point-side explode puts
    each point in two buckets, and a naive interval-side explode (or a
    dropped dedup) would emit the unmatched interval once per bucket."""
    from datetime import datetime, timedelta

    from kinesis_analytics_demo_spark.operators.temporal import interval_join

    base = datetime(2024, 1, 1)
    W = 60
    intervals = spark.createDataFrame(
        [(base + timedelta(seconds=300), "A", 1)],
        "e_ts timestamp, e_key string, iid long",
    )
    # same key, one point just BEFORE the window and one just AFTER it:
    # both land in a candidate bucket of the interval, neither matches
    points = spark.createDataFrame(
        [
            (base + timedelta(seconds=299), "A", 10, 1),
            (base + timedelta(seconds=360), "A", 20, 2),
        ],
        "p_ts timestamp, p_key string, v long, pid long",
    )
    rows = interval_join(
        intervals, points, "e_key", "p_key", "e_ts", "p_ts", W, how="left"
    ).collect()
    assert len(rows) == 1
    assert rows[0].iid == 1 and rows[0].pid is None


def test_concurrent_sessions_peak_hand_verified(spark, tmp_path):
    """Sweep-line semantics on a hand-built corpus: three overlapping
    windows peak at 3; a window starting exactly when another ends
    (closed-open) does NOT overlap it; the first instant of the peak
    is reported."""
    from kinesis_analytics_demo_spark.operators.temporal import (
        CONCURRENCY_WINDOW_SEC,
        concurrent_sessions_peak,
    )

    adjacent = datetime(2024, 1, 1) + timedelta(seconds=CONCURRENCY_WINDOW_SEC)
    rows = [
        # click: events at t=0s, 60s, 120s -> all three open at 120s
        (1, 10, "click", _ts(0, 0), 0.0),
        (2, 11, "click", _ts(1, 0), 0.0),
        (3, 12, "click", _ts(2, 0), 0.0),
        # view: [0, w) then [w, 2w) — adjacency, never concurrent
        (4, 20, "view", _ts(0, 0), 0.0),
        (5, 21, "view", adjacent, 0.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
        "ts timestamp, value double",
    )
    path = str(tmp_path)
    df.write.mode("overwrite").parquet(path + "/events.parquet")
    out = {
        r["event_type"]: (r["peak_concurrent"], r["first_peak_ts"])
        for r in concurrent_sessions_peak(spark, path).collect()
    }
    assert out["click"] == (3, _ts(2, 0))
    assert out["view"] == (1, _ts(0, 0))


def test_concurrent_sessions_peak_bucket_boundary(spark, tmp_path):
    """Two-level carry correctness: windows spanning an hour-bucket
    boundary must count into the next bucket's concurrency via the
    carry-in, not be dropped at the bucket edge."""
    from kinesis_analytics_demo_spark.operators.temporal import (
        concurrent_sessions_peak,
    )

    rows = [
        # opens 00:58:00, still active 01:01:00 (bucket 2's territory)
        (1, 1, "click", datetime(2024, 1, 1, 0, 58, 0), 0.0),
        (2, 2, "click", datetime(2024, 1, 1, 1, 1, 0), 0.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
        "ts timestamp, value double",
    )
    path = str(tmp_path)
    df.write.mode("overwrite").parquet(path + "/events.parquet")
    [r] = concurrent_sessions_peak(spark, path).collect()
    assert r["peak_concurrent"] == 2
    assert r["first_peak_ts"] == datetime(2024, 1, 1, 1, 1, 0)


def test_interval_coverage_hand_verified(spark, tmp_path):
    """Union-length semantics: overlapping windows merge into one
    segment; an adjacent [a,b)/[b,c) pair fuses seamlessly (still one
    segment, no double count); a distant window opens a second
    segment."""
    from kinesis_analytics_demo_spark.operators.temporal import (
        CONCURRENCY_WINDOW_SEC,
        interval_coverage_seconds,
    )

    w = CONCURRENCY_WINDOW_SEC
    base = datetime(2024, 1, 1)
    rows = [
        # overlap: [0, w) and [60, 60+w) -> one segment of w+60 s
        (1, 1, "click", base, 0.0),
        (2, 2, "click", base + timedelta(seconds=60), 0.0),
        # distant: [7200, 7200+w) -> second segment of w s
        (3, 3, "click", base + timedelta(seconds=7200), 0.0),
        # adjacency: [0, w) then [w, 2w) -> ONE fused segment of 2w s
        (4, 4, "view", base, 0.0),
        (5, 5, "view", base + timedelta(seconds=w), 0.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
        "ts timestamp, value double",
    )
    path = str(tmp_path)
    df.write.mode("overwrite").parquet(path + "/events.parquet")
    out = {
        r["event_type"]: (r["n_segments"], r["covered_sec"])
        for r in interval_coverage_seconds(spark, path).collect()
    }
    assert out["click"] == (2, float(w + 60 + w))
    assert out["view"] == (1, float(2 * w))
