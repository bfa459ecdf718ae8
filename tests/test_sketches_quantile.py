"""Histogram quantile sketch: error bounded by one bin width vs the
exact continuous percentile."""

from __future__ import annotations

from kinesis_analytics_demo_spark.plans.registry import get_query
from tests.conftest import SF_MEDIUM


def test_histogram_quantile_within_one_bin(spark, oracle_con):
    est = {
        (r["event_type"], r["q"]): r["estimate"]
        for r in get_query("quantile_histogram_events")
        .fn(spark, SF_MEDIUM)
        .collect()
    }
    binw = oracle_con.sql(
        "SELECT (max(value) - min(value)) / 256 FROM events"
    ).fetchone()[0]
    exact = oracle_con.sql(
        """SELECT event_type,
                  quantile_cont(value, 0.5) AS p50,
                  quantile_cont(value, 0.9) AS p90,
                  quantile_cont(value, 0.99) AS p99
           FROM events GROUP BY 1"""
    ).fetchall()
    for et, p50, p90, p99 in exact:
        for q, ex in ((0.5, p50), (0.9, p90), (0.99, p99)):
            assert abs(est[(et, q)] - ex) <= binw, (et, q, est[(et, q)], ex)
