"""Golden-output tests (SURVEY.md §5 strategy 3): checked-in expected
results for the reference's two headline queries + the arg-min/max
aggregate at sf0.001. Catches silent semantic drift that the live
DuckDB oracle (which would drift in lockstep with a query-text change)
cannot."""

from __future__ import annotations

import os

import pytest

from kinesis_analytics_demo_spark.plans.registry import all_queries
from tests.conftest import SF_SMALL

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
GOLDEN = ["candlestick_tumbling", "sliding_window_min", "argminmax_events"]


@pytest.mark.parametrize("name", GOLDEN)
def test_matches_golden(spark, name):
    df = all_queries()[name].fn(spark, SF_SMALL)
    cols = df.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    got_header = ",".join(cols[i] for i in order)
    got_rows = sorted(
        "\t".join(str(r[i]) for i in order)
        for r in [tuple(row) for row in df.collect()]
    )
    with open(os.path.join(GOLDEN_DIR, f"{name}.tsv")) as fh:
        lines = fh.read().splitlines()
    assert got_header == lines[0]
    assert got_rows == lines[1:]
