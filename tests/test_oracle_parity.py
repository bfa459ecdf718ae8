"""Oracle-parity gate: every registered query with an oracle runs on
Spark and DuckDB at sf0.01 and must match exactly (row count, columns,
values) — a local emulation of the driver's CORRECTNESS check."""

from __future__ import annotations

import pytest

from kinesis_analytics_demo_spark.plans.registry import all_queries
from tests.conftest import SF_MEDIUM, assert_matches_oracle

QUERIES = all_queries()
WITH_ORACLE = sorted(n for n, s in QUERIES.items() if s.oracle is not None)
WITHOUT_ORACLE = sorted(n for n, s in QUERIES.items() if s.oracle is None)


@pytest.fixture(autouse=True)
def _release_cached_intermediates():
    """Free tracked persisted intermediates after every query so the
    full-registry run doesn't accumulate cached tables (ADVICE r2)."""
    yield
    from kinesis_analytics_demo_spark.caching import release_tracked

    release_tracked()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, oracle_con, name):
    spec = QUERIES[name]
    df = spec.fn(spark, SF_MEDIUM)
    assert_matches_oracle(df, oracle_con, spec.oracle)


@pytest.mark.parametrize("name", WITHOUT_ORACLE)
def test_query_runs(spark, name):
    """Rows-only check for non-SQL-expressible operators."""
    spec = QUERIES[name]
    df = spec.fn(spark, SF_MEDIUM)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs = e.queries()
    osql = e.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 5
