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


def test_gate_rejects_hugeint_oracle(spark, oracle_con):
    """Regression (round-4 hash-fails): a bare integer SUM(CASE...) is
    HUGEINT in DuckDB — pandas materializes it as float while Spark
    emits int64, so the driver's value-hash diverges even though
    fetchall() values compare equal. The local gate must reject it."""
    import pyspark.sql.functions as F

    from tests.conftest import assert_result_types_compatible

    df = spark.range(3).select(
        F.sum(F.when(F.col("id") > 0, 1).otherwise(0)).alias("n_pos")
    )
    bad = oracle_con.sql(
        "SELECT sum(CASE WHEN x > 0 THEN 1 ELSE 0 END) AS n_pos "
        "FROM (VALUES (0), (1), (2)) t(x)"
    )
    with pytest.raises(AssertionError, match="HUGEINT"):
        assert_result_types_compatible(df, bad)
    good = oracle_con.sql(
        "SELECT CAST(sum(CASE WHEN x > 0 THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_pos FROM (VALUES (0), (1), (2)) t(x)"
    )
    assert_result_types_compatible(df, good)


def test_gate_rejects_int_float_drift(spark, oracle_con):
    """An oracle typed DOUBLE against a Spark int64 column (or vice
    versa) hashes differently at the driver — the gate must flag the
    class mismatch even when the numeric values are equal."""
    import pyspark.sql.functions as F

    from tests.conftest import assert_result_types_compatible

    df = spark.range(1).select(F.lit(5).cast("bigint").alias("v"))
    drift = oracle_con.sql("SELECT 5.0::DOUBLE AS v")
    with pytest.raises(AssertionError, match="result-type drift"):
        assert_result_types_compatible(df, drift)


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs = e.queries()
    osql = e.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 5
