"""Query plan registry: every operator from SURVEY.md §2 is declared
here as a (Spark DataFrame builder, DuckDB oracle SQL) pair consumed by
``__spark_entry__.py`` and the test suite."""

from kinesis_analytics_demo_spark.plans.registry import (
    QuerySpec,
    all_queries,
    get_query,
    register,
)

__all__ = ["QuerySpec", "all_queries", "get_query", "register"]
