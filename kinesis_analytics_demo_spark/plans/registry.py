"""Central query registry.

Each entry pairs a Spark DataFrame builder ``(spark, sf_dir) ->
DataFrame`` with an equivalent DuckDB oracle SQL string (or ``None``
for genuinely non-SQL-expressible operators — the driver then records
a weaker rows-only check).

Contract (from the driver): column names/aliases MUST match between
the Spark result and the oracle result; the comparison sorts columns
by name and value-hashes rows order-insensitively.

Determinism discipline: any aggregate over floating-point columns that
is sensitive to accumulation order (sum/avg of doubles) is computed in
DECIMAL on both sides and rounded before casting back to DOUBLE, so
results are bit-identical regardless of partitioning / AQE decisions.
min/max/count/arg_min-style aggregates are order-insensitive and need
no treatment.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: SparkQuery
    oracle: str | None  # DuckDB SQL over pre-registered table views
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: add a query to the registry."""

    def deco(fn: SparkQuery) -> SparkQuery:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def _load_all_modules() -> None:
    """Import every module that registers queries (idempotent)."""
    import kinesis_analytics_demo_spark.operators.dedup  # noqa: F401
    import kinesis_analytics_demo_spark.operators.multimodal  # noqa: F401
    import kinesis_analytics_demo_spark.operators.pipeline  # noqa: F401
    import kinesis_analytics_demo_spark.operators.relational  # noqa: F401
    import kinesis_analytics_demo_spark.operators.relational2  # noqa: F401
    import kinesis_analytics_demo_spark.operators.relational3  # noqa: F401
    import kinesis_analytics_demo_spark.operators.relational4  # noqa: F401
    import kinesis_analytics_demo_spark.operators.similarity  # noqa: F401
    import kinesis_analytics_demo_spark.operators.sketches  # noqa: F401
    import kinesis_analytics_demo_spark.operators.temporal  # noqa: F401
    import kinesis_analytics_demo_spark.operators.text  # noqa: F401
    import kinesis_analytics_demo_spark.operators.text2  # noqa: F401
    import kinesis_analytics_demo_spark.operators.training  # noqa: F401
    import kinesis_analytics_demo_spark.plans.reference_queries  # noqa: F401


def all_queries() -> dict[str, QuerySpec]:
    _load_all_modules()
    return dict(_REGISTRY)


def get_query(name: str) -> QuerySpec:
    _load_all_modules()
    return _REGISTRY[name]
