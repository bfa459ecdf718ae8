"""Vector math over ``array<float>`` embedding columns — pure JVM
expressions (zip_with + aggregate fold), no UDFs.

Cross-engine determinism: both the Spark expressions and the DuckDB
oracle fragments accumulate in float64, left-to-right over the array —
verified bit-identical (see tests/test_llm_ops.py).

Scale: a dot product per row is whole-stage-codegen'd; brute-force
top-k over N vectors x Q queries is O(N*Q*d) scan work with NO shuffle
until the final per-query top-k (a 10-row-per-query aggregate).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# ---------------------------------------------------------------- DuckDB side
def sql_dot(a: str, b: str, dim: int) -> str:
    return (
        f"list_sum([CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) "
        f"for i in generate_series(1, {dim})])"
    )


def sql_cosine(a: str, b: str, dim: int) -> str:
    return (
        f"({sql_dot(a, b, dim)} / "
        f"(sqrt({sql_dot(a, a, dim)}) * sqrt({sql_dot(b, b, dim)})))"
    )
