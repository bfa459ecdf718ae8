"""User-defined function surface (SURVEY.md §2 U1).

The reference registers no UDFs, but the engine exposes the full
surface for the extended scope: Arrow-vectorized ``pandas_udf``
registered into the session catalog so BOTH front-ends (DataFrame and
``spark.sql``) can call it.

``vector_norm`` is the demonstrator: the L2 norm of an
``array<float>`` embedding, accumulated dimension-by-dimension in
float64 (left-to-right) so the result is bit-identical to the JVM
fold in functions/vectors.py and the DuckDB oracle — proving the
pandas-UDF path can preserve the engine's determinism contract.

Scale: Arrow batches stream through the python worker; the kernel is
numpy-vectorized over whole batches (no per-row python). UDFs remain
the slow path versus JVM expressions — this module exists for
operations that genuinely need python (custom scientific code,
tokenizers), not as a default.
"""

# NB: no `from __future__ import annotations` here — pandas_udf infers
# the eval type from REAL type hints; stringified ones don't resolve.
import pandas as pd

from pyspark.sql import SparkSession
from pyspark.sql import types as T


def make_vector_norm_udf():
    """Build the Arrow-vectorized norm kernel as a closure (workers
    never import this package)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.DoubleType())
    def vector_norm(embs: pd.Series) -> pd.Series:
        import numpy as np

        def one(v):
            if v is None:  # SQL semantics: NULL in -> NULL out
                return None
            a = np.asarray(v, dtype=np.float64)
            acc = 0.0
            for x in a:  # LTR fold == F.aggregate == DuckDB list_sum
                acc += x * x
            return float(np.sqrt(acc))

        return embs.map(one)

    return vector_norm


def register_udfs(spark: SparkSession) -> None:
    """Register the engine's UDFs into the session catalog
    (``spark.udf.register`` — usable from spark.sql)."""
    spark.udf.register("vector_norm", make_vector_norm_udf())
