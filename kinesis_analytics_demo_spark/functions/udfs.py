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


# ------------------------------------------------------- UDTF surface
#: tokens per chunk for the UDTF demonstrator (mirrors the codegen'd
#: doc_chunks_fixed semantics so a DuckDB oracle exists).
UDTF_CHUNK_TOKENS = 10


def make_word_chunks_udtf():
    """Python UDTF (Spark 4 table function): text -> one row per
    fixed-size word chunk. Built inside a function so the class body
    ships by value (cloudpickle) to workers."""
    from pyspark.sql.functions import udtf

    k = UDTF_CHUNK_TOKENS

    @udtf(returnType="chunk_idx: int, n_tokens: int, chunk_text: string")
    class WordChunks:
        def eval(self, text):
            if text is None:
                return
            toks = text.split()
            for i in range(0, len(toks), k):
                chunk = toks[i : i + k]
                yield i // k, len(chunk), " ".join(chunk)

    return WordChunks


# ---------------------------------------------------- UDAF surface
def make_value_spread_udaf():
    """Grouped-aggregate pandas UDF (Arrow UDAF): (max-min)/median of
    a double column — a robust dispersion measure. numpy's linear-
    interpolation percentile is the same a+(b-a)*frac formula as
    DuckDB quantile_cont / Spark percentile, so the result stays
    oracle-exact."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(T.DoubleType())
    def value_spread(v: pd.Series) -> float:
        import numpy as np

        a = v.to_numpy(dtype=np.float64)
        med = float(np.percentile(a, 50))
        return float((a.max() - a.min()) / med)

    return value_spread


# ------------------------------------------- registered query surface
from pyspark.sql import DataFrame  # noqa: E402

from kinesis_analytics_demo_spark.plans.registry import register  # noqa: E402
from kinesis_analytics_demo_spark.session import read_table as _t  # noqa: E402


@register(
    "udtf_word_chunks",
    oracle=f"""
    WITH t AS (SELECT doc_id, string_split_regex(text, '\\s+') AS toks
               FROM documents),
    c AS (
        SELECT doc_id,
               unnest([struct_pack(
                   chunk_idx := j - 1,
                   n_tokens := len(toks[(j - 1) * {UDTF_CHUNK_TOKENS} + 1
                                        : j * {UDTF_CHUNK_TOKENS}]),
                   chunk_text := array_to_string(
                       toks[(j - 1) * {UDTF_CHUNK_TOKENS} + 1
                            : j * {UDTF_CHUNK_TOKENS}], ' '))
                   for j in generate_series(1,
                       CAST(ceil(len(toks) / {UDTF_CHUNK_TOKENS}.0) AS INT))])
                   AS ch
        FROM t
    )
    SELECT doc_id,
           CAST(ch.chunk_idx AS INT) AS chunk_idx,
           CAST(ch.n_tokens AS INT) AS n_tokens,
           ch.chunk_text AS chunk_text
    FROM c
    """,
    doc="Python UDTF surface (Spark 4 table functions): a LATERAL "
    "word-chunker called from SQL — the user-defined-table-function "
    "half of the U1 surface (the reference registers none; the "
    "engine exposes the full register path). Semantics mirror the "
    "codegen'd doc_chunks_fixed so the oracle is plain SQL; rows "
    "stream through the python worker per input row — the documented "
    "trade versus the JVM chunker, which stays the production path.",
)
def udtf_word_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.udtf.register("word_chunks", make_word_chunks_udtf())
    docs = _t(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("documents_udtf_src")
    return spark.sql(
        "SELECT d.doc_id, c.chunk_idx, c.n_tokens, c.chunk_text "
        "FROM documents_udtf_src d, LATERAL word_chunks(d.text) c"
    )


@register(
    "udaf_value_spread",
    oracle="""
    SELECT event_type,
           ROUND((max(value) - min(value)) / quantile_cont(value, 0.5), 6)
               AS spread
    FROM events GROUP BY event_type
    """,
    doc="Grouped-aggregate pandas UDF (Arrow UDAF): per-key "
    "(max-min)/median dispersion. numpy's linear percentile is the "
    "same a+(b-a)*frac formula as quantile_cont, so even the python "
    "aggregate stays oracle-exact. Scale: grouped-agg pandas UDFs "
    "materialize each group in the worker (no partial aggregation) — "
    "fine for bounded per-key cardinality, and the reason built-in "
    "percentile/min/max remain the default for open-keyed data.",
)
def udaf_value_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    ev = _t(spark, sf_dir, "events")
    spread = make_value_spread_udaf()
    return ev.groupBy("event_type").agg(
        F.round(spread("value"), 6).alias("spread")
    )
