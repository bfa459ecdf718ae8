"""Custom stateful streaming operators via ``applyInPandasWithState``
— the escape hatch SURVEY.md §2/§7 prescribes for semantics Spark's
built-in windowed aggregations can't express (here: order-dependent
recursive state).

``ema_stateful`` computes a per-key exponential moving average
(ema_i = alpha*v_i + (1-alpha)*ema_{i-1}) across micro-batches: the
carried GroupState is the last EMA value, rows within each batch are
processed in (ts, tiebreak) order, so the stream result equals the
batch fold over the full history (tests assert this equivalence).

The batch twin ``ema_per_key`` (operators side, registered with a
DuckDB oracle) computes the same recursion as an ordered array fold —
``aggregate(collect_sorted_values)`` on Spark, ``list_reduce`` on
DuckDB — both left-to-right in f64, hence bit-identical.

Scale notes: state per key is ONE double + one timestamp (bounded);
the shuffle is the standard groupBy hash exchange; Arrow batches
stream through the pandas function without materializing a key's
whole history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EMA_ALPHA = 0.3

_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("ema", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType([T.StructField("last_ema", T.DoubleType())])


def _make_ema_fn(alpha: float, ts_col: str, value_col: str, tiebreak_col: str):
    """Closure (shipped by value to executors — no package import on
    workers) that folds each micro-batch's rows into the carried EMA."""

    def ema_fn(key, pdf_iter, state: GroupState):
        import pandas as pd

        (k,) = key
        last = state.get[0] if state.exists else None
        outs = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values([ts_col, tiebreak_col], kind="mergesort")
            emas = []
            for v in pdf[value_col]:
                last = v if last is None else alpha * v + (1.0 - alpha) * last
                emas.append(last)
            outs.append(
                pd.DataFrame(
                    {
                        "key": k,
                        "ts": pdf[ts_col],
                        "value": pdf[value_col],
                        "ema": emas,
                    }
                )
            )
        state.update((last,))
        yield pd.concat(outs) if outs else pd.DataFrame(
            columns=["key", "ts", "value", "ema"]
        )

    return ema_fn


def ema_stateful(
    df: DataFrame,
    key_col: str = "ticker",
    ts_col: str = "utc",
    value_col: str = "price",
    tiebreak_col: str | None = None,
    alpha: float = EMA_ALPHA,
    watermark: str | None = None,
) -> DataFrame:
    """Per-key EMA over a streaming (or batch-tested) DataFrame.

    NB: exact streaming/batch equivalence additionally requires event-
    time-ordered arrival across micro-batches (replay order); with
    out-of-order batches the EMA folds in arrival order within the
    watermark — the documented semantics of recursive state.
    """
    tiebreak = tiebreak_col or value_col
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    grouped = df.groupBy(key_col)
    return grouped.applyInPandasWithState(
        _make_ema_fn(alpha, ts_col, value_col, tiebreak),
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
