"""State API v2 (``transformWithStateInPandas``) operators — the
Spark 4 successor to ``applyInPandasWithState`` (streaming/stateful.py)
with typed named state, TTL, and timers.

``running_candlestick`` keeps a per-key cumulative OHLC (open = value
at earliest event time seen, close = at latest, plus min/max/count)
across micro-batches and emits the updated row for every key touched
by a batch — the unbounded-window version of the reference's tumbling
candlestick (reference flink/tumbling_window.py:179-198): same
aggregate family, but over the whole stream history instead of
1-minute buckets, which only a custom stateful operator can express
(Spark's built-in aggregation cannot emit mid-stream under append
mode without a window).

Scale: state per key is one fixed-width row (4 doubles + 2 timestamps
+ 1 long) in the state store — independent of stream length; the only
shuffle is the groupBy hash exchange. An optional TTL evicts keys
idle longer than the horizon (the state-v2 feature applyInPandas
lacked).

The processor class is built inside a factory function so cloudpickle
ships it BY VALUE to executor workers (a module-level class would be
pickled by reference and require this package on the executors'
sys.path — see tests/conftest notes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def state_v2_available() -> bool:
    """The state-v2 python runner talks to the JVM state server over
    protobuf; without the `protobuf` package the driver worker
    crashes at query start. Gate callers (and tests) on this."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False

OHLC_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("first_value", T.DoubleType()),
        T.StructField("last_value", T.DoubleType()),
        T.StructField("min_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_OHLC_STATE_SCHEMA = (
    "first_ts timestamp, first_v double, last_ts timestamp, "
    "last_v double, min_v double, max_v double, n long"
)


def _make_ohlc_processor(ts_col: str, value_col: str, ttl_ms: int | None):
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningCandlestick(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "ohlc", _OHLC_STATE_SCHEMA, ttlDurationMs=ttl_ms
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            (k,) = key
            cur = self._state.get() if self._state.exists() else None
            first_ts = first_v = last_ts = last_v = None
            min_v = max_v = None
            n = 0
            if cur is not None:
                first_ts, first_v, last_ts, last_v, min_v, max_v, n = cur
            for pdf in rows:
                pdf = pdf.sort_values(ts_col, kind="mergesort")
                ts = pdf[ts_col]
                vals = pdf[value_col]
                if len(pdf) == 0:
                    continue
                if first_ts is None or ts.iloc[0] < first_ts:
                    first_ts, first_v = ts.iloc[0], float(vals.iloc[0])
                if last_ts is None or ts.iloc[-1] >= last_ts:
                    last_ts, last_v = ts.iloc[-1], float(vals.iloc[-1])
                bmin, bmax = float(vals.min()), float(vals.max())
                min_v = bmin if min_v is None else min(min_v, bmin)
                max_v = bmax if max_v is None else max(max_v, bmax)
                n += len(pdf)
            self._state.update((first_ts, first_v, last_ts, last_v, min_v, max_v, n))
            yield pd.DataFrame(
                {
                    "key": [k],
                    "first_value": [first_v],
                    "last_value": [last_v],
                    "min_value": [min_v],
                    "max_value": [max_v],
                    "n_events": [n],
                }
            )

        def close(self) -> None:
            pass

    return RunningCandlestick()


def running_candlestick(
    df: DataFrame,
    key_col: str = "ticker",
    ts_col: str = "utc",
    value_col: str = "price",
    ttl: str | None = None,
) -> DataFrame:
    """Cumulative per-key OHLC via the state-v2 API. Emits one updated
    row per touched key per micro-batch (update semantics); read the
    LAST emission per key for the final aggregate. ``ttl`` (e.g.
    ``"1 hour"``) evicts idle keys' state.

    Requires the `protobuf` package (``state_v2_available()``): the
    python<->JVM state-server protocol is protobuf-encoded. Where
    absent, use the applyInPandasWithState operators
    (streaming/stateful.py) — same recursive-state semantics, minus
    TTL/timers."""
    if not state_v2_available():
        raise RuntimeError(
            "transformWithStateInPandas needs the protobuf package; "
            "use streaming.stateful (applyInPandasWithState) instead"
        )
    # canonical_duration accepts every duration syntax the config
    # layer does (day/millisecond included) and raises a descriptive
    # ValueError on garbage — no bare KeyError for '1 day' etc.
    from kinesis_analytics_demo_spark.config import duration_millis

    ttl_ms = duration_millis(ttl) if ttl is not None else None
    return df.groupBy(key_col).transformWithStateInPandas(
        _make_ohlc_processor(ts_col, value_col, ttl_ms),
        outputStructType=OHLC_OUTPUT_SCHEMA,
        outputMode="Update",
        # state TTL needs a processing-time clock; otherwise no timers
        timeMode="None" if ttl_ms is None else "ProcessingTime",
    )
