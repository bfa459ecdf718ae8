"""Custom Python DataSource (Spark 4 DataSource API): a deterministic
stock-tick connector usable as BOTH a batch table and a micro-batch
stream — the engine-native stand-in for the reference's Kinesis
consumer (reference datagen/stock.py record shape, tumbling job
source at flink/tumbling_window.py:122-131) that needs no AWS and no
files.

Why a custom DataSource and not another file format: the reference's
source is a *service* connector (shards, offsets, replay); the Python
DataSource API is Spark's sanctioned way to build exactly that. The
streaming reader exposes Kinesis-like semantics honestly:

- offsets are monotonically increasing record indices
  (``{"index": n}``), the analog of shard sequence numbers;
- ``latestOffset`` advances by ``rows_per_batch`` per micro-batch
  (a rate-limited poll);
- ``partitions(start, end)`` splits each batch range into
  ``n_partitions`` independent slices — the shard fan-out;
- replay after failure re-reads the same index range and regenerates
  IDENTICAL records (tick content is a pure function of the global
  index — md5-derived, no RNG chain), which is what makes the source
  exactly-once under checkpoint recovery.

Scale: each partition generates its slice independently (no shared
state, no driver data movement); a real deployment swaps the
generator body for a shard HTTP client, keeping offsets/partitioning.

Executor pickling: the module registers itself with cloudpickle's
pickle-by-value so worker processes never need this package on their
import path (the repo's closure convention, applied to classes).
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

TICKERS = ["AAPL", "AMZN", "MSFT", "TSLA"]
#: fixed epoch origin for deterministic event times
_ORIGIN = datetime(2024, 1, 1, tzinfo=timezone.utc).replace(tzinfo=None)

_SCHEMA = (
    "utc timestamp, type string, source string, ticker string, "
    "name string, sector string, industry string, price double"
)


def tick_at(i: int, step_ms: int = 250) -> tuple:
    """The i-th tick — a pure function of the index (reference record
    shape, datagen/stock.py:24-33)."""
    h = hashlib.md5(f"tick{i}".encode()).hexdigest()
    ticker = TICKERS[int(h[:2], 16) % len(TICKERS)]
    price = round((int(h[2:10], 16) % 10000) / 100.0, 2)
    ts = _ORIGIN + timedelta(milliseconds=i * step_ms)
    return (
        ts,
        "get_live_price",
        "xxx",
        ticker,
        "xxx common stock",
        "technology",
        "consumer electronics",
        price,
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


def _split(start: int, end: int, k: int) -> list[_RangePartition]:
    n = end - start
    out = []
    for p in range(k):
        lo = start + (n * p) // k
        hi = start + (n * (p + 1)) // k
        if hi > lo:
            out.append(_RangePartition(lo, hi))
    return out


class _StockBatchReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))

    def partitions(self):
        return _split(0, self.n_rows, self.n_partitions)

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield tick_at(i)


class _StockStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.n_partitions = int(options.get("n_partitions", 4))
        self._current = 0

    def initialOffset(self):
        return {"index": 0}

    def latestOffset(self):
        self._current += self.rows_per_batch
        return {"index": self._current}

    def partitions(self, start, end):
        # Restart-safety: after checkpoint recovery Spark hands this
        # FRESH reader instance the restored offsets; sync the poll
        # counter so the next latestOffset() continues from where the
        # recovered stream actually is instead of replaying from 0.
        self._current = max(self._current, end["index"])
        return _split(start["index"], end["index"], self.n_partitions)

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield tick_at(i)

    def commit(self, end):
        self._current = max(self._current, end["index"])

    def stop(self):
        pass


class StockTicksDataSource(DataSource):
    """``spark.read.format("stock_ticks")`` /
    ``spark.readStream.format("stock_ticks")``."""

    @classmethod
    def name(cls):
        return "stock_ticks"

    def schema(self):
        return _SCHEMA

    def reader(self, schema):
        return _StockBatchReader(self.options)

    def streamReader(self, schema):
        return _StockStreamReader(self.options)


def register_stock_ticks(spark) -> None:
    """Register the connector on a session; idempotent. Ships this
    module to executors by value so no package install is needed."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(StockTicksDataSource)
