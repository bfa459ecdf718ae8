"""Custom Python DataSource (stock_ticks): batch determinism,
partition fan-out, streaming offsets, and the reference tumbling job
running end-to-end on the connector."""

from __future__ import annotations

import pytest

from kinesis_analytics_demo_spark.sources.pyds import (
    TICKERS,
    register_stock_ticks,
    tick_at,
)


@pytest.fixture()
def ticks(spark):
    register_stock_ticks(spark)
    return spark


def test_batch_read_deterministic(ticks):
    df = ticks.read.format("stock_ticks").option("n_rows", 200).load()
    rows = sorted(tuple(r) for r in df.collect())
    assert len(rows) == 200
    again = sorted(tuple(r) for r in
                   ticks.read.format("stock_ticks").option("n_rows", 200).load().collect())
    assert rows == again
    assert {r[3] for r in rows} <= set(TICKERS)
    assert all(0 <= r[7] < 100 for r in rows)
    # content is the pure index function
    assert rows[0] == tuple(min((tick_at(i) for i in range(200))))


def test_batch_partition_fanout(ticks):
    df = (
        ticks.read.format("stock_ticks")
        .option("n_rows", 100)
        .option("n_partitions", 5)
        .load()
    )
    assert df.rdd.getNumPartitions() == 5
    assert df.count() == 100


def test_stream_microbatches_and_candlestick(ticks, tmp_path):
    """Run the reference's tumbling candlestick on the connector
    stream for a few micro-batches; results must equal the batch
    computation over the same index range (exactly-once replay)."""
    from kinesis_analytics_demo_spark.streaming.windows import (
        tumbling_candlestick,
    )

    stream = (
        ticks.readStream.format("stock_ticks")
        .option("rows_per_batch", 120)
        .option("n_partitions", 3)
        .load()
    )
    agg = tumbling_candlestick(
        stream, ts_col="utc", key_col="ticker", value_col="price",
        window_duration="1 minute",
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("pyds_candle")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        # wait until at least 2 micro-batches committed
        import time

        deadline = time.time() + 60
        while time.time() < deadline:
            p = q.lastProgress
            if p and p["batchId"] >= 2:
                break
            time.sleep(0.5)
        else:
            pytest.fail("stream made no progress")
    finally:
        q.stop()
    got = {
        (r["ticker"], r["window_start"]): (
            r["first_price"], r["last_price"], r["min_price"], r["max_price"]
        )
        for r in ticks.table("pyds_candle").collect()
    }
    assert got, "no windows emitted"
    # batch recomputation over the SAME index prefix must agree on
    # every fully-contained window the stream has already finalized
    batch = (
        ticks.read.format("stock_ticks")
        .option("n_rows", 120 * 10)  # superset of what streamed
        .load()
    )
    exp = {
        (r["ticker"], r["window_start"]): (
            r["first_price"], r["last_price"], r["min_price"], r["max_price"]
        )
        for r in tumbling_candlestick(
            batch, ts_col="utc", key_col="ticker", value_col="price",
            window_duration="1 minute",
        ).collect()
    }
    for k, v in got.items():
        # the last (still-open) window may be partial in the stream;
        # every other window must match the batch exactly
        max_ws = max(ws for _, ws in got)
        if k[1] == max_ws:
            continue
        assert exp[k] == v, k


def test_checkpoint_restart_no_duplicates(ticks, tmp_path):
    """Stop the stream mid-way and restart from the checkpoint with a
    FRESH reader: the union of all written rows must be exactly the
    tick-index prefix — no duplicates, no gaps (exactly-once visible
    output across restarts)."""
    import json
    import os
    import time

    from kinesis_analytics_demo_spark.sinks.pyds_sink import (
        register_jsonl_audit,
    )

    register_jsonl_audit(ticks)
    out = str(tmp_path / "restart_out")
    ck = str(tmp_path / "ck")

    def run_until(n_manifests, timeout_s=90):
        stream = (
            ticks.readStream.format("stock_ticks")
            .option("rows_per_batch", 70)
            .option("n_partitions", 2)
            .load()
        )
        q = (
            stream.writeStream.format("jsonl_audit")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            deadline = time.time() + timeout_s
            while time.time() < deadline:
                ms = (
                    [f for f in os.listdir(out) if f.startswith("_manifest-")]
                    if os.path.exists(out)
                    else []
                )
                if len(ms) >= n_manifests:
                    break
                time.sleep(0.3)
        finally:
            q.stop()

    run_until(2)
    run_until(4)  # restart from checkpoint, fresh reader instance

    rows = []
    for f in os.listdir(out):
        if f.endswith(".jsonl"):
            with open(os.path.join(out, f)) as fh:
                rows.extend(json.loads(line) for line in fh)
    keys = [(r["utc"], r["ticker"], r["price"]) for r in rows]
    assert len(keys) == len(set(keys)), "duplicate rows across restart"
    # contiguity: rows are the exact index prefix 0..n-1 (every tick's
    # utc is ORIGIN + 250ms * index)
    from kinesis_analytics_demo_spark.sources.pyds import tick_at

    n = len(keys)
    expected = {
        (str(t[0]), t[3], t[7]) for t in (tick_at(i) for i in range(n))
    }
    assert {(str(k[0]), k[1], k[2]) for k in keys} == expected
