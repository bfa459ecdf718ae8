"""Streaming metrics listener: per-batch progress captured, summary
folds correctly, state size visible for a windowed aggregate."""

from __future__ import annotations

import time

import pytest

from kinesis_analytics_demo_spark.streaming.metrics import (
    attach_metrics,
    detach_metrics,
)


def test_listener_captures_windowed_agg(spark, tmp_path):
    from kinesis_analytics_demo_spark.sources.pyds import register_stock_ticks
    from kinesis_analytics_demo_spark.streaming.windows import (
        tumbling_candlestick,
    )

    register_stock_ticks(spark)
    listener = attach_metrics(spark)
    stream = (
        spark.readStream.format("stock_ticks")
        .option("rows_per_batch", 80)
        .option("n_partitions", 2)
        .load()
    )
    agg = tumbling_candlestick(
        stream, ts_col="utc", key_col="ticker", value_col="price",
        window_duration="1 minute",
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("metrics_probe")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if listener.summary("metrics_probe")["n_batches"] >= 3:
                break
            time.sleep(0.5)
        else:
            pytest.fail("listener captured fewer than 3 batches")
    finally:
        q.stop()
        detach_metrics(spark, listener)
    s = listener.summary("metrics_probe")
    assert s["total_input_rows"] >= 160  # at least two 80-row batches
    assert s["total_input_rows"] % 80 == 0
    assert s["max_trigger_ms"] is not None and s["max_trigger_ms"] > 0
    # the windowed aggregate holds state: 4 tickers x live windows
    assert s["latest_state_rows"] > 0
    batches = listener.batches("metrics_probe")
    assert [b["batch_id"] for b in batches] == sorted(
        b["batch_id"] for b in batches
    )
