#!/usr/bin/env python
"""End-to-end custom-connector pipeline: the Python-DataSource tick
source -> the reference's tumbling candlestick -> the transactional
JSON-lines audit sink. The full Kinesis-analog data path with zero
external services:

    python examples/connector_pipeline.py --out /tmp/candles \
        --rows-per-batch 120 --batches 3

Reads micro-batches from ``stock_ticks`` (sequence-number offsets,
per-batch shard fan-out), aggregates per-ticker 1-minute candlesticks
(complete mode), and on each trigger rewrites the aggregate snapshot
through ``jsonl_audit`` (atomic rename + manifest). Stops after
``--batches`` micro-batches and prints the collected per-batch
metrics from the StreamingQueryListener tap.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kinesis_analytics_demo_spark.session import get_spark
from kinesis_analytics_demo_spark.sinks.pyds_sink import register_jsonl_audit
from kinesis_analytics_demo_spark.sources.pyds import register_stock_ticks
from kinesis_analytics_demo_spark.streaming.metrics import (
    attach_metrics,
    detach_metrics,
)
from kinesis_analytics_demo_spark.streaming.windows import tumbling_candlestick


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="/tmp/kads-candles")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--rows-per-batch", type=int, default=120)
    p.add_argument("--batches", type=int, default=3)
    p.add_argument("--timeout-s", type=int, default=120)
    args = p.parse_args()

    spark = get_spark(app_name="connector-pipeline")
    register_stock_ticks(spark)
    register_jsonl_audit(spark)
    listener = attach_metrics(spark)

    stream = (
        spark.readStream.format("stock_ticks")
        .option("rows_per_batch", args.rows_per_batch)
        .option("n_partitions", 4)
        .load()
    )
    candles = tumbling_candlestick(
        stream,
        ts_col="utc",
        key_col="ticker",
        value_col="price",
        window_duration="1 minute",
    )
    q = (
        candles.writeStream.format("jsonl_audit")
        .option("path", args.out)
        .option(
            "checkpointLocation",
            args.checkpoint or os.path.join(args.out, "_ckpt"),
        )
        .outputMode("complete")
        .queryName("connector_pipeline")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + args.timeout_s
        while time.time() < deadline:
            if listener.summary("connector_pipeline")["n_batches"] >= args.batches:
                break
            time.sleep(0.5)
    finally:
        q.stop()
        detach_metrics(spark, listener)
    s = listener.summary("connector_pipeline")
    print(
        f"batches={s['n_batches']} input_rows={s['total_input_rows']} "
        f"mean_rows_per_s={s['mean_rows_per_second']:.0f} "
        f"max_trigger_ms={s['max_trigger_ms']}"
    )
    manifests = sorted(
        f for f in os.listdir(args.out) if f.startswith("_manifest-")
    )
    print(f"manifests={len(manifests)} out={args.out}")


if __name__ == "__main__":
    main()
