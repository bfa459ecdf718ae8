#!/usr/bin/env python
"""CUMULATE-window job CLI — the third windowing TVF beside the
tumbling/sliding reference jobs: expanding-prefix sums per key over a
base period ("daily total, updated every step").

Run against a replayable tick directory (batch over the files, or
streaming with --stream):

    python datagen/stock.py --target dir --out-dir /tmp/ticks \
        --base-time 2024-06-01T00:00:00 --step-s 600 --n-files 5
    python examples/cumulate_window.py --path /tmp/ticks \
        --max-size '1 day' --step '6 hours'
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.session import get_spark
from kinesis_analytics_demo_spark.sources.factory import (
    create_stream_source,
    parse_stock_json,
)
from kinesis_analytics_demo_spark.streaming.windows import cumulate_window_agg


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--path", default="/tmp/ticks")
    p.add_argument("--max-size", default="1 day")
    p.add_argument("--step", default="6 hours")
    p.add_argument("--stream", action="store_true",
                   help="run as a streaming job (complete mode, console)")
    p.add_argument("--checkpoint", default="/tmp/kads-cumulate-ckpt")
    args = p.parse_args()

    spark = get_spark(app_name="cumulate-window")
    if args.stream:
        raw = create_stream_source(spark, "file-json", path=args.path)
        ticks = parse_stock_json(raw)
        out = cumulate_window_agg(
            ticks, ts_col="utc", key_col="ticker", value_col="price",
            max_size=args.max_size, step=args.step,
        )
        q = (
            out.writeStream.format("console")
            .outputMode("complete")
            .option("checkpointLocation", args.checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return
    raw = spark.read.json(os.path.join(args.path, "*.json"))
    ticks = raw.select(
        F.to_timestamp("utc").alias("utc"), "ticker",
        F.col("price").cast("double").alias("price"),
    )
    out = cumulate_window_agg(
        ticks, ts_col="utc", key_col="ticker", value_col="price",
        max_size=args.max_size, step=args.step,
    )
    out.orderBy("ticker", "window_start", "window_end").show(50, truncate=False)


if __name__ == "__main__":
    main()
