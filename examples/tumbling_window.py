#!/usr/bin/env python
"""Drop-in equivalent of the reference's ``flink/tumbling_window.py``
main: per-ticker 1-minute tumbling-window candlestick over a JSON tick
stream, configured by the same ``application_properties.json`` format
(IS_LOCAL env switch included).

Run locally against a replayable tick directory:

    python datagen/stock.py --target dir --out-dir /tmp/ticks \
        --base-time 2024-06-01T12:00:00 --step-s 3 --n-files 5
    IS_LOCAL=1 python examples/tumbling_window.py \
        --source file-json --path /tmp/ticks --sink console

In production, point ``--source kinesis`` at a cluster with the
spark-kinesis connector and the properties file's stream names/region
(reference flink/tumbling_window.py:96-138) are passed through.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kinesis_analytics_demo_spark.config import AppConfig
from kinesis_analytics_demo_spark.session import get_spark
from kinesis_analytics_demo_spark.streaming.jobs import run_reference_pipeline


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--source", default="file-json",
                   choices=["file-json", "file-parquet", "socket", "rate", "kinesis", "kafka"])
    p.add_argument("--path", default="/tmp/ticks", help="source dir for file sources")
    p.add_argument("--sink", default="console", choices=["console", "noop", "file"])
    p.add_argument("--properties", default=None,
                   help="application_properties.json (reference format)")
    p.add_argument("--checkpoint", default="/tmp/kads-tumbling-ckpt")
    p.add_argument("--once", action="store_true",
                   help="process available data then exit (availableNow)")
    args = p.parse_args()

    cfg = AppConfig.load(args.properties) if args.properties else None
    spark = get_spark(app_name="tumbling-window")
    source_options = None
    if cfg is not None and args.source == "kinesis":
        source_options = {
            "streamName": cfg.input_stream,
            "region": cfg.region,
            "startingPosition": cfg.stream_initpos,
        }
    query = run_reference_pipeline(
        spark,
        job="tumbling",
        source_kind=args.source,
        sink_kind=args.sink,
        cfg=cfg,
        source_path=args.path,
        query_name="tumbling_window",
        checkpoint=args.checkpoint,
        trigger_available_now=args.once,
        source_options=source_options,
    )
    # reference: table_result1.wait() (flink/tumbling_window.py:293-296)
    query.awaitTermination()


if __name__ == "__main__":
    main()
