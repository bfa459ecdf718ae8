#!/usr/bin/env python
"""Drop-in equivalent of the reference's ``flink/sliding_window.py``
main: per-ticker sliding-window min(price), window over/every/on/alias
read from the same ``application_properties.json`` keys
(``flink.sliding_window.*`` — reference
flink/application_properties.json.replace:14-17), output projected as
``(ticker, p, t)`` exactly like the reference's Table-API select
(flink/sliding_window.py:176-179).

    IS_LOCAL=1 python examples/sliding_window.py \
        --source file-json --path /tmp/ticks --sink console \
        --properties my_application_properties.json
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
    p.add_argument("--path", default="/tmp/ticks")
    p.add_argument("--sink", default="console", choices=["console", "noop", "file"])
    p.add_argument("--properties", default=None)
    p.add_argument("--checkpoint", default="/tmp/kads-sliding-ckpt")
    p.add_argument("--once", action="store_true")
    args = p.parse_args()

    cfg = AppConfig.load(args.properties) if args.properties else None
    spark = get_spark(app_name="sliding-window")
    source_options = None
    if cfg is not None and args.source == "kinesis":
        source_options = {
            "streamName": cfg.input_stream,
            "region": cfg.region,
            "startingPosition": cfg.stream_initpos,
        }
    query = run_reference_pipeline(
        spark,
        job="sliding",
        source_kind=args.source,
        sink_kind=args.sink,
        cfg=cfg,
        source_path=args.path,
        query_name="sliding_window",
        checkpoint=args.checkpoint,
        trigger_available_now=args.once,
        source_options=source_options,
    )
    query.awaitTermination()


if __name__ == "__main__":
    main()
