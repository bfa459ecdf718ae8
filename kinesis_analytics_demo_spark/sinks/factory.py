"""Sink factories — console / noop / memory / partitioned files /
kinesis-via-foreachBatch.

Reference sinks: print (flink/tumbling_window.py:141-161), blackhole
(:253-256), kinesis with partition-key and producer batching
(:121-128). Spark mapping per SURVEY.md §2 S3-S6.
"""

from __future__ import annotations

import json
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


class KinesisBatchWriter:
    """foreachBatch writer that puts records onto a Kinesis stream in
    batches of ``collection_max_count`` (the reference's
    ``sink.producer.collection-max-count = '100'``,
    flink/tumbling_window.py:128), keyed by ``partition_key_col``
    (``PARTITIONED BY (ticker)``, flink/tumbling_window.py:121).

    ``client_factory`` defaults to boto3 (import-gated: absent in the
    test container); tests inject a fake. Records are serialized as
    JSON — the reference's wire format.

    Scale: runs once per micro-batch per partition via
    ``foreachPartition`` so puts happen executor-side in parallel —
    the driver never collects the batch.
    """

    def __init__(
        self,
        stream_name: str,
        region: str = "us-east-1",
        partition_key_col: str = "ticker",
        collection_max_count: int = 100,
        client_factory: Callable | None = None,
        max_retries: int = 5,
        backoff_base_s: float = 0.2,
    ):
        self.stream_name = stream_name
        self.region = region
        self.partition_key_col = partition_key_col
        self.collection_max_count = collection_max_count
        self.client_factory = client_factory
        self.max_retries = max_retries
        self.backoff_base_s = backoff_base_s

    def _default_client_factory(self):
        import boto3  # gated: only needed on the production path

        region = self.region

        def make():
            return boto3.client("kinesis", region_name=region)

        return make

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        factory = self.client_factory or self._default_client_factory()
        stream = self.stream_name
        key_col = self.partition_key_col
        max_count = self.collection_max_count
        max_retries = self.max_retries
        backoff_base = self.backoff_base_s

        def put_partition(rows):
            import time

            client = factory()

            def put_with_retry(records):
                # put_records does NOT raise on partial failure: a 200
                # response can still carry FailedRecordCount > 0
                # (throttled/failed entries). Retry only the failed
                # records with exponential backoff; give up loudly
                # after max_retries so records are never silently
                # dropped (the reference's per-record put_record
                # raises — this keeps that delivery guarantee at
                # batched throughput).
                pending = records
                first_err = None
                for attempt in range(max_retries + 1):
                    resp = client.put_records(StreamName=stream, Records=pending)
                    if not (resp or {}).get("FailedRecordCount"):
                        return
                    failed = [
                        (rec, res)
                        for rec, res in zip(pending, resp["Records"])
                        if "ErrorCode" in res
                    ]
                    pending = [rec for rec, _ in failed]
                    first_err = failed[0][1].get("ErrorCode") if failed else None
                    if attempt < max_retries:
                        time.sleep(backoff_base * (2**attempt))
                raise RuntimeError(
                    f"kinesis put_records: {len(pending)} records still "
                    f"failing after {max_retries} retries "
                    f"(first error: {first_err})"
                )

            buf = []
            for row in rows:
                d = row.asDict(recursive=True)
                buf.append(
                    {
                        "Data": json.dumps(d, default=str),
                        "PartitionKey": str(d.get(key_col, "")),
                    }
                )
                if len(buf) >= max_count:
                    put_with_retry(buf)
                    buf = []
            if buf:
                put_with_retry(buf)

        batch_df.rdd.foreachPartition(put_partition)


def write_stream(
    df: DataFrame,
    kind: str,
    query_name: str = "kads_query",
    checkpoint: str | None = None,
    output_mode: str = "append",
    path: str | None = None,
    partition_by: str | None = None,
    trigger_available_now: bool = False,
    foreach_batch: Callable | None = None,
    options: dict[str, str] | None = None,
    sink_columns: list[str] | None = None,
) -> StreamingQuery:
    """Start a streaming write (reference INSERT INTO submission,
    flink/tumbling_window.py:286-296).

    kinds: console (print sink), noop (blackhole), memory (named
    in-memory table, tests), file (parquet, optionally partitioned by
    key — the S6 analog), foreach_batch (e.g. KinesisBatchWriter).

    ``sink_columns`` reproduces Flink's POSITIONAL sink binding: the
    reference's sliding job declares its sink as (ticker, price, utc)
    but inserts (ticker, p=min(price), t=window.end) — columns bind by
    position, not name (flink/sliding_window.py:144-151 vs 176-179).
    Passing the declared sink schema's names renames the query's
    output positionally before writing.
    """
    if sink_columns is not None:
        if len(sink_columns) != len(df.columns):
            raise ValueError(
                f"sink declares {len(sink_columns)} columns, query "
                f"produces {len(df.columns)}"
            )
        df = df.toDF(*sink_columns)
    writer = df.writeStream.outputMode(output_mode).queryName(query_name)
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    if kind == "console":
        return writer.format("console").option("truncate", "false").start()
    if kind == "noop":
        return writer.format("noop").start()
    if kind == "memory":
        return writer.format("memory").start()
    if kind == "file":
        if partition_by:
            writer = writer.partitionBy(partition_by)
        return writer.format("parquet").option("path", path).start()
    if kind == "foreach_batch":
        return writer.foreachBatch(foreach_batch).start()
    raise ValueError(f"unknown sink kind: {kind!r}")
