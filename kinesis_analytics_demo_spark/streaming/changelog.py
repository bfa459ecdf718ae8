"""Changelog (retract-stream) emission — the Flink dynamic-table
concept the reference's engine family exposes as retract/upsert
streams: downstream consumers that cannot overwrite state (message
queues, incremental caches) need each aggregate CHANGE as
insert/retract events, not snapshots.

Structured Streaming's update mode hands ``foreachBatch`` exactly the
CHANGED aggregate rows per micro-batch; this module turns them into
an append-only changelog table:

    op = 'I'   first value for a key
    op = 'U-'  retraction carrying the PREVIOUS value
    op = 'U+'  the new value

The previous value is recovered from the changelog itself (latest
'I'/'U+' per key — the CDC latest-state shape from operators/cdc.py),
so the log is self-contained: replaying it in (batch_id, op) order
reconstructs the current snapshot exactly, which the test pins
against the batch aggregate of the same data.

Scale: each micro-batch touches O(changed keys) — the join against
the latest-state view is key-partitioned; at production scale the
latest-state read comes from periodic compactions of the log (the
standard changelog-compaction contract, e.g. a Kafka compacted
topic), not a full log scan.
"""

from __future__ import annotations

import os

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def latest_state(changelog: DataFrame, key_cols: list[str]) -> DataFrame:
    """Current snapshot from the log: last non-retract row per key."""
    w = Window.partitionBy(*key_cols).orderBy(
        F.desc("batch_id"), F.desc("seq")
    )
    return (
        changelog.filter(F.col("op").isin("I", "U+"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "op", "batch_id", "seq")
    )


def changelog_writer(log_path: str, key_cols: list[str], value_cols: list[str]):
    """``foreachBatch`` function: diff each update-mode batch against
    the log's latest state and append I / U- / U+ rows."""

    def fn(batch_df, batch_id: int):
        spark = batch_df.sparkSession
        new = batch_df.select(*key_cols, *value_cols)
        # First-batch means the log path genuinely does not exist /
        # holds no data yet. Any OTHER read failure (transient IO,
        # corrupt file) must propagate — treating it as first-batch
        # would emit op='I' for keys that already exist and corrupt
        # the replay-in-(batch_id,op)-order contract.
        prev = None
        try:
            # replay-aware: a replayed batch's OWN rows are already in
            # the log — diffing against them would see 'no change' and
            # overwrite the batch directory with nothing. The previous
            # state is everything strictly BEFORE this batch.
            log = spark.read.parquet(log_path).filter(
                F.col("batch_id") < int(batch_id)
            )
            prev = latest_state(log, key_cols).select(
                *key_cols,
                *[F.col(c).alias(f"__old_{c}") for c in value_cols],
                F.lit(True).alias("__had_prev"),
            )
        except AnalysisException as e:
            getter = getattr(e, "getCondition", None) or getattr(
                e, "getErrorClass", lambda: None
            )
            cond = getter() or ""
            msg = str(e)
            if not (
                "PATH_NOT_FOUND" in cond
                or "UNABLE_TO_INFER_SCHEMA" in cond
                or "Path does not exist" in msg
                or "Unable to infer schema" in msg
            ):
                raise
        if prev is not None:
            j = new.join(prev, key_cols, "left")
            # unchanged rows re-emitted by update mode are dropped;
            # null-safe struct compare so NULL values diff correctly
            changed = j.filter(
                F.col("__had_prev").isNull()
                | ~F.struct(*value_cols).eqNullSafe(
                    F.struct(
                        *[F.col(f"__old_{c}").alias(c) for c in value_cols]
                    )
                )
            )
            inserts = changed.filter(F.col("__had_prev").isNull())
            updates = changed.filter(F.col("__had_prev").isNotNull())
            out_i = inserts.select(
                F.lit(0).alias("seq"),
                F.lit("I").alias("op"),
                *key_cols,
                *value_cols,
            )
            out_um = updates.select(
                F.lit(1).alias("seq"),
                F.lit("U-").alias("op"),
                *key_cols,
                *[F.col(f"__old_{c}").alias(c) for c in value_cols],
            )
            out_up = updates.select(
                F.lit(2).alias("seq"),
                F.lit("U+").alias("op"),
                *key_cols,
                *value_cols,
            )
            out = out_i.unionByName(out_um).unionByName(out_up)
        else:
            out = new.select(
                F.lit(0).alias("seq"),
                F.lit("I").alias("op"),
                *key_cols,
                *value_cols,
            )
        # batch_id lives as a hive-style PARTITION directory, written
        # with per-directory overwrite: a foreachBatch replay of the
        # same micro-batch (append mode is not idempotent) rewrites
        # its own directory instead of appending duplicate rows. On
        # read, partition discovery restores batch_id as a column.
        out.write.mode("overwrite").parquet(
            os.path.join(log_path, f"batch_id={int(batch_id)}")
        )

    return fn
