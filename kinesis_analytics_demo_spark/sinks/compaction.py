"""Small-file compaction and sort-order management for the parquet
file sink — the maintenance half of S6 (partitioned write).

Streaming file sinks produce one file per trigger per partition;
at a 1-minute cadence that is ~1,440 files/day/partition, and at
100 TB the NameNode/S3-listing and per-file open costs dominate scan
time long before the data does. ``compact_parquet_dir`` rewrites a
directory (or each ``key=value`` partition subdirectory) into
``ceil(bytes / target_file_bytes)`` files, optionally range-clustered
on sort columns so per-file min/max statistics allow row-group and
file pruning on the sort key (the "sort-order management" of
Delta/Iceberg OPTIMIZE ... ZORDER, restricted to lexicographic order
— true multi-column Z-curves need a space-filling-curve expression,
which ``sort_by`` approximates for the leading column).

The rewrite is swap-based: write to a temp sibling, rename the old
directory away, rename the temp in, then delete the old — the window
where readers see a missing directory is two renames. Plain parquet
directories have no transaction log; production tables should do this
through a table format (Delta/Iceberg/Hudi) whose commit protocol
makes the swap atomic against concurrent readers AND writers. The
streaming file sink's ``_spark_metadata`` log (exactly-once manifest)
is preserved untouched if present: Spark reads the directory THROUGH
the manifest, so compaction must be applied only to terminal
directories no longer written by a streaming query (enforced here by
refusing when ``_spark_metadata`` exists, unless ``force=True``).
"""

from __future__ import annotations

import math
import os
import shutil
import uuid
from dataclasses import dataclass

from pyspark.sql import SparkSession

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024  # one HDFS-ish block


@dataclass(frozen=True)
class CompactionPlan:
    path: str
    total_bytes: int
    n_files: int
    n_output_files: int
    partitions: tuple[str, ...]  # relative partition dirs ('' = unpartitioned)


def _data_files(root: str) -> list[str]:
    out = []
    for dirpath, _dirnames, filenames in os.walk(root):
        if "_spark_metadata" in dirpath:
            continue
        for f in filenames:
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                out.append(os.path.join(dirpath, f))
    return out


def _partition_dirs(root: str) -> list[str]:
    """Relative 'key=value[/key2=value2...]' dirs that directly hold
    data files; [''] when the directory is unpartitioned."""
    parts = set()
    for f in _data_files(root):
        rel = os.path.relpath(os.path.dirname(f), root)
        parts.add("" if rel == "." else rel)
    return sorted(parts)


def plan_compaction(
    path: str, target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES
) -> CompactionPlan:
    """Inspect a parquet directory and size the rewrite. Local-FS
    listing stands in for what the table format's manifest (or the
    driver's InMemoryFileIndex) provides on a real cluster."""
    files = _data_files(path)
    total = sum(os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(total / target_file_bytes))
    return CompactionPlan(
        path=path,
        total_bytes=total,
        n_files=len(files),
        n_output_files=n_out,
        partitions=tuple(_partition_dirs(path)),
    )


def compact_parquet_dir(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    sort_by: list[str] | None = None,
    force: bool = False,
) -> CompactionPlan:
    """Rewrite ``path`` (per partition subdirectory when partitioned)
    into ~target-sized files, range-clustered on ``sort_by`` when
    given. Returns the executed plan. Refuses directories still owned
    by a streaming query (``_spark_metadata`` present) unless
    ``force``."""
    if os.path.exists(os.path.join(path, "_spark_metadata")) and not force:
        raise ValueError(
            f"{path} has a _spark_metadata streaming manifest; stop the "
            "streaming query and pass force=True to compact a terminal "
            "directory (the manifest will be dropped)."
        )
    plan = plan_compaction(path, target_file_bytes)
    if plan.n_files == 0:
        return plan
    tmp = f"{path}.compact-{uuid.uuid4().hex[:8]}"
    old = f"{path}.pre-compact-{uuid.uuid4().hex[:8]}"
    per_part = max(1, math.ceil(plan.n_output_files / max(1, len(plan.partitions))))
    for rel in plan.partitions:
        src = os.path.join(path, rel) if rel else path
        dst = os.path.join(tmp, rel) if rel else tmp
        df = spark.read.parquet(src)
        if sort_by:
            # Range partitioning gives files disjoint sort-key ranges,
            # so min/max footer stats prune whole files on that key.
            df = df.repartitionByRange(per_part, *sort_by).sortWithinPartitions(
                *sort_by
            )
        else:
            df = df.coalesce(per_part)
        df.write.mode("overwrite").parquet(dst)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return plan_compaction(path, target_file_bytes)
