"""Targeted deletion in a partitioned parquet lake — the
right-to-be-forgotten path: remove every row for a set of subject
keys while rewriting ONLY the partitions that contain them.

Plain parquet has no row-level DELETE; the lake-native move is:

1. find the partitions holding any doomed row (a partition-pruned
   scan of just the partition column + key column);
2. rewrite those partitions minus the doomed rows with DYNAMIC
   partition overwrite (``partitionOverwriteMode=dynamic``) — Spark
   replaces exactly the partitions present in the written frame and
   leaves every other partition's files untouched.

Scale: cost is O(size of affected partitions), not O(table) — with a
reasonable partition scheme (date/source), deleting one user touches
a sliver of a 100 TB table. The audit trail (how many rows died per
partition) comes back to the caller.

This is the file-format-honest analog of DELETE in Delta/Iceberg;
those formats add a transaction log on top of the same rewrite.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

# Hive escapes these characters in partition directory names
# (org.apache.hadoop.hive.common.FileUtils.escapePathName); Spark
# follows the same convention when writing partitioned output.
_HIVE_ESCAPE = set('"#%\'*/:=?\\\x7f{[]^')


def _partition_dirname(partition_col: str, value) -> str:
    """Directory name Spark writes for ``partition_col=value``."""
    if value is None:
        return f"{partition_col}=__HIVE_DEFAULT_PARTITION__"
    s = str(value)
    out = []
    for ch in s:
        if ch in _HIVE_ESCAPE or ord(ch) < 0x20:
            out.append("%{:02X}".format(ord(ch)))
        else:
            out.append(ch)
    return f"{partition_col}={''.join(out)}"


def delete_keys_partitioned(
    spark: SparkSession,
    path: str,
    key_col: str,
    keys: list,
    partition_col: str,
) -> dict:
    """Delete all rows with ``key_col`` in ``keys`` from the
    partitioned parquet table at ``path``; rewrite only affected
    partitions. Returns an audit dict
    ``{partition_value: n_rows_deleted}``."""
    df = spark.read.parquet(path)
    doomed = df.filter(F.col(key_col).isin(keys))
    audit_rows = (
        doomed.groupBy(partition_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    audit = {r[partition_col]: r["n"] for r in audit_rows}
    if not audit:
        return audit
    affected = list(audit)
    # partition-pruned read of ONLY the affected partitions
    survivors = df.filter(
        F.col(partition_col).isin(affected) & ~F.col(key_col).isin(keys)
    )
    # Dynamic overwrite only replaces partitions PRESENT in the
    # written frame — a partition whose every row is doomed has no
    # survivor rows, is absent from the write, and would be left
    # fully intact (the erasure would silently fail for exactly the
    # subjects most concentrated in one partition). Find those
    # partitions up front and delete their directories afterwards.
    surviving_parts = {
        r[partition_col]
        for r in survivors.select(partition_col).distinct().collect()
    }
    doomed_parts = [p for p in affected if p not in surviving_parts]
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            survivors.write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(path)
        )
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    for p in doomed_parts:
        d = os.path.join(path, _partition_dirname(partition_col, p))
        if os.path.isdir(d):
            shutil.rmtree(d)
    return audit
