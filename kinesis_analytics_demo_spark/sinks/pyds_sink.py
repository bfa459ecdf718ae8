"""Custom Python DataSource WRITER: a transactional JSON-lines sink
("jsonl_audit") for batch and streaming — the writer half of the
connector API, completing what ``sources/pyds.py`` starts on the read
side. It models the commit discipline a Kinesis/queue producer sink
needs (the reference's S3 sink batches puts but has no transactional
story; reference flink/tumbling_window.py:127-128):

- each task writes to a TEMP file and reports a commit message
  (path + row count) — no partial output is ever visible;
- ``commit()`` atomically renames every temp into place and writes a
  ``_manifest-<batch>.json`` with per-file row counts (the audit
  trail downstream consumers reconcile against);
- ``abort()`` deletes temps, so failed/speculative attempts leave
  nothing;
- the STREAMING writer keys manifests by micro-batch id, and final
  file names carry an ATTEMPT-UNIQUE token —
  ``<prefix>-<batch>-<attempt>-<i>.jsonl`` — so a replayed batch
  (failure after commit() but before the checkpoint offset commit)
  NEVER renames onto a name the still-current manifest references.
  The atomic manifest swap is the single commit point: a crash
  anywhere before it leaves the prior manifest and every file it
  lists byte-for-byte intact (this attempt's files are unreferenced
  orphans, swept by the next attempt's janitor); after it, the new
  manifest's files are all in place and the prior attempt's are
  deleted. At-least-once execution, exactly-once MANIFEST-visible
  output — consumers must read via the manifest, not by globbing
  ``*.jsonl`` (a glob can see a crashed attempt's orphans).

Scale: tasks write independently (no driver data); commit touches
only O(tasks) renames. Executor pickling follows the repo's
pickle-by-value convention so workers need no package install.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


class _FileCommit(WriterCommitMessage):
    def __init__(self, tmp_path: str, n_rows: int):
        self.tmp_path = tmp_path
        self.n_rows = n_rows


def _write_partition(path: str, prefix: str, iterator) -> _FileCommit:
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, f".{prefix}-{uuid.uuid4().hex}.tmp")
    n = 0
    with open(tmp, "w") as fh:
        for row in iterator:
            fh.write(json.dumps(row.asDict(), default=str) + "\n")
            n += 1
    return _FileCommit(tmp, n)


def _commit_files(path: str, manifest_name: str, messages, name_prefix) -> None:
    """Rename temps into place under ATTEMPT-UNIQUE final names —
    ``<name_prefix>-<attempt>-<i>.jsonl`` (``i`` = commit-message
    index; Spark hands ``messages`` in partition order) — then
    atomically swap the manifest, then delete the prior attempt's
    files. Because no rename can collide with a name the still-current
    manifest references, a crash at ANY point before the swap leaves
    the prior manifest and every file it lists byte-for-byte intact
    (ADVICE r5: deterministic same-name renames had a transient
    mixed-content window when a replay produced a DIFFERENT
    partitioning — some old-manifest names overwritten with new-split
    content before the swap). This attempt's already-renamed files are
    then unreferenced orphans; the janitor below sweeps them on the
    next attempt. The manifest swap is the single commit point."""
    manifest = os.path.join(path, manifest_name)
    stale = []
    if os.path.exists(manifest):
        try:
            with open(manifest) as fh:
                stale = json.load(fh).get("files", [])
        except (OSError, ValueError):
            stale = []
    stale_names = {e.get("file") for e in stale}
    attempt = uuid.uuid4().hex[:8]
    entries = []
    own_tmps = set()
    for i, m in enumerate(messages):
        if m is None:
            continue
        own_tmps.add(os.path.basename(m.tmp_path))
        if m.n_rows == 0:
            if os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)
            continue
        final_path = os.path.join(
            path, f"{name_prefix}-{attempt}-{i:05d}.jsonl"
        )
        os.replace(m.tmp_path, final_path)
        entries.append(
            {"file": os.path.basename(final_path), "rows": m.n_rows}
        )
    new_names = {e["file"] for e in entries}
    # Janitor: a query killed mid-batch strands its dot-prefixed temp
    # files (workers die before abort() runs), and a query killed
    # between this function's renames and its manifest swap strands
    # attempt-named data files no manifest references. Sweep both —
    # anything under this name_prefix that is neither in the current
    # (old) manifest nor created by this attempt is garbage. Safe
    # because the sink is single-writer-per-path (batches are
    # sequential within a query; concurrent queries must use distinct
    # paths).
    for f in os.listdir(path):
        is_orphan_tmp = (
            f.startswith(".") and f.endswith(".tmp") and f not in own_tmps
        )
        is_orphan_data = (
            f.startswith(f"{name_prefix}-")
            and f.endswith(".jsonl")
            and f not in stale_names
            and f not in new_names
        )
        if is_orphan_tmp or is_orphan_data:
            try:
                os.remove(os.path.join(path, f))
            except OSError:
                pass
    tmp = manifest + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(
            {"files": entries, "total_rows": sum(e["rows"] for e in entries)},
            fh,
        )
    os.rename(tmp, manifest)
    # Only now, with the new manifest committed, remove the prior
    # attempt's files (attempt tokens differ, so none are reused): a
    # crash anywhere above leaves the old manifest with its files
    # intact; a crash below leaves the new manifest with all its
    # files in place plus some undeleted stale files, which the next
    # commit's janitor sweeps (they are absent from the then-current
    # manifest).
    for e in stale:
        if e.get("file") not in new_names:
            try:
                os.remove(os.path.join(path, e["file"]))
            except OSError:
                pass


def _abort_files(messages) -> None:
    for m in messages:
        if m is not None and os.path.exists(m.tmp_path):
            os.remove(m.tmp_path)


class _JsonlBatchWriter(DataSourceWriter):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_audit requires a 'path' option")

    def write(self, iterator):
        return _write_partition(self.path, "part", iterator)

    def commit(self, messages):
        _commit_files(self.path, "_manifest.json", messages, "part")

    def abort(self, messages):
        _abort_files(messages)


class _JsonlStreamWriter(DataSourceStreamWriter):
    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_audit requires a 'path' option")

    def write(self, iterator):
        return _write_partition(self.path, "stream", iterator)

    def commit(self, messages, batchId):
        _commit_files(
            self.path,
            f"_manifest-{batchId:08d}.json",
            messages,
            f"stream-{batchId:08d}",
        )

    def abort(self, messages, batchId):
        _abort_files(messages)


class JsonlAuditDataSource(DataSource):
    """``df.write.format("jsonl_audit").option("path", ...)`` /
    ``df.writeStream.format("jsonl_audit")``."""

    @classmethod
    def name(cls):
        return "jsonl_audit"

    def writer(self, schema, overwrite):
        return _JsonlBatchWriter(self.options)

    def streamWriter(self, schema, overwrite):
        return _JsonlStreamWriter(self.options)


def register_jsonl_audit(spark) -> None:
    """Register the sink; ships this module by value (no executor
    package install)."""
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(JsonlAuditDataSource)
