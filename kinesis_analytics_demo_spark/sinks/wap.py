"""Write-Audit-Publish (WAP) — the batch-promotion pattern that ties
the expectation suite to the write path: a new batch lands in a
STAGING directory, the audit runs against staging, and only a fully
green report promotes the data with an atomic rename. A failed audit
leaves the batch quarantined beside its violation report; the
published table is never observable in a half-written or dirty state.

This is the plain-filesystem analog of Iceberg's WAP branch / Delta's
constraint-checked commit; the audit gate itself is
``data_quality_expectations`` (operators/expectations.py) restricted
to the checks whose tables the batch touches.

Scale: staging write and audit cost the same as any batch write +
one violation-counting scan; promote is a metadata rename. The audit
report is persisted as JSON either way — the paper trail an on-call
engineer reads first.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


def write_audit_publish(
    spark: SparkSession,
    df: DataFrame,
    table_dir: str,
    audit,  # Callable[[str], DataFrame] -> expectation report for a dir
    batch_name: str = "batch",
) -> dict:
    """Write ``df`` to ``<table_dir>/_staging/<batch_name>``, run
    ``audit(staged_batch_dir)`` (a callable returning an expectation
    report DataFrame with ``check``/``passed``/``n_violations``
    columns), and on all-green atomically rename the staged batch to
    ``<table_dir>/<batch_name>``. Returns
    ``{"published": bool, "report": [...], "path": final_or_staged}``.

    The audit is scoped to THIS batch's staged directory — not the
    staging parent — so a previously quarantined dirty batch sitting
    in ``_staging`` can never fail (or double-count) the audit of a
    later clean batch.
    """
    staging_parent = os.path.join(table_dir, "_staging")
    staged = os.path.join(staging_parent, batch_name)
    final = os.path.join(table_dir, batch_name)
    if os.path.exists(final):
        raise ValueError(f"batch already published: {final}")
    df.write.mode("overwrite").parquet(staged)

    report_rows = [r.asDict() for r in audit(staged).collect()]
    clean = all(r["passed"] for r in report_rows)
    report_path = os.path.join(staged, "_audit.json")
    with open(report_path + ".tmp", "w") as fh:
        json.dump({"published": clean, "checks": report_rows}, fh, default=str)
    os.rename(report_path + ".tmp", report_path)

    if clean:
        os.rename(staged, final)  # atomic promote
        return {"published": True, "report": report_rows, "path": final}
    return {"published": False, "report": report_rows, "path": staged}
