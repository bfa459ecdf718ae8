"""Registry contract: the driver samples the FIRST 50 ``queries()``
entries in dict order, so the priority ordering is load-bearing —
pin it."""

from __future__ import annotations

import pytest

from kinesis_analytics_demo_spark.plans import registry


def test_priority_names_all_registered():
    qs = registry.all_queries()  # raises KeyError if a priority name is stale
    names = list(qs)
    assert len(registry._DRIVER_PRIORITY) == 50
    assert names[:50] == registry._DRIVER_PRIORITY
    assert len(set(names)) == len(names)


def test_priority_rename_fails_loudly(monkeypatch):
    """A rename that orphans a priority slot must raise, not silently
    hand the driver a weaker sample."""
    monkeypatch.setattr(
        registry,
        "_DRIVER_PRIORITY",
        registry._DRIVER_PRIORITY[:-1] + ["no_such_query_xyz"],
    )
    with pytest.raises(KeyError, match="no_such_query_xyz"):
        registry.all_queries()


def test_every_query_has_doc_and_callable():
    for name, spec in registry.all_queries().items():
        assert callable(spec.fn), name
        assert spec.doc and len(spec.doc) > 20, name


def test_rotation_covers_whole_registry():
    """The staged next-round priority list must not rot: every name in
    it resolves, and active-50 + staged + already-driver-checked
    (CORRECTNESS_r*.json) covers the whole registry — so by the end of
    the staged rotation every query has at least one driver row. A new
    query MUST be appended to _DRIVER_PRIORITY_NEXT when registered."""
    import json
    import os

    qs = registry.all_queries()
    missing = [n for n in registry._DRIVER_PRIORITY_NEXT if n not in qs]
    assert missing == []
    checked = set()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for f in sorted(os.listdir(root)):
        if f.startswith("CORRECTNESS_r") and f.endswith(".json"):
            with open(os.path.join(root, f)) as fh:
                checked |= set(json.load(fh))
    covered = (
        set(registry._DRIVER_PRIORITY)
        | set(registry._DRIVER_PRIORITY_NEXT)
        | checked
    )
    uncovered = sorted(set(qs) - covered)
    assert uncovered == [], uncovered
