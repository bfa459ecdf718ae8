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


def test_round4_rotation_names_stay_registered():
    """The prepared round-4 priority list must not rot: every name in
    it resolves, and together with the active first-50 it covers the
    whole registry."""
    qs = registry.all_queries()
    missing = [n for n in registry._DRIVER_PRIORITY_R4 if n not in qs]
    assert missing == []
    covered = set(registry._DRIVER_PRIORITY) | set(registry._DRIVER_PRIORITY_R4)
    assert covered == set(qs)
