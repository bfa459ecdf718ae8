"""Semantic invariants for the analytics family — properties the
oracle-parity gate (which only proves Spark == DuckDB) cannot state:
one-sided sketch error, no-false-negative filtering, cohort
completeness, threshold consistency.
"""

from __future__ import annotations

from kinesis_analytics_demo_spark.plans.registry import all_queries
from kinesis_analytics_demo_spark.session import read_table
from tests.conftest import SF_MEDIUM, SF_SMALL


def test_cms_never_underestimates(spark):
    """Count-min's defining guarantee: estimate >= exact, always."""
    qs = all_queries()
    rows = qs["heavy_hitters_cms"].fn(spark, SF_MEDIUM).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.cms_estimate >= r.exact_count, r
        assert r.never_underestimates


def test_bloom_no_false_negatives(spark):
    """A bloom filter may over-admit but must NEVER drop a true
    member: pass count >= member count, and fp accounting closes."""
    qs = all_queries()
    for sf in (SF_SMALL, SF_MEDIUM):
        (r,) = qs["bloom_filter_semijoin"].fn(spark, sf).collect()
        assert r.n_pass_bloom >= r.n_true_members, (sf, r)
        assert r.n_pass_bloom == r.n_true_members + r.n_false_positives, (sf, r)
        assert r.n_orders >= r.n_pass_bloom


def test_zscore_flags_consistent(spark):
    """Every flagged row's reported z matches its flag threshold, and
    the flagged set is recomputable from raw moments in python."""
    import math
    from collections import defaultdict

    qs = all_queries()
    flagged = {
        r.event_id: r.zscore
        for r in qs["anomaly_zscore_events"].fn(spark, SF_MEDIUM).collect()
    }
    assert flagged, "threshold should flag something at sf0.01"
    for z in flagged.values():
        assert abs(z) > 2.5

    ev = read_table(spark, SF_MEDIUM, "events").select(
        "event_id", "event_type", "value"
    )
    groups = defaultdict(list)
    rows = ev.collect()
    for r in rows:
        groups[r.event_type].append(r.value)
    expect = set()
    for r in rows:
        vs = groups[r.event_type]
        n = len(vs)
        mean = math.fsum(vs) / n
        var = math.fsum(v * v for v in vs) / n - mean * mean
        if abs((r.value - mean) / math.sqrt(var)) > 2.5:
            expect.add(r.event_id)
    # the decimal-exact engine selection and the float recomputation
    # may disagree only for rows within float error of the boundary;
    # none exist in this data — require exact agreement
    assert expect == set(flagged)


def test_cohort_week0_covers_every_user(spark):
    """Every user is active in their own cohort week, so the offset-0
    counts must sum to the number of distinct users."""
    qs = all_queries()
    rows = qs["cohort_retention"].fn(spark, SF_MEDIUM).collect()
    week0 = sum(r.n_users for r in rows if r.week_offset == 0)
    n_users = (
        read_table(spark, SF_MEDIUM, "events").select("user_id").distinct().count()
    )
    assert week0 == n_users
    assert all(r.week_offset >= 0 for r in rows)


def test_repeated_span_coverage_bounded(spark):
    """Span coverage can never exceed the doc's token count, and a
    doc with zero duplicated grams must have zero coverage."""
    qs = all_queries()
    for r in qs["dedup_repeated_ngram_spans"].fn(spark, SF_MEDIUM).collect():
        assert 0 <= r.covered_tokens <= r.n_tokens, r
        if r.n_dup_grams == 0:
            assert r.covered_tokens == 0, r
        else:
            # one dup gram covers exactly 5 positions; unions overlap
            assert 5 <= r.covered_tokens <= 5 * r.n_dup_grams, r
