"""bench.py output contract: the driver tail-captures the LAST ~2000
chars of stdout and parses a JSON line from them. Round 4's single
full-detail line outgrew that window (BENCH_r04 ``parsed: null``), so
bench now prints detail first and a short headline line LAST — this
pins the final line's size and shape without running the benchmark."""

from __future__ import annotations

import json

import bench


def _fake_timings(n=80):
    # Worst realistic shape: many queries, long snake_case names,
    # 4-sig-fig values.
    return {
        f"dedup_containment_pipeline_variant_{i:02d}": round(0.1 + i * 0.07, 3)
        for i in range(n)
    }


def test_final_line_fits_driver_tail_window():
    timings = _fake_timings()
    lines = bench.format_output(timings, sum(timings.values()), 0.1, 2)
    assert len(lines) == 2
    # Final line (what the driver parses) must survive a 2000-char
    # tail capture whole, with headroom.
    assert len(lines[-1]) <= bench._TAIL_SAFE_CHARS < 2000


def test_final_line_is_parseable_headline():
    timings = _fake_timings()
    total = sum(timings.values())
    lines = bench.format_output(timings, total, 0.1, 2)
    rec = json.loads(lines[-1])
    assert rec["metric"] == "headline_queries_wall_sec"
    assert rec["value"] == round(total, 3)
    assert rec["unit"] == "sec"
    assert rec["sf"] == 0.1
    assert rec["queries_total"] == len(timings)
    # top-N slowest subset, values intact
    assert len(rec["queries"]) == bench._TOP_N
    slowest = max(timings, key=timings.get)
    assert rec["queries"][slowest] == timings[slowest]


def test_detail_line_keeps_every_query():
    timings = _fake_timings()
    lines = bench.format_output(timings, sum(timings.values()), 0.1, 2)
    rec = json.loads(lines[0])
    assert rec["queries"] == timings


def test_headline_names_registered():
    """Every benched name must exist in the registry (catches a
    rename that would crash bench at the driver)."""
    from kinesis_analytics_demo_spark.plans.registry import all_queries

    qs = all_queries()
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert not missing, missing
