"""Golden and invariant tests for the two operators redesigned in
round 7 after the degenerate-readout audit: did_error_impact (early-
exposure cohort assignment) and good_turing_counts (trigram counts).
Both already have tri-scale DuckDB-oracle parity; these tests pin the
semantics against an INDEPENDENT pure-Python recomputation so a
same-bug-both-engines regression cannot slip through."""

from __future__ import annotations

import re
from collections import Counter

import pandas as pd

from kinesis_analytics_demo_spark.caching import release_tracked
from kinesis_analytics_demo_spark.plans.registry import get_query
from tests.conftest import SF_SMALL


def test_good_turing_matches_pure_python(spark):
    """Full golden: trigram counts, frequency-of-frequencies, r*, and
    p_gt recomputed in pure Python over the same parquet."""
    from kinesis_analytics_demo_spark.operators.sketches2 import GT_MAX_R

    docs = pd.read_parquet(SF_SMALL + "/documents.parquet")
    tri = Counter()
    for text in docs["text"]:
        ws = [w for w in re.split(r"\s+", text) if w != ""]
        for i in range(len(ws) - 2):
            tri[(ws[i], ws[i + 1], ws[i + 2])] += 1
    ff = Counter(tri.values())  # r -> f_r
    n_tokens = sum(r * fr for r, fr in ff.items())
    expected = {}
    for r, fr in ff.items():
        if r > GT_MAX_R:
            continue
        fr1 = ff.get(r + 1, 0)
        rstar = (r + 1) * float(fr1) / fr
        expected[r] = (fr, fr1, rstar, rstar / n_tokens)

    try:
        rows = {
            r["r"]: r
            for r in get_query("good_turing_counts")
            .fn(spark, SF_SMALL)
            .collect()
        }
    finally:
        release_tracked()
    assert rows, "redesigned GT must be non-degenerate at SF_SMALL"
    assert set(rows) == set(expected)
    for r, (fr, fr1, rstar, pgt) in expected.items():
        got = rows[r]
        assert got["f_r"] == fr and got["f_r1"] == fr1, r
        # rounding-mode-agnostic: half a 1e-6 / 1e-9 grid step
        assert abs(got["r_star"] - rstar) <= 5e-7, (r, got["r_star"], rstar)
        assert abs(got["p_gt"] - pgt) <= 5e-10, (r, got["p_gt"], pgt)


def test_did_cohorts_split_and_decompose(spark):
    """The round-7 redesign's whole point: BOTH cohorts are non-empty
    at test scale, the cohort sizes match an independent pandas
    recomputation of the early-exposure assignment, and the released
    DiD equals the difference of the released per-cohort differences
    (internal consistency of the 3-op chain)."""
    import numpy as np

    from kinesis_analytics_demo_spark.operators.analytics import (
        DID_ASSIGN_Q,
    )

    ev = pd.read_parquet(SF_SMALL + "/events.parquet")
    es = (ev["ts"].astype("datetime64[us]").astype("int64") // 1_000_000)
    cut = np.percentile(es, DID_ASSIGN_Q * 100)  # linear interp, both
    treated = set(ev.loc[(ev["event_type"] == "error") & (es <= cut), "user_id"])
    n_users = ev["user_id"].nunique()

    try:
        row = (
            get_query("did_error_impact").fn(spark, SF_SMALL).collect()[0]
        )
    finally:
        release_tracked()
    assert row["n_treated"] == len(treated)
    assert row["n_control"] == n_users - len(treated)
    assert row["n_treated"] > 0 and row["n_control"] > 0
    did = (row["post_treated"] - row["pre_treated"]) - (
        row["post_control"] - row["pre_control"]
    )
    # the operator rounds each mean to 6dp before release, then rounds
    # the did of UNROUNDED means — allow the released-mean grid error
    assert abs(row["did"] - did) <= 2e-6, (row["did"], did)
