"""Semantic checks for curation part 3: the fuzzy matcher must
recover every planted corruption, the Pareto frontier must satisfy
the dominance definition on both sides (members undominated,
non-members dominated), and topic labeling must emit a full ranked
slate per cluster. (Cross-engine value parity is covered by
test_oracle_parity — whose fuzzy oracle is the brute-force all-pairs
argmin, so green there already proves blocking loses no matches.)"""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.operators.curation3 import (
    TOPIC_TOP,
    cluster_topic_terms,
    fuzzy_match_entity_names,
    pareto_quality_frontier,
)
from kinesis_analytics_demo_spark.session import read_table
from tests.conftest import SF_MEDIUM, SF_SMALL


def test_fuzzy_match_recovers_planted_truth(spark):
    """Every dirty variant was derived from a known supplier — the
    linkage must map each one back to exactly its source, at edit
    distance 1, with no supplier unmatched."""
    out = fuzzy_match_entity_names(spark, SF_MEDIUM).collect()
    n_sup = read_table(spark, SF_MEDIUM, "supplier").count()
    assert len(out) == n_sup
    for r in out:
        assert r["matched_suppkey"] == r["dirty_id"], r
        assert r["edit_distance"] == 1, r


def test_pareto_frontier_is_exactly_the_undominated_set(spark):
    """Check the skyline definition directly: no member dominated by
    any document, every non-member dominated by some member."""
    sky = pareto_quality_frontier(spark, SF_SMALL)
    pts = [(r["quality_score"], r["n_chars"], r["doc_id"]) for r in sky.collect()]
    assert pts, "frontier must be non-empty on non-empty input"

    def dominates(a, b):
        return a[0] >= b[0] and a[1] >= b[1] and (a[0] > b[0] or a[1] > b[1])

    member_pts = [(q, n) for q, n, _ in pts]
    # 1) no member dominates another member
    for a in member_pts:
        for b in member_pts:
            assert not dominates(a, b), (a, b)

    # 2) every non-member is dominated by some member — recompute each
    # doc's (q, n) with the shared oracle-side score expression.
    import duckdb

    from kinesis_analytics_demo_spark.operators.text import sql_quality_score

    con = duckdb.connect()
    toks_expr = "string_split_regex(text, '\\s+')"
    rows = con.execute(
        f"""
        SELECT doc_id,
               {sql_quality_score(toks_expr)} AS q,
               n_chars AS n
        FROM '{SF_SMALL}/documents.parquet'
        """
    ).fetchall()
    member_ids = {d for _, _, d in pts}
    for doc_id, q, n in rows:
        if doc_id in member_ids:
            continue
        assert any(dominates(m, (q, n)) for m in member_pts), (doc_id, q, n)


def test_cluster_topics_full_slate_per_cluster(spark):
    """Each cluster gets exactly TOPIC_TOP terms ranked 1..TOP with
    positive lift, and the top term's lift is >= 1x corpus rate is
    NOT required (a uniform cluster may sit below 1) — but ranks must
    be dense and lifts non-increasing within a cluster."""
    out = cluster_topic_terms(spark, SF_MEDIUM)
    rows = out.collect()
    by_cid: dict[int, list] = {}
    for r in rows:
        by_cid.setdefault(r["cid"], []).append(r)
    n_labels = (
        read_table(spark, SF_MEDIUM, "embeddings")
        .select("label")
        .distinct()
        .count()
    )
    assert len(by_cid) == n_labels
    for cid, rs in by_cid.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, TOPIC_TOP + 1)), cid
        lifts = [r["lift"] for r in rs]
        assert all(l > 0 for l in lifts), cid
        assert lifts == sorted(lifts, reverse=True), cid


def test_fuzzy_match_plan_is_blocked_not_cross(spark):
    """The production plan must candidate-generate via the blocking
    equi-join — no cartesian product (that's the oracle's job)."""
    plan = fuzzy_match_entity_names(spark, SF_MEDIUM)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
