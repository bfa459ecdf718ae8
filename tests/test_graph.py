"""PageRank: closed-form sanity on tiny synthetic graphs plus the
probability-mass invariant on the trade graph."""

from __future__ import annotations

import pytest

from kinesis_analytics_demo_spark.caching import release_tracked
from kinesis_analytics_demo_spark.operators.graph import pagerank
from kinesis_analytics_demo_spark.plans.registry import get_query
from tests.conftest import SF_MEDIUM


def _run(spark, nodes, edges, **kw):
    n = spark.createDataFrame([(x,) for x in nodes], "node_id string")
    e = spark.createDataFrame(list(edges), "src string, dst string")
    try:
        return {r["node_id"]: r["rank"] for r in pagerank(n, e, **kw).collect()}
    finally:
        release_tracked()


def test_two_node_cycle_is_uniform(spark):
    """a<->b: symmetric, so rank stays exactly 1/2 each iteration."""
    ranks = _run(spark, ["a", "b"], [("a", "b"), ("b", "a")])
    assert ranks["a"] == pytest.approx(0.5, abs=1e-9)
    assert ranks["b"] == pytest.approx(0.5, abs=1e-9)


def test_sink_absorbs_rank(spark):
    """a->b, b dangling: b must outrank a, mass stays ~1 (dangling
    redistribution keeps the distribution stochastic)."""
    ranks = _run(spark, ["a", "b"], [("a", "b")])
    assert ranks["b"] > ranks["a"]
    assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-6)


def test_star_center_dominates(spark):
    leaves = [f"l{i}" for i in range(6)]
    edges = [(leaf, "hub") for leaf in leaves] + [("hub", leaf) for leaf in leaves]
    ranks = _run(spark, ["hub", *leaves], edges)
    assert all(ranks["hub"] > ranks[leaf] for leaf in leaves)
    # leaves are symmetric: identical rank (bit-equal by determinism)
    assert len({ranks[leaf] for leaf in leaves}) == 1


def test_trade_graph_mass_and_oracle_shape(spark):
    spec = get_query("pagerank_trade_graph")
    df = spec.fn(spark, SF_MEDIUM)
    try:
        rows = df.collect()
    finally:
        release_tracked()
    ranks = [r["rank"] for r in rows]
    assert all(r > 0 for r in ranks)
    # mass conservation within rounding drift (5 iters x 12 digits)
    assert sum(ranks) == pytest.approx(1.0, abs=1e-6)


def _cc(spark, edges):
    from kinesis_analytics_demo_spark.operators.graph import (
        connected_components,
    )

    e0 = spark.createDataFrame(list(edges), "u long, v long")
    sym = e0.union(e0.selectExpr("v AS u", "u AS v"))
    try:
        return {
            r["node"]: r["lbl"] for r in connected_components(sym).collect()
        }
    finally:
        release_tracked()


def test_cc_two_components(spark):
    """Path 1-2-3 plus edge 10-11: labels are the component minima."""
    lbl = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert lbl == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_cc_long_path_converges(spark):
    """A 40-node path exceeds any naive per-hop budget within
    CC_MAX_ITERS — pointer jumping must collapse it in O(log n)."""
    lbl = _cc(spark, [(i, i + 1) for i in range(40)])
    assert set(lbl.values()) == {0} and len(lbl) == 41


# ------------------------------------------------------- k-core peeling
def _kcore(spark, edges, k):
    from kinesis_analytics_demo_spark.operators.graph import (
        kcore_surviving_edges,
    )

    e0 = spark.createDataFrame(list(edges), "src long, dst long")
    sym = e0.union(e0.selectExpr("dst AS src", "src AS dst"))
    try:
        surv = kcore_surviving_edges(sym, k=k)
        from pyspark.sql import functions as F

        deg = {
            r["src"]: r["n"]
            for r in surv.groupBy("src")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        return deg
    finally:
        release_tracked()


def test_kcore_triangle_with_pendant(spark):
    """Triangle 1-2-3 plus pendant 3-4: the 2-core is the triangle."""
    deg = _kcore(spark, [(1, 2), (2, 3), (1, 3), (3, 4)], k=2)
    assert deg == {1: 2, 2: 2, 3: 2}


def test_kcore_k4_with_tail(spark):
    """K4 on 1-4 plus tail 4-5-6: the 3-core is exactly K4 (each node
    degree 3); the tail and its attachment edges peel away."""
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    deg = _kcore(spark, k4 + [(4, 5), (5, 6)], k=3)
    assert deg == {1: 3, 2: 3, 3: 3, 4: 3}


def test_kcore_path_has_no_2core(spark):
    """A path graph has no 2-core: everything peels (cascading)."""
    deg = _kcore(spark, [(1, 2), (2, 3), (3, 4), (4, 5)], k=2)
    assert deg == {}
