"""Bucketed (sub-quadratic) embedding near-dup: recall vs the exact
all-pairs query, recall at realistic near-dup similarity, and the
no-O(N^2)-stage plan audit VERDICT.md round 1 asked for."""

from __future__ import annotations

import math
import random
import re

from pyspark.sql import functions as F

from kinesis_analytics_demo_spark.operators.dedup import (
    EMBEDDING_NEAR_DUP_COSINE,
)
from kinesis_analytics_demo_spark.operators.dedup_embedding import (
    embedding_near_dup_bucketed,
)
from kinesis_analytics_demo_spark.plans.registry import all_queries
from tests.conftest import SF_MEDIUM


def _pairs(df):
    return {(r["vec_a"], r["vec_b"]) for r in df.collect()}


def test_bucketed_subset_of_exact_with_pinned_recall(spark):
    """Every bucketed pair is a true near-dup (verify stage is exact),
    and blocking recall at this corpus's pathological 0.45 threshold
    (max pairwise sim ~0.51 — essentially random vectors, the hardest
    possible case for any blocking scheme) stays at the measured
    11/14 floor."""
    exact = _pairs(all_queries()["dedup_embedding_cosine"].fn(spark, SF_MEDIUM))
    bucketed = _pairs(
        all_queries()["dedup_embedding_cosine_bucketed"].fn(spark, SF_MEDIUM)
    )
    assert bucketed <= exact
    assert len(exact) == 14
    assert len(bucketed) >= 11


def test_bucketed_recall_at_real_near_dup_threshold(spark):
    """At a realistic near-dup threshold (0.9) on a corpus with
    planted jittered duplicates, IVF-list blocking finds every
    planted pair: near-identical vectors land in the same probed
    lists essentially always."""
    rng = random.Random(7)
    dim, n_base, n_dup = 16, 120, 30

    def unit(v):
        s = math.sqrt(sum(x * x for x in v))
        return [x / s for x in v]

    base = [unit([rng.gauss(0, 1) for _ in range(dim)]) for _ in range(n_base)]
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    planted = set()
    for d in range(n_dup):
        src = rng.randrange(n_base)
        jitter = unit(
            [x + rng.gauss(0, 0.02) for x in base[src]]
        )  # cosine vs src ~0.999
        rows.append((n_base + d, [float(x) for x in jitter]))
        planted.add((src, n_base + d))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cent = (
        emb.filter(F.col("vec_id") < 8)
        .select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cv"))
    )
    found = _pairs(embedding_near_dup_bucketed(emb, cent, 0.9, nprobe=2))
    hit = {p for p in planted if p in found}
    assert len(hit) / len(planted) >= 0.95


def test_bucketed_plan_has_no_quadratic_stage(spark):
    """The bucketed path must never plan an all-pairs product over the
    corpus: the only nested-loop is the BROADCAST centroid cross
    (O(N*k)); candidate generation and verify join-backs are
    hash-keyed equi-joins."""
    df = all_queries()["dedup_embedding_cosine_bucketed"].fn(spark, SF_MEDIUM)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the only nested loops are the O(N*k) broadcast centroid cross
    # and the 1-row adaptive-draw stats broadcast (round 8). The
    # centroid frame is persisted (ADVICE r8 — its count action and
    # the member assign share one materialization), and the
    # InMemoryRelation node re-prints the cached lineage, so the
    # stats-broadcast BNLJ can appear several times TEXTUALLY;
    # classify each occurrence instead of counting: a conditioned
    # BNLJ must be the md5-threshold adaptive draw (its pushed
    # condition contains the md5 conv()), and at most one
    # condition-free Cross may exist — the centroid assign.
    bnlj_lines = [
        ln for ln in plan.splitlines() if "BroadcastNestedLoopJoin" in ln
    ]
    assert bnlj_lines
    free_cross = 0
    for ln in bnlj_lines:
        # parse join type + condition independently of each other
        # (ADVICE r9: splitting on the literal 'Cross' classified a
        # conditioned Inner BNLJ as the condition-free cross) —
        # format: "BroadcastNestedLoopJoin Build<Side>, <Type>[, (cond)]"
        m = re.search(
            r"BroadcastNestedLoopJoin Build(?:Left|Right), (\w+)"
            r"(?:, (\(.*\)))?\s*$",
            ln,
        )
        assert m, ln
        jtype, cond = m.group(1), (m.group(2) or "").strip()
        if cond:
            assert "conv(" in cond, ln  # the 1-row md5-draw stats join
        else:
            # the one allowed condition-free nested loop must really
            # be the Cross centroid assign, not an unconditioned Inner
            assert jtype == "Cross", ln
            free_cross += 1
    assert free_cross <= 1  # the O(N*k) broadcast centroid assign
    assert plan.count("IdentityBroadcastMode") >= len(bnlj_lines)
    # verify runs as per-list matrix kernels (one mapInPandas), fed by
    # a hash-partitioned collect_list — no pair-row join anywhere
    assert plan.count("MapInPandas") == 1
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def _chain_labels(spark, n_nodes: int, max_rounds: int):
    """Min-label propagation over a path graph 0-1-2-...-(n-1) — the
    worst-case (diameter n-1) shape for a near-duplicate cluster."""
    from kinesis_analytics_demo_spark.operators.dedup import label_propagation

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n_nodes - 1)]
        + [(i + 1, i) for i in range(n_nodes - 1)],
        "src long, dst long",
    )
    labels = spark.createDataFrame(
        [(i, i) for i in range(n_nodes)], "doc_id long, cluster_id long"
    )
    return label_propagation(labels, edges, max_rounds=max_rounds)


def test_label_propagation_converges_at_cap_diameter(spark):
    """VERDICT r2 item 6: a chain whose diameter is exactly at the
    convergence budget (n-1 propagation rounds + 1 observe-no-change
    round = max_rounds) must converge to a single cluster labeled 0."""
    got = {(r.doc_id, r.cluster_id) for r in _chain_labels(spark, 20, 20).collect()}
    assert got == {(i, 0) for i in range(20)}


def test_label_propagation_raises_past_cap(spark):
    """A chain longer than the round cap must RAISE, never return
    silently-unconverged labels (they would diverge from the
    recursive-CTE oracle)."""
    import pytest

    with pytest.raises(RuntimeError, match="did not converge"):
        _chain_labels(spark, 26, 20).collect()


def test_hybrid_clusters_coarsen_both_graphs(spark):
    """The hybrid (lexical UNION semantic) component partition must be
    coarser than BOTH single-signal partitions: merging edge sets can
    only merge clusters, never split them — and on this corpus it must
    actually merge something (the planted near-dups overlap the two
    signals only partially)."""
    from kinesis_analytics_demo_spark.operators.dedup import (
        dedup_hybrid_clusters,
        dedup_minhash_clusters,
    )
    from kinesis_analytics_demo_spark.operators.dedup_embedding import (
        dedup_embedding_clusters,
    )
    from tests.conftest import SF_MEDIUM

    n_hybrid = (
        dedup_hybrid_clusters(spark, SF_MEDIUM)
        .select("cluster_id").distinct().count()
    )
    n_lex = (
        dedup_minhash_clusters(spark, SF_MEDIUM)
        .select("cluster_id").distinct().count()
    )
    n_sem = (
        dedup_embedding_clusters(spark, SF_MEDIUM)
        .select("cluster_id").distinct().count()
    )
    assert n_hybrid <= min(n_lex, n_sem)
    assert n_hybrid < max(n_lex, n_sem), (
        f"hybrid={n_hybrid} lex={n_lex} sem={n_sem}: union merged nothing"
    )
