"""Golden test for similarity_mmr_diversified. The query also has a
full DuckDB oracle (recursive CTE + LATERAL greedy argmax), so this
pure-Python MMR reimplementation — same float64 operations in the
same left-to-right order as the Spark fold — is the third,
engine-independent witness: exact candidate pools, selection order,
and scores at two scale factors."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from kinesis_analytics_demo_spark.operators.similarity import N_QUERIES
from kinesis_analytics_demo_spark.operators.similarity2 import (
    MMR_CAND,
    MMR_K,
    MMR_LAMBDA,
)
from kinesis_analytics_demo_spark.plans.registry import all_queries
from tests.conftest import SF_SMALL, SF_MEDIUM


def _dot(a: list[float], b: list[float]) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _python_mmr(sf_dir: str) -> list[tuple[int, int, int]]:
    """(query_id, select_rank, neighbor_id) triples plus score map."""
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    ).fetchall()
    vecs = {vid: [float(x) for x in emb] for vid, emb in rows}
    norms = {vid: math.sqrt(_dot(v, v)) for vid, v in vecs.items()}
    out = []
    for qid in range(N_QUERIES):
        qv, qn = vecs[qid], norms[qid]
        sims = [
            (_dot(v, qv) / (norms[vid] * qn), vid)
            for vid, v in vecs.items()
            if vid != qid
        ]
        # top-MMR_CAND by (sim desc, id asc) — the Spark window order
        cand = sorted(sims, key=lambda t: (-t[0], t[1]))[:MMR_CAND]
        selected: list[tuple[int, float]] = []  # (id, mmr)
        while len(selected) < MMR_K:
            best = None
            for sim, vid in cand:
                if any(vid == s for s, _ in selected):
                    continue
                red = max(
                    (
                        _dot(vecs[vid], vecs[s])
                        / (norms[vid] * norms[s])
                        for s, _ in selected
                    ),
                    default=0.0,
                )
                mmr = MMR_LAMBDA * sim - (1 - MMR_LAMBDA) * red
                key = (mmr, -vid)
                if best is None or key > best[0]:
                    best = (key, vid, mmr)
            selected.append((best[1], best[2]))
        out.extend(
            (qid, k + 1, vid, mmr)
            for k, (vid, mmr) in enumerate(selected)
        )
    return out


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_MEDIUM])
def test_mmr_matches_python_golden(spark, sf_dir):
    spec = all_queries()["similarity_mmr_diversified"]
    got = {
        (r["query_id"], r["select_rank"]): (
            r["neighbor_id"],
            r["mmr_score"],
        )
        for r in spec.fn(spark, sf_dir).collect()
    }
    want = _python_mmr(sf_dir)
    assert len(got) == len(want) == N_QUERIES * MMR_K
    for qid, rank, vid, mmr in want:
        g_vid, g_mmr = got[(qid, rank)]
        assert g_vid == vid, (qid, rank, g_vid, vid)
        # mmr_score is ROUND(.,6) in the query output: allow half a
        # 1e-6 grid step against the raw golden value
        assert abs(g_mmr - mmr) <= 5.001e-7, (qid, rank, g_mmr, mmr)


def test_mmr_picks_are_distinct_and_first_is_top1(spark):
    spec = all_queries()["similarity_mmr_diversified"]
    rows = spec.fn(spark, SF_SMALL).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    top1 = {
        r["query_id"]: r["neighbor_id"]
        for r in all_queries()["similarity_cosine_topk"]
        .fn(spark, SF_SMALL)
        .collect()
        if r["rank"] == 1
    }
    for qid, picks in by_q.items():
        ids = [p["neighbor_id"] for p in picks]
        assert len(set(ids)) == MMR_K
        # with an empty selected set the MMR score is lambda*sim, so
        # the first pick must equal the plain cosine top-1
        first = min(picks, key=lambda p: p["select_rank"])
        assert first["neighbor_id"] == top1[qid]


def test_mmr_degenerate_pool_matches_oracle(spark, tmp_path):
    """ADVICE r5: with fewer than MMR_K candidates per query, the
    Spark fold must STOP growing (the recursive-CTE oracle terminates
    early) instead of appending null-field structs up to MMR_K rows.
    Build a 4-vector corpus (3 candidates per query < MMR_K=5) and
    assert full engine parity on it."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kinesis_analytics_demo_spark.operators.similarity import DIM
    from tests.conftest import assert_matches_oracle

    rng = np.random.default_rng(7)
    n = 4  # all 4 are queries (vec_id < N_QUERIES); pools have 3 < MMR_K
    vecs = rng.standard_normal((n, DIM)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), type=pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vecs], type=pa.list_(pa.float32())
            ),
            "label": pa.array([i % 2 for i in range(n)], type=pa.int32()),
        }
    )
    sf_dir = str(tmp_path)
    pq.write_table(tbl, os.path.join(sf_dir, "embeddings.parquet"))

    spec = all_queries()["similarity_mmr_diversified"]
    df = spec.fn(spark, sf_dir)
    rows = df.collect()
    # 4 queries x 3-candidate pools: exactly 3 picks each, none null
    assert len(rows) == n * (n - 1)
    assert all(r["neighbor_id"] is not None for r in rows)
    assert all(r["mmr_score"] is not None for r in rows)

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    assert_matches_oracle(df, con, spec.oracle)
    con.close()
