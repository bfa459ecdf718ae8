"""Bounds oracle for ``approx_aggregates`` (VERDICT r10 item 6).

The driver's correctness gate is an equality hash, which a sketch
readout can never satisfy (HLL++/KLL internals differ per engine), so
the registry entry is rows-only by design. This test is the missing
value check — the BPE-golden precedent (tests/test_curation2.py)
applied to approximate aggregates: every approx column must satisfy
the sketch's DOCUMENTED error bound against the exact value computed
by the DuckDB oracle on the same parquet.

Bounds tested (both deterministic per dataset — Spark's sketches are
seed-free, so a pass is stable until the testdata regenerates):

- ``approx_count_distinct`` uses HyperLogLog++ with default
  relativeSD = 0.05; we assert relative error <= 3 * 0.05 (plus an
  absolute slack of 1 for tiny groups, where the integer grid
  dominates the relative bound).
- ``percentile_approx`` uses the Greenwald-Khanna variant with
  default accuracy = 10000, guaranteeing a RANK error of at most
  n/accuracy; the returned value is an actual element of the group,
  so we recompute its rank window in DuckDB and assert the target
  quantile falls inside [lo_rank - eps*n - 1, hi_rank + eps*n + 1].
"""

from __future__ import annotations

import pytest

from kinesis_analytics_demo_spark.plans.registry import get_query

HLL_RSD = 0.05  #: Spark default relativeSD of approx_count_distinct
GK_ACCURACY = 10000  #: Spark default accuracy of percentile_approx

SFS = [("sf001", "/root/testdata/sf0.001"), ("sf01", "/root/testdata/sf0.01")]


@pytest.mark.parametrize("schema,sf_dir", SFS, ids=[s for s, _ in SFS])
def test_approx_aggregates_within_documented_bounds(
    spark, oracle_con, schema, sf_dir
):
    rows = {
        r["l_returnflag"]: r.asDict()
        for r in get_query("approx_aggregates").fn(spark, sf_dir).collect()
    }
    exact = {
        flag: (nd, n)
        for flag, nd, n in oracle_con.sql(
            f"""SELECT l_returnflag, count(DISTINCT l_partkey), count(*)
                FROM {schema}.lineitem GROUP BY l_returnflag"""
        ).fetchall()
    }
    assert set(rows) == set(exact)

    for flag, r in rows.items():
        nd, n = exact[flag]
        # HLL++: |approx - exact| <= 3*rsd*exact (+1 integer slack)
        assert abs(r["approx_parts"] - nd) <= 3 * HLL_RSD * nd + 1, (
            flag, r["approx_parts"], nd,
        )
        # GK: the returned value's rank window must contain the target
        # quantile within the documented n/accuracy rank error
        for col, q in (
            ("approx_median_price", 0.5),
            ("approx_p25", 0.25),
            ("approx_p75", 0.75),
        ):
            v = r[col]
            below, at_or_below = oracle_con.sql(
                f"""SELECT count(*) FILTER (l_extendedprice < {v!r}),
                           count(*) FILTER (l_extendedprice <= {v!r})
                    FROM {schema}.lineitem
                    WHERE l_returnflag = '{flag}'"""
            ).fetchall()[0]
            eps_rank = n / GK_ACCURACY + 1
            target = q * n
            assert below - eps_rank <= target <= at_or_below + eps_rank, (
                flag, col, v, below, at_or_below, target, n,
            )
