"""Pure-Python golden cross-checks for the round-6 trend/tail batch:
Mann-Kendall, lagged cross-correlation, and the Hill tail index. Each
test recomputes the statistic a THIRD way (DuckDB supplies only the
exact daily/rank inputs; the statistic itself is hand-rolled Python)
and compares against the registered Spark query at sf0.001 — so a
shared misreading of the formula in the Spark/oracle twins would
still be caught."""

from __future__ import annotations

import math

import duckdb
import pytest

from kinesis_analytics_demo_spark.caching import release_tracked
from kinesis_analytics_demo_spark.plans.registry import get_query
from tests.conftest import SF_SMALL


def _daily(sf_dir: str, types=None):
    con = duckdb.connect()
    where = (
        "WHERE event_type IN ({})".format(
            ",".join(f"'{t}'" for t in types)
        )
        if types
        else ""
    )
    rows = con.sql(
        f"""
        SELECT event_type,
               date_diff('day', DATE '1970-01-01',
                         CAST(date_trunc('day', ts) AS DATE)) AS di,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
                   AS v
        FROM read_parquet('{sf_dir}/events.parquet') {where}
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    con.close()
    out: dict[str, list[tuple[int, float]]] = {}
    for et, di, v in rows:
        out.setdefault(et, []).append((di, v))
    return out


def test_mann_kendall_python_golden(spark):
    series = _daily(SF_SMALL)
    spec = get_query("mann_kendall_event_types")
    try:
        got = {r["event_type"]: r for r in spec.fn(spark, SF_SMALL).collect()}
    finally:
        release_tracked()
    assert set(got) == set(series)
    for et, pts in series.items():
        vs = [v for _, v in pts]
        n = len(vs)
        s = sum(
            (vs[j] > vs[i]) - (vs[j] < vs[i])
            for i in range(n)
            for j in range(i + 1, n)
        )
        counts: dict[float, int] = {}
        for v in vs:
            counts[v] = counts.get(v, 0) + 1
        tie = sum(t * (t - 1) * (2 * t + 5) for t in counts.values() if t > 1)
        var = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
        r = got[et]
        assert r["n_days"] == n and r["s_stat"] == s
        assert r["var_s"] == pytest.approx(var, abs=1e-6)
        if var == 0:
            assert r["z"] is None
        elif s == 0:
            assert r["z"] == 0.0
        else:
            z = (s - 1 if s > 0 else s + 1) / math.sqrt(var)
            assert r["z"] == pytest.approx(z, abs=1e-6)


def test_ccf_python_golden(spark):
    from kinesis_analytics_demo_spark.operators.timeseries import (
        CCF_MAX_LAG,
        CCF_X_TYPE,
        CCF_Y_TYPE,
    )

    series = _daily(SF_SMALL, [CCF_X_TYPE, CCF_Y_TYPE])
    x = dict(series[CCF_X_TYPE])
    y = dict(series[CCF_Y_TYPE])
    spec = get_query("ccf_view_purchase_daily")
    try:
        got = {r["lag"]: r for r in spec.fn(spark, SF_SMALL).collect()}
    finally:
        release_tracked()
    for lag in range(-CCF_MAX_LAG, CCF_MAX_LAG + 1):
        # exact integer cents so the Python sums are float-error-free
        pairs = [
            (round(x[d] * 100), round(y[d + lag] * 100))
            for d in x
            if d + lag in y
        ]
        if not pairs:
            assert lag not in got
            continue
        n = len(pairs)
        sx = sum(p[0] for p in pairs)
        sy = sum(p[1] for p in pairs)
        sxy = sum(p[0] * p[1] for p in pairs)
        sxx = sum(p[0] * p[0] for p in pairs)
        syy = sum(p[1] * p[1] for p in pairs)
        dx, dy = n * sxx - sx * sx, n * syy - sy * sy
        r = got[lag]
        assert r["n_days"] == n
        if dx * dy <= 0:
            assert r["ccf"] is None
        else:
            # cents scaling cancels in the correlation
            assert r["ccf"] == pytest.approx(
                (n * sxy - sx * sy) / math.sqrt(dx * dy), abs=1e-6
            )


def test_hill_python_golden(spark):
    from kinesis_analytics_demo_spark.operators.stats2 import HILL_K

    con = duckdb.connect()
    rows = con.sql(
        f"""
        SELECT event_type, value FROM (
            SELECT event_type, value,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY value DESC, event_id) AS rn
            FROM read_parquet('{SF_SMALL}/events.parquet'))
        WHERE rn <= {HILL_K + 1} ORDER BY event_type, rn
        """
    ).fetchall()
    con.close()
    top: dict[str, list[float]] = {}
    for et, v in rows:
        top.setdefault(et, []).append(v)
    spec = get_query("hill_tail_index_event_values")
    try:
        got = {r["event_type"]: r for r in spec.fn(spark, SF_SMALL).collect()}
    finally:
        release_tracked()
    for et, vs in top.items():
        if len(vs) < HILL_K + 1 or vs[HILL_K] <= 0:
            assert et not in got
            continue
        xk1 = vs[HILL_K]
        acc = 0.0
        for v in vs[:HILL_K]:  # fixed-order left fold, like both engines
            acc += math.log(v / xk1)
        hinv = acc / HILL_K
        r = got[et]
        assert r["x_k1"] == xk1
        assert r["hill_inv"] == pytest.approx(hinv, abs=1e-6)
        if hinv != 0:
            assert r["tail_alpha"] == pytest.approx(1.0 / hinv, abs=1e-6)
