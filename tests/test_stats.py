"""Stats battery invariants: correlation bounds, OLS/corr coherence,
chi-square magnitude on a uniform generator."""

from __future__ import annotations

import pytest

from kinesis_analytics_demo_spark.plans.registry import get_query
from tests.conftest import SF_MEDIUM


def test_corr_bounded_and_near_zero_on_independent_cols(spark):
    rows = get_query("corr_matrix_lineitem").fn(spark, SF_MEDIUM).collect()
    assert len(rows) == 6
    for r in rows:
        assert -1.0 <= r["corr"] <= 1.0
        # TPC-H-ish generator draws these columns independently
        assert abs(r["corr"]) < 0.05, (r["col_x"], r["col_y"], r["corr"])


def test_ols_r_squared_equals_corr_squared(spark):
    corr = {
        (r["col_x"], r["col_y"]): r["corr"]
        for r in get_query("corr_matrix_lineitem").fn(spark, SF_MEDIUM).collect()
    }
    ols = get_query("ols_discount_vs_quantity").fn(spark, SF_MEDIUM).collect()[0]
    r = corr[("l_quantity", "l_discount")]
    assert ols["r_squared"] == pytest.approx(r * r, abs=1e-6)


def test_chisq_does_not_reject_uniform_generator(spark):
    row = get_query("chisq_event_type_weekday").fn(spark, SF_MEDIUM).collect()[0]
    # chi2(dof).ppf(0.999) ~ dof + 3*sqrt(2*dof); uniform data sits
    # far below any rejection threshold
    assert row["chi_square"] < row["dof"] + 10 * (2 * row["dof"]) ** 0.5
    assert row["n_cells"] <= 35
