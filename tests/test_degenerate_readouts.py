"""Registry-wide degenerate-readout audit (round-7 verdict item 2).

A query whose result is EMPTY at every test scale factor passes the
driver's oracle-parity gate trivially — both engines agree on the
empty answer — while checking nothing. Round 7 found two real defects
of this class by hand (``did_error_impact``: empty control cohort at
every SF; ``good_turing_counts``: no unigram frequency class with
r<=10 in the 31-word synthetic vocab). This test automates that audit
so a future zero-row design cannot land silently.

The check is DuckDB-only (no JVM): for every registered query with an
oracle, row-count the oracle at sf0.01 and assert the readout is
non-empty. Oracle parity (the driver gate plus the suite's parity
tests) guarantees the Spark side returns the same count, so a
non-empty oracle readout certifies a non-empty Spark readout.

Allowlist: queries whose zero-row answer at small SFs is a documented
DATA artifact, not a design degeneracy.
"""

from __future__ import annotations

from kinesis_analytics_demo_spark.plans import registry

#: Zero rows at sf0.01 is the CORRECT answer for these, verified
#: against the data, not a degenerate design:
#: - customers_without_orders: the sf0.001/sf0.01 generators give
#:   every customer at least one order; the anti-join is exercised
#:   non-trivially at sf0.1 and by tests/test_empty_inputs.py.
ZERO_ROW_ALLOWLIST = {
    "customers_without_orders",
}


def test_no_degenerate_readouts_at_sf001(oracle_con):
    """Every oracle'd query must read out >0 rows at sf0.01 (or be on
    the documented allowlist). ~2 min, DuckDB only."""
    zero = []
    for name, spec in registry.all_queries().items():
        if spec.oracle is None:
            continue
        n = oracle_con.sql(
            f"SELECT count(*) FROM ({spec.oracle})"
        ).fetchone()[0]
        if n == 0 and name not in ZERO_ROW_ALLOWLIST:
            zero.append(name)
    assert zero == [], (
        "zero-row readouts at sf0.01 — parity-green but checking "
        f"nothing; redesign or allowlist with a data-artifact proof: {zero}"
    )


def test_allowlist_entries_still_registered():
    """A renamed/removed query must not leave a stale allowlist row."""
    qs = registry.all_queries()
    stale = [n for n in ZERO_ROW_ALLOWLIST if n not in qs]
    assert stale == []
