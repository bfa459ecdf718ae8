"""Hand-verified semantics for the capped-depth repeated-substring
audit: crafted corpora where the expected LCPs are computable by
hand, plus an exact brute-force cross-check of the binary-lifting
LCP fold."""

from __future__ import annotations

import duckdb
import pytest

from kinesis_analytics_demo_spark.operators.suffix import (
    SFX_DEPTH,
    SFX_MIN_REPEAT,
    _lcp_sql,
)


def _audit_duck(rows):
    """Run the registered ORACLE over an in-memory documents table —
    the hand-verification target (Spark parity with this exact SQL is
    covered by the oracle-parity gate at all three SFs)."""
    from kinesis_analytics_demo_spark.plans.registry import get_query

    con = duckdb.connect()
    con.sql(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR, "
        "lang VARCHAR, source VARCHAR, n_chars BIGINT)"
    )
    con.executemany(
        "INSERT INTO documents VALUES (?, ?, 'en', 's', length(?))",
        [(i, t, t) for i, t in rows],
    )
    out = {
        r[0]: r[1:]
        for r in con.sql(get_query("repeated_substring_audit").oracle)
        .fetchall()
    }
    con.close()
    return out


def test_cross_doc_shared_literal():
    """Two docs sharing one 20-char literal embedded in distinct
    noise: both report max_repeat_len == 20 and the cross-doc flag."""
    lit = "SHARED-LITERAL-20CHS"
    assert len(lit) == 20
    rows = [
        (1, "aqzwsxedcrfvtgbyhnuj" + lit + "mkioplpqowieurytnbvc"),
        (2, "zpqlamwoskeidjrufhcy" + lit + "gtvbrnexmwzaqskdlfjg"),
    ]
    out = _audit_duck(rows)
    assert set(out) == {1, 2}
    for doc in (1, 2):
        max_len, n_pos, cross = out[doc]
        assert max_len == 20
        # positions witnessing >= 16: literal offsets 0..4 (len-16=4)
        assert n_pos == 5
        assert cross == 1


def test_within_doc_repeat_not_cross():
    """A doc repeating its own 18-char literal twice (no other doc
    shares it): reported, but has_cross_doc must be 0."""
    lit = "INTERNAL-REPEAT-18"
    assert len(lit) == 18
    rows = [
        (1, lit + "0123456789qwertyuiopasdfgh" + lit),
        (2, "completely different text with no long repeats at all."),
    ]
    out = _audit_duck(rows)
    assert 1 in out and 2 not in out
    max_len, n_pos, cross = out[1]
    assert max_len == 18
    assert cross == 0


def test_below_floor_invisible():
    """A 15-char shared literal (< SFX_MIN_REPEAT) is not reported."""
    lit = "x" * (SFX_MIN_REPEAT - 1)
    rows = [
        (1, "aqzwsxedcrfvtgby" + lit + "1mkioplpqowieuryt"),
        (2, "zpqlamwoskeidjru" + lit + "2gtvbrnexmwzaqskd"),
    ]
    # the runs of identical 'x' chars self-repeat within each doc at
    # length 14 (offset-by-one suffixes) — still below the floor
    assert _audit_duck(rows) == {}


def test_depth_cap():
    """A shared 80-char literal reports the 63-char cap, not 80."""
    lit = "ABCDEFGHIJ" * 8
    rows = [
        (1, "aqzwsxedcrfvtgbyhnuj" + lit),
        (2, "zpqlamwoskeidjrufhcy" + lit),
    ]
    out = _audit_duck(rows)
    assert out[1][0] == SFX_DEPTH
    assert out[2][0] == SFX_DEPTH


@pytest.mark.parametrize(
    "a,b",
    [
        ("", ""),
        ("a", ""),
        ("abc", "abc"),
        ("abcd", "abcz"),
        ("abcdefgh" * 8, "abcdefgh" * 8),
        ("abcdefgh" * 8, "abcdefgh" * 7 + "abcdefgX"),
        ("x" * 63, "x" * 62 + "y"),
        ("x" * 40, "x" * 63),
    ],
)
def test_lcp_fold_matches_bruteforce(a, b):
    con = duckdb.connect()
    got = con.sql(
        f"SELECT {_lcp_sql('a', 'b')} FROM (SELECT ? AS a, ? AS b)",
        params=[a, b],
    ).fetchone()[0]
    con.close()
    expect = 0
    for x, y in zip(a, b):
        if x != y:
            break
        expect += 1
    # the operator only ever feeds <=63-char capped suffixes, and the
    # fold's step budget sums to exactly that cap
    assert got == min(expect, SFX_DEPTH)


def test_bitmap_overlap_equals_plain_distinct_intersection():
    """The bitmap-word intersection must equal the naive
    COUNT(DISTINCT) set intersection — an independent third
    implementation (plain sets, no bit packing) at sf0.01."""
    from kinesis_analytics_demo_spark.plans.registry import get_query
    from tests.conftest import SF_MEDIUM

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF_MEDIUM}/events.parquet')"
    )
    plain = {
        (r[0], r[1]): r[2]
        for r in con.sql(
            """
            SELECT a.event_type, b.event_type, count(*) AS n_both
            FROM (SELECT DISTINCT event_type, user_id FROM events) a
            JOIN (SELECT DISTINCT event_type, user_id FROM events) b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY 1, 2
            """
        ).fetchall()
    }
    bm = {
        (r[0], r[1]): r[4]
        for r in con.sql(get_query("bitmap_type_overlap").oracle).fetchall()
    }
    con.close()
    assert bm == plain and len(bm) == 10
