"""Skew-stress fixture (VERDICT r5 item 8): a generated corpus with a
HOT KEY holding ~20-60% of all rows, pushed through the salted-agg,
salted-join, and containment-dedup paths — turning the 100x-scale
claims from plan-shape arguments into measured ones on adversarial
data. The companion sf0.1-scale wall-clock numbers live in README's
bench notes (one-off measurement, not asserted here — co-tenant noise
makes timing assertions flaky)."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kinesis_analytics_demo_spark.caching import release_tracked
from kinesis_analytics_demo_spark.plans.registry import all_queries
from tests.conftest import assert_matches_oracle

N_EVENTS = 200_000
HOT_TYPE_SHARE = 0.6  #: 'click' holds 60% of rows (uniform would be 20%)
HOT_USER_SHARE = 0.2  #: one user holds 20% of rows
N_DOCS = 1_500
HOT_PHRASE_SHARE = 0.2  #: 20% of docs share a boilerplate phrase


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory):
    """Skewed events + documents parquet, events-table schema."""
    dst = str(tmp_path_factory.mktemp("skew_sf"))
    rng = np.random.default_rng(42)

    n = N_EVENTS
    types = np.array(["click", "view", "purchase", "error", "scroll"])
    # hot event_type: 60% 'click', the rest uniform over the other 4
    t_idx = np.where(
        rng.random(n) < HOT_TYPE_SHARE,
        0,
        rng.integers(1, len(types), n),
    )
    # hot user: user 0 emits 20% of all rows
    user = np.where(
        rng.random(n) < HOT_USER_SHARE,
        0,
        rng.integers(1, 1000, n),
    ).astype(np.int64)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = base + rng.integers(0, 30 * 86400 * 1_000_000, n).astype(
        "timedelta64[us]"
    )
    ev = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "ts": pa.array(ts),
            "user_id": pa.array(user),
            "event_type": pa.array(types[t_idx]),
            "value": pa.array(
                np.round(rng.random(n) * 100, 2).astype(np.float64)
            ),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(ev, os.path.join(dst, "events.parquet"))

    # documents: a boilerplate phrase in 20% of docs (its shingles'
    # df blows the 2% cap, so the containment candidate join must
    # veto them), plus genuine containment pairs on rare content.
    words = [f"w{i}" for i in range(400)]
    docs = []
    for i in range(N_DOCS):
        body = " ".join(
            rng.choice(words, size=rng.integers(20, 40)).tolist()
        )
        if i < int(N_DOCS * HOT_PHRASE_SHARE):
            body = "subscribe to our newsletter for updates " + body
        docs.append(body)
    # 15 explicit containment pairs: doc N_DOCS+k is a long doc that
    # swallows doc k's text whole
    extra = []
    for k in range(15):
        filler = " ".join(
            rng.choice(words, size=rng.integers(30, 50)).tolist()
        )
        extra.append(docs[k] + " " + filler)
    all_docs = docs + extra
    dt = pa.table(
        {
            "doc_id": pa.array(range(len(all_docs)), type=pa.int64()),
            "text": pa.array(all_docs),
            "lang": pa.array(["en"] * len(all_docs)),
            "source": pa.array(
                [f"src{i % 4}" for i in range(len(all_docs))]
            ),
            "n_chars": pa.array(
                [len(t) for t in all_docs], type=pa.int64()
            ),
        }
    )
    pq.write_table(dt, os.path.join(dst, "documents.parquet"))
    return dst


@pytest.fixture(scope="module")
def skew_con(skew_dir):
    con = duckdb.connect()
    for t in ("events", "documents"):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{skew_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize(
    "name", ["skewed_agg_salted", "skewed_join_salted"]
)
def test_salted_paths_exact_on_hot_key_data(spark, skew_dir, skew_con, name):
    """Salting must stay bit-exact under real skew (decimal partial
    sums are associative — the property the two-phase combine relies
    on)."""
    spec = all_queries()[name]
    try:
        assert_matches_oracle(spec.fn(spark, skew_dir), skew_con, spec.oracle)
    finally:
        release_tracked()


def test_salt_spreads_hot_key_on_disk_data(spark, skew_dir):
    """Measured (not synthetic-frame) spread: the 60%-hot event_type's
    phase-1 partials must land in all 16 salt buckets with no bucket
    holding a reducer-hot share."""
    from pyspark.sql import functions as F

    from kinesis_analytics_demo_spark.operators.relational3 import (
        SALT_BUCKETS,
    )

    ev = spark.read.parquet(os.path.join(skew_dir, "events.parquet"))
    salted = ev.withColumn(
        "salt",
        F.pmod(F.xxhash64("event_id"), F.lit(SALT_BUCKETS)).cast("int"),
    )
    partial = (
        salted.groupBy("event_type", "salt")
        .agg(F.count(F.lit(1)).alias("pn"))
        .filter(F.col("event_type") == "click")
        .collect()
    )
    assert len(partial) == SALT_BUCKETS
    counts = sorted(r.pn for r in partial)
    total = sum(counts)
    assert total > N_EVENTS * 0.5  # the fixture really is hot
    # uniform share is 1/16 = 6.25%; anything under 10% means no
    # residual hot reducer
    assert counts[-1] < total * 0.10, counts


def test_containment_exact_under_boilerplate_skew(spark, skew_dir, skew_con):
    """The rarest-prefix containment join against a corpus where 20%
    of docs share a boilerplate phrase: the df-cap (50*df <= n_docs)
    must veto the hot shingles BEFORE the candidate join, and the
    planted short-in-long pairs must all surface — proven by parity
    with the exhaustive quadratic oracle on the same skewed corpus."""
    spec = all_queries()["dedup_containment_pairs"]
    try:
        df = spec.fn(spark, skew_dir)
        rows = df.collect()
        # the 15 planted containments are found (other organic pairs
        # may exist; parity below checks the full set)
        planted = {
            (r["src_doc"], r["dst_doc"])
            for r in rows
            if r["src_doc"] < 15 and r["dst_doc"] == N_DOCS + r["src_doc"]
        }
        assert len(planted) == 15, sorted(planted)
        assert_matches_oracle(df, skew_con, spec.oracle)
    finally:
        release_tracked()


def test_winnowing_exact_under_boilerplate_skew(spark, skew_dir, skew_con):
    """Winnowing fingerprint matching against the 20%-boilerplate
    corpus: the shared phrase's fingerprints blow the 1% df-cap and
    must be vetoed BEFORE the pair join (else 300 docs x 300 docs of
    boilerplate-only pairs fan out), while the 15 planted short-in-long
    copies still surface through their rare-content fingerprints —
    proven by parity with the quadratic DuckDB oracle on the same
    skewed corpus."""
    spec = all_queries()["winnowing_fingerprint_matches"]
    try:
        df = spec.fn(spark, skew_dir)
        rows = df.collect()
        planted = {
            (r["doc_a"], r["doc_b"])
            for r in rows
            if r["doc_a"] < 15 and r["doc_b"] == N_DOCS + r["doc_a"]
        }
        assert len(planted) == 15, sorted(planted)
        assert_matches_oracle(df, skew_con, spec.oracle)
    finally:
        release_tracked()


def test_winnowing_boilerplate_fps_vetoed(spark, skew_dir):
    """Direct audit of winnowing's df-cap: every fingerprint the
    boilerplate phrase contributes lands in ~20% of documents, far
    above the 1% cap, so the capped fingerprint set's max document
    frequency stays at n_docs/100 — the candidate join's fan-out bound
    under a hot fingerprint."""
    from pyspark.sql import functions as F

    from kinesis_analytics_demo_spark.operators.text4 import (
        WIN_DF_CAP_INV,
        WIN_K,
        WIN_W,
    )

    docs = spark.read.parquet(os.path.join(skew_dir, "documents.parquet"))
    n_docs = docs.count()
    hs = F.expr(
        f"transform(sequence(1, length(text) - {WIN_K} + 1), "
        f"i -> CAST(conv(substring(md5(substring(text, i, {WIN_K})), 1, 15),"
        f" 16, 10) AS BIGINT))"
    )
    fps = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("hs") - WIN_W + 1),
            lambda i: F.array_min(F.slice(F.col("hs"), i, WIN_W)),
        )
    )
    e = (
        docs.filter(F.length("text") >= WIN_K + WIN_W - 1)
        .select("doc_id", hs.alias("hs"))
        .select("doc_id", F.explode(fps).alias("fp"))
    )
    dfreq = e.groupBy("fp").agg(F.count(F.lit(1)).alias("df"))
    surviving_max_df = (
        dfreq.filter(F.lit(WIN_DF_CAP_INV) * F.col("df") <= F.lit(n_docs))
        .agg(F.max("df").alias("m"))
        .collect()[0]["m"]
    )
    hot_floor = int(N_DOCS * HOT_PHRASE_SHARE)
    # boilerplate fps sit at df ~ hot_floor (300); the cap admits only
    # df <= n_docs/100 (15) — two orders of magnitude below the hot df
    assert surviving_max_df <= n_docs // WIN_DF_CAP_INV
    assert surviving_max_df < hot_floor
    # and the hot fingerprints really exist pre-veto (the fixture bites)
    hot_max_df = dfreq.agg(F.max("df").alias("m")).collect()[0]["m"]
    assert hot_max_df >= hot_floor * 0.9


def test_suffix_audit_exact_under_boilerplate_skew(spark, skew_dir, skew_con):
    """Repeated-substring audit on the boilerplate-heavy corpus: the
    41-char shared phrase makes ~40 of the 16-char prefix buckets hot
    (one suffix per phrase position per boilerplate doc), so the
    per-bucket window sort must absorb a bucket holding ~20% of docs'
    suffixes at that offset. Every boilerplate doc must come back
    flagged has_cross_doc with max_repeat_len >= the phrase length,
    and the whole result must match the DuckDB oracle exactly."""
    from kinesis_analytics_demo_spark.operators.suffix import SFX_DEPTH

    phrase = "subscribe to our newsletter for updates "
    spec = all_queries()["repeated_substring_audit"]
    try:
        df = spec.fn(spark, skew_dir)
        rows = {r["doc_id"]: r for r in df.collect()}
        n_hot = int(N_DOCS * HOT_PHRASE_SHARE)
        for d in range(n_hot):
            assert d in rows, f"boilerplate doc {d} missing from audit"
            # the phrase itself repeats across docs: the max repeat is
            # at least the phrase (capped at the 63-char depth)
            assert rows[d]["max_repeat_len"] >= min(len(phrase), SFX_DEPTH)
            assert rows[d]["has_cross_doc"] == 1
        assert_matches_oracle(df, skew_con, spec.oracle)
    finally:
        release_tracked()


def test_suffix_audit_hot_bucket_bounded(spark, skew_dir):
    """Direct audit of the prefix-bucket claim: the hot bucket (the
    phrase's first 16 chars) holds exactly one suffix per boilerplate
    doc — bucket size scales with OCCURRENCES of one exact 16-char
    string, not with corpus size times phrase length. On this corpus
    that is ~300 rows vs ~270k total suffixes (~0.1% per hot bucket):
    the window sort stays partition-parallel under 20% boilerplate."""
    from pyspark.sql import functions as F

    from kinesis_analytics_demo_spark.operators.suffix import (
        SFX_MIN_REPEAT,
    )

    docs = spark.read.parquet(os.path.join(skew_dir, "documents.parquet"))
    s = (
        docs.filter(F.length("text") >= SFX_MIN_REPEAT)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(1), F.length("text"))).alias("pos"),
            "text",
        )
        .filter(F.length("text") - F.col("pos") + 1 >= SFX_MIN_REPEAT)
        .select(
            F.substring(
                F.col("text").substr(F.col("pos"), F.lit(SFX_MIN_REPEAT)),
                1,
                SFX_MIN_REPEAT,
            ).alias("bucket")
        )
    )
    sizes = s.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    stats = sizes.agg(
        F.max("n").alias("mx"), F.sum("n").alias("total")
    ).collect()[0]
    n_hot = int(N_DOCS * HOT_PHRASE_SHARE)
    # hottest bucket == one suffix per boilerplate doc (plus organic
    # collisions), a vanishing share of the total suffix volume
    assert stats["mx"] >= n_hot * 0.9
    assert stats["mx"] <= stats["total"] * 0.01, (
        stats["mx"],
        stats["total"],
    )


def test_containment_hot_shingles_vetoed(spark, skew_dir):
    """Direct audit of the df-cap: every shingle of the boilerplate
    phrase exceeds the 2% document-frequency cap on this corpus, so
    the candidate join's per-shingle fan-out stays bounded by the cap,
    not by the hot phrase's 20% share."""
    from pyspark.sql import functions as F

    from kinesis_analytics_demo_spark.operators.dedup import (
        _distinct_shingles,
    )
    from kinesis_analytics_demo_spark.operators.dedup2 import DF_CAP_INV

    docs = spark.read.parquet(os.path.join(skew_dir, "documents.parquet"))
    n_docs = docs.count()
    dsh = _distinct_shingles(docs)
    dfreq = dsh.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    surviving_max_df = (
        dfreq.filter(F.lit(DF_CAP_INV) * F.col("df") <= F.lit(n_docs))
        .agg(F.max("df").alias("m"))
        .collect()[0]["m"]
    )
    hot_floor = int(N_DOCS * HOT_PHRASE_SHARE)
    # the surviving shingle universe is capped at n_docs/50 (2%),
    # far below the hot phrase's document frequency
    assert surviving_max_df <= n_docs // DF_CAP_INV
    assert surviving_max_df < hot_floor
