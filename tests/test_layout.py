"""Z-order layout: oracle parity for the key, and a MEASURED
row-group-pruning win — the point of the layout, not just the bit
math."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from kinesis_analytics_demo_spark.caching import release_tracked
from kinesis_analytics_demo_spark.plans.registry import get_query
from kinesis_analytics_demo_spark.session import read_table
from tests.conftest import SF_MEDIUM, assert_matches_oracle


def test_zorder_key_matches_oracle(spark, oracle_con):
    spec = get_query("zorder_key_events")
    try:
        assert_matches_oracle(spec.fn(spark, SF_MEDIUM), oracle_con, spec.oracle)
    finally:
        release_tracked()


def test_zorder_interleave_roundtrip(spark):
    """Bit-exact spot check: z(x, y) de-interleaves back to (x, y)."""
    rows = get_query("zorder_key_events").fn(spark, SF_MEDIUM).collect()
    for r in rows[:200]:
        z = r["zkey"]
        x = sum(((z >> (2 * i)) & 1) << i for i in range(16))
        y = sum(((z >> (2 * i + 1)) & 1) << i for i in range(16))
        assert (x, y) == (r["user_id"], r["vbucket"])


def _touched_row_groups(path, col_ranges):
    """Row groups whose min/max stats overlap every (col, lo, hi)."""
    md = pq.ParquetFile(path).metadata
    names = {md.row_group(0).column(i).path_in_schema: i
             for i in range(md.row_group(0).num_columns)}
    touched = 0
    for g in range(md.num_row_groups):
        rg = md.row_group(g)
        ok = True
        for col, lo, hi in col_ranges:
            st = rg.column(names[col]).statistics
            if st.max < lo or st.min > hi:
                ok = False
                break
        if ok:
            touched += 1
    return touched, md.num_row_groups


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    """Lay the same rows out twice — sorted by user_id vs by Z-key —
    and count row groups a min/max-pruning reader must touch.

    The vbucket-only box is the killer case for the single-column
    sort (its vbucket stats span everything -> touches all groups);
    Z-order must touch strictly fewer, while staying competitive on
    the user_id-only box."""
    df = get_query("zorder_key_events").fn(spark, SF_MEDIUM)
    pdf = df.toPandas()  # test-side layout construction, 10k rows
    tbl_x = pa.Table.from_pandas(
        pdf.sort_values("user_id"), preserve_index=False
    )
    tbl_z = pa.Table.from_pandas(pdf.sort_values("zkey"), preserve_index=False)
    px, pz = os.path.join(tmp_path, "x.parquet"), os.path.join(tmp_path, "z.parquet")
    pq.write_table(tbl_x, px, row_group_size=256)
    pq.write_table(tbl_z, pz, row_group_size=256)

    vbox = [("vbucket", 100, 140)]
    xbox = [("user_id", 10, 20)]

    v_x, total = _touched_row_groups(px, vbox)
    v_z, _ = _touched_row_groups(pz, vbox)
    assert v_x == total, "single-column sort cannot prune the other dim"
    assert v_z < v_x, (v_z, v_x)

    x_x, _ = _touched_row_groups(px, xbox)
    x_z, _ = _touched_row_groups(pz, xbox)
    # z-order keeps user_id partially pruned too: within 4x of the
    # perfectly-sorted layout
    assert x_z <= 4 * max(x_x, 1), (x_z, x_x)


def test_zone_map_audit_pruning_story(spark):
    """The audit must SHOW the layout trade-off, not just parse: the
    2-D box prunes hard only under z-order; the time range prunes
    under the time layout; matching row counts agree across layouts
    (zones partition the table)."""
    from kinesis_analytics_demo_spark.plans.registry import get_query
    from tests.conftest import SF_MEDIUM

    rows = {
        (r["layout"], r["pred"]): r
        for r in get_query("zone_map_pruning_audit").fn(spark, SF_MEDIUM).collect()
    }
    box = {k[0]: v for k, v in rows.items() if k[1] == "box2d_user_value"}
    tr = {k[0]: v for k, v in rows.items() if k[1] == "time_range"}
    # matching rows identical across layouts for each predicate
    assert len({v["n_rows_matching"] for v in box.values()}) == 1
    assert len({v["n_rows_matching"] for v in tr.values()}) == 1
    # natural layout cannot prune the 2-D box; z-order must
    assert box["natural"]["n_zones_scanned"] == box["natural"]["n_zones"]
    zo = box["zorder"]
    assert zo["n_zones_scanned"] * 5 <= zo["n_zones"]
    assert zo["n_rows_scanned"] < box["natural"]["n_rows_scanned"]
    # the time layout prunes the time range to a tight zone subset
    dy = tr["daily"]
    assert dy["n_zones_scanned"] * 5 < dy["n_zones"]
    # scanned rows always cover the matching rows
    for v in list(box.values()) + list(tr.values()):
        assert v["n_rows_scanned"] >= v["n_rows_matching"]
