"""Fluent Table-API front-end tests: the reference's chain shape
(Slide/Tumble + string expression DSL) builds the same results as the
DataFrame form, and bad expressions fail loudly."""

from __future__ import annotations

import pytest

from kinesis_analytics_demo_spark.plans.fluent import Slide, TableEnv, Tumble
from kinesis_analytics_demo_spark.session import read_table
from kinesis_analytics_demo_spark.streaming.windows import (
    sliding_window_agg,
    tumbling_candlestick,
)
from tests.conftest import SF_SMALL


@pytest.fixture()
def env(spark):
    e = TableEnv(spark)
    e.create_temporary_view("ev", read_table(spark, SF_SMALL, "events"))
    return e


def test_sliding_chain_equals_dataframe_form(spark, env):
    fluent = (
        env.from_path("ev")
        .window(Slide.over("2.minutes").every("1.minutes").on("ts").alias("w"))
        .group_by("event_type, w")
        .select("event_type, value.min as p, w.end as t")
    )
    df_form = sliding_window_agg(
        read_table(spark, SF_SMALL, "events"),
        ts_col="ts",
        key_col="event_type",
        value_col="value",
        over="2 minutes",
        every="1 minute",
    )
    assert fluent.columns == ["event_type", "p", "t"]
    assert sorted(map(tuple, fluent.collect())) == sorted(map(tuple, df_form.collect()))


def test_tumble_chain_window_bounds(spark, env):
    fluent = (
        env.from_path("ev")
        .window(Tumble.over("'1' MINUTE").on("ts").alias("w"))
        .group_by("event_type, w")
        .select("event_type, w.start as ws, w.end as we, value.min as lo, value.max as hi")
    )
    batch = tumbling_candlestick(
        read_table(spark, SF_SMALL, "events"),
        ts_col="ts",
        key_col="event_type",
        value_col="value",
        window_duration="1 minute",
    )
    got = {(r.event_type, r.ws, r.we): (r.lo, r.hi) for r in fluent.collect()}
    exp = {
        (r.event_type, r.window_start, r.window_end): (r.min_value, r.max_value)
        for r in batch.collect()
    }
    assert got == exp


def test_first_last_aggregates_match_candlestick(spark, env):
    """'price.first as o / price.last as c' (advertised in the module
    docstring, missing from _AGGS in round 1): event-time
    min_by/max_by over the window's .on() column — must equal the
    candlestick's deterministic open/close."""
    fluent = (
        env.from_path("ev")
        .window(Tumble.over("1 minute").on("ts").alias("w"))
        .group_by("event_type, w")
        .select(
            "event_type, w.start as ws, value.first as o, value.last as c"
        )
    )
    batch = tumbling_candlestick(
        read_table(spark, SF_SMALL, "events"),
        ts_col="ts",
        key_col="event_type",
        value_col="value",
        window_duration="1 minute",
    )
    got = {(r.event_type, r.ws): (r.o, r.c) for r in fluent.collect()}
    exp = {
        (r.event_type, r.window_start): (r.first_value, r.last_value)
        for r in batch.collect()
    }
    assert got == exp


def test_first_without_window_raises(env):
    with pytest.raises(ValueError, match="event-time"):
        env.from_path("ev").group_by("event_type").select(
            "event_type, value.first as o"
        )


def test_plain_projection_with_rename(env):
    df = env.from_path("ev").select("event_type as ticker, value as p")
    assert df.columns == ["ticker", "p"]


def test_sql_entry_points(spark, env):
    assert env.sql_query("SELECT count(*) AS n FROM ev").collect()[0].n > 0
    env.execute_sql("CREATE OR REPLACE TEMP VIEW ev2 AS SELECT * FROM ev")
    assert env.from_path("ev2").to_df().count() > 0


@pytest.mark.parametrize(
    "exprs,err",
    [
        (("value.median as m",), "unknown aggregate"),
        (("w.middle as m",), "unknown window accessor"),
        (("event_type", "value.min as p", "user_id"), "not a grouping column"),
        (("event_type",), "at least one aggregate"),
    ],
)
def test_bad_expressions_raise(env, exprs, err):
    chain = (
        env.from_path("ev")
        .window(Slide.over("2 minutes").every("1 minute").on("ts").alias("w"))
        .group_by("event_type, w")
    )
    with pytest.raises(ValueError, match=err):
        chain.select(*exprs)


def test_fluent_cumulate_equals_operator(spark):
    """Cumulate.over().step() in the fluent chain must build the same
    result as cumulate_window_agg (sum aggregate, daily/6h)."""
    from pyspark.sql import functions as F

    from kinesis_analytics_demo_spark.plans.fluent import Cumulate, TableEnv
    from kinesis_analytics_demo_spark.session import read_table
    from kinesis_analytics_demo_spark.streaming.windows import cumulate_window_agg
    from tests.conftest import SF_MEDIUM

    events = read_table(spark, SF_MEDIUM, "events")
    env = TableEnv(spark)
    fluent = (
        env.from_df(events)
        .window(Cumulate.over("1 day").step("6 hours").on("ts").alias("w"))
        .group_by("event_type, w")
        .select("event_type, value.sum as p, w.start as ws, w.end as we")
    )
    op = cumulate_window_agg(
        events,
        ts_col="ts",
        key_col="event_type",
        value_col="value",
        max_size="1 day",
        step="6 hours",
        agg="sum",
    )
    f_rows = {
        (r["event_type"], r["ws"], r["we"]): r["p"] for r in fluent.collect()
    }
    o_rows = {
        (r["event_type"], r["window_start"].replace(tzinfo=None) if r["window_start"].tzinfo else r["window_start"],
         r["window_end"].replace(tzinfo=None) if r["window_end"].tzinfo else r["window_end"]): r["p"]
        for r in op.collect()
    }
    f_rows = {
        (k[0], k[1].replace(tzinfo=None) if k[1].tzinfo else k[1],
         k[2].replace(tzinfo=None) if k[2].tzinfo else k[2]): v
        for k, v in f_rows.items()
    }
    assert f_rows.keys() == o_rows.keys()
    for k in f_rows:  # float sum vs decomposed sum: tolerance
        assert abs(f_rows[k] - o_rows[k]) < 1e-6 * max(1.0, abs(o_rows[k]))


def test_fluent_cumulate_requires_step(spark):
    import pytest as _pytest

    from kinesis_analytics_demo_spark.plans.fluent import Cumulate, TableEnv
    from kinesis_analytics_demo_spark.session import read_table
    from tests.conftest import SF_MEDIUM

    events = read_table(spark, SF_MEDIUM, "events")
    env = TableEnv(spark)
    with _pytest.raises(ValueError, match="step"):
        (
            env.from_df(events)
            .window(Cumulate.over("1 day").on("ts").alias("w"))
            .group_by("event_type, w")
            .select("event_type, value.sum as p, w.end as t")
        )
