"""Bucketed co-located joins: writing both join sides bucketed on the
join key lets Spark sort-merge-join them with ZERO exchange — the
persistent-shuffle-elimination technique for repeatedly-joined 100 TB
fact tables (SURVEY brief: 'bucketing for co-located joins')."""

from __future__ import annotations

import re

import pytest

from kinesis_analytics_demo_spark.session import read_table
from tests.conftest import SF_MEDIUM


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    li = read_table(spark, SF_MEDIUM, "lineitem")
    orders = read_table(spark, SF_MEDIUM, "orders")
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(wh / "li_bucketed"))
        .mode("overwrite")
        .saveAsTable("li_bucketed")
    )
    (
        orders.withColumnRenamed("o_orderkey", "l_orderkey")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(wh / "orders_bucketed"))
        .mode("overwrite")
        .saveAsTable("orders_bucketed")
    )
    yield "li_bucketed", "orders_bucketed"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    # disable broadcast so the join strategy is genuinely merge-based
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(li_t).join(spark.table(o_t), "l_orderkey").groupBy(
            "o_orderstatus"
        ).count()
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = joined._jdf.queryExecution().explainString(mode)
        join_section = plan.split("SortMergeJoin")[0]
        # no shuffle below the join: both sides read pre-bucketed
        assert "SortMergeJoin" in plan
        assert not re.search(r"\(\d+\) Exchange hashpartitioning", join_section)
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_results_match_plain_join(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    li = read_table(spark, SF_MEDIUM, "lineitem")
    orders = read_table(spark, SF_MEDIUM, "orders")
    plain = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .count()
    )
    bucketed = spark.table(li_t).join(spark.table(o_t), "l_orderkey").groupBy(
        "o_orderstatus"
    ).count()
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, bucketed.collect())
    )
