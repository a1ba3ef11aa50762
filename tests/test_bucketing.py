"""Bucketed-table joins: co-located layout must eliminate the shuffle on
both join sides (the durable co-partitioning strategy for repeated
fact-fact joins at scale)."""

from __future__ import annotations

import pytest

from eel_spark.scale import write_bucketed

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    write_bucketed(li, "b_lineitem", "l_orderkey", buckets=8, sort_by="l_orderkey")
    write_bucketed(orders, "b_orders", "o_orderkey", buckets=8, sort_by="o_orderkey")
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_no_shuffle(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    # disable auto-broadcast so the join strategy must rely on bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        li, orders = spark.table(li_t), spark.table(o_t)
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert joined.count() == spark.read.parquet(f"{SF}/lineitem.parquet").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_bucketed_groupby_no_shuffle(spark, bucketed_tables):
    li_t, _ = bucketed_tables
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        from pyspark.sql import functions as F

        agg = spark.table(li_t).groupBy("l_orderkey").agg(F.sum("l_quantity"))
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed group-by still shuffles:\n{plan}"
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
