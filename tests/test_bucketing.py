"""Bucketed co-located join: the write-once-shuffle-never pattern.
Asserts the physical property (no Exchange feeding the join) and
result equality with the plain shuffled join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webarchive_indexing_spark.operators.bucketing import bucketed_join, write_bucketed
from webarchive_indexing_spark.tables import load_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "orders_b", "o_orderkey", buckets=8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        "o_orderkey",
        buckets=8,
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = bucketed_join(spark, "orders_b", "lineitem_b", "o_orderkey")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not re-shuffle"
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_equals_plain_join(spark, sf_dir, bucketed):
    got = (
        bucketed_join(spark, "orders_b", "lineitem_b", "o_orderkey")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    want = (
        orders.join(lineitem, "o_orderkey")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
