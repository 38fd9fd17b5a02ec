"""operators.global_rank: two-pass total-order rank / exact ntile must
agree exactly with the single-partition window definitions they
replace (which are only usable at toy scale)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from webarchive_indexing_spark.operators.global_rank import (
    exact_ntile,
    global_row_number,
)


@pytest.fixture(scope="module")
def nums(spark):
    # unique, deliberately adversarial order + >1 input partition
    vals = [(i * 37) % 1000 for i in range(1000)]
    return spark.createDataFrame([(v,) for v in vals], "v long").repartition(7)


def test_global_row_number_matches_window(spark, nums):
    got = {r.v: r.rank for r in global_row_number(nums, ["v"]).collect()}
    w = Window.orderBy("v")
    want = {
        r.v: r.rank
        for r in nums.withColumn("rank", F.row_number().over(w)).collect()
    }
    assert got == want


def test_global_row_number_plan_never_single_partition(spark, nums):
    # the ranking windows run over the range partitions; nothing in the
    # plan may funnel the data through one task (AQE may *coalesce* the
    # toy-sized shuffle, but must never plant an Exchange SinglePartition).
    # The localCheckpoint that pins pass 1 truncates the final plan to
    # Scan ExistingRDD, so the range-partitioning evidence is asserted
    # on the pre-checkpoint stage (_range_sorted) it scans.
    from webarchive_indexing_spark.operators.global_rank import _range_sorted

    ranked = global_row_number(nums, ["v"])
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan

    pass1 = _range_sorted(nums, ["v"], 8)
    p1 = pass1._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in p1, p1
    assert "SinglePartition" not in p1, p1


@pytest.mark.parametrize("n", [1, 4, 7, 1000, 1500])
def test_exact_ntile_matches_window(spark, nums, n):
    got = {r.v: r.tile for r in exact_ntile(nums, ["v"], n).collect()}
    w = Window.orderBy("v")
    want = {
        r.v: r.tile for r in nums.withColumn("tile", F.ntile(n).over(w)).collect()
    }
    assert got == want


def test_exact_ntile_with_ties_stable_aggregates(spark):
    # ties across tile boundaries: per-tile count/min/max stay
    # deterministic even though tied rows may swap tiles
    df = spark.createDataFrame([(i % 10,) for i in range(100)], "v long")
    agg = (
        exact_ntile(df, ["v"], 4)
        .groupBy("tile")
        .agg(F.count(F.lit(1)).alias("n"), F.min("v").alias("lo"), F.max("v").alias("hi"))
        .orderBy("tile")
        .collect()
    )
    assert [r.n for r in agg] == [25, 25, 25, 25]
    assert [(r.lo, r.hi) for r in agg] == [(0, 2), (2, 4), (5, 7), (7, 9)]


def test_global_cumsum_matches_window(spark):
    from webarchive_indexing_spark.operators.global_rank import global_cumsum

    df = spark.range(0, 500).select(
        F.col("id").alias("k"), ((F.col("id") * 37) % 101).alias("v")
    )
    got = {
        r["k"]: r["c"]
        for r in global_cumsum(df, ["k"], "v", out_col="c").collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["k"]: r["c"]
        for r in df.withColumn("c", F.sum("v").over(w)).collect()
    }
    assert got == want


def test_global_cumsum_plan_never_single_partition(spark):
    from webarchive_indexing_spark.operators.global_rank import global_cumsum

    df = spark.range(0, 100).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    out = global_cumsum(df, ["k"], "v")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_cols_contract_projects_wide_input(spark):
    """The self-enforcing width contract: with ``cols`` given, the
    checkpointed intermediate (and the output) carries exactly
    keys + cols + rank — a wide input's unused columns are never
    pinned in block storage (VERDICT r03 nit)."""
    wide = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("keep_me"),
        F.repeat(F.lit("x"), 1000).alias("fat_unused"),
        F.lit(1).alias("also_unused"),
    )
    out = global_row_number(wide, ["k"], cols=["keep_me"])
    assert out.columns == ["k", "keep_me", "rank"]
    got = {r.k: r.rank for r in out.collect()}
    assert got == {i: i + 1 for i in range(100)}

    # cumsum variant: value_col is retained implicitly
    from webarchive_indexing_spark.operators.global_rank import global_cumsum

    cs = global_cumsum(wide, ["k"], "keep_me", cols=[])
    assert cs.columns == ["k", "keep_me", "cumsum"]
