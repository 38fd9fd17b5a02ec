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


def test_zorder_prunes_where_linear_sort_cannot(spark, sf_dir):
    """The z-order claim, measured from the parquet footers the
    reader actually prunes with: clustered on the Morton interleave
    of (user_id, value), each file bounds BOTH columns, so a box
    query's value predicate skips most files — while under a
    user_id-sorted layout every file spans ~the full value range and
    the value predicate prunes (almost) nothing.  Also: the layout
    rewrite loses no rows and the sidecar records the recipe."""
    import json
    import os
    import tempfile

    from webarchive_indexing_spark.operators.bucketing import (
        parquet_files_intersecting,
        write_zordered,
    )

    ev = load_table(spark, sf_dir, "events")
    zdir = tempfile.mkdtemp(prefix="zo_ev_")
    stats = write_zordered(ev, zdir, ["user_id", "value"], n_files=16)
    assert set(stats) == {"user_id", "value"}

    ldir = tempfile.mkdtemp(prefix="lin_ev_")
    (
        ev.repartitionByRange(16, F.col("user_id"))
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(ldir)
    )

    # the value predicate alone (the dimension the user-sorted layout
    # CANNOT prune): every linear file spans ~the full value range, so
    # the tail box intersects them all; under z-order the value bits
    # bound each file and most files skip
    z_val, z_total = parquet_files_intersecting(zdir, "value", 150.0, 400.0)
    l_val, l_total = parquet_files_intersecting(ldir, "value", 150.0, 400.0)
    assert l_val >= l_total - 1, (l_val, l_total)
    assert z_val <= z_total // 2, (z_val, z_total)
    assert z_val < l_val

    # ...while the leading dimension still prunes under z-order too
    z_uid, _ = parquet_files_intersecting(zdir, "user_id", 2.0, 5.0)
    assert z_uid <= z_total - 2, (z_uid, z_total)

    # layout-only: same rows back, original schema, sidecar intact
    back = spark.read.parquet(zdir)
    assert back.columns == ev.columns
    assert back.count() == ev.count()
    assert (
        back.selectExpr("sum(hash(event_id))").first()[0]
        == ev.selectExpr("sum(hash(event_id))").first()[0]
    )
    with open(os.path.join(zdir, "_zorder.json")) as fh:
        side = json.load(fh)
    assert side["cols"] == ["user_id", "value"] and side["n_files"] == 16


def test_zorder_quantile_bucketing_prunes_dense_regions(spark, sf_dir):
    """The skewed-dimension fix: under LINEAR bucketing the events
    value column (heavy lower tail) wastes buckets on its sparse top,
    so a DENSE-region box intersects most files; equi-depth QUANTILE
    bucketing gives every file a similar row share per dimension, so
    the same dense box prunes.  Row content stays identical."""
    import tempfile

    from webarchive_indexing_spark.operators.bucketing import (
        parquet_files_intersecting,
        write_zordered,
    )

    ev = load_table(spark, sf_dir, "events")
    lin = tempfile.mkdtemp(prefix="zo_lin_")
    qtl = tempfile.mkdtemp(prefix="zo_qtl_")
    write_zordered(ev, lin, ["user_id", "value"], n_files=16)
    write_zordered(
        ev, qtl, ["user_id", "value"], n_files=16, bucketing="quantile"
    )

    # a NARROW box in the dense region (~11% of the row mass): linear
    # bucketing compresses the dense region into few buckets, so most
    # files' value ranges overlap it; equi-depth buckets resolve the
    # dense region finely and most files skip
    l_val, l_total = parquet_files_intersecting(lin, "value", 40.0, 55.0)
    q_val, q_total = parquet_files_intersecting(qtl, "value", 40.0, 55.0)
    assert q_val < l_val, (q_val, l_val)
    assert q_val <= q_total // 2, (q_val, q_total)

    got = spark.read.parquet(qtl)
    assert got.count() == ev.count()
    assert (
        got.selectExpr("sum(hash(event_id))").first()[0]
        == ev.selectExpr("sum(hash(event_id))").first()[0]
    )

    import pytest

    with pytest.raises(ValueError, match="unknown bucketing"):
        write_zordered(ev, lin, ["user_id"], bucketing="hilbert")


def test_zorder_three_dimensions_roundtrip(spark, sf_dir):
    """Morton interleave generalizes past two columns: a 3-D cluster
    (48-bit key at bits=16) still round-trips every row and bounds
    each dimension per file."""
    import tempfile

    from webarchive_indexing_spark.operators.bucketing import (
        parquet_files_intersecting,
        write_zordered,
    )

    ev = load_table(spark, sf_dir, "events").withColumn(
        "uid2", F.col("user_id") * 7 % 13
    )
    zdir = tempfile.mkdtemp(prefix="zo3_")
    stats = write_zordered(
        ev, zdir, ["user_id", "value", "uid2"], n_files=8
    )
    assert set(stats) == {"user_id", "value", "uid2"}
    back = spark.read.parquet(zdir)
    assert back.count() == ev.count()
    # every dimension prunes at least a little on a tail slice
    for col, lo, hi in [("value", 150.0, 1e9), ("uid2", 11.0, 1e9)]:
        inter, total = parquet_files_intersecting(zdir, col, lo, hi)
        assert inter < total, (col, inter, total)


def test_zorder_input_guards(spark, tmp_path):
    """Review fixes: an empty table (or all-NULL column) refuses with
    a clean ValueError instead of a TypeError traceback, and wide
    column sets auto-shrink per-dimension bits so the Morton key
    never overflows the 62 usable bits of a signed long."""
    import json
    import tempfile

    import pytest

    from webarchive_indexing_spark.operators.bucketing import write_zordered

    empty = spark.createDataFrame([], "a bigint, b double")
    with pytest.raises(ValueError, match="no non-NULL values"):
        write_zordered(empty, str(tmp_path / "e"), ["a", "b"])

    nulls = spark.createDataFrame([(1, None), (2, None)], "a bigint, b double")
    with pytest.raises(ValueError, match="'b' has no non-NULL"):
        write_zordered(nulls, str(tmp_path / "n"), ["a", "b"])

    with pytest.raises(ValueError, match="at least one column"):
        write_zordered(nulls, str(tmp_path / "c"), [])

    # five dimensions at the default bits=16 would need 80 bits;
    # the writer shrinks to 62//5=12 per dimension and still works
    wide = spark.range(100).selectExpr(
        "id a", "id * 3 % 17 b", "id * 5 % 13 c", "id * 7 % 11 d",
        "id * 11 % 7 e"
    )
    out = tempfile.mkdtemp(prefix="zo_wide_")
    write_zordered(wide, out, ["a", "b", "c", "d", "e"], n_files=4)
    with open(out + "/_zorder.json") as fh:
        side = json.load(fh)
    assert side["bits"] == 12
    assert spark.read.parquet(out).count() == 100

    # >62 dimensions cannot fit 1 bit each in a signed long — refuse
    # (silently clamping would overflow into the sign bit and
    # mis-sort) — round-13 ADVICE fix
    cols63 = [f"c{i}" for i in range(63)]
    huge = spark.range(4).selectExpr(
        *[f"id + {i} as c{i}" for i in range(63)]
    )
    with pytest.raises(ValueError, match="62-bit Morton budget"):
        write_zordered(huge, str(tmp_path / "w63"), cols63)
