"""Columnar (cc-index-table-layout) parquet index sink: directory
layout, within-file ordering (the row-group-pruning contract), and the
shape guard.  The end-to-end value check is the
``cdx_parquet_index_roundtrip`` oracle query; the three-layer pruning
is plan-asserted in test_plans.py."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from webarchive_indexing_spark.sinks.parquet_index import (
    read_parquet_index,
    to_parquet_index_shape,
    write_parquet_index,
)


def _cdx_frame(spark, n=300):
    d = spark.range(n).select(
        F.concat(F.lit("com,example)/p/"), F.lpad(F.col("id").cast("string"), 4, "0")).alias("urlkey"),
        F.concat(F.lit("2015"), F.lpad((F.col("id") % 12 + 1).cast("string"), 2, "0"), F.lit("01000000")).alias("timestamp"),
        F.concat(F.lit("https://example.com/p/"), F.col("id").cast("string")).alias("url"),
        F.lit("text/html").alias("mime"),
        F.when(F.col("id") % 5 == 0, 404).otherwise(200).alias("status"),
        F.md5(F.col("id").cast("string")).alias("digest"),
        F.lit(None).cast("string").alias("redirect"),
        F.lit(None).cast("string").alias("robotflags"),
        (F.col("id") + 1000).alias("length"),
        (F.col("id") * 100).alias("offset"),
        F.concat(F.lit("crawl-"), (F.col("id") % 2).cast("string"), F.lit(".warc.gz")).alias("filename"),
    )
    return d


def test_layout_partitions_and_within_file_order(spark, tmp_path):
    out = str(tmp_path / "idx")
    write_parquet_index(
        to_parquet_index_shape(_cdx_frame(spark)), out, range_partitions=4
    )
    dirs = sorted(
        os.path.relpath(p, out)
        for p in glob.glob(os.path.join(out, "crawl=*", "subset=*"))
    )
    assert dirs == [
        "crawl=crawl-0/subset=crawldiagnostics",
        "crawl=crawl-0/subset=warc",
        "crawl=crawl-1/subset=crawldiagnostics",
        "crawl=crawl-1/subset=warc",
    ]
    # every data file is internally sorted by url_surtkey — the
    # property that makes row-group min/max stats tight
    files = glob.glob(os.path.join(out, "crawl=*", "subset=*", "*.parquet"))
    assert files
    for f in files:
        keys = pq.read_table(f, columns=["url_surtkey"])["url_surtkey"].to_pylist()
        assert keys == sorted(keys), f
    # read-back recovers partition columns and the full row count
    idx = read_parquet_index(spark, out)
    assert idx.count() == 300
    assert idx.filter("subset = 'crawldiagnostics'").count() == 60  # id%5==0


def test_write_requires_partition_columns(spark):
    with pytest.raises(ValueError, match="partition columns"):
        write_parquet_index(_cdx_frame(spark), "/tmp/nope")
