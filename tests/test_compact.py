"""Small-file compaction (sinks/compact.py): file-count planning from
metadata only, row-preserving rewrite, and clustering restoration."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from webarchive_indexing_spark.sinks.compact import (
    compact_parquet,
    dataset_bytes,
    plan_file_count,
)


def _files(d):
    return [f for f in glob.glob(os.path.join(d, "*.parquet")) if os.path.getsize(f) > 0]


def test_plan_file_count():
    assert plan_file_count(0, 128) == 1
    assert plan_file_count(129, 128) == 2
    assert plan_file_count(128, 128) == 1
    assert plan_file_count(10**9, 128 * 1024 * 1024) == 8


def test_compact_merges_small_files(spark, sf_dir, tmp_path):
    frag = str(tmp_path / "frag")
    out = str(tmp_path / "out")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    # simulate a small-file storm: 64 files for a tiny table
    docs.repartition(64).write.parquet(frag)
    assert len(_files(frag)) == 64

    total = dataset_bytes(spark, frag)
    assert total > 0
    compacted = compact_parquet(spark, frag, out, target_file_bytes=total)

    # one target-size file replaces the storm; rows survive exactly
    assert len(_files(out)) == 1
    assert compacted.count() == docs.count()
    a = docs.select(F.sum(F.xxhash64(*docs.columns).cast("decimal(38,0)"))).first()[0]
    b = compacted.select(
        F.sum(F.xxhash64(*docs.columns).cast("decimal(38,0)"))
    ).first()[0]
    assert a == b


def test_compact_sorted_restores_clustering(spark, sf_dir, tmp_path):
    frag = str(tmp_path / "frag")
    out = str(tmp_path / "out")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    docs.repartition(16).write.parquet(frag)

    total = dataset_bytes(spark, frag)
    compacted = compact_parquet(
        spark, frag, out, target_file_bytes=(total + 3) // 4, sort_cols=["doc_id"]
    )
    files = _files(out)
    assert len(files) >= 2
    # range-partitioned + sorted: per-file doc_id ranges must be disjoint
    ranges = []
    for f in files:
        agg = (
            spark.read.parquet(f)
            .agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
            .first()
        )
        if agg.lo is not None:
            ranges.append((agg.lo, agg.hi))
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi < lo, f"overlapping file key ranges: {ranges}"
    assert compacted.count() == docs.count()
