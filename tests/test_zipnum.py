"""ZipNum cluster golden tests (FIXTURES.md B3, SURVEY.md §5.2):
byte-exact secondary index semantics, stock-zlib decompressibility,
block-pruned reads equal full-scan filters."""

from __future__ import annotations

import gzip
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from webarchive_indexing_spark.queries.cdx_surface import derived_cdx
from webarchive_indexing_spark.sinks.zipnum import (
    _load_idx,
    read_zipnum,
    write_zipnum,
    zipnum_prefix_query,
)

NUMLINES = 10
SHARDS = 4


@pytest.fixture(scope="module")
def cdx(spark, sf_dir):
    c = derived_cdx(spark, sf_dir)
    return c.select(
        "urlkey",
        F.col("ts14").alias("timestamp"),
        F.concat(F.lit("https://example.org/x/"), F.col("digest")).alias("url"),
        "mime",
        "status",
        "digest",
        F.lit(None).cast("string").alias("redirect"),
        F.lit(None).cast("string").alias("robotflags"),
        "length",
        "offset",
        "filename",
    ).cache()


@pytest.fixture(scope="module")
def cluster(spark, cdx):
    d = tempfile.mkdtemp(prefix="zipnum_")
    idx = write_zipnum(cdx, d, shards=SHARDS, numlines=NUMLINES)
    return d, idx


def test_shard_files_standard_gzip_and_sorted(cluster):
    d, idx = cluster
    # every shard decompresses with stock gzip; keys globally ordered
    # across shards in shard order (total-order sort)
    all_keys = []
    for shard in sorted(f for f in os.listdir(d) if f.endswith(".gz")):
        with gzip.open(os.path.join(d, shard), "rt") as fh:
            keys = [tuple(line.split(" ")[:2]) for line in fh]
        assert keys == sorted(keys), f"{shard} not internally sorted"
        all_keys.extend(keys)
    assert all_keys == sorted(all_keys), "shards not range-partitioned in order"


def test_secondary_index_matches_blocks(cluster, cdx):
    d, idx = cluster
    blocks = _load_idx(d)
    # one index row per ceil(rows/numlines) within each shard
    n_rows = cdx.count()
    assert n_rows / NUMLINES <= len(blocks) <= n_rows / NUMLINES + SHARDS
    # each block's recorded (offset,length) decompresses to numlines
    # lines whose first key equals the index row's key
    for b in blocks:
        with open(os.path.join(d, b.shard), "rb") as fh:
            fh.seek(b.offset)
            data = fh.read(b.length)
        lines = gzip.decompress(data).decode().splitlines()
        assert 1 <= len(lines) <= NUMLINES
        first = lines[0].split(" ")
        assert (first[0], first[1]) == (b.urlkey, b.timestamp)


def test_roundtrip_equals_input(spark, cluster, cdx):
    d, _ = cluster
    back = read_zipnum(spark, d)
    a = sorted(map(tuple, cdx.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_pruned_read_equals_filter(spark, cluster, cdx):
    d, _ = cluster
    prefix = "org,example,src1)"
    pruned = zipnum_prefix_query(spark, d, prefix)
    expected = cdx.filter(F.col("urlkey").startswith(prefix))
    a = sorted(map(tuple, pruned.collect()))
    b = sorted(map(tuple, expected.collect()))
    assert a == b
    # and it actually pruned: the matching blocks are a strict subset
    blocks = _load_idx(d)
    from webarchive_indexing_spark.sinks.zipnum import _prune

    kept = _prune(blocks, prefix, prefix + "~")
    assert 0 < len(kept) < len(blocks)


def test_empty_range_read(spark, cluster):
    d, _ = cluster
    out = read_zipnum(spark, d, key_lo="zzz", key_hi="zzzz")
    assert out.count() == 0


def test_uri_scheme_roundtrip(spark, cdx):
    # the pyarrow.fs seam: write + read through a file:// URI exactly as
    # an object-store deployment would through s3://; shard paths in
    # cluster.loc stay URIs end-to-end
    d = tempfile.mkdtemp(prefix="zipnum_uri_")
    uri = "file://" + d
    write_zipnum(cdx, uri, shards=2, numlines=NUMLINES)
    assert os.path.exists(os.path.join(d, "cluster.idx"))
    back = read_zipnum(spark, uri)
    a = sorted(map(tuple, cdx.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b
