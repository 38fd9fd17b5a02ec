"""End-to-end plan tests: the reference's CLI workflow as one call
(build_index) and as the two materialized stages, both queryable via
the cdx-server surface afterwards."""

from __future__ import annotations

import os
import tempfile

import pytest

from webarchive_indexing_spark.plans import (
    build_index,
    cluster_from_cdx_gz,
    index_to_cdx_gz,
    query_index,
)
from webarchive_indexing_spark.sources.warc import write_mini_warc


@pytest.fixture(scope="module")
def warc_manifest(spark):
    d = tempfile.mkdtemp(prefix="pipe_warcs_")
    for i in range(4):
        write_mini_warc(
            os.path.join(d, f"crawl-{i:02d}.warc.gz"),
            [
                dict(
                    url=f"https://example.com/page/{i}-{j}",
                    date_iso=f"201{5 + (j % 3)}-01-0{1 + j}T00:00:0{i}Z",
                    payload=f"body {i} {j}".encode(),
                )
                for j in range(5)
            ],
        )
    manifest = os.path.join(d, "manifest.txt")
    with open(manifest, "w") as fh:
        for i in range(4):
            fh.write(os.path.join(d, f"crawl-{i:02d}.warc.gz") + "\n")
    return manifest


def test_one_call_build_and_query(spark, warc_manifest):
    with tempfile.TemporaryDirectory() as out:
        idx = build_index(spark, warc_manifest, out, shards=4, numlines=3)
        assert idx.count() > 0
        assert os.path.exists(os.path.join(out, "cluster.idx"))
        assert os.path.exists(os.path.join(out, "cluster.loc"))
        # exact-match query through the block-pruned read path
        hits = query_index(spark, out, "https://example.com/page/2-3").collect()
        assert len(hits) == 1
        assert hits[0].urlkey == "com,example)/page/2-3"
        # prefix query + from/to + limit
        pfx = query_index(
            spark,
            out,
            "https://example.com/page/",
            match_type="prefix",
            from_="2015",
            to="2015",
            limit=5,
        )
        rows = pfx.collect()
        assert 0 < len(rows) <= 5
        assert all(r.timestamp.startswith("2015") for r in rows)


def test_two_stage_equals_one_call(spark, warc_manifest):
    with tempfile.TemporaryDirectory() as d:
        cdx_dir = os.path.join(d, "cdx")
        out1 = os.path.join(d, "cluster_two_stage")
        out2 = os.path.join(d, "cluster_one_call")
        index_to_cdx_gz(spark, warc_manifest, cdx_dir)
        cluster_from_cdx_gz(spark, cdx_dir, out1, shards=4, numlines=3)
        build_index(spark, warc_manifest, out2, shards=4, numlines=3)
        a = query_index(spark, out1, "https://example.com/", match_type="prefix")
        b = query_index(spark, out2, "https://example.com/", match_type="prefix")
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
