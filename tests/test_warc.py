"""WARC ingestion tests (SURVEY.md §5, M4): synthetic mini-WARCs →
parse → CDX; digest correctness; revisit marking; skip-existing
anti-join; end-to-end manifest pipeline into ZipNum."""

from __future__ import annotations

import gzip
import hashlib
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from webarchive_indexing_spark.sources.warc import (
    index_warcs,
    iter_warc_members,
    parse_warc_file,
    skip_existing,
    write_mini_warc,
)


@pytest.fixture(scope="module")
def warc_dir():
    d = tempfile.mkdtemp(prefix="warcs_")
    body_a = b"<html>hello world</html>"
    body_b = b'{"k": 1}'
    write_mini_warc(
        os.path.join(d, "crawl-00.warc.gz"),
        [
            dict(
                url="https://WWW.Example.COM/a?b=2&a=1",
                date_iso="2015-03-04T12:30:45Z",
                payload=body_a,
            ),
            dict(
                url="http://example.com/data",
                date_iso="2015-03-04T12:31:00Z",
                payload=body_b,
                mime="application/json",
                status=200,
            ),
            dict(
                url="http://example.com/missing",
                date_iso="2015-03-04T12:32:00Z",
                payload=b"not found",
                status=404,
            ),
        ],
    )
    write_mini_warc(
        os.path.join(d, "crawl-01.warc.gz"),
        [
            # revisit of /a (same payload → same digest)
            dict(
                url="http://example.com/a?a=1&b=2",
                date_iso="2016-01-01T00:00:00Z",
                payload=body_a,
                rec_type="revisit",
            ),
            # a request record — must NOT be indexed
            dict(
                url="http://example.com/a",
                date_iso="2016-01-01T00:00:00Z",
                payload=b"GET /a HTTP/1.1",
                rec_type="request",
            ),
        ],
    )
    return d


def test_members_are_standard_gzip(warc_dir):
    p = os.path.join(warc_dir, "crawl-00.warc.gz")
    data = open(p, "rb").read()
    # stock gzip reads the whole concatenation
    full = gzip.decompress(data)
    assert full.count(b"WARC/1.0") == 3
    members = list(iter_warc_members(data))
    assert len(members) == 3
    assert members[0][0] == 0
    # offsets + lengths tile the file exactly
    assert sum(m[1] for m in members) == len(data)


def test_parse_fields_and_digest(warc_dir):
    p = os.path.join(warc_dir, "crawl-00.warc.gz")
    rows = list(parse_warc_file(p, open(p, "rb").read()))
    assert len(rows) == 3
    urlkey, ts, url, mime, status, digest, _, _, length, offset, fname = rows[0]
    assert urlkey == "com,example)/a?a=1&b=2"  # SURT applied
    assert ts == "20150304123045"
    assert mime == "text/html"
    assert status == 200
    assert digest == hashlib.sha1(b"<html>hello world</html>").hexdigest()
    assert fname == "crawl-00.warc.gz"
    assert rows[1][3] == "application/json"
    assert rows[2][4] == 404


def test_revisit_shares_digest_and_request_skipped(warc_dir):
    p0 = os.path.join(warc_dir, "crawl-00.warc.gz")
    p1 = os.path.join(warc_dir, "crawl-01.warc.gz")
    r0 = list(parse_warc_file(p0, open(p0, "rb").read()))
    r1 = list(parse_warc_file(p1, open(p1, "rb").read()))
    assert len(r1) == 1  # request record skipped
    assert r1[0][3] == "warc/revisit"
    assert r1[0][5] == r0[0][5]  # same payload digest as the original
    assert r1[0][0] == r0[0][0]  # same urlkey (query order normalized)


def test_index_warcs_pipeline(spark, warc_dir):
    manifest = spark.createDataFrame(
        [(os.path.join(warc_dir, f),) for f in sorted(os.listdir(warc_dir))], ["path"]
    )
    cdx = index_warcs(spark, manifest)
    assert cdx.count() == 4
    # revisit resolution: join back to original by digest (J2 [B])
    revisits = cdx.filter(F.col("mime") == "warc/revisit").select("digest", "timestamp")
    originals = cdx.filter(F.col("mime") != "warc/revisit").select(
        "digest", F.col("filename").alias("orig_file")
    )
    resolved = revisits.join(originals, "digest")
    assert resolved.count() == 1


def test_skip_existing_anti_join(spark, warc_dir):
    manifest = spark.createDataFrame(
        [(os.path.join(warc_dir, f),) for f in sorted(os.listdir(warc_dir))], ["path"]
    )
    existing = spark.createDataFrame([("s3://out/crawl-00.cdx.gz",)], ["path"])
    todo = skip_existing(manifest, existing)
    assert [r.path.rsplit("/", 1)[-1] for r in todo.collect()] == ["crawl-01.warc.gz"]


def test_warc_to_zipnum_end_to_end(spark, warc_dir):
    from webarchive_indexing_spark.sinks.zipnum import read_zipnum, write_zipnum

    manifest = spark.createDataFrame(
        [(os.path.join(warc_dir, f),) for f in sorted(os.listdir(warc_dir))], ["path"]
    )
    cdx = index_warcs(spark, manifest)
    out = tempfile.mkdtemp(prefix="zipnum_warc_")
    write_zipnum(cdx, out, shards=2, numlines=2)
    back = read_zipnum(spark, out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, cdx.collect()))


def test_parse_tolerates_truncated_and_corrupt_members(spark, tmp_path):
    """A truncated tail or garbage between members costs that file's
    tail only — records before the damage still index; a malformed
    WARC-Date degrades to the epoch sentinel instead of throwing."""
    from webarchive_indexing_spark.sources.warc import (
        build_warc_record,
        parse_warc_file,
    )

    good = build_warc_record("http://ok.example/", "2020-01-01T00:00:00Z", b"hi")
    bad_date = build_warc_record("http://baddate.example/", "not-a-date", b"x")
    truncated = good[: len(good) // 2]

    rows = list(parse_warc_file("a.warc.gz", good + bad_date + truncated))
    urls = [r[2] for r in rows]
    assert "http://ok.example/" in urls
    assert "http://baddate.example/" in urls
    assert [r[1] for r in rows if r[2] == "http://baddate.example/"] == [
        "19700101000000"
    ]

    # pure garbage between members: stop, don't spin or throw
    rows2 = list(parse_warc_file("b.warc.gz", good + b"\x00garbage\x00" + good))
    assert [r[2] for r in rows2] == ["http://ok.example/"]
