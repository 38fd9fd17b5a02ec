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
    assert len(rows) == 2  # the truncated tail member must NOT index
    assert [r[1] for r in rows if r[2] == "http://baddate.example/"] == [
        "19700101000000"
    ]

    # pure garbage between members: stop, don't spin or throw
    rows2 = list(parse_warc_file("b.warc.gz", good + b"\x00garbage\x00" + good))
    assert [r[2] for r in rows2] == ["http://ok.example/"]


def test_cleanly_truncated_member_never_yields_partial_record():
    """zlib raises only on CORRUPT bytes; a clean mid-stream cut ends
    with eof False and a PARTIAL payload.  Indexing it would emit a
    second row for the same URL with a wrong digest/length — poisoning
    digest dedup and revisit resolution (ADVICE r03).  The parser must
    drop the partial member, keeping exactly the intact records."""
    from webarchive_indexing_spark.sources.warc import (
        build_warc_record,
        parse_warc_file,
    )

    good = build_warc_record("http://ok.example/", "2020-01-01T00:00:00Z", b"payload")
    [full_row] = list(parse_warc_file("w.warc.gz", good))

    # 90% of the member: decompresses without error, eof never reached
    rows = list(parse_warc_file("w.warc.gz", good + good[: int(len(good) * 0.9)]))
    assert len(rows) == 1
    assert rows[0] == full_row  # and the survivor's digest is the true one



# ---------------------------------------------------------------------------
# format interop (VERDICT r03 items 1, 2, 10)
# ---------------------------------------------------------------------------

_RECS = [
    dict(url="http://a.example/p1", date_iso="2020-01-01T00:00:00Z", payload=b"one"),
    dict(url="http://a.example/p2", date_iso="2020-02-01T00:00:00Z", payload=b"two"),
    dict(url="http://b.example/", date_iso="2020-03-01T00:00:00Z", payload=b"three"),
]


def _cdx_core(rows):
    """(urlkey, ts, url, mime, status, digest) — the format-independent
    fields; offsets/lengths legitimately differ per container."""
    return sorted(r[:6] for r in rows)


def test_layouts_index_identically(tmp_path):
    """member-per-record gz, single-member gz (wget-style), and plain
    .warc must produce the SAME captures (modulo extents)."""
    from webarchive_indexing_spark.sources.warc import parse_archive_file

    paths = {}
    for layout, name in [
        ("member", "m.warc.gz"),
        ("single-member", "s.warc.gz"),
        ("plain", "p.warc"),
    ]:
        p = str(tmp_path / name)
        write_mini_warc(p, _RECS, layout=layout)
        paths[layout] = p

    parsed = {
        layout: list(parse_archive_file(p, open(p, "rb").read()))
        for layout, p in paths.items()
    }
    assert len(parsed["member"]) == 3
    assert _cdx_core(parsed["member"]) == _cdx_core(parsed["single-member"])
    assert _cdx_core(parsed["member"]) == _cdx_core(parsed["plain"])

    # single-member gz: every record reports the member's extent (the
    # smallest gzip-seekable unit)
    offs = {(r[9], r[8]) for r in parsed["single-member"]}
    assert len(offs) == 1 and next(iter(offs))[0] == 0
    # plain warc: true non-overlapping byte extents covering the file
    spans = sorted((r[9], r[8]) for r in parsed["plain"])
    for (o1, l1), (o2, _) in zip(spans, spans[1:]):
        assert o1 + l1 == o2
    assert spans[0][0] == 0
    assert sum(l for _, l in spans) == os.path.getsize(paths["plain"])


def test_plain_warc_truncated_tail_dropped(tmp_path):
    from webarchive_indexing_spark.sources.warc import parse_archive_file

    p = str(tmp_path / "t.warc")
    write_mini_warc(p, _RECS, layout="plain")
    data = open(p, "rb").read()
    cut = data[: len(data) - len(data) // 4]  # cuts into the last record
    rows = list(parse_archive_file(p, cut))
    assert [r[2] for r in rows] == ["http://a.example/p1", "http://a.example/p2"]


def test_digest_b32_matches_pywb_encoding(tmp_path):
    """base32 digests: uppercase RFC 4648, exactly 32 chars, no
    padding — byte-for-byte b32encode(sha1(payload))."""
    import base64

    from webarchive_indexing_spark.sources.warc import parse_archive_file

    p = str(tmp_path / "d.warc.gz")
    write_mini_warc(p, _RECS[:1])
    data = open(p, "rb").read()
    [hex_row] = list(parse_archive_file(p, data))
    [b32_row] = list(parse_archive_file(p, data, digest_b32=True))
    want = base64.b32encode(hashlib.sha1(b"one").digest()).decode()
    assert b32_row[5] == want
    assert len(b32_row[5]) == 32 and "=" not in b32_row[5]
    assert hex_row[5] == hashlib.sha1(b"one").hexdigest()
    # identical capture otherwise
    assert hex_row[:5] == b32_row[:5] and hex_row[6:] == b32_row[6:]


def test_arc_golden_parity_with_warc(tmp_path):
    """ARC legacy reader: same captures as the WARC path for the same
    payloads (urlkey/ts/url/mime/status/digest), both .arc and
    .arc.gz containers."""
    from webarchive_indexing_spark.sources.warc import (
        build_arc_filedesc,
        build_arc_record,
        parse_archive_file,
    )

    ts = {"2020-01-01T00:00:00Z": "20200101000000",
          "2020-02-01T00:00:00Z": "20200201000000",
          "2020-03-01T00:00:00Z": "20200301000000"}
    arc_plain = build_arc_filedesc("x.arc") + b"".join(
        build_arc_record(r["url"], ts[r["date_iso"]], r["payload"])
        for r in _RECS
    )
    p_arc = str(tmp_path / "x.arc")
    open(p_arc, "wb").write(arc_plain)

    p_gz = str(tmp_path / "x.arc.gz")
    with open(p_gz, "wb") as fh:
        fh.write(gzip.compress(build_arc_filedesc("x.arc"), mtime=0))
        for r in _RECS:
            fh.write(
                gzip.compress(
                    build_arc_record(r["url"], ts[r["date_iso"]], r["payload"]),
                    mtime=0,
                )
            )

    p_warc = str(tmp_path / "x.warc.gz")
    write_mini_warc(p_warc, _RECS)

    warc_rows = list(parse_archive_file(p_warc, open(p_warc, "rb").read()))
    arc_rows = list(parse_archive_file(p_arc, open(p_arc, "rb").read()))
    arcgz_rows = list(parse_archive_file(p_gz, open(p_gz, "rb").read()))
    assert _cdx_core(arc_rows) == _cdx_core(warc_rows)
    assert _cdx_core(arcgz_rows) == _cdx_core(warc_rows)
    # filedesc:// must not index
    assert all("filedesc" not in r[2] for r in arc_rows)


def test_mixed_manifest_end_to_end(spark, tmp_path):
    """One manifest mixing all four container formats through
    index_warcs — the dispatcher works per file inside the tasks."""
    from webarchive_indexing_spark.sources.warc import (
        build_arc_filedesc,
        build_arc_record,
    )

    write_mini_warc(str(tmp_path / "a.warc.gz"), _RECS[:1])
    write_mini_warc(str(tmp_path / "b.warc.gz"), _RECS[1:2], layout="single-member")
    write_mini_warc(str(tmp_path / "c.warc"), _RECS[2:], layout="plain")
    open(str(tmp_path / "d.arc"), "wb").write(
        build_arc_filedesc("d.arc")
        + build_arc_record("http://c.example/", "20200401000000", b"four")
    )
    manifest = spark.createDataFrame(
        [(str(tmp_path / n),) for n in ("a.warc.gz", "b.warc.gz", "c.warc", "d.arc")],
        ["path"],
    )
    cdx = index_warcs(spark, manifest)
    rows = cdx.collect()
    assert sorted(r["url"] for r in rows) == [
        "http://a.example/p1",
        "http://a.example/p2",
        "http://b.example/",
        "http://c.example/",
    ]
    assert all(r["urlkey"] and r["timestamp"] and r["digest"] for r in rows)


def test_record_types_opt_in_request_metadata(tmp_path):
    """pywb include-all semantics: request/metadata records index only
    when opted into via record_types; request rows carry the request
    block's Content-Type and no status; metadata rows the WARC record's
    own Content-Type; warcinfo never indexes even when listed."""
    from webarchive_indexing_spark.sources.warc import (
        build_warc_record_plain,
        parse_plain_warc,
    )

    req_http = (
        b"GET /page HTTP/1.1\r\nHost: x.example\r\n"
        b"Content-Type: application/x-www-form-urlencoded\r\n\r\nq=1"
    )
    recs = (
        build_warc_record_plain(
            "http://x.example/page", "2020-01-02T03:04:05Z", b"<html>hi</html>"
        )
        + build_warc_record_plain(
            "http://x.example/page",
            "2020-01-02T03:04:05Z",
            req_http,
            rec_type="request",
        )
        + build_warc_record_plain(
            "http://x.example/page",
            "2020-01-02T03:04:06Z",
            b"via: crawler\r\n",
            rec_type="metadata",
        )
        + build_warc_record_plain(
            "http://x.example/", "2020-01-02T03:04:07Z", b"software: test\r\n",
            rec_type="warcinfo",
        )
    )
    # metadata records carry their Content-Type in the WARC headers —
    # patch the fixture's generic header for that record
    recs = recs.replace(
        b"WARC-Type: metadata\r\n"
        b"WARC-Target-URI: http://x.example/page\r\n"
        b"WARC-Date: 2020-01-02T03:04:06Z\r\n"
        b"Content-Length: 14\r\n"
        b"Content-Type: application/http; msgtype=response\r\n",
        b"WARC-Type: metadata\r\n"
        b"WARC-Target-URI: http://x.example/page\r\n"
        b"WARC-Date: 2020-01-02T03:04:06Z\r\n"
        b"Content-Length: 14\r\n"
        b"Content-Type: application/warc-fields\r\n",
    )

    default_rows = list(parse_plain_warc("f.warc", recs))
    assert [r[3] for r in default_rows] == ["text/html"]  # response only

    all_rows = list(
        parse_plain_warc(
            "f.warc",
            recs,
            record_types=("response", "revisit", "request", "metadata", "warcinfo"),
        )
    )
    assert len(all_rows) == 3  # warcinfo still excluded
    by_type = {r[3]: r for r in all_rows}
    assert "text/html" in by_type
    req = by_type["application/x-www-form-urlencoded"]
    assert req[4] is None  # no status on request rows
    assert req[0] == "example,x)/page"
    meta = by_type["application/warc-fields"]
    assert meta[4] is None
    assert meta[1] == "20200102030406"


def test_post_append_folds_method_query(tmp_path):
    """pywb cdx-indexer -p/--post-append end-to-end: with request
    records opted in AND post_append=True, a POST request record's
    urlkey folds __wb_method plus the body's params (sorted in with
    the URL's own by SURT); non-form bodies fold as
    __wb_post_data=<base64>; bodyless POSTs gain the method marker
    alone; GET request records and the post_append=False default stay
    byte-identical to before.  The CDX url field always stays the
    target URI — only the KEY gains the grammar."""
    import base64

    from webarchive_indexing_spark.sources.warc import (
        build_warc_record_plain,
        parse_plain_warc,
    )

    form = (
        b"POST /api?z=9 HTTP/1.1\r\nHost: x.example\r\n"
        b"Content-Type: application/x-www-form-urlencoded\r\n\r\nb=2&a=1"
    )
    blob = b"\x00\x01binary"
    binary = (
        b"POST /upload HTTP/1.1\r\nHost: x.example\r\n"
        b"Content-Type: application/octet-stream\r\n\r\n" + blob
    )
    getreq = b"GET /page HTTP/1.1\r\nHost: x.example\r\n\r\n"
    empty = b"POST /ping HTTP/1.1\r\nHost: x.example\r\n\r\n"
    jsonreq = (
        b"POST /graphql HTTP/1.1\r\nHost: x.example\r\n"
        b"Content-Type: application/json\r\n\r\n"
        b'{"op": "q", "vars": {"id": 7}}'
    )
    recs = (
        build_warc_record_plain(
            "http://x.example/api?z=9", "2020-01-02T03:04:05Z", form,
            rec_type="request",
        )
        + build_warc_record_plain(
            "http://x.example/upload", "2020-01-02T03:04:06Z", binary,
            rec_type="request",
        )
        + build_warc_record_plain(
            "http://x.example/page", "2020-01-02T03:04:07Z", getreq,
            rec_type="request",
        )
        + build_warc_record_plain(
            "http://x.example/ping", "2020-01-02T03:04:08Z", empty,
            rec_type="request",
        )
        + build_warc_record_plain(
            "http://x.example/graphql", "2020-01-02T03:04:09Z", jsonreq,
            rec_type="request",
        )
    )
    types = ("response", "revisit", "request")

    keys = [
        r[0] for r in parse_plain_warc(
            "f.warc", recs, record_types=types, post_append=True
        )
    ]
    b64 = base64.b64encode(blob).decode("ascii").lower()
    assert keys == [
        "example,x)/api?__wb_method=post&a=1&b=2&z=9",
        f"example,x)/upload?__wb_method=post&__wb_post_data={b64}",
        "example,x)/page",
        "example,x)/ping?__wb_method=post",
        # json body flattened pywb-style: leaf keys, then SURT sorts
        "example,x)/graphql?__wb_method=post&id=7&op=q",
    ]
    # url field stays the target URI even when the key folds
    urls = [
        r[2] for r in parse_plain_warc(
            "f.warc", recs, record_types=types, post_append=True
        )
    ]
    assert urls[0] == "http://x.example/api?z=9"

    # the default (no post_append) is unchanged pre-existing behavior
    plain = [
        r[0] for r in parse_plain_warc("f.warc", recs, record_types=types)
    ]
    assert plain == [
        "example,x)/api?z=9",
        "example,x)/upload",
        "example,x)/page",
        "example,x)/ping",
        "example,x)/graphql",
    ]


def test_parser_never_raises_on_fuzzed_bytes():
    """Hypothesis fuzz of the damage-tolerance contract: ANY byte
    mutation of a valid archive (bit flips, truncation, garbage
    insertion) must parse without raising — damaged tails cost rows,
    never tasks — and whatever rows survive must be prefix-consistent
    with the clean parse (corruption cannot invent new captures before
    the damage point)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from webarchive_indexing_spark.sources.warc import (
        build_warc_record,
        build_warc_record_plain,
        parse_archive_file,
    )

    clean = b"".join(
        build_warc_record(
            f"http://f{i}.example/p{i}",
            "2020-05-06T07:08:09Z",
            f"payload {i}".encode(),
        )
        for i in range(4)
    )
    clean_rows = list(parse_archive_file("f.warc.gz", clean))
    assert len(clean_rows) == 4

    plain = b"".join(
        build_warc_record_plain(
            f"http://f{i}.example/p{i}",
            "2020-05-06T07:08:09Z",
            f"payload {i}".encode(),
        )
        for i in range(4)
    )

    @settings(max_examples=120, deadline=None)
    @given(
        data=st.sampled_from([clean, plain]),
        pos=st.integers(min_value=0, max_value=max(len(clean), len(plain)) - 1),
        mode=st.sampled_from(["flip", "truncate", "insert"]),
        byte=st.integers(min_value=0, max_value=255),
    )
    def fuzz(data, pos, mode, byte):
        pos = min(pos, len(data) - 1)
        if mode == "flip":
            mutated = data[:pos] + bytes([data[pos] ^ (byte or 1)]) + data[pos + 1 :]
        elif mode == "truncate":
            mutated = data[:pos]
        else:
            mutated = data[:pos] + bytes([byte]) + data[pos:]
        name = "f.warc.gz" if data is clean else "f.warc"
        rows = list(parse_archive_file(name, mutated))  # must not raise
        assert len(rows) <= 8  # never invents unbounded rows

    fuzz()


def test_wet_conversion_records_index(tmp_path):
    """Common Crawl WET support: a .warc.gz of `conversion` records
    (plain-text extracts) indexes via record_types=('conversion',) —
    urlkey/date from WARC headers, text/plain mime, digest over the
    extracted text; the default record set still ignores WET files."""
    import gzip

    from webarchive_indexing_spark.sources.warc import parse_archive_file

    def wet_record(url, text):
        body = text.encode()
        headers = (
            "WARC/1.0\r\n"
            "WARC-Type: conversion\r\n"
            f"WARC-Target-URI: {url}\r\n"
            "WARC-Date: 2021-03-04T05:06:07Z\r\n"
            f"Content-Length: {len(body)}\r\n"
            "Content-Type: text/plain\r\n"
        ).encode()
        return gzip.compress(headers + b"\r\n" + body + b"\r\n\r\n", mtime=0)

    data = wet_record("http://a.example/x", "extracted text one") + wet_record(
        "http://b.example/y", "extracted text two"
    )
    assert list(parse_archive_file("f.warc.wet.gz", data)) == []
    rows = list(
        parse_archive_file("f.warc.wet.gz", data, record_types=("conversion",))
    )
    assert [r[0] for r in rows] == ["example,a)/x", "example,b)/y"]
    assert all(r[3] == "text/plain" for r in rows)
    assert all(r[1] == "20210304050607" for r in rows)
    assert all(r[4] is None for r in rows)  # no HTTP status on WET


def test_wat_link_extraction_feeds_graph(spark, tmp_path):
    """Common Crawl WAT: metadata-record JSON envelopes yield the
    outlink edge list, SURT keys derived scan-side — the input the
    link-graph operators (PageRank, host reports) consume.  Damaged
    envelopes cost their own record only."""
    from webarchive_indexing_spark.sources.warc import (
        build_wat_record,
        parse_wat_links,
        wat_link_edges,
    )

    wat = (
        build_wat_record(
            "http://a.example/page",
            "2021-01-02T03:04:05Z",
            ["http://b.example/x", "https://C.example:443/y?b=2&a=1"],
        )
        + build_wat_record("http://nolinks.example/", "2021-01-02T03:04:06Z", [])
        + build_wat_record("http://b.example/x", "2021-01-02T03:04:07Z",
                           ["http://a.example/page"])
    )
    edges = list(parse_wat_links("f.warc.wat.gz", wat))
    assert len(edges) == 3
    assert ("http://a.example/page", "20210102030405", "http://b.example/x") in edges

    # a record with an unparseable envelope yields nothing; the valid
    # record in the same file still does
    import gzip as _gz

    bad_body = b'{"Envelope": not json'
    bad = _gz.compress(
        (
            "WARC/1.0\r\nWARC-Type: metadata\r\n"
            "WARC-Target-URI: http://bad.example/\r\n"
            "WARC-Date: 2021-01-02T03:04:08Z\r\n"
            f"Content-Length: {len(bad_body)}\r\n"
            "Content-Type: application/json\r\n"
        ).encode()
        + b"\r\n"
        + bad_body
        + b"\r\n\r\n",
        mtime=0,
    )
    mixed = bad + build_wat_record(
        "http://ok.example/", "2021-01-02T03:04:09Z", ["http://t.example/"]
    )
    got = list(parse_wat_links("f.warc.wat.gz", mixed))
    assert got == [("http://ok.example/", "20210102030409", "http://t.example/")]

    p = tmp_path / "f.warc.wat.gz"
    p.write_bytes(wat)
    manifest = spark.createDataFrame([(str(p),)], ["path"])
    df = wat_link_edges(spark, manifest)
    rows = {(r.src_key, r.target_key) for r in df.collect()}
    assert ("example,a)/page", "example,b)/x") in rows
    assert ("example,a)/page", "example,c)/y?a=1&b=2") in rows  # SURT-normalized
    assert ("example,b)/x", "example,a)/page") in rows


def test_streaming_member_reader_equivalence(tmp_path):
    """The bounded-memory streaming reader must yield byte-identical
    results to the in-memory parser across awkward chunk sizes
    (member boundaries mid-chunk, 1-byte chunks) and keep the
    truncated-tail tolerance."""
    import io

    from webarchive_indexing_spark.sources.warc import (
        build_warc_record,
        iter_warc_members,
        iter_warc_members_stream,
        parse_warc_file,
        parse_warc_file_stream,
    )

    data = b"".join(
        build_warc_record(
            f"http://s{i}.example/p", "2020-05-06T07:08:09Z", b"x" * (10 + i)
        )
        for i in range(5)
    )
    want_members = list(iter_warc_members(data))
    want_rows = list(parse_warc_file("f.warc.gz", data))
    assert len(want_rows) == 5

    for chunk in (1, 7, 64, 1 << 20):
        got_members = list(iter_warc_members_stream(io.BytesIO(data), chunk))
        assert got_members == want_members, f"chunk={chunk}"
        got_rows = list(
            parse_warc_file_stream("f.warc.gz", io.BytesIO(data), chunk_size=chunk)
        )
        assert got_rows == want_rows, f"chunk={chunk}"

    # truncated tail: the complete members still parse, no raise
    cut = data[: len(data) - 8]
    got_cut = list(iter_warc_members_stream(io.BytesIO(cut), 13))
    assert got_cut == want_members[:4]
    # corrupt mid-file: iteration stops at the damage.  The flip must
    # hit the DEFLATE payload (offset+30), not the gzip header's mtime
    # field (offset+4..7), which zlib legitimately ignores.
    bad = bytearray(data)
    bad[want_members[2][0] + 30] ^= 0xFF
    got_bad = list(iter_warc_members_stream(io.BytesIO(bytes(bad)), 17))
    assert got_bad == want_members[:2]


def test_index_warcs_streaming_path_equivalence(spark, warc_dir):
    """index_warcs(streaming=True) — the bounded-memory default —
    must produce exactly the in-memory path's rows over the mixed
    fixture set (member-per-record gzip dispatched streaming, the
    rest down the whole-file path)."""
    manifest = spark.createDataFrame(
        [(os.path.join(warc_dir, f),) for f in sorted(os.listdir(warc_dir))],
        ["path"],
    )
    stream_rows = sorted(map(tuple, index_warcs(spark, manifest).collect()))
    memory_rows = sorted(
        map(tuple, index_warcs(spark, manifest, streaming=False).collect())
    )
    assert stream_rows == memory_rows
    assert len(stream_rows) == 4


def test_wat_page_metadata_surface(spark, tmp_path):
    """WAT beyond outlinks: Head.Title / Metas description / response
    Server + Content-Type headers / link count per record, NULL-safe
    on partial envelopes, SURT-keyed for CDX joins."""
    from webarchive_indexing_spark.sources.warc import (
        build_wat_record,
        parse_wat_meta,
        wat_page_meta,
    )

    wat = (
        build_wat_record(
            "http://a.example/page",
            "2021-01-02T03:04:05Z",
            ["http://b.example/x", "http://c.example/y"],
            title="A page",
            server="nginx/1.18",
            content_type="text/html; charset=utf-8",
            metas=[("keywords", "k1,k2"), ("Description", "hello world")],
        )
        + build_wat_record(
            # partial envelope: no Head, no Headers, no links
            "http://bare.example/", "2021-01-02T03:04:06Z", []
        )
    )
    rows = list(parse_wat_meta("f.warc.wat.gz", wat))
    assert len(rows) == 2
    full = next(r for r in rows if r[0] == "http://a.example/page")
    assert full == (
        "http://a.example/page", "20210102030405", "A page", "hello world",
        "nginx/1.18", "text/html; charset=utf-8", 2,
    )
    bare = next(r for r in rows if r[0] == "http://bare.example/")
    assert bare[2:] == (None, None, None, None, 0)

    p = tmp_path / "m.warc.wat.gz"
    p.write_bytes(wat)
    manifest = spark.createDataFrame([(str(p),)], ["path"])
    df = wat_page_meta(spark, manifest)
    got = {r.urlkey: r for r in df.collect()}
    assert got["example,a)/page"].title == "A page"
    assert got["example,a)/page"].server == "nginx/1.18"
    assert got["example,bare)/"].n_links == 0


def test_wat_meta_damage_tolerance_on_hostile_envelopes():
    """Review fix (round 6): type-confused WAT envelopes (Metas name
    null, non-string header values, non-dict payload levels, JSON
    bodies that are arrays) must degrade to NULL fields or skip their
    own record — never raise through the scan."""
    import gzip as _gz
    import json as _json

    from webarchive_indexing_spark.sources.warc import parse_wat_meta

    def rec(env) -> bytes:
        body = _json.dumps(env).encode()
        return _gz.compress(
            (
                "WARC/1.0\r\nWARC-Type: metadata\r\n"
                "WARC-Target-URI: http://h.example/\r\n"
                "WARC-Date: 2021-01-02T03:04:05Z\r\n"
                f"Content-Length: {len(body)}\r\n"
                "Content-Type: application/json\r\n"
            ).encode()
            + b"\r\n" + body + b"\r\n\r\n",
            mtime=0,
        )

    hostile = (
        rec([1, 2, 3])  # JSON body not an object -> record skipped
        + rec({"Envelope": {"Payload-Metadata": 3}})  # non-dict level
        + rec({"Envelope": {"Payload-Metadata": {"HTTP-Response-Metadata": {
            "HTML-Metadata": {
                "Head": {"Title": 7,
                         "Metas": [{"name": None, "content": "x"},
                                   "junk",
                                   {"name": "description", "content": 5},
                                   {"name": "Description", "content": "ok"}]},
                "Links": "not-a-list"},
            "Headers": {"Server": 123, "Content-Type": ["a"]}}}}})
    )
    rows = list(parse_wat_meta("h.warc.wat.gz", hostile))
    # first record skipped (not an object); the other two yield NULLs
    assert len(rows) == 2
    assert rows[0][2:] == (None, None, None, None, 0)
    url, ts, title, desc, server, ctype, n_links = rows[1]
    assert title is None and server is None and ctype is None
    # first matching description wins; its non-string content -> NULL
    assert desc is None
    assert n_links == 0


def test_wat_asset_classes_and_header_map(spark, tmp_path):
    """Full WAT surface (round 7): body link classes (A@/href,
    IMG@/src), Head.Scripts, Head.Link with rel, and the complete
    HTTP response header MAP — type-guarded like every WAT extractor."""
    from webarchive_indexing_spark.sources.warc import (
        build_wat_record,
        parse_wat_assets,
        parse_wat_headers,
        wat_page_assets,
        wat_response_headers,
    )

    wat = (
        build_wat_record(
            "http://a.example/page",
            "2021-01-02T03:04:05Z",
            ["http://b.example/x", "http://img.example/i.png"],
            link_paths=["A@/href", "IMG@/src"],
            scripts=["http://cdn.example/app.js"],
            head_links=[("http://cdn.example/site.css", "stylesheet")],
            server="nginx/1.18",
            content_type="text/html",
            extra_headers={"Cache-Control": "max-age=60",
                           "X-Frame-Options": "DENY"},
        )
        + build_wat_record("http://bare.example/", "2021-01-02T03:04:06Z", [])
    )
    assets = list(parse_wat_assets("f.warc.wat.gz", wat))
    by_class = {}
    for src, ts, url, cls, rel in assets:
        assert src == "http://a.example/page" and ts == "20210102030405"
        by_class.setdefault(cls, []).append((url, rel))
    assert by_class == {
        "A@/href": [("http://b.example/x", None)],
        "IMG@/src": [("http://img.example/i.png", None)],
        "SCRIPT@/src": [("http://cdn.example/app.js", None)],
        "LINK@/href": [("http://cdn.example/site.css", "stylesheet")],
    }

    hdrs = {u: h for u, _, h in parse_wat_headers("f.warc.wat.gz", wat)}
    assert hdrs["http://a.example/page"] == {
        "Server": "nginx/1.18",
        "Content-Type": "text/html",
        "Cache-Control": "max-age=60",
        "X-Frame-Options": "DENY",
    }
    assert hdrs["http://bare.example/"] == {}

    p = tmp_path / "m.warc.wat.gz"
    p.write_bytes(wat)
    manifest = spark.createDataFrame([(str(p),)], ["path"])
    adf = wat_page_assets(spark, manifest)
    rows = adf.collect()
    assert {r.link_class for r in rows} == {
        "A@/href", "IMG@/src", "SCRIPT@/src", "LINK@/href"
    }
    assert all(r.src_key == "example,a)/page" for r in rows)
    css = next(r for r in rows if r.link_class == "LINK@/href")
    assert css.target_key == "example,cdn)/site.css" and css.rel == "stylesheet"

    hdf = wat_response_headers(spark, manifest)
    from pyspark.sql import functions as _F

    got = {
        r.urlkey: r.h
        for r in hdf.select(
            "urlkey", _F.element_at("headers", "Cache-Control").alias("h")
        ).collect()
    }
    assert got["example,a)/page"] == "max-age=60"
    assert got["example,bare)/"] is None


def test_wat_asset_and_header_damage_tolerance():
    """Hostile envelopes degrade per-entry/per-record, never raise:
    non-dict link entries, numeric urls, non-string header values,
    non-list Scripts."""
    import gzip as _gz
    import json as _json

    from webarchive_indexing_spark.sources.warc import (
        parse_wat_assets,
        parse_wat_headers,
    )

    def rec(env) -> bytes:
        body = _json.dumps(env).encode()
        head = (
            "WARC/1.0\r\nWARC-Type: metadata\r\n"
            "WARC-Target-URI: http://x.example/\r\n"
            "WARC-Date: 2021-01-01T00:00:00Z\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode()
        return _gz.compress(head + body + b"\r\n\r\n", mtime=0)

    env = {
        "Envelope": {
            "Payload-Metadata": {
                "HTTP-Response-Metadata": {
                    "HTML-Metadata": {
                        "Links": ["junk", {"url": 7}, {"url": "http://ok/"},
                                  {"url": "http://cls/", "path": 9}],
                        "Head": {"Scripts": "not-a-list",
                                 "Link": [{"url": "http://l/", "rel": 3}]},
                    },
                    "Headers": {"Server": "ok", "Bad": 42, 7: "alsobad"},
                }
            }
        }
    }
    rows = list(parse_wat_assets("f", rec(env)))
    assert ("http://x.example/", "20210101000000", "http://ok/", "A@/href", None) in rows
    assert ("http://x.example/", "20210101000000", "http://cls/", "A@/href", None) in rows
    assert ("http://x.example/", "20210101000000", "http://l/", "LINK@/href", None) in rows
    assert len(rows) == 3
    (hrow,) = parse_wat_headers("f", rec(env))
    # JSON stringifies the 7 key on the wire, so it survives as "7";
    # the non-string VALUE (42) drops its entry
    assert hrow[2] == {"Server": "ok", "7": "alsobad"}


def test_find_member_split_offsets_true_boundaries(tmp_path):
    """The pre-scan's verified offsets are exactly member starts: every
    returned offset appears in the ground-truth member walk, offsets
    bracket the size/n targets, and candidates inside deflate payloads
    are rejected (verification decompresses and demands a WARC head)."""
    from webarchive_indexing_spark.sources.warc import (
        find_member_split_offsets,
        iter_warc_members,
        _next_member_offset,
    )

    recs = [
        dict(
            url=f"http://example.com/p{i}",
            date_iso="2015-03-04T12:30:45Z",
            # vary payloads so compressed members differ in size; embed
            # the gzip magic INSIDE payloads to stress verification
            payload=(b"\x1f\x8b\x08" + bytes([i % 251]) * (50 + 37 * i)),
        )
        for i in range(40)
    ]
    p = str(tmp_path / "big.warc.gz")
    write_mini_warc(p, recs)
    data = open(p, "rb").read()
    truth = [off for off, _len, _rec in iter_warc_members(data)]

    with open(p, "rb") as fh:
        offs = find_member_split_offsets(fh, len(data), 8)
    assert offs[0] == 0
    assert offs == sorted(set(offs))
    assert set(offs) <= set(truth), set(offs) - set(truth)
    assert len(offs) >= 6  # targets actually split (members are small)

    # a target mid-member resolves to the NEXT member boundary
    with open(p, "rb") as fh:
        nxt = _next_member_offset(fh, truth[3] + 1, len(data))
    assert nxt == truth[4]


def test_warc_media_composition_end_to_end(spark, tmp_path):
    """Round-12 ingest→curation seam: index_warcs(keep_payload=...)
    retains ONLY allowlisted-mime payloads as a trailing binary
    column (CDX fields identical to the CDX-only pass; default-path
    schema untouched), and media_meta runs the image/audio/video
    header parsers over the same frame — one image/audio/video member
    each, a damaged media payload, and an html row that must not
    retain bytes."""
    from webarchive_indexing_spark.operators.multimodal import (
        build_mp4,
        build_png_header,
        build_wav,
        media_meta,
    )
    from webarchive_indexing_spark.sources.warc import index_warcs

    png = build_png_header(640, 480)
    wav = build_wav(2, 44100, 16, 44100)  # exactly 1 s
    mp4 = build_mp4(1280, 720, 1000, 2500)  # 2500 ms
    recs = [
        dict(url="http://m.example/img", date_iso="2020-01-01T00:00:00Z",
             payload=png, mime="image/png"),
        dict(url="http://m.example/aud", date_iso="2020-01-01T00:00:01Z",
             payload=wav, mime="audio/wav"),
        dict(url="http://m.example/vid", date_iso="2020-01-01T00:00:02Z",
             payload=mp4, mime="video/mp4"),
        # damaged media payload: retained (mime matches) but parses
        # to 'unsupported' — per-row tolerance, never task death
        dict(url="http://m.example/bad", date_iso="2020-01-01T00:00:03Z",
             payload=b"\x89PNG\r\n\x1a\nJUNK", mime="image/png"),
        dict(url="http://m.example/page", date_iso="2020-01-01T00:00:04Z",
             payload=b"<html>hi</html>", mime="text/html"),
    ]
    p = str(tmp_path / "media.warc.gz")
    write_mini_warc(p, recs)
    manifest = spark.createDataFrame([(p,)], ["path"])

    plain = index_warcs(spark, manifest)
    kept = index_warcs(
        spark, manifest, keep_payload=("image/", "audio/", "video/")
    )
    assert "payload" not in plain.columns  # default path untouched
    assert kept.columns == plain.columns + ["payload"]
    # CDX fields identical with retention on
    assert sorted(map(tuple, plain.collect())) == sorted(
        tuple(r)[:-1] for r in kept.collect()
    )
    by_url = {r.url: r for r in kept.collect()}
    assert bytes(by_url["http://m.example/img"].payload) == png
    assert bytes(by_url["http://m.example/aud"].payload) == wav
    assert bytes(by_url["http://m.example/vid"].payload) == mp4
    assert by_url["http://m.example/page"].payload is None  # not allowlisted

    meta = {r.url: r for r in media_meta(kept).collect()}
    assert "http://m.example/page" in {r.url for r in kept.collect()}
    assert "http://m.example/page" not in meta  # NULL payload dropped
    img = meta["http://m.example/img"]
    assert (img.media_kind, img.format, img.width, img.height) == (
        "image", "png", 640, 480,
    )
    aud = meta["http://m.example/aud"]
    assert (aud.media_kind, aud.channels, aud.sample_rate,
            aud.duration_ms) == ("audio", 2, 44100, 1000)
    vid = meta["http://m.example/vid"]
    assert (vid.media_kind, vid.width, vid.height, vid.duration_ms) == (
        "video", 1280, 720, 2500,
    )
    bad = meta["http://m.example/bad"]
    assert (bad.media_kind, bad.format) == ("image", "unsupported")
    # metadata out, bytes dropped: no payload column downstream
    assert "payload" not in meta["http://m.example/img"].asDict()


def test_arc_keep_payload_retention(tmp_path):
    """keep_payload works on the legacy ARC path too: allowlisted
    mimes retain bytes, others stay NULL, filedesc never indexes."""
    import gzip as _gzip

    from webarchive_indexing_spark.operators.multimodal import (
        build_png_header,
    )
    from webarchive_indexing_spark.sources.warc import (
        build_arc_filedesc,
        build_arc_record,
        parse_archive_file,
    )

    png = build_png_header(8, 8)
    blob = (
        build_arc_filedesc("a.arc")
        + build_arc_record("http://a.example/i", "20200101000000", png,
                           mime="image/png")
        + build_arc_record("http://a.example/t", "20200101000001",
                           b"<html/>", mime="text/html")
    )
    p_gz = str(tmp_path / "a.arc.gz")
    open(p_gz, "wb").write(_gzip.compress(blob, mtime=0))
    rows = list(parse_archive_file(
        p_gz, open(p_gz, "rb").read(),
        keep_payload=("image/", "audio/", "video/"),
    ))
    by_url = {r[2]: r for r in rows}
    assert bytes(by_url["http://a.example/i"][-1]) == png
    assert by_url["http://a.example/t"][-1] is None
    assert len(rows) == 2


def test_media_meta_cli(spark, tmp_path):
    """The media-meta subcommand drives the whole keep_payload →
    curation chain from argv and writes the metadata parquet."""
    import os

    from webarchive_indexing_spark.__main__ import main
    from webarchive_indexing_spark.operators.multimodal import (
        build_png_header,
    )

    p = str(tmp_path / "m.warc.gz")
    write_mini_warc(p, [
        dict(url="http://c.example/i", date_iso="2020-01-01T00:00:00Z",
             payload=build_png_header(32, 16), mime="image/png"),
        dict(url="http://c.example/t", date_iso="2020-01-01T00:00:01Z",
             payload=b"<html/>", mime="text/html"),
    ])
    man = str(tmp_path / "manifest.txt")
    open(man, "w").write(p + "\n")
    out = str(tmp_path / "meta")
    assert main(["media-meta", man, out]) == 0
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1  # html row not retained, so not curated
    assert (rows[0].media_kind, rows[0].format, rows[0].width,
            rows[0].height) == ("image", "png", 32, 16)
    assert os.path.isdir(out)


def test_split_planning_arc_and_unknown_containers(spark, tmp_path):
    """Round-12 ADVICE: split planning must not pay O(n_splits x file)
    on containers whose member heads never verify.  (1) A gzipped ARC
    over the split threshold stays WHOLE (the ranged parser is
    WARC-only; ARC routes down the whole-file dispatch) and parses
    identically with split_bytes on; (2) _next_member_offset gives up
    after max_windows instead of trial-decompressing to EOF;
    (3) direct callers scanning an ARC still get verified member
    boundaries (URL-line heads are accepted)."""
    import gzip as _gzip

    from webarchive_indexing_spark.sources.warc import (
        _next_member_offset,
        _plan_split_ranges,
        build_arc_filedesc,
        build_arc_record,
        index_warcs,
    )

    p_gz = str(tmp_path / "legacy.arc.gz")
    members = [_gzip.compress(build_arc_filedesc("legacy.arc"), mtime=0)]
    for i in range(30):
        members.append(
            _gzip.compress(
                build_arc_record(
                    f"http://a.example/p{i}",
                    "20200101000000",
                    bytes([i % 251]) * (200 + 31 * i),
                ),
                mtime=0,
            )
        )
    with open(p_gz, "wb") as fh:
        for m in members:
            fh.write(m)
    size = os.path.getsize(p_gz)

    manifest = spark.createDataFrame([(p_gz,)], ["path"])
    ranges_rdd, n_tasks = _plan_split_ranges(
        spark, manifest, 1, size // 6
    )
    assert ranges_rdd.collect() == [(p_gz, 0, -1)]  # kept whole
    assert n_tasks == 1

    base = sorted(map(tuple, index_warcs(spark, manifest).collect()))
    split = sorted(
        map(tuple, index_warcs(spark, manifest, split_bytes=size // 6).collect())
    )
    assert base and split == base

    # (2) a gzip member whose head never verifies: bounded give-up
    junk = str(tmp_path / "junk.gz")
    open(junk, "wb").write(
        _gzip.compress(b"not-an-archive " * 20000, mtime=0) * 4
    )
    jsize = os.path.getsize(junk)
    with open(junk, "rb") as fh:
        assert (
            _next_member_offset(fh, 0, jsize, window=1024, max_windows=3)
            is None
        )

    # (3) ARC URL-line heads verify as member boundaries
    off1 = len(members[0])
    with open(p_gz, "rb") as fh:
        assert _next_member_offset(fh, 1, size) == off1


def test_index_warcs_split_equals_unsplit(spark, tmp_path):
    """Intra-file ranged parsing returns EXACTLY the unsplit rows —
    same records, same absolute offsets — on a clean multi-member file
    plus mixed small files; split_bytes only changes task shape."""
    from webarchive_indexing_spark.sources.warc import index_warcs

    recs = [
        dict(
            url=f"http://example.com/big/{i}",
            date_iso="2015-03-04T12:30:45Z",
            payload=bytes([i % 251]) * (200 + 13 * i),
        )
        for i in range(60)
    ]
    big = str(tmp_path / "huge.warc.gz")
    write_mini_warc(big, recs)
    small = str(tmp_path / "small.warc.gz")
    write_mini_warc(small, _RECS[:2])
    plain = str(tmp_path / "plain.warc")
    write_mini_warc(plain, _RECS[2:], layout="plain")
    manifest = spark.createDataFrame(
        [(big,), (small,), (plain,)], ["path"]
    )

    base = sorted(map(tuple, index_warcs(spark, manifest).collect()))
    split = index_warcs(
        spark, manifest, split_bytes=os.path.getsize(big) // 6
    )
    assert sorted(map(tuple, split.collect())) == base
    # the big file really fanned out into >1 ranged task
    n_parts = split.rdd.getNumPartitions()
    assert n_parts > 2, n_parts


def test_index_warcs_split_recovers_ranges_past_corruption(spark, tmp_path):
    """A corrupt member ends its RANGE, not the rest of the file:
    ranges starting after the damage still parse — the split read
    recovers at least every record the unsplit read recovers."""
    from webarchive_indexing_spark.sources.warc import (
        index_warcs,
        iter_warc_members,
    )

    recs = [
        dict(
            url=f"http://example.com/c/{i}",
            date_iso="2015-03-04T12:30:45Z",
            payload=bytes([i % 251]) * 400,
        )
        for i in range(30)
    ]
    p = str(tmp_path / "damaged.warc.gz")
    write_mini_warc(p, recs)
    data = open(p, "rb").read()
    offs = [o for o, _l, _r in iter_warc_members(data)]
    # corrupt the 10th member's interior bytes
    hit = offs[10] + 20
    damaged = data[:hit] + b"\xde\xad\xbe\xef" + data[hit + 4 :]
    open(p, "wb").write(damaged)

    manifest = spark.createDataFrame([(p,)], ["path"])
    base = index_warcs(spark, manifest).count()
    split = index_warcs(
        spark, manifest, split_bytes=len(damaged) // 5
    ).count()
    assert base == 10  # unsplit: everything after the damage is lost
    assert split > base  # later ranges resume at verified boundaries


def test_wat_scan_split_equals_unsplit(spark, tmp_path):
    """Intra-file ranges on the WAT path: one big .wat.gz fanned into
    member-offset ranges yields exactly the unsplit extractor output
    (edges AND page metadata) — same planner as index_warcs, same
    straggler argument."""
    from webarchive_indexing_spark.sources.warc import (
        build_wat_record,
        wat_link_edges,
        wat_page_meta,
    )

    wat = b"".join(
        build_wat_record(
            f"http://site{i % 7}.example/p/{i}",
            f"2021-01-02T03:04:{i % 60:02d}Z",
            [f"http://site{(i + 1) % 7}.example/q/{i}"] * (1 + i % 3),
        )
        for i in range(120)
    )
    p = str(tmp_path / "big.warc.wat.gz")
    open(p, "wb").write(wat)
    manifest = spark.createDataFrame([(p,)], ["path"])

    base_edges = sorted(map(tuple, wat_link_edges(spark, manifest).collect()))
    split_edges_df = wat_link_edges(
        spark, manifest, split_bytes=os.path.getsize(p) // 5
    )
    assert sorted(map(tuple, split_edges_df.collect())) == base_edges
    assert split_edges_df.rdd.getNumPartitions() > 1

    base_meta = sorted(map(tuple, wat_page_meta(spark, manifest).collect()))
    split_meta = sorted(
        map(
            tuple,
            wat_page_meta(
                spark, manifest, split_bytes=os.path.getsize(p) // 5
            ).collect(),
        )
    )
    assert split_meta == base_meta


def test_keep_payload_skips_revisit_and_empty_bodies(spark, tmp_path):
    """Review fix: a revisit record carries the original response's
    HTTP headers (media content-type) but NO body — retaining its
    empty payload would hand the curation pass one spurious
    'unsupported' row per deduplicated recrawl of every media URL.
    Revisits and empty-bodied responses must keep payload=NULL; the
    CDX row itself is unchanged (mime 'warc/revisit')."""
    from webarchive_indexing_spark.operators.multimodal import (
        build_png_header,
        media_meta,
    )
    from webarchive_indexing_spark.sources.warc import (
        index_warcs,
        write_mini_warc,
    )

    png = build_png_header(10, 10)
    recs = [
        dict(url="http://r.example/img", date_iso="2020-01-01T00:00:00Z",
             payload=png, mime="image/png"),
        # a revisit of the image: HTTP headers only, zero body bytes
        dict(url="http://r.example/img", date_iso="2020-02-01T00:00:00Z",
             rec_type="revisit",
             payload=b"HTTP/1.1 200 OK\r\nContent-Type: image/png\r\n\r\n"),
        # a media-mime response whose body is empty
        dict(url="http://r.example/empty", date_iso="2020-01-01T00:00:01Z",
             payload=b"", mime="image/png"),
    ]
    p = str(tmp_path / "revisit.warc.gz")
    write_mini_warc(p, recs)
    manifest = spark.createDataFrame([(p,)], ["path"])
    kept = index_warcs(
        spark, manifest, keep_payload=("image/", "audio/", "video/")
    )
    rows = sorted(kept.collect(), key=lambda r: (r.url, r.timestamp))
    by = {(r.url, r.timestamp[:6]): r for r in rows}
    assert bytes(by[("http://r.example/img", "202001")].payload) == png
    rv = by[("http://r.example/img", "202002")]
    assert rv.mime == "warc/revisit" and rv.payload is None
    assert by[("http://r.example/empty", "202001")].payload is None
    # curation sees exactly one row: the real image
    meta = media_meta(kept).collect()
    assert len(meta) == 1 and meta[0].format == "png"


def test_write_wet_shards_and_grammar(spark, tmp_path):
    """Round 13 WET producer: sharded conversion records, key-ranged
    shards, record-level text/plain Content-Type, NULL-text rows
    dropped — and the raw bytes re-parse with the engine's WET
    reader."""
    from webarchive_indexing_spark.sources.warc import (
        parse_archive_file,
        write_wet,
    )

    rows = [
        (f"http://w.example/p/{i:02d}", "2021-05-05T01:02:03Z",
         f"text body {i} with several more words here" if i % 4 else None)
        for i in range(20)
    ]
    df = spark.createDataFrame(
        rows, "url string, date_iso string, main_text string"
    )
    out = tmp_path / "wet"
    manifest = write_wet(df, str(out), n_files=2)
    assert [n for _, n in manifest] and sum(n for _, n in manifest) == 15
    assert all(p.endswith(".warc.wet.gz") for p, _ in manifest)
    parsed = []
    for p, _n in manifest:
        data = open(p, "rb").read()
        parsed += list(
            parse_archive_file(
                p.rsplit("/", 1)[1], data,
                record_types=("conversion",), keep_payload=("text/",),
            )
        )
    assert len(parsed) == 15
    got = sorted((r[2], r[1], r[3], bytes(r[-1]).decode()) for r in parsed)
    want = sorted(
        (u, "20210505010203", "text/plain", t)
        for u, _d, t in rows if t is not None
    )
    assert got == want
    # shards hold disjoint, contiguous key ranges (range shuffle)
    per_shard = {}
    for p, _n in manifest:
        data = open(p, "rb").read()
        urls = [r[2] for r in parse_archive_file(
            p, data, record_types=("conversion",))]
        assert urls == sorted(urls)
        per_shard[p] = (min(urls), max(urls))
    spans = sorted(per_shard.values())
    for (_, hi), (lo, _) in zip(spans, spans[1:]):
        assert hi <= lo


def test_build_warc_record_conversion_content_type():
    from webarchive_indexing_spark.sources.warc import (
        build_warc_record_plain,
    )

    rec = build_warc_record_plain(
        "http://x.example/", "2020-01-01T00:00:00Z", b"hello",
        rec_type="conversion",
    )
    assert b"Content-Type: text/plain\r\n" in rec
    resp = build_warc_record_plain(
        "http://x.example/", "2020-01-01T00:00:00Z", b"<p>hi</p>"
    )
    assert b"Content-Type: application/http; msgtype=response\r\n" in resp


def test_write_wet_clears_stale_shards(spark, tmp_path):
    """Round-13 ADVICE: re-running write_wet into a populated out_dir
    with FEWER shards must not leave stale wet-NNNNN files for a
    directory-level reader to double-ingest — parquet-sink overwrite
    semantics."""
    import os

    from webarchive_indexing_spark.sources.warc import write_wet

    rows = [
        (f"http://e.com/{i}", "2020-01-01T00:00:00Z", f"text {i}")
        for i in range(8)
    ]
    df = spark.createDataFrame(rows, ["url", "date_iso", "main_text"])
    out = str(tmp_path / "wet")
    write_wet(df, out, n_files=4)
    first = sorted(
        f for f in os.listdir(out) if f.endswith(".warc.wet.gz")
    )
    assert len(first) == 4
    manifest = write_wet(df.limit(2), out, n_files=1)
    now = sorted(f for f in os.listdir(out) if f.endswith(".warc.wet.gz"))
    assert now == ["wet-00000.warc.wet.gz"]
    assert manifest[0][1] == 2


def test_write_warc_roundtrip_digest_and_overwrite(spark, tmp_path):
    """write_warc emits response records the engine's own reader
    parses back field-for-field; the stored WARC-Payload-Digest
    header matches the digest the reader recomputes (b32), and a
    re-run with fewer shards clears stale warc-NNNNN files."""
    import gzip
    import os

    from webarchive_indexing_spark.sources.warc import (
        index_warcs,
        write_warc,
    )

    rows = [
        (
            f"http://w.example/p/{i}",
            "2021-06-01T12:00:00Z",
            f"payload number {i}".encode(),
            "text/plain",
        )
        for i in range(6)
    ]
    df = spark.createDataFrame(
        rows, "url string, date_iso string, payload binary, mime string"
    )
    out = str(tmp_path / "rearc")
    manifest = write_warc(df, out, n_files=3)
    assert sum(n for _p, n in manifest) == 6
    got = index_warcs(
        spark,
        spark.createDataFrame([(p,) for p, _n in manifest], ["path"]),
        keep_payload=("text/",),
        digest_b32=True,
    ).collect()
    assert len(got) == 6
    by_url = {r.url: r for r in got}
    for url, _d, payload, mime in rows:
        r = by_url[url]
        assert bytes(r.payload) == payload
        assert r.mime == "text/plain" and r.status == 200
        assert r.timestamp == "20210601120000"
    # the WRITTEN digest header equals the reader's recomputed digest
    with open(manifest[0][0], "rb") as fh:
        raw = gzip.decompress(fh.read())
    first_url = raw.split(b"WARC-Target-URI: ", 1)[1].split(b"\r\n", 1)[0]
    written = raw.split(b"WARC-Payload-Digest: sha1:", 1)[1].split(
        b"\r\n", 1
    )[0]
    assert written.decode() == by_url[first_url.decode()].digest
    # overwrite semantics
    write_warc(df.limit(2), out, n_files=1)
    now = sorted(f for f in os.listdir(out) if f.endswith(".warc.gz"))
    assert now == ["warc-00000.warc.gz"]


def test_revisit_declared_digest_normalized_both_formats(tmp_path):
    """pywb cdx-indexer parity (round 14): a BODILESS revisit's CDX
    digest comes from its declared WARC-Payload-Digest (sha1:b32),
    normalized to whichever digest format the ingest asked for — so
    revisit→original joins work in hex AND b32 runs.  A malformed
    declaration falls back to the computed digest."""
    import base64
    import hashlib
    import os

    from webarchive_indexing_spark.sources.warc import (
        build_warc_record,
        parse_warc_file,
    )

    body = b"the original payload"
    h = hashlib.sha1(body)
    b32 = base64.b32encode(h.digest()).decode()
    p = str(tmp_path / "rv.warc.gz")
    with open(p, "wb") as fh:
        fh.write(
            build_warc_record(
                "http://x.example/a", "2021-01-01T00:00:00Z", b"",
                rec_type="revisit", payload_digest=f"sha1:{b32}",
                refers_to_url="http://x.example/a",
                refers_to_date="2020-01-01T00:00:00Z",
            )
        )
        fh.write(
            build_warc_record(
                "http://x.example/bad", "2021-01-01T00:00:00Z", b"",
                rec_type="revisit", payload_digest="sha1:not!b32",
            )
        )
    data = open(p, "rb").read()
    hex_rows = list(parse_warc_file(os.path.basename(p), data))
    assert hex_rows[0][5] == h.hexdigest()
    assert hex_rows[1][5] == hashlib.sha1(b"").hexdigest()  # fallback
    b32_rows = list(
        parse_warc_file(os.path.basename(p), data, digest_b32=True)
    )
    assert b32_rows[0][5] == b32


def test_dedup_to_revisits_window_semantics(spark):
    """First capture per payload digest (by date, then url) stays a
    response; every later identical capture becomes a revisit
    pointing at it — including cross-URL duplicates."""
    from webarchive_indexing_spark.sources.warc import dedup_to_revisits

    rows = [
        ("http://d.example/a", "2020-01-01T00:00:00Z", b"same", "t"),
        ("http://d.example/b", "2020-06-01T00:00:00Z", b"same", "t"),
        ("http://d.example/a", "2021-01-01T00:00:00Z", b"same", "t"),
        ("http://d.example/c", "2020-01-01T00:00:00Z", b"other", "t"),
    ]
    dd = {
        (r.url, r.date_iso): (r.rec_type, r.refers_to_url, r.refers_to_date)
        for r in dedup_to_revisits(
            spark.createDataFrame(
                rows, "url string, date_iso string, payload binary, mime string"
            )
        ).collect()
    }
    a0 = ("http://d.example/a", "2020-01-01T00:00:00Z")
    assert dd[a0] == ("response", None, None)
    assert dd[("http://d.example/b", "2020-06-01T00:00:00Z")] == (
        "revisit", *a0,
    )
    assert dd[("http://d.example/a", "2021-01-01T00:00:00Z")] == (
        "revisit", *a0,
    )
    assert dd[("http://d.example/c", "2020-01-01T00:00:00Z")][0] == "response"
