"""CDX line scan/sink round-trip (S4/S5) + CDXJ parse (SURVEY.md §5.2)."""

from __future__ import annotations

import glob
import gzip
import os
import tempfile

from pyspark.sql import functions as F

from webarchive_indexing_spark.queries.cdx_surface import derived_cdx
from webarchive_indexing_spark.sources.cdx import (
    CDX_SCHEMA,
    parse_cdx_lines,
    parse_cdxj_lines,
    read_cdx_gz,
    to_cdx_lines,
    write_cdx_gz,
)


def _sample_cdx(spark, sf_dir):
    c = derived_cdx(spark, sf_dir)
    # give the full 11-field shape (derived view lacks url/redirect/robotflags)
    return c.select(
        "urlkey",
        F.col("ts14").alias("timestamp"),
        F.concat(F.lit("https://example.org/"), F.col("urlkey")).alias("url"),
        "mime",
        "status",
        "digest",
        F.lit(None).cast("string").alias("redirect"),
        F.lit(None).cast("string").alias("robotflags"),
        "length",
        "offset",
        "filename",
    )


def test_cdx_line_roundtrip(spark, sf_dir):
    cdx = _sample_cdx(spark, sf_dir)
    lines = to_cdx_lines(cdx)
    back = parse_cdx_lines(lines)
    assert back.schema == CDX_SCHEMA
    a = sorted(map(tuple, cdx.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_cdx_gz_sink_is_standard_gzip(spark, sf_dir):
    cdx = _sample_cdx(spark, sf_dir).limit(200)
    with tempfile.TemporaryDirectory() as d:
        out = os.path.join(d, "cdx")
        write_cdx_gz(cdx.repartition(2), out)
        files = glob.glob(os.path.join(out, "*.txt.gz"))
        assert files, "expected gzip part files"
        # independently decompress with stock gzip → prove standard members
        n = 0
        for f in files:
            with gzip.open(f, "rt") as fh:
                for line in fh:
                    assert len(line.split(" ")) == 11
                    n += 1
        assert n == 200
        # partition-local sort: lines within each file are ordered
        for f in files:
            with gzip.open(f, "rt") as fh:
                keys = [tuple(ln.split(" ")[:2]) for ln in fh]
            assert keys == sorted(keys)
        back = read_cdx_gz(spark, out)
        assert back.count() == 200


def test_cdxj_parse(spark):
    rows = [
        ('com,example)/a 20150101000000 {"url": "http://example.com/a", "status": "200"}',),
        ('com,example)/b 20160202000000 {"url": "http://example.com/b", "digest": "XYZ"}',),
    ]
    df = spark.createDataFrame(rows, ["value"])
    out = parse_cdxj_lines(df).collect()
    assert out[0].urlkey == "com,example)/a"
    assert out[0].timestamp == "20150101000000"
    assert out[0].props["status"] == "200"
    assert out[1].props["digest"] == "XYZ"


def test_cdxj_roundtrip_through_typed_cdx(spark, sf_dir):
    """typed CDX → CDXJ lines → parse → typed projection == original
    (the conversion a reference user needs to serve a cc-index-style
    CDXJ cluster from the same pipeline)."""
    from webarchive_indexing_spark.queries.cdx_surface import derived_cdx
    from webarchive_indexing_spark.sources.cdx import cdxj_to_cdx, to_cdxj_lines

    cdx = derived_cdx(spark, sf_dir).select(
        "urlkey",
        F.col("ts14").alias("timestamp"),
        F.concat(F.lit("https://x/"), F.col("digest")).alias("url"),
        "mime",
        "status",
        "digest",
        F.lit(None).cast("string").alias("redirect"),
        F.lit(None).cast("string").alias("robotflags"),
        "length",
        "offset",
        "filename",
    ).orderBy("urlkey", "timestamp").limit(300)  # deterministic subset
    lines = to_cdxj_lines(cdx)
    sample = lines.take(1)[0].value
    # shape: urlkey SP ts SP {json}; nulls omitted, not '-'
    assert sample.split(" ", 2)[2].startswith("{")
    assert '"redirect"' not in sample
    back = cdxj_to_cdx(parse_cdxj_lines(lines))
    a = sorted(map(tuple, cdx.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_parse_tolerates_malformed_lines(spark):
    """Real CDX files carry damage: short lines, non-numeric status,
    empty lines.  The parse must yield NULLs, never throw — a single
    bad line must not kill a 100 TB scan (ANSI mode would make the
    int cast throw; try_cast-through-when semantics keep it NULL)."""
    from webarchive_indexing_spark.sources.cdx import parse_cdx_lines

    lines = spark.createDataFrame(
        [
            ("com,ok)/ 20200101000000 http://ok/ text/html 200 D - - 10 0 f.gz",),
            ("com,short)/ 20200101000000",),  # truncated
            ("",),  # empty
            ("com,bad)/ ts http://x/ mime NOTANUMBER D - - abc xyz f.gz",),
        ],
        "value string",
    )
    rows = parse_cdx_lines(lines).collect()
    assert len(rows) == 4
    ok = {r.urlkey: r for r in rows if r.urlkey}
    assert ok["com,ok)/"].status == 200 and ok["com,ok)/"].length == 10
    assert ok["com,short)/"].url is None and ok["com,short)/"].status is None
    assert ok["com,bad)/"].status is None  # non-numeric -> NULL, no throw
    assert ok["com,bad)/"].length is None


def test_orc_mirror_roundtrip(spark, sf_dir):
    """S8: the index mirrors to ORC (Spark-native, no extra jars) with
    full fidelity — same rows back, and predicate pushdown reaches the
    ORC reader just like parquet."""
    import tempfile

    from webarchive_indexing_spark.queries.cdx_surface import derived_cdx

    d = tempfile.mkdtemp(prefix="cdx_orc_")
    src = derived_cdx(spark, sf_dir)
    src.write.mode("overwrite").orc(d)
    back = spark.read.orc(d)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))
    plan = (
        back.filter(back.status == 200)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "status" in plan.split(
        "PushedFilters: [", 1
    )[1].split("]", 1)[0]
