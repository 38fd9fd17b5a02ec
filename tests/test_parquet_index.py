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


# ------------------------------------------------------------------
# Incremental epoch store (parquet payload, shared LSM protocol)


def _shape(df):
    from webarchive_indexing_spark.sinks.parquet_index import (
        to_parquet_index_shape,
    )

    return to_parquet_index_shape(df)


def test_parquet_epoch_store_takedown_and_purge(spark, tmp_path):
    """The columnar twin of the ZipNum takedown scenario: tombstone
    epochs hide captures from every parquet epoch (whole-url + exact
    forms), compaction PHYSICALLY purges the excluded rows from the
    merged epoch's parquet bytes while carrying the tombstone list
    forward (a later re-crawl of the taken-down URL stays hidden),
    and tombstone replay after compaction is a no-op."""
    from webarchive_indexing_spark.sinks.parquet_index import (
        compact_parquet_index_epochs,
        read_parquet_index_epochs,
        store_backend,
        write_parquet_index_epoch,
    )
    from webarchive_indexing_spark.sinks.zipnum import (
        _read_tombstones,
        list_epochs,
        write_tombstone_epoch,
    )

    out = str(tmp_path / "store")
    full = _cdx_frame(spark, 120).cache()
    rows = full.collect()
    all_keys = {(r.urlkey, r.timestamp) for r in rows}
    wild_key = rows[0].urlkey
    exact_cap = next(
        (r.urlkey, r.timestamp) for r in rows if r.urlkey != wild_key
    )

    write_parquet_index_epoch(
        _shape(full.filter(F.col("urlkey") < "com,example)/p/0060")),
        out, "batch-a", range_partitions=2,
    )
    write_parquet_index_epoch(
        _shape(full.filter(F.col("urlkey") >= "com,example)/p/0060")),
        out, "batch-b", range_partitions=2,
    )
    assert store_backend(out) == "parquet"

    tdf = spark.createDataFrame(
        [(wild_key, None), (exact_cap[0], exact_cap[1])],
        "urlkey string, timestamp string",
    )
    write_tombstone_epoch(tdf, out, "takedown-1")

    def visible():
        df = read_parquet_index_epochs(spark, out)
        return {
            (r.url_surtkey, r.ts14)
            for r in df.select(
                "url_surtkey",
                F.date_format("fetch_time", "yyyyMMddHHmmss").alias("ts14"),
            ).collect()
        }

    hidden = {kt for kt in all_keys if kt[0] == wild_key} | {exact_cap}
    assert visible() == all_keys - hidden

    # compaction: one live epoch, view unchanged, tombstones carried,
    # and the excluded keys are physically absent from the parquet bytes
    compact_parquet_index_epochs(spark, out, range_partitions=2)
    live = list_epochs(out)
    assert len(live) == 1
    assert visible() == all_keys - hidden
    wild, exact = _read_tombstones(out)
    assert wild == [wild_key] and exact == [exact_cap]
    merged_keys = set()
    for f in glob.glob(os.path.join(live[0], "crawl=*", "subset=*", "*.parquet")):
        merged_keys.update(
            pq.read_table(f, columns=["url_surtkey"])["url_surtkey"].to_pylist()
        )
    assert wild_key not in merged_keys

    # a later re-crawl of the taken-down URL: still hidden
    recrawl = full.filter(F.col("urlkey") == wild_key).withColumn(
        "timestamp", F.concat(F.lit("2029"), F.substring("timestamp", 5, 10))
    )
    write_parquet_index_epoch(_shape(recrawl), out, "batch-c", range_partitions=2)
    assert visible() == all_keys - hidden

    # tombstone replay after compaction: no-op
    write_tombstone_epoch(tdf, out, "takedown-1")
    assert visible() == all_keys - hidden
    full.unpersist()


def test_parquet_lsm_snapshot_model_randomized(spark, tmp_path):
    """The randomized LSM model test, parquet backend: the SAME
    seeded ingest / takedown / retained-compaction sequences replay
    against the same pure-Python model, and every snapshot id (plus
    the latest view) must return exactly the model's visible row set
    — pinning that the shared protocol gives identical semantics
    through the columnar payload."""
    import random

    from webarchive_indexing_spark.sinks.parquet_index import (
        compact_parquet_index_epochs,
        read_parquet_index_epochs,
        write_parquet_index_epoch,
    )
    from webarchive_indexing_spark.sinks.zipnum import write_tombstone_epoch

    def run_scenario(seed, root):
        rng = random.Random(seed)
        epochs = {}
        next_key = [0]

        def visible(as_of=None):
            ids = [i for i in sorted(epochs) if as_of is None or i <= as_of]
            dead = set()
            for i in ids:
                if epochs[i][0] == "compact":
                    dead |= epochs[i][3]
            live = [i for i in ids if i not in dead]
            rows, tombs = set(), set()
            for i in live:
                kind = epochs[i][0]
                if kind == "data":
                    rows |= epochs[i][1]
                elif kind == "tomb":
                    tombs |= set(epochs[i][1])
                else:
                    rows |= epochs[i][1]
                    tombs |= set(epochs[i][2])
            wild = {k for k, ts in tombs if ts is None}
            exact = {(k, ts) for k, ts in tombs if ts is not None}
            return {
                (k, ts)
                for k, ts in rows
                if k not in wild and (k, ts) not in exact
            }

        def ingest():
            lo = next_key[0]
            n = rng.randint(5, 15)
            next_key[0] += n
            rows = {
                (f"com,example)/p/{i:05d}", f"2015{i % 12 + 1:02d}01000000")
                for i in range(lo, lo + n)
            }
            df = spark.createDataFrame(
                [
                    (k, ts, "https://e/", "text/html", 200, "d", None, None,
                     10, 0, "f.warc.gz")
                    for k, ts in sorted(rows)
                ],
                "urlkey string, timestamp string, url string, mime string, "
                "status int, digest string, redirect string, "
                "robotflags string, length long, offset long, filename string",
            )
            eid = write_parquet_index_epoch(
                _shape(df), root, f"batch:{len(epochs)}", range_partitions=2
            )
            epochs[eid] = ("data", rows)

        def takedown():
            pool = sorted(visible())
            if not pool:
                return
            picks = rng.sample(pool, min(len(pool), rng.randint(1, 4)))
            keys = [
                (k, None if rng.random() < 0.5 else ts) for k, ts in picks
            ]
            df = spark.createDataFrame(keys, "urlkey string, timestamp string")
            eid = write_tombstone_epoch(df, root, f"t:{len(epochs)}")
            epochs[eid] = ("tomb", keys)

        def compact():
            if not any(kind == "data" for kind, *_ in epochs.values()):
                return
            dead = set()
            for i in sorted(epochs):
                if epochs[i][0] == "compact":
                    dead |= epochs[i][3]
            live = {i for i in epochs if i not in dead}
            rows = visible()
            tombs = set()
            for i in live:
                if epochs[i][0] == "tomb":
                    tombs |= set(epochs[i][1])
                elif epochs[i][0] == "compact":
                    tombs |= set(epochs[i][2])
            eid = compact_parquet_index_epochs(
                spark, root, range_partitions=2, retain_inputs=True
            )
            epochs[eid] = ("compact", rows, tombs, live)

        ingest()
        for _ in range(6):
            rng.choice([ingest, ingest, takedown, compact])()

        for as_of in [*sorted(epochs), None]:
            got = {
                (r["url_surtkey"], r["ts14"])
                for r in read_parquet_index_epochs(spark, root, as_of_epoch=as_of)
                .select(
                    "url_surtkey",
                    F.date_format("fetch_time", "yyyyMMddHHmmss").alias("ts14"),
                )
                .collect()
            }
            assert got == visible(as_of), (seed, as_of)

    for seed in (7, 23):
        run_scenario(seed, str(tmp_path / f"plsm{seed}"))


def test_cdx_query_parquet_store_guards(spark, tmp_path):
    """Front-door guards: as_of_epoch on a STATIC index raises (no
    snapshot history to travel); a digit from_ that doesn't parse as
    a date raises instead of silently emptying the result; an
    odd-length digit from_ skips the typed bound but still filters
    exactly via the residual ts14 string compare."""
    from webarchive_indexing_spark.operators.cdx_query import (
        cdx_query_parquet,
    )
    from webarchive_indexing_spark.sinks.parquet_index import (
        to_parquet_index_shape,
    )

    out = str(tmp_path / "static")
    write_parquet_index(
        to_parquet_index_shape(_cdx_frame(spark)), out, range_partitions=2
    )
    url = "https://example.com/p/"
    with pytest.raises(ValueError, match="epoch store"):
        cdx_query_parquet(spark, out, url, match_type="prefix", as_of_epoch=1)
    with pytest.raises(ValueError):
        cdx_query_parquet(
            spark, out, url, match_type="prefix", from_="20150231"
        ).collect()
    got = {
        r.timestamp
        for r in cdx_query_parquet(
            spark, out, url, match_type="prefix", from_="2015060"
        ).collect()
    }
    assert got and all(ts >= "20150600000000" for ts in got)
    assert any(ts < "20150600000000" for ts in {
        r.timestamp
        for r in cdx_query_parquet(spark, out, url, match_type="prefix").collect()
    })


def _files_intersecting_2d(
    root: str, key_lo: str, key_hi: str, t_lo, t_hi
) -> tuple[int, int]:
    """(files whose footer stats intersect BOTH box predicates,
    total data files) across a hive-partitioned index directory —
    the 2-D file-skip a stats-aware reader performs."""
    inter = total = 0
    for path in glob.glob(os.path.join(root, "**", "*.parquet"),
                          recursive=True):
        md = pq.ParquetFile(path).metadata
        total += 1
        k_lo = k_hi = f_lo = f_hi = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                cc = md.row_group(rg).column(ci)
                if cc.statistics is None:
                    continue
                mn, mx = cc.statistics.min, cc.statistics.max
                if cc.path_in_schema == "url_surtkey":
                    k_lo = mn if k_lo is None else min(k_lo, mn)
                    k_hi = mx if k_hi is None else max(k_hi, mx)
                elif cc.path_in_schema == "fetch_time":
                    f_lo = mn if f_lo is None else min(f_lo, mn)
                    f_hi = mx if f_hi is None else max(f_hi, mx)
        key_hit = k_lo is None or (k_hi >= key_lo and k_lo < key_hi)
        t_hit = f_lo is None or (f_hi >= t_lo and f_lo < t_hi)
        if key_hit and t_hit:
            inter += 1
    return inter, total


def test_zorder_compaction_prunes_2d_and_changes_no_answers(
    spark, sf_dir, tmp_path
):
    """Round-13 OPTIMIZE-ZORDER on the production store: compacting
    with zorder_by re-clusters the merged epoch so a 2-D box
    (url_surtkey range × fetch_time year) skips files on BOTH
    dimensions, while the read answers stay byte-identical to the
    default-layout compaction (layout-only — the full-oracle
    ``parquet_index_zorder_box`` query pins it against DuckDB; this
    test pins the physical evidence)."""
    import datetime

    from webarchive_indexing_spark.queries.cdx_surface import (
        _parquet_epoch_store,
        parquet_zorder_box_read,
    )
    from webarchive_indexing_spark.sinks.parquet_index import (
        compact_parquet_index_epochs,
    )
    from webarchive_indexing_spark.sinks.zipnum import list_epochs

    plain = _parquet_epoch_store(spark, sf_dir, "pq_zo_plain_")
    compact_parquet_index_epochs(spark, plain, range_partitions=8)
    zo = _parquet_epoch_store(spark, sf_dir, "pq_zo_clust_")
    compact_parquet_index_epochs(
        spark, zo, range_partitions=8,
        zorder_by=("url_surtkey", "fetch_time"),
    )

    want = sorted(map(tuple, parquet_zorder_box_read(spark, plain).collect()))
    got = sorted(map(tuple, parquet_zorder_box_read(spark, zo).collect()))
    assert got == want and len(got) > 0

    # the second-dimension demonstration: a TIME-ONLY predicate.  The
    # url_surtkey-sorted plain layout cannot bound fetch_time per file
    # (every key range spans all three fixture years → ~every file
    # intersects); the z-clustered layout bounds both dimensions, so
    # a one-year slice must skip a real fraction of files.
    key_lo, key_hi = "", "￿"  # whole keyspace
    utc = datetime.timezone.utc
    t_lo = datetime.datetime(2016, 1, 1, tzinfo=utc)
    t_hi = datetime.datetime(2017, 1, 1, tzinfo=utc)
    zo_epoch = list_epochs(zo)[-1]
    plain_epoch = list_epochs(plain)[-1]
    zi, zt = _files_intersecting_2d(zo_epoch, key_lo, key_hi, t_lo, t_hi)
    pi, pt = _files_intersecting_2d(plain_epoch, key_lo, key_hi, t_lo, t_hi)
    assert zt >= 8 and pt >= 8  # enough files for skipping to mean anything
    z_frac, p_frac = zi / zt, pi / pt
    assert p_frac > 0.9, (pi, pt)  # plain layout: time prunes ~nothing
    assert z_frac < p_frac, (zi, zt, pi, pt)
    assert z_frac <= 0.75, f"z-order year slice should skip >=25%: {zi}/{zt}"
