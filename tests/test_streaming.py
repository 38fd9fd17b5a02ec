"""Structured Streaming tests (ST1-ST5): availableNow micro-batches
over file sources, results compared against their batch twins."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from webarchive_indexing_spark.queries.cdx_surface import derived_cdx
from webarchive_indexing_spark.sources.cdx import to_cdx_lines
from webarchive_indexing_spark.streaming.incremental import (
    stream_cdx_ingest,
    stream_dedup,
    stream_session_counts,
    stream_windowed_counts,
)
from webarchive_indexing_spark.tables import load_table


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


def _stream_events(spark, events, tmpdir, max_files_per_trigger=None):
    """events table → json files → file-source stream (2 'arrivals')."""
    src = os.path.join(tmpdir, "src")
    half1 = events.filter(F.col("event_id") % 2 == 0)
    half2 = events.filter(F.col("event_id") % 2 == 1)
    half1.coalesce(1).write.mode("overwrite").json(os.path.join(src, "b1"))
    half2.coalesce(1).write.mode("overwrite").json(os.path.join(src, "b2"))
    schema = events.schema
    reader = spark.readStream.schema(schema).option("recursiveFileLookup", "true")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(src).withColumn("ts", F.col("ts").cast("timestamp"))


def _run_to_memory(sdf, name, mode="append"):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_st1_incremental_cdx_ingest(spark, sf_dir):
    with tempfile.TemporaryDirectory() as d:
        cdx = derived_cdx(spark, sf_dir).limit(500)
        full = cdx.select(
            "urlkey",
            F.col("ts14").alias("timestamp"),
            F.lit("http://x/").alias("url"),
            "mime",
            "status",
            "digest",
            F.lit(None).cast("string").alias("redirect"),
            F.lit(None).cast("string").alias("robotflags"),
            "length",
            "offset",
            "filename",
        )
        inp, out, chk = (os.path.join(d, s) for s in ("in", "out", "chk"))
        os.makedirs(inp)
        # first arrival
        to_cdx_lines(full.filter(F.col("status") == 200)).coalesce(1).write.mode(
            "overwrite"
        ).text(os.path.join(inp, "f1"))
        q = stream_cdx_ingest(spark, inp + "/*/", out, chk)
        q.awaitTermination(120)
        n1 = spark.read.parquet(out).count()
        assert n1 == full.filter(F.col("status") == 200).count()
        # second arrival — only the delta is processed (checkpointed offsets)
        to_cdx_lines(full.filter(F.col("status") != 200)).coalesce(1).write.mode(
            "overwrite"
        ).text(os.path.join(inp, "f2"))
        q2 = stream_cdx_ingest(spark, inp + "/*/", out, chk)
        q2.awaitTermination(120)
        assert spark.read.parquet(out).count() == full.count()
        # typed round-trip survived the stream boundary
        back = spark.read.parquet(out)
        assert back.filter(F.col("status") == 200).count() == n1


def test_st1_zipnum_epoch_indexing(spark, sf_dir):
    """Incremental INDEXING: each micro-batch becomes an immutable
    sorted ZipNum epoch; the epoch reader merges them; compaction folds
    them into one epoch with identical query results."""
    from webarchive_indexing_spark.sinks.zipnum import (
        compact_zipnum_epochs,
        list_epochs,
        read_zipnum_epochs,
    )
    from webarchive_indexing_spark.streaming.incremental import stream_zipnum_epochs

    with tempfile.TemporaryDirectory() as d:
        cdx = derived_cdx(spark, sf_dir).limit(400)
        full = cdx.select(
            "urlkey",
            F.col("ts14").alias("timestamp"),
            F.lit("http://x/").alias("url"),
            "mime",
            "status",
            "digest",
            F.lit(None).cast("string").alias("redirect"),
            F.lit(None).cast("string").alias("robotflags"),
            "length",
            "offset",
            "filename",
        )
        inp, out, chk = (os.path.join(d, s) for s in ("in", "idx", "chk"))
        os.makedirs(inp)
        to_cdx_lines(full.filter(F.col("status") == 200)).coalesce(1).write.mode(
            "overwrite"
        ).text(os.path.join(inp, "f1"))
        q = stream_zipnum_epochs(spark, inp + "/*/", out, chk)
        q.awaitTermination(120)
        assert len(list_epochs(out)) == 1
        # second arrival -> second epoch (exactly-once via checkpoint)
        to_cdx_lines(full.filter(F.col("status") != 200)).coalesce(1).write.mode(
            "overwrite"
        ).text(os.path.join(inp, "f2"))
        q2 = stream_zipnum_epochs(spark, inp + "/*/", out, chk)
        q2.awaitTermination(120)
        assert len(list_epochs(out)) == 2

        want_all = {tuple(r) for r in full.collect()}
        got_all = {tuple(r) for r in read_zipnum_epochs(spark, out).collect()}
        assert got_all == want_all

        prefix = "org,example,src1"
        want_p = {
            tuple(r)
            for r in full.filter(
                (F.col("urlkey") >= prefix) & (F.col("urlkey") < prefix + "~")
            ).collect()
        }
        got_p = {
            tuple(r)
            for r in read_zipnum_epochs(
                spark, out, key_lo=prefix, key_hi=prefix + "~"
            ).collect()
        }
        assert got_p == want_p

        # compaction: one epoch, same answers
        compact_zipnum_epochs(spark, out, shards=2, numlines=100)
        assert len(list_epochs(out)) == 1
        got_c = {tuple(r) for r in read_zipnum_epochs(spark, out).collect()}
        assert got_c == want_all
        got_cp = {
            tuple(r)
            for r in read_zipnum_epochs(
                spark, out, key_lo=prefix, key_hi=prefix + "~"
            ).collect()
        }
        assert got_cp == want_p

        # THE collision scenario (ADVICE r03): micro-batches 0..1 were
        # compacted into epoch-2; the next micro-batch arrives with
        # checkpointed batch_id=2 — its epoch id must come from the
        # manifest allocator, NOT overwrite the compacted epoch.
        extra = full.limit(50).withColumn(
            "urlkey", F.concat(F.lit("zz,late)/"), F.col("urlkey"))
        )
        to_cdx_lines(extra).coalesce(1).write.mode("overwrite").text(
            os.path.join(inp, "f3")
        )
        q3 = stream_zipnum_epochs(spark, inp + "/*/", out, chk)
        q3.awaitTermination(120)
        assert len(list_epochs(out)) == 2  # compacted + the new batch
        want_post = want_all | {tuple(r) for r in extra.collect()}
        got_post = {tuple(r) for r in read_zipnum_epochs(spark, out).collect()}
        assert got_post == want_post  # nothing lost, nothing duplicated


def test_epoch_protocol_interleaved_compaction_replay(spark, sf_dir):
    """The ADVICE-r4 collision scenario verbatim, as an interleaving:
    ingest batches 0,1 → compact → LATE REPLAY of pre-compaction batch
    id 0 (must be skipped: its rows are durable in the merged epoch) →
    new batch 2 → idempotent immediate replay of batch 2 (same slot,
    rewritten, no duplicates) → second compaction → late replay of
    batch 2 again (now subsumed → skipped).  Invariants at every step:
    zero row loss, zero duplication, the merged read equals the union
    of delivered batches.

    Drives the protocol functions directly (reserve_epoch_id /
    _subsumed_names / write_zipnum_epoch) — the same calls
    stream_zipnum_epochs' foreachBatch makes — because a real
    checkpoint never re-delivers; replay is exactly the
    checkpoint-lost/at-least-once path the manifest must absorb."""
    from webarchive_indexing_spark.sinks.zipnum import (
        _subsumed_names,
        compact_zipnum_epochs,
        list_epochs,
        read_zipnum_epochs,
        reserve_epoch_id,
        write_zipnum_epoch,
    )

    with tempfile.TemporaryDirectory() as d:
        out = os.path.join(d, "idx")
        cdx = derived_cdx(spark, sf_dir).limit(300)
        full = cdx.select(
            "urlkey",
            F.col("ts14").alias("timestamp"),
            F.lit("http://x/").alias("url"),
            "mime",
            "status",
            "digest",
            F.lit(None).cast("string").alias("redirect"),
            F.lit(None).cast("string").alias("robotflags"),
            "length",
            "offset",
            "filename",
        ).cache()
        b0 = full.filter(F.col("status") == 200)
        b1 = full.filter(F.col("status") != 200)
        b2 = full.limit(40).withColumn(
            "urlkey", F.concat(F.lit("zz,late)/"), F.col("urlkey"))
        )

        def deliver(batch_df, batch_id) -> str:
            """foreachBatch merge body from stream_zipnum_epochs."""
            eid = reserve_epoch_id(out, f"batch:{int(batch_id)}")
            if f"epoch-{eid:06d}" in _subsumed_names(out):
                return "skipped"
            write_zipnum_epoch(batch_df, out, eid, shards=2, numlines=100)
            return "written"

        def snapshot():
            return {tuple(r) for r in read_zipnum_epochs(spark, out).collect()}

        assert deliver(b0, 0) == "written"
        assert deliver(b1, 1) == "written"
        want01 = {tuple(r) for r in b0.collect()} | {tuple(r) for r in b1.collect()}
        assert snapshot() == want01

        compact_zipnum_epochs(spark, out, shards=2, numlines=100)
        assert len(list_epochs(out)) == 1
        assert snapshot() == want01

        # late replay of PRE-compaction batch 0: skipped, nothing lost,
        # nothing duplicated, no resurrected epoch directory
        assert deliver(b0, 0) == "skipped"
        assert len(list_epochs(out)) == 1
        assert snapshot() == want01

        # new batch after compaction: fresh slot past the merged epoch
        assert deliver(b2, 2) == "written"
        want012 = want01 | {tuple(r) for r in b2.collect()}
        assert snapshot() == want012

        # immediate at-least-once replay of batch 2 (checkpoint lost
        # BEFORE any compaction): same manifest slot, idempotent
        # rewrite — still exactly one copy of every row
        assert deliver(b2, 2) == "written"
        assert snapshot() == want012

        # interleave a second compaction, then the same replay again:
        # now the slot is subsumed and the replay must be skipped
        compact_zipnum_epochs(spark, out, shards=2, numlines=100)
        assert len(list_epochs(out)) == 1
        assert deliver(b2, 2) == "skipped"
        assert snapshot() == want012
        full.unpersist()


def test_st2_windowed_counts_match_batch(spark, events):
    with tempfile.TemporaryDirectory() as d:
        sdf = _stream_events(spark, events, d)
        _run_to_memory(
            stream_windowed_counts(sdf, window="1 day", watermark="10 days"),
            "win_counts",
            mode="append",
        )
        got = {
            (r.win_start, r.event_type): r.n
            for r in spark.sql("SELECT * FROM win_counts").collect()
        }
        expected = {
            (r.win_start, r.event_type): r.n
            for r in events.groupBy(
                F.window("ts", "1 day").alias("w"), "event_type"
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("win_start"), "event_type", "n")
            .collect()
        }
        # append mode finalizes exactly the windows whose END precedes
        # the final watermark (max_ts - 10 days); later windows stay in
        # state — pin that boundary exactly (ST4 late-data semantics)
        import datetime as dt

        max_ts = events.agg(F.max("ts")).collect()[0][0]
        horizon = max_ts - dt.timedelta(days=10)
        finalized = {
            k: v for k, v in expected.items() if k[0] + dt.timedelta(days=1) <= horizon
        }
        assert got == finalized


def test_st3_session_windows_match_batch_sessionize(spark, events):
    from webarchive_indexing_spark.operators.sessionize import sessionize

    with tempfile.TemporaryDirectory() as d:
        sdf = _stream_events(spark, events, d)
        _run_to_memory(
            stream_session_counts(sdf, gap="30 minutes", watermark="40 days"),
            "sess_counts",
            mode="complete",
        )
        got = spark.sql("SELECT user_id, n_events FROM sess_counts")
        batch = (
            sessionize(events, key="user_id", ts="ts", gap_seconds=1800)
            .groupBy("user_id", "session_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select("user_id", "n_events")
        )
        a = sorted(map(tuple, got.collect()))
        b = sorted(map(tuple, batch.collect()))
        assert a == b, "streaming session windows != batch sessionization"


def test_st5_stateful_dedup(spark, events):
    with tempfile.TemporaryDirectory() as d:
        sdf = _stream_events(spark, events, d)
        # duplicate the stream against itself via union → every event
        # twice; stateful dedup must restore exact-once
        _run_to_memory(
            stream_dedup(sdf.unionByName(sdf), ["event_id"], watermark="40 days"),
            "dedup_out",
        )
        n = spark.sql("SELECT COUNT(*) AS n FROM dedup_out").collect()[0].n
        assert n == events.count()


def test_custom_stateful_running_counts(spark, events):
    from webarchive_indexing_spark.streaming.incremental import stream_running_counts

    with tempfile.TemporaryDirectory() as d:
        # maxFilesPerTrigger=1 forces one micro-batch per arrival file,
        # so state must actually carry across batches
        sdf = _stream_events(spark, events, d, max_files_per_trigger=1)
        _run_to_memory(stream_running_counts(sdf), "run_counts", mode="update")
        # update mode emits one row per key per micro-batch; the LAST
        # (= max, counts only grow) total per user must equal the batch
        # group count — proving state carried across batches
        got = {
            r.user_id: r.mx
            for r in spark.sql(
                "SELECT user_id, MAX(n_events) AS mx FROM run_counts GROUP BY user_id"
            ).collect()
        }
        expected = {
            r.user_id: r.n
            for r in events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert got == expected
        # and at least one key really saw >1 micro-batch (intermediate
        # emission < final total) — otherwise state was never exercised
        inter = spark.sql(
            "SELECT COUNT(*) AS c FROM (SELECT user_id, COUNT(*) n FROM run_counts"
            " GROUP BY user_id HAVING n > 1)"
        ).collect()[0].c
        assert inter > 0


def test_st6_stream_stream_interval_join(spark, events):
    """Stream-stream interval join (two watermarked file streams)
    must produce exactly the batch join's pair set."""
    from webarchive_indexing_spark.streaming.incremental import stream_stream_join

    with tempfile.TemporaryDirectory() as d:
        sdf = _stream_events(spark, events, d)
        schema = events.schema
        sdf2 = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .json(os.path.join(d, "src"))
            .withColumn("ts", F.col("ts").cast("timestamp"))
        )
        joined = stream_stream_join(
            sdf.filter(F.col("event_type") == "view"),
            sdf2.filter(F.col("event_type") == "click"),
            within_seconds=3600,
            watermark="10 days",
        )
        _run_to_memory(joined, "ssj", mode="append")
        got = {
            (r.view_id, r.click_id)
            for r in spark.sql("SELECT * FROM ssj").collect()
        }

    v = events.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("event_id").alias("view_id"),
    )
    c = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"),
    )
    want = {
        (r.view_id, r.click_id)
        for r in v.join(
            c,
            (F.col("v_user") == F.col("c_user"))
            & (F.col("c_ts") >= F.col("v_ts"))
            & (F.col("c_ts") <= F.col("v_ts") + F.expr("INTERVAL 3600 SECONDS")),
        ).collect()
    }
    assert want, "fixture must produce at least one attributed pair"
    assert got == want


def test_tombstone_epochs_takedown_semantics(spark, sf_dir):
    """Exclusion/takedown through the LSM: a tombstone epoch hides
    matching captures from every data epoch (whole-url and exact
    capture forms); compaction physically drops the excluded rows AND
    carries the tombstone list forward so captures of a taken-down URL
    arriving in LATER crawls stay hidden; tombstone replay after
    compaction is a no-op."""
    from webarchive_indexing_spark.sinks.zipnum import (
        _read_tombstones,
        compact_zipnum_epochs,
        list_epochs,
        read_zipnum_epochs,
        reserve_epoch_id,
        write_tombstone_epoch,
        write_zipnum_epoch,
    )

    with tempfile.TemporaryDirectory() as d:
        out = os.path.join(d, "idx")
        cdx = derived_cdx(spark, sf_dir).limit(200)
        full = cdx.select(
            "urlkey",
            F.col("ts14").alias("timestamp"),
            F.lit("http://x/").alias("url"),
            "mime",
            "status",
            "digest",
            F.lit(None).cast("string").alias("redirect"),
            F.lit(None).cast("string").alias("robotflags"),
            "length",
            "offset",
            "filename",
        ).cache()
        rows = full.collect()
        all_keys = {(r.urlkey, r.timestamp) for r in rows}
        # pick one urlkey for whole-URL takedown, one single capture
        wild_key = rows[0].urlkey
        exact_cap = next(
            (r.urlkey, r.timestamp) for r in rows if r.urlkey != wild_key
        )

        eid = reserve_epoch_id(out, "batch:0")
        write_zipnum_epoch(full, out, eid, shards=2, numlines=100)

        tdf = spark.createDataFrame(
            [(wild_key, None), (exact_cap[0], exact_cap[1])],
            "urlkey string, timestamp string",
        )
        write_tombstone_epoch(tdf, out, "takedown-1")

        def visible():
            return {
                (r.urlkey, r.timestamp)
                for r in read_zipnum_epochs(spark, out).collect()
            }

        hidden = {kt for kt in all_keys if kt[0] == wild_key} | {exact_cap}
        assert visible() == all_keys - hidden
        assert hidden, "fixture must actually hide something"

        # compaction: excluded rows physically dropped, tombstones carried
        compact_zipnum_epochs(spark, out, shards=2, numlines=100)
        assert len(list_epochs(out)) == 1
        assert visible() == all_keys - hidden
        wild, exact = _read_tombstones(out)
        assert wild == [wild_key] and exact == [exact_cap]

        # a LATER crawl re-captures the taken-down URL: still hidden
        recrawl = full.filter(F.col("urlkey") == wild_key).withColumn(
            "timestamp", F.concat(F.lit("2029"), F.substring("timestamp", 5, 10))
        )
        eid2 = reserve_epoch_id(out, "batch:1")
        write_zipnum_epoch(recrawl, out, eid2, shards=2, numlines=100)
        assert visible() == all_keys - hidden

        # tombstone replay after compaction: no-op, nothing resurfaces
        write_tombstone_epoch(tdf, out, "takedown-1")
        assert visible() == all_keys - hidden
        full.unpersist()


def test_stream_takedowns_feed(spark, sf_dir):
    """Takedown feed → tombstone epochs via the streaming path:
    checkpointed exactly-once per batch, captures hidden after each
    micro-batch, wildcard and exact lines both parsed."""
    from webarchive_indexing_spark.sinks.zipnum import (
        read_zipnum_epochs,
        reserve_epoch_id,
        write_zipnum_epoch,
    )
    from webarchive_indexing_spark.streaming.incremental import stream_takedowns

    with tempfile.TemporaryDirectory() as d:
        out = os.path.join(d, "idx")
        inp, chk = os.path.join(d, "in"), os.path.join(d, "chk")
        os.makedirs(inp)
        full = (
            derived_cdx(spark, sf_dir)
            .limit(120)
            .select(
                "urlkey",
                F.col("ts14").alias("timestamp"),
                F.lit("http://x/").alias("url"),
                "mime",
                "status",
                "digest",
                F.lit(None).cast("string").alias("redirect"),
                F.lit(None).cast("string").alias("robotflags"),
                "length",
                "offset",
                "filename",
            )
        )
        rows = full.collect()
        eid = reserve_epoch_id(out, "batch:0")
        write_zipnum_epoch(full, out, eid, shards=2, numlines=60)

        wild_key = rows[0].urlkey
        exact = next(
            (r.urlkey, r.timestamp) for r in rows if r.urlkey != wild_key
        )
        # a damaged feed line naming `victim` must be QUARANTINED, not
        # widen to a whole-URL wildcard takedown (round-6 ADVICE fix)
        victim = next(
            r.urlkey
            for r in rows
            if r.urlkey not in (wild_key, exact[0])
        )
        feed = (
            f"{wild_key}\t*\n{exact[0]}\t{exact[1]}\n"
            f"{victim}\n"  # no tab → malformed
            f"{victim}\t2020\n"  # short ts → malformed
            f"{victim}\tlater\textra\n"  # 3 fields → malformed
            "\t*\n"  # empty urlkey → malformed
        )
        os.makedirs(os.path.join(inp, "f1"))
        with open(os.path.join(inp, "f1", "takedown.txt"), "w") as fh:
            fh.write(feed)

        q = stream_takedowns(spark, inp + "/*/", out, chk)
        q.awaitTermination(120)

        vis = {
            (r.urlkey, r.timestamp)
            for r in read_zipnum_epochs(spark, out).collect()
        }
        hidden = {
            (r.urlkey, r.timestamp) for r in rows if r.urlkey == wild_key
        } | {exact}
        assert vis == {(r.urlkey, r.timestamp) for r in rows} - hidden
        # every capture of the malformed-line victim is still visible
        assert {(r.urlkey, r.timestamp) for r in rows if r.urlkey == victim} <= vis

        # re-running the stream (no new files) is a no-op
        q2 = stream_takedowns(spark, inp + "/*/", out, chk)
        q2.awaitTermination(120)
        assert {
            (r.urlkey, r.timestamp)
            for r in read_zipnum_epochs(spark, out).collect()
        } == vis


def test_st1_parquet_epoch_indexing(spark, sf_dir):
    """The columnar twin of the ZipNum streaming ingest: each
    micro-batch becomes an immutable parquet (cc-index-table) epoch
    through the shared LSM protocol; the epoch reader merges them;
    compaction folds them with identical results; checkpoint replay
    is exactly-once."""
    from webarchive_indexing_spark.sinks.parquet_index import (
        compact_parquet_index_epochs,
        read_parquet_index_epochs,
    )
    from webarchive_indexing_spark.sinks.zipnum import list_epochs
    from webarchive_indexing_spark.streaming.incremental import (
        stream_parquet_epochs,
    )

    with tempfile.TemporaryDirectory() as d:
        cdx = derived_cdx(spark, sf_dir).limit(300)
        full = cdx.select(
            "urlkey",
            F.col("ts14").alias("timestamp"),
            F.lit("http://x/").alias("url"),
            "mime",
            "status",
            "digest",
            F.lit(None).cast("string").alias("redirect"),
            F.lit(None).cast("string").alias("robotflags"),
            "length",
            "offset",
            "filename",
        )
        inp, out, chk = (os.path.join(d, s) for s in ("in", "idx", "chk"))
        os.makedirs(inp)
        to_cdx_lines(full.filter(F.col("status") == 200)).coalesce(1).write.mode(
            "overwrite"
        ).text(os.path.join(inp, "f1"))
        q = stream_parquet_epochs(spark, inp + "/*/", out, chk)
        q.awaitTermination(120)
        assert len(list_epochs(out)) == 1
        to_cdx_lines(full.filter(F.col("status") != 200)).coalesce(1).write.mode(
            "overwrite"
        ).text(os.path.join(inp, "f2"))
        q2 = stream_parquet_epochs(spark, inp + "/*/", out, chk)
        q2.awaitTermination(120)
        assert len(list_epochs(out)) == 2
        # replay with the same checkpoint: no third epoch
        q3 = stream_parquet_epochs(spark, inp + "/*/", out, chk)
        q3.awaitTermination(120)
        assert len(list_epochs(out)) == 2

        def view():
            return {
                (r.url_surtkey, r.ts14)
                for r in read_parquet_index_epochs(spark, out)
                .select(
                    "url_surtkey",
                    F.date_format(
                        "fetch_time", "yyyyMMddHHmmss"
                    ).alias("ts14"),
                )
                .collect()
            }

        want = {(r.urlkey, r.timestamp) for r in full.collect()}
        assert view() == want

        compact_parquet_index_epochs(spark, out, range_partitions=2)
        assert len(list_epochs(out)) == 1
        assert view() == want


def test_host_stats_ivm_on_parquet_store(spark, sf_dir):
    """The host-stats IVM covers parquet epochs: partials land beside
    each columnar epoch exactly once, the merged report equals a
    direct recompute, and a new epoch costs one scan of itself."""
    from webarchive_indexing_spark.sinks.parquet_index import (
        to_parquet_index_shape,
        write_parquet_index_epoch,
    )
    from webarchive_indexing_spark.sinks.stats import (
        compute_host_stats,
        materialize_host_stats,
        merged_host_stats,
    )

    with tempfile.TemporaryDirectory() as d:
        out = os.path.join(d, "store")
        cdx = derived_cdx(spark, sf_dir).limit(300)
        full = cdx.select(
            "urlkey",
            F.col("ts14").alias("timestamp"),
            F.lit("http://x/").alias("url"),
            "mime",
            "status",
            "digest",
            F.lit(None).cast("string").alias("redirect"),
            F.lit(None).cast("string").alias("robotflags"),
            "length",
            "offset",
            "filename",
        ).cache()
        write_parquet_index_epoch(
            to_parquet_index_shape(full.filter(F.col("status") == 200)),
            out, "a", range_partitions=2,
        )
        assert materialize_host_stats(spark, out) == 1
        assert materialize_host_stats(spark, out) == 0  # compute-once
        write_parquet_index_epoch(
            to_parquet_index_shape(full.filter(F.col("status") != 200)),
            out, "b", range_partitions=2,
        )
        assert materialize_host_stats(spark, out) == 1  # only the new one

        want = {
            tuple(r)
            for r in compute_host_stats(
                full.select("urlkey", "timestamp", "length")
            ).collect()
        }
        got = {tuple(r) for r in merged_host_stats(spark, out).collect()}
        assert got == want
        full.unpersist()


def test_vacuum_tmp_reclaims_crashed_runs(spark, sf_dir, tmp_path):
    """vacuum_tmp deletes only PROVABLY-garbage tmp dirs by default
    (their epoch slot completed); a tmp with no final slot survives
    unless all_tmp=True; live epochs are never touched."""
    from webarchive_indexing_spark.sinks.parquet_index import (
        read_parquet_index_epochs,
        to_parquet_index_shape,
        write_parquet_index_epoch,
    )
    from webarchive_indexing_spark.sinks.zipnum import vacuum_tmp

    out = str(tmp_path / "store")
    cdx = derived_cdx(spark, sf_dir).limit(50).select(
        "urlkey",
        F.col("ts14").alias("timestamp"),
        F.lit("http://x/").alias("url"),
        "mime", "status", "digest",
        F.lit(None).cast("string").alias("redirect"),
        F.lit(None).cast("string").alias("robotflags"),
        "length", "offset", "filename",
    )
    write_parquet_index_epoch(
        to_parquet_index_shape(cdx), out, "a", range_partitions=2
    )
    n = read_parquet_index_epochs(spark, out).count()
    assert n > 0
    # fake crash leftovers: slot 0 completed, slot 7 never renamed
    os.makedirs(os.path.join(out, "ingest-tmp-000000"))
    os.makedirs(os.path.join(out, "compact-tmp-000007"))
    assert vacuum_tmp(out) == ["ingest-tmp-000000"]
    assert os.path.isdir(os.path.join(out, "compact-tmp-000007"))
    assert vacuum_tmp(out, all_tmp=True) == ["compact-tmp-000007"]
    assert read_parquet_index_epochs(spark, out).count() == n

    # argv surface: expire-snapshots --vacuum-tmp prints what it frees
    from webarchive_indexing_spark.__main__ import main

    os.makedirs(os.path.join(out, "ingest-tmp-000000"))
    assert main(["expire-snapshots", out, "--vacuum-tmp"]) == 0
    assert not os.path.isdir(os.path.join(out, "ingest-tmp-000000"))


def test_stream_ann_appends_versioned(spark, sf_dir, tmp_path):
    """Round-12 streaming ANN maintenance: micro-batches of new
    vectors append into a VERSIONED flat store behind per-batch
    CURRENT swaps.  Pins: (1) probe equality vs the same base store
    grown by direct batch appends (same stored quantizer → same
    answers); (2) reader stability — the pre-stream version is
    frozen while new probes see the appended vectors; (3) a
    mid-stream tombstone is honored (root-level, spans versions);
    (4) a redelivered batch id is a ledger no-op."""
    import os

    from pyspark.sql import functions as F

    from webarchive_indexing_spark.operators.similarity import (
        collect_query_vector,
    )
    from webarchive_indexing_spark.sinks import ann_index
    from webarchive_indexing_spark.streaming.incremental import (
        stream_ann_appends,
    )
    from webarchive_indexing_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") < 300)
    extra = emb.filter(F.col("vec_id") >= 300)

    root = str(tmp_path / "store")
    ann_index.write_ivf_index_versioned(base, root, n_cents=8, train_iters=2)
    v_before = ann_index.resolve_store(root)
    rows_before = spark.read.parquet(
        os.path.join(v_before, "vectors")
    ).count()

    # twin store grown by DIRECT appends — same model, so the
    # streamed store must answer identically
    twin = str(tmp_path / "twin")
    ann_index.write_ivf_index_versioned(base, twin, n_cents=8, train_iters=2)
    ann_index.append_ivf_index(extra, twin)

    # two parquet files + maxFilesPerTrigger=1 → two micro-batches
    inp = str(tmp_path / "incoming")
    extra.filter(F.col("vec_id") < 400).coalesce(1).write.parquet(
        inp, mode="append"
    )
    extra.filter(F.col("vec_id") >= 400).coalesce(1).write.parquet(
        inp, mode="append"
    )
    # mid-stream takedown filed at the root before the swaps land
    victim = 305
    ann_index.delete_from_ann_index(root, [victim])

    q = stream_ann_appends(
        spark, inp, root, str(tmp_path / "ckpt"),
        kind="flat", max_files_per_trigger=1,
    )
    q.awaitTermination(120)

    v_after = ann_index.resolve_store(root)
    assert v_after != v_before  # at least one swap landed
    # (2) reader stability: the old version is untouched
    assert (
        spark.read.parquet(os.path.join(v_before, "vectors")).count()
        == rows_before
    )
    new_rows = spark.read.parquet(os.path.join(v_after, "vectors"))
    assert new_rows.count() == base.count() + extra.count()

    # (1) probe equality vs the direct-append twin, (3) tombstone
    qv = collect_query_vector(emb, 321)
    got = ann_index.ivf_index_probe_topk(
        spark, root, qv, k=10, nprobe=3, exclude_id=321
    ).collect()
    ann_index.delete_from_ann_index(twin, [victim])
    want = ann_index.ivf_index_probe_topk(
        spark, twin, qv, k=10, nprobe=3, exclude_id=321
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert victim not in {r.vec_id for r in got}

    # (4) replay: re-delivering an applied batch id is a no-op
    applied = ann_index._applied_batches(v_after)
    assert applied  # ledger carried through the swaps
    sid, bid = sorted(applied)[0].rsplit(":", 1)
    assert (
        ann_index.stream_append_batch(
            extra.limit(5), int(bid), root, kind="flat", stream_id=sid
        )
        is False
    )
    assert (
        spark.read.parquet(
            os.path.join(ann_index.resolve_store(root), "vectors")
        ).count()
        == base.count() + extra.count()
    )


def test_stream_media_meta(spark, tmp_path):
    """Streaming media curation: manifest files arriving as a stream
    produce the same metadata parquet the batch media-meta pass
    produces — and the checkpoint makes file intake exactly-once."""
    from pyspark.sql import functions as F

    from webarchive_indexing_spark.operators.multimodal import (
        build_png_header,
        build_wav,
        media_meta,
    )
    from webarchive_indexing_spark.sources.warc import (
        index_warcs,
        write_mini_warc,
    )
    from webarchive_indexing_spark.streaming.incremental import (
        stream_media_meta,
    )

    w1 = str(tmp_path / "a.warc.gz")
    w2 = str(tmp_path / "b.warc.gz")
    write_mini_warc(w1, [
        dict(url="http://s.example/i", date_iso="2020-01-01T00:00:00Z",
             payload=build_png_header(100, 50), mime="image/png"),
    ])
    write_mini_warc(w2, [
        dict(url="http://s.example/a", date_iso="2020-01-01T00:00:01Z",
             payload=build_wav(1, 8000, 16, 4000), mime="audio/wav"),
        dict(url="http://s.example/t", date_iso="2020-01-01T00:00:02Z",
             payload=b"<html/>", mime="text/html"),
    ])
    mdir = tmp_path / "manifests"
    mdir.mkdir()
    (mdir / "m1.txt").write_text(w1 + "\n")
    (mdir / "m2.txt").write_text(w2 + "\n")

    out = str(tmp_path / "meta")
    ckpt = str(tmp_path / "ckpt")
    q = stream_media_meta(spark, str(mdir), out, ckpt)
    q.awaitTermination(120)

    got_df = spark.read.parquet(out)
    assert "ingest_batch" in got_df.columns  # per-batch idempotent sink
    got = sorted(
        map(tuple, got_df.drop("ingest_batch").orderBy("url").collect())
    )
    manifest = spark.createDataFrame([(w1,), (w2,)], ["path"])
    want = sorted(
        map(
            tuple,
            media_meta(
                index_warcs(
                    spark, manifest,
                    keep_payload=("image/", "audio/", "video/"),
                )
            ).collect(),
        )
    )
    assert got == want and len(got) == 2  # html row never retained

    # restart with the same checkpoint: nothing new, no duplicates
    q2 = stream_media_meta(spark, str(mdir), out, ckpt)
    q2.awaitTermination(60)
    assert spark.read.parquet(out).count() == 2


def test_stream_media_meta_refuses_legacy_flat_layout(spark, tmp_path):
    """Round-13 ADVICE fix: an out_dir holding PRE-partitioning flat
    part files cannot take ingest_batch= hive partitions (mixed
    layouts break spark.read.parquet) — the stream refuses up front
    with a migration hint instead of corrupting the store."""
    import pytest

    from webarchive_indexing_spark.streaming.incremental import (
        stream_media_meta,
    )

    out = tmp_path / "legacy_meta"
    out.mkdir()
    spark.range(3).coalesce(1).write.mode("overwrite").parquet(str(out))
    assert any(p.suffix == ".parquet" for p in out.iterdir())
    with pytest.raises(ValueError, match="root-level parquet"):
        stream_media_meta(
            spark, str(tmp_path / "m"), str(out), str(tmp_path / "ck")
        )


def test_stream_scope_id_adopts_legacy_checkpoint(tmp_path):
    """Round-13 ADVICE fix (medium): a checkpoint with Spark state
    (offsets/) but no stream_id file predates scope ids — its ledger
    entries read back as 'default:<n>', so the scope must resolve to
    'default' (not a fresh uuid) or a micro-batch redelivered across
    the code upgrade would be applied twice.  Fresh checkpoints still
    mint a uuid; an existing stream_id file always wins."""
    from webarchive_indexing_spark.streaming.incremental import (
        _stream_scope_id,
    )

    legacy = tmp_path / "ck_legacy"
    (legacy / "offsets").mkdir(parents=True)
    assert _stream_scope_id(str(legacy)) == "default"
    assert (legacy / "stream_id").read_text() == "default"
    assert _stream_scope_id(str(legacy)) == "default"  # sticky

    fresh = tmp_path / "ck_fresh"
    sid = _stream_scope_id(str(fresh))
    assert sid != "default" and len(sid) == 12
    assert _stream_scope_id(str(fresh)) == sid  # sticky too

    pinned = tmp_path / "ck_pinned"
    (pinned / "offsets").mkdir(parents=True)
    (pinned / "stream_id").write_text("abc123def456")
    assert _stream_scope_id(str(pinned)) == "abc123def456"


def test_stream_ann_appends_pq_and_sq_kinds(spark, sf_dir, tmp_path):
    """kind='pq'/'sq' streaming appends: the version clone carries
    model artifacts + sidecar + ledger, the append encodes with the
    STORED model (codes + refine sidecar + attrs stay in step), and
    probes against the streamed store equal a direct-append twin."""
    from pyspark.sql import functions as F

    from webarchive_indexing_spark.operators.similarity import (
        collect_query_vector,
    )
    from webarchive_indexing_spark.sinks import ann_index
    from webarchive_indexing_spark.streaming.incremental import (
        stream_ann_appends,
    )
    from webarchive_indexing_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") < 350)
    extra = emb.filter(F.col("vec_id") >= 350)
    qv = collect_query_vector(emb, 321)

    for kind, build, probe in (
        (
            "pq",
            lambda d: ann_index.write_ivfpq_index_versioned(
                base, d, n_cells=8, n_sub=4, k_codes=8, train_iters=2,
                refine="flat", attrs=["label"],
            ),
            lambda d: ann_index.ivfpq_refined_topk(
                spark, d, None, qv, k=5, k_factor=4, nprobe=3,
                exclude_id=321,
            ),
        ),
        (
            "sq",
            lambda d: ann_index.write_ivfsq_index_versioned(
                base, d, n_cents=8, train_iters=2, attrs=["label"],
            ),
            lambda d: ann_index.ivfsq_index_probe_topk(
                spark, d, qv, k=5, nprobe=3, exclude_id=321,
                where="label >= 0",
            ),
        ),
    ):
        root = str(tmp_path / f"store_{kind}")
        twin = str(tmp_path / f"twin_{kind}")
        build(root)
        build(twin)
        getattr(ann_index, f"append_ivf{kind}_index")(extra, twin)

        inp = str(tmp_path / f"in_{kind}")
        extra.coalesce(1).write.parquet(inp)
        q = stream_ann_appends(
            spark, inp, root, str(tmp_path / f"ck_{kind}"), kind=kind
        )
        q.awaitTermination(120)
        got = [tuple(r) for r in probe(root).collect()]
        want = [tuple(r) for r in probe(twin).collect()]
        assert got == want and got, kind
        # appended rows really landed (same model => same answers is
        # only meaningful if the streamed store grew)
        sub = "codes" if kind == "pq" else "sq"
        import os as _os

        n = spark.read.parquet(
            _os.path.join(ann_index.resolve_store(root), sub)
        ).count()
        assert n == emb.count(), (kind, n)


def test_stream_append_ledger_corruption_refuses(spark, sf_dir, tmp_path):
    """A corrupt replay ledger must ABORT appends, not silently read
    as empty (which would re-apply delivered batches as duplicates)."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from webarchive_indexing_spark.sinks import ann_index
    from webarchive_indexing_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    root = str(tmp_path / "store")
    ann_index.write_ivf_index_versioned(
        emb.filter(F.col("vec_id") < 100), root, n_cents=8, train_iters=2
    )
    batch = emb.filter(F.col("vec_id").between(100, 120))
    assert ann_index.stream_append_batch(batch, 0, root, kind="flat")
    cur = ann_index.resolve_store(root)
    with open(os.path.join(cur, "applied_batches.json"), "w") as fh:
        fh.write("{corrupt")
    with _pytest.raises(RuntimeError, match="replay ledger"):
        ann_index.stream_append_batch(batch, 1, root, kind="flat")


def test_stream_ledger_scoped_by_stream_id(spark, sf_dir, tmp_path):
    """Review fix: Spark batch ids are unique only per checkpoint, so
    the replay ledger keys on stream_id:batch_id — a redelivery
    within one stream is a no-op, but a NEW stream incarnation's
    batch 0 is never mistaken for the old stream's batch 0 (the
    silent-data-loss case); pre-scoping integer ledgers read as the
    'default' scope."""
    import json
    import os

    from pyspark.sql import functions as F

    from webarchive_indexing_spark.sinks import ann_index
    from webarchive_indexing_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    root = str(tmp_path / "annroot")
    ann_index.write_ivf_index_versioned(
        emb.filter(F.col("vec_id") < 200), root, n_cents=4, train_iters=1
    )
    batch_a = emb.filter(
        (F.col("vec_id") >= 200) & (F.col("vec_id") < 220)
    )
    batch_b = emb.filter(
        (F.col("vec_id") >= 220) & (F.col("vec_id") < 240)
    )
    assert ann_index.stream_append_batch(
        batch_a, 0, root, kind="flat", stream_id="ckpt-a"
    )
    # same stream, same id: replay no-op
    assert not ann_index.stream_append_batch(
        batch_a, 0, root, kind="flat", stream_id="ckpt-a"
    )
    # NEW incarnation, same batch id: must apply
    assert ann_index.stream_append_batch(
        batch_b, 0, root, kind="flat", stream_id="ckpt-b"
    )
    cur = ann_index.resolve_store(root)
    ids = {
        r.vec_id
        for r in spark.read.parquet(cur + "/vectors").collect()
    }
    assert 205 in ids and 225 in ids

    # back-compat: a bare-integer ledger reads as the default scope
    with open(os.path.join(cur, "applied_batches.json"), "w") as fh:
        json.dump([7], fh)
    assert ann_index._applied_batches(cur) == {"default:7"}
    assert not ann_index.stream_append_batch(
        batch_a, 7, root, kind="flat"
    )


def test_expire_reclaims_stale_building_opt_in(tmp_path):
    """Review fix: a crash between new_store_version and publish
    leaves the BUILDING sentinel forever; default housekeeping still
    never touches it, but stale_building_s reclaims sentinel'd dirs
    older than the threshold — CURRENT always untouched."""
    import os

    from webarchive_indexing_spark.sinks import ann_index

    root = str(tmp_path / "store")
    os.makedirs(root)
    # a published version
    name, path = ann_index.new_store_version(root)
    os.makedirs(os.path.join(path, "vectors"), exist_ok=True)
    ann_index._publish_store_version(root, name)
    # an abandoned build: sentinel still present
    _n2, p2 = ann_index.new_store_version(root)
    assert os.path.exists(os.path.join(p2, "BUILDING"))

    # default: never reclaimed
    assert ann_index.expire_store_versions(root, min_age_s=0) == []
    assert os.path.exists(p2)
    # opt-in with a future threshold: still protected
    assert ann_index.expire_store_versions(
        root, min_age_s=0, stale_building_s=3600
    ) == []
    # opt-in with 0: reclaimed; CURRENT version survives
    gone = ann_index.expire_store_versions(
        root, min_age_s=0, stale_building_s=0.0
    )
    assert gone == [_n2]
    assert not os.path.exists(p2)
    assert os.path.exists(path)


def test_stream_wet_extract(spark, tmp_path):
    """Round 13: streaming WET production — manifests of response
    WARCs arrive as a stream; each batch publishes its own WET shard
    directory atomically, checkpoint makes intake exactly-once, and
    the union of batch directories re-ingests through the engine's
    WET reader with the same text the batch pipeline extracts."""
    import glob

    from pyspark.sql import functions as F

    from webarchive_indexing_spark.sources.warc import (
        index_warcs,
        write_mini_warc,
    )
    from webarchive_indexing_spark.streaming.incremental import (
        stream_wet_extract,
    )

    page = (
        "<html><body><nav><a href='/'>Home</a></nav><p>{body}</p>"
        "<footer><a href='/t'>Terms</a></footer></body></html>"
    )

    def mk(path, tag, n):
        write_mini_warc(path, [
            dict(
                url=f"http://sw.example/{tag}/{j}",
                date_iso="2021-01-01T00:00:00Z",
                mime="text/html",
                payload=page.format(
                    body=f"{tag} page {j} holds plenty of real words to "
                         f"clear the configured minimum"
                ).encode(),
            )
            for j in range(n)
        ])

    w1, w2 = str(tmp_path / "a.warc.gz"), str(tmp_path / "b.warc.gz")
    mk(w1, "alpha", 3)
    mk(w2, "beta", 2)
    mdir = tmp_path / "manifests"
    mdir.mkdir()
    (mdir / "m1.txt").write_text(w1 + "\n")
    (mdir / "m2.txt").write_text(w2 + "\n")

    out = str(tmp_path / "wet")
    ckpt = str(tmp_path / "ckpt")
    q = stream_wet_extract(spark, str(mdir), out, ckpt)
    q.awaitTermination(120)

    shards = glob.glob(out + "/batch=*/wet-*.warc.wet.gz")
    assert shards and not glob.glob(out + "/tmp-*")
    wet = index_warcs(
        spark,
        spark.createDataFrame([(p,) for p in shards], ["path"]),
        record_types=("conversion",), keep_payload=("text/",),
    ).select("urlkey", F.decode(F.col("payload"), "UTF-8").alias("text"))
    got = {r.urlkey: r.text for r in wet.collect()}
    assert len(got) == 5
    assert got["example,sw)/alpha/2"].startswith("alpha page 2")
    assert all("Home" not in t and "Terms" not in t for t in got.values())

    # restart with the same checkpoint: nothing new, no duplicates
    q2 = stream_wet_extract(spark, str(mdir), out, ckpt)
    q2.awaitTermination(60)
    assert len(glob.glob(out + "/batch=*/wet-*.warc.wet.gz")) == len(shards)


def test_stream_graph_appends_versioned(spark, sf_dir, tmp_path):
    """Round-15 streaming graph ANN maintenance (the stream_ann_appends
    twin for the graph layout): micro-batches of new vectors append
    into a VERSIONED graph store behind per-batch CURRENT swaps.
    Pins: (1) walk equality vs the same base store grown by direct
    batch appends in the same order; (2) reader stability — the
    pre-stream version is frozen; (3) a mid-stream tombstone is
    honored; (4) a redelivered batch id is a ledger no-op."""
    import os

    from pyspark.sql import functions as F

    from webarchive_indexing_spark.operators import graph_ann
    from webarchive_indexing_spark.operators.similarity import (
        collect_query_vector,
    )
    from webarchive_indexing_spark.sinks import ann_index
    from webarchive_indexing_spark.streaming.incremental import (
        stream_graph_appends,
    )
    from webarchive_indexing_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") < 300).select("vec_id", "embedding")
    b1 = emb.filter(
        (F.col("vec_id") >= 300) & (F.col("vec_id") < 400)
    ).select("vec_id", "embedding")
    b2 = emb.filter(
        (F.col("vec_id") >= 400) & (F.col("vec_id") < 500)
    ).select("vec_id", "embedding")

    root = str(tmp_path / "store")
    graph_ann.write_knn_graph_versioned(
        emb, root, k_neighbors=8, n_base=300
    )
    v_before = ann_index.resolve_store(root)
    rows_before = spark.read.parquet(
        os.path.join(v_before, "vectors")
    ).count()

    twin = str(tmp_path / "twin")
    graph_ann.write_knn_graph_versioned(
        emb, twin, k_neighbors=8, n_base=300
    )
    graph_ann.append_knn_graph(b1, twin)
    graph_ann.append_knn_graph(b2, twin)

    # two parquet files + maxFilesPerTrigger=1 → two micro-batches in
    # arrival order
    inp = str(tmp_path / "incoming")
    b1.coalesce(1).write.parquet(inp, mode="append")
    import time

    time.sleep(1.1)  # distinct mtimes pin the micro-batch order
    b2.coalesce(1).write.parquet(inp, mode="append")
    victim = 305
    ann_index.delete_from_ann_index(root, [victim])

    q = stream_graph_appends(
        spark, inp, root, str(tmp_path / "ckpt"), max_files_per_trigger=1
    )
    q.awaitTermination(180)

    v_after = ann_index.resolve_store(root)
    assert v_after != v_before
    # (2) reader stability
    assert (
        spark.read.parquet(os.path.join(v_before, "vectors")).count()
        == rows_before
    )
    assert (
        spark.read.parquet(os.path.join(v_after, "vectors")).count() == 500
    )

    # (1) walk equality vs the direct-append twin, (3) tombstone
    qv = collect_query_vector(emb, 321)
    got = graph_ann.graph_beam_topk(
        spark, root, qv, k=10, beam=10, hops=3, exclude_id=321
    ).collect()
    ann_index.delete_from_ann_index(twin, [victim])
    want = graph_ann.graph_beam_topk(
        spark, twin, qv, k=10, beam=10, hops=3, exclude_id=321
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert victim not in {r.vec_id for r in got}

    # (4) replay no-op
    applied = ann_index._applied_batches(v_after)
    assert applied
    sid, bid = sorted(applied)[0].rsplit(":", 1)
    assert (
        graph_ann.stream_graph_append_batch(
            b1.limit(5), int(bid), root, stream_id=sid
        )
        is False
    )
    assert (
        spark.read.parquet(
            os.path.join(ann_index.resolve_store(root), "vectors")
        ).count()
        == 500
    )
