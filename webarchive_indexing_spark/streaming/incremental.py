"""Streaming operators (SURVEY.md §2.9).

The reference is pure batch [U]; these are the tier-C streaming twins
of its operators, built on Structured Streaming so the SAME
transformations run incrementally:

* ST1 ``stream_cdx_ingest`` — new CDX files appearing in a directory
  are parsed and appended to a parquet index mirror via foreachBatch
  (the micro-batch hook where a production job would merge into the
  ZipNum cluster and rewrite cluster.idx).
* ST2 ``stream_windowed_counts`` — watermarked tumbling/sliding
  windows over an event stream (batch twin: tumbling_window_daily).
* ST3 ``stream_session_counts`` — native session windows
  (batch twin: operators.sessionize).
* ST5 ``stream_dedup`` — stateful digest dedup bounded by the
  watermark (batch twin: dropDuplicates / A7).

Watermarks bound state at scale: an unbounded-state streaming dedup
or window agg dies at 100 TB/day; ``withWatermark`` caps what the
state store retains (ST4 late-data semantics are the tests' job to
pin down).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.cdx import parse_cdx_lines


def stream_cdx_ingest(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """ST1: directory of arriving .cdx text files → typed parquet
    mirror, exactly-once via checkpointed file-source offsets."""
    lines = spark.readStream.format("text").load(input_dir)
    cdx = parse_cdx_lines(lines)

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        # production seam: zipnum merge; here an append-mode parquet
        # mirror keeps the index queryable after every micro-batch
        batch_df.write.mode("append").parquet(out_dir)

    return (
        cdx.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_zipnum_epochs(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    shards: int = 2,
    numlines: int = 100,
):
    """ST1 end-to-end incremental INDEXING (not just a parquet mirror):
    every micro-batch of arriving CDX files becomes one immutable
    sorted ZipNum cluster — an EPOCH — under ``out_dir``; readers merge
    epochs (sinks.zipnum.read_zipnum_epochs) and a background
    compaction (compact_zipnum_epochs) folds them when read
    amplification grows.  The LSM contract: sorted runs in, leveled
    merge behind — which is how a live archive actually absorbs a new
    crawl without rewriting the whole index.  Exactly-once per epoch
    via the checkpointed file-source offsets PLUS the epoch manifest:
    each batch_id is mapped to an epoch id drawn from the same
    monotonic space compaction allocates from (``reserve_epoch_id``),
    so a post-compaction micro-batch can never land on — and wipe —
    the merged epoch's slot; a replayed batch reuses its mapped id
    (idempotent rewrite), and a replay whose epoch was already folded
    into a compacted cluster is skipped outright (its rows are
    durable in the merged epoch — rewriting would duplicate them)."""
    from ..sinks.zipnum import (
        _subsumed_names,
        reserve_epoch_id,
        write_zipnum_epoch,
    )

    lines = spark.readStream.format("text").load(input_dir)
    cdx = parse_cdx_lines(lines)

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        epoch_id = reserve_epoch_id(out_dir, f"batch:{int(batch_id)}")
        if f"epoch-{epoch_id:06d}" in _subsumed_names(out_dir):
            return
        write_zipnum_epoch(
            batch_df, out_dir, epoch_id, shards=shards, numlines=numlines
        )

    return (
        cdx.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_parquet_epochs(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    range_partitions: int = 2,
):
    """ST1 on the COLUMNAR backend: the ``stream_zipnum_epochs`` twin
    writing each micro-batch as one immutable parquet
    (cc-index-table) epoch through the SAME shared LSM protocol —
    epoch ids from the manifest allocator keyed on batch_id
    (replay-safe: a redelivered batch rewrites ITS OWN epoch; a batch
    already folded by compaction is skipped), tombstones and
    ``as_of_epoch`` snapshots apply at read time, and
    ``compact_parquet_index_epochs`` folds the store.  This is the
    100 TB live-ingest shape for the SQL-engine-facing index — a
    monthly crawl streams in as epochs, history never rewritten."""
    from ..sinks.parquet_index import (
        to_parquet_index_shape,
        write_parquet_index_epoch,
    )

    lines = spark.readStream.format("text").load(input_dir)
    cdx = parse_cdx_lines(lines)

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write_parquet_index_epoch(
            to_parquet_index_shape(batch_df),
            out_dir,
            f"batch:{int(batch_id)}",
            range_partitions=range_partitions,
        )

    return (
        cdx.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_ann_appends(
    spark: SparkSession,
    input_dir: str,
    root: str,
    checkpoint_dir: str,
    *,
    kind: str = "flat",
    schema: str = "vec_id bigint, embedding array<float>, label int",
    max_files_per_trigger: int | None = None,
    **append_kw,
):
    """Streaming ingest for a VERSIONED ANN store (round 12 — the
    ``stream_parquet_epochs`` twin for vector indexes, completing the
    store-maintenance parity the round-11 verdict named): new vectors
    land as parquet files under ``input_dir``; each micro-batch
    clones the published version by hard links (O(files), zero data
    bytes), appends with the STORED quantizer/codebooks
    (``append_*_index`` — scores never shift under a serving index),
    records the batch id in a replay ledger, and publishes with one
    atomic ``CURRENT`` swap.  In-flight readers keep their resolved
    version (frozen by construction — appends only add files and old
    versions share data files immutably); redelivered batches are
    ledger no-ops; tombstones live at the ROOT and span every
    version, so a mid-stream takedown is honored by the next probe
    regardless of swaps.  ``kind`` selects the payload family
    (flat / pq / sq)."""
    from ..sinks.ann_index import stream_append_batch

    sid = _stream_scope_id(checkpoint_dir)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    vecs = reader.parquet(input_dir)

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        stream_append_batch(
            batch_df, int(batch_id), root, kind=kind, stream_id=sid,
            **append_kw,
        )

    return (
        vecs.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_graph_appends(
    spark: SparkSession,
    input_dir: str,
    root: str,
    checkpoint_dir: str,
    *,
    schema: str = "vec_id bigint, embedding array<float>",
    max_files_per_trigger: int | None = None,
    **append_kw,
):
    """Streaming ingest for a VERSIONED graph ANN store (round 15 —
    the ``stream_ann_appends`` twin for the graph layout, closing the
    "vectors arrive as a stream" story across every persisted index
    family): new vectors land as parquet files under ``input_dir``;
    each micro-batch hard-link-clones the published version, appends
    vectors + their symmetrized edges under the STORED build recipe
    (``append_knn_graph`` — old nodes gain reverse routes into the
    batch, edge semantics never shift under a serving store), records
    the batch in the replay ledger, and publishes with one atomic
    ``CURRENT`` swap.  In-flight readers keep their resolved version;
    redelivered batches are ledger no-ops; tombstones live at the
    root and span every version."""
    from ..operators.graph_ann import stream_graph_append_batch

    sid = _stream_scope_id(checkpoint_dir)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    vecs = reader.parquet(input_dir)

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        stream_graph_append_batch(
            batch_df, int(batch_id), root, stream_id=sid, **append_kw
        )

    return (
        vecs.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _stream_scope_id(checkpoint_dir: str) -> str:
    """Read-or-create the stream incarnation id stored INSIDE the
    checkpoint directory.  Spark batch ids are unique only per
    checkpoint; keying replay ledgers / idempotent sinks on the bare
    id makes a FRESH checkpoint's first batches look like replays of
    the old stream's.  A uuid that lives (and dies) with the
    checkpoint tracks exactly the identity the batch ids are scoped
    to: wipe the checkpoint → new uuid → the new incarnation's
    batches apply."""
    import os
    import uuid

    os.makedirs(checkpoint_dir, exist_ok=True)
    path = os.path.join(checkpoint_dir, "stream_id")
    if os.path.exists(path):
        with open(path) as fh:
            sid = fh.read().strip()
        if sid:
            return sid
    # Upgrade path: a checkpoint that ALREADY has Spark state (an
    # offsets/ dir) but no stream_id file was written by pre-scope-id
    # code whose ledger entries read back as 'default:<n>'.  Minting a
    # fresh uuid here would orphan those entries — a micro-batch
    # redelivered across the upgrade (crash between publish and
    # checkpoint commit) would re-apply under the new key and
    # duplicate rows.  Adopt the legacy 'default' scope so the old
    # incarnation's replay dedup keeps working; only genuinely FRESH
    # checkpoints get a uuid.
    if os.path.isdir(os.path.join(checkpoint_dir, "offsets")):
        sid = "default"
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(sid)
        os.replace(tmp, path)
        return sid
    sid = uuid.uuid4().hex[:12]
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(sid)
    os.replace(tmp, path)
    return sid


def stream_media_meta(
    spark: SparkSession,
    manifest_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    mime_prefixes: tuple[str, ...] = ("image/", "audio/", "video/"),
    files_per_task: int = 2,
    split_bytes: int | None = None,
):
    """Streaming twin of the ``media-meta`` pipeline (round 12): new
    manifest files (one WARC path per line) land under
    ``manifest_dir``; each micro-batch runs the keep_payload ingest +
    one-Arrow-pass header curation over ITS OWN paths and appends the
    metadata parquet — the incremental crawl-intake shape
    (``update_index``'s contract) applied to media curation.  Payload
    bytes live only inside the batch's executors; the sink holds
    metadata rows.

    Exactly-once end to end: the stream checkpoint tracks which
    manifest files are consumed, and each micro-batch OVERWRITES its
    own ``ingest_batch=<stream_id>-<batch_id>`` hive partition —
    foreachBatch is at-least-once, so a crash between the parquet
    write and the checkpoint commit redelivers the batch, and a blind
    append would duplicate its rows where the per-batch overwrite is
    a no-op.  Readers of ``out_dir`` see the extra ``ingest_batch``
    provenance column (drop it to match the batch pipeline's frame).
    A fresh checkpoint gets a fresh stream id, so its partitions
    never collide with an earlier incarnation's — point a new stream
    at a new ``out_dir``.

    Migration note: pre-partitioning incarnations of this sink wrote
    FLAT part files at the root of ``out_dir``; mixing those with
    ``ingest_batch=`` hive directories makes ``spark.read.parquet``
    fail with conflicting directory structures.  Resuming against
    such an ``out_dir`` is refused up front (start a new ``out_dir``,
    or move the legacy part files into a synthetic
    ``ingest_batch=legacy-0/`` directory first)."""
    import os

    from ..operators.multimodal import media_meta
    from ..sources.warc import index_warcs

    if os.path.isdir(out_dir) and any(
        n.endswith(".parquet") for n in os.listdir(out_dir)
    ):
        raise ValueError(
            f"stream_media_meta: {out_dir!r} holds root-level parquet "
            f"part files (pre-partitioning layout); mixing them with "
            f"ingest_batch= hive partitions breaks spark.read.parquet. "
            f"Start a new out_dir, or move the legacy files under an "
            f"ingest_batch=legacy-0/ subdirectory."
        )
    sid = _stream_scope_id(checkpoint_dir)
    lines = spark.readStream.format("text").load(manifest_dir)

    def curate(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        manifest = batch_df.select(F.col("value").alias("path"))
        kept = index_warcs(
            spark, manifest, files_per_task=files_per_task,
            split_bytes=split_bytes, keep_payload=mime_prefixes,
        )
        media_meta(kept).write.mode("overwrite").parquet(
            f"{out_dir}/ingest_batch={sid}-{int(batch_id)}"
        )

    return (
        lines.writeStream.foreachBatch(curate)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_takedowns(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
):
    """ST1 companion: a FEED of takedown requests (text files, one
    ``urlkey<TAB>ts14_or_*`` line each — the shape a legal-request
    queue exports) streams into tombstone epochs through the same
    manifest-allocated LSM protocol as crawl ingest.  Each micro-batch
    is one tombstone epoch; matching captures disappear from readers
    at the next query, past and future crawls alike; compaction later
    purges them physically.  Exactly-once via checkpointed offsets +
    the ``tombstone:batch:N`` manifest key (idempotent rewrite;
    post-compaction replays are skipped inside write_tombstone_epoch).

    Malformed lines are QUARANTINED, not widened: a NULL timestamp is
    the whole-URL wildcard tombstone, so a damaged line (no tab, bad
    ts) must never default there — only lines shaped exactly
    ``urlkey<TAB>(14-digit ts | *)`` pass; the rest drop at the scan
    (round-6 ADVICE fix)."""
    from ..sinks.zipnum import write_tombstone_epoch

    lines = spark.readStream.format("text").load(input_dir)
    parts = F.split(F.col("value"), "\t")
    ts_raw = parts.getItem(1)
    keys = (
        lines.filter(
            (F.size(parts) == 2)
            & (F.length(parts.getItem(0)) > 0)
            & ((ts_raw == "*") | ts_raw.rlike(r"^[0-9]{14}$"))
        )
        .select(
            parts.getItem(0).alias("urlkey"),
            F.when(ts_raw == "*", F.lit(None))
            .otherwise(ts_raw)
            .cast("string")
            .alias("timestamp"),
        )
    )

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write_tombstone_epoch(batch_df, out_dir, f"batch:{int(batch_id)}")

    return (
        keys.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_windowed_counts(
    events: DataFrame,
    *,
    window: str = "1 day",
    slide: str | None = None,
    watermark: str = "2 days",
) -> DataFrame:
    """ST2: watermarked tumbling (or sliding, if ``slide``) window
    counts per event_type."""
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("win_start"), "event_type", "n")
    )


def stream_session_counts(
    events: DataFrame, *, gap: str = "30 minutes", watermark: str = "2 days"
) -> DataFrame:
    """ST3: native session windows per user (gap-based, merging as
    events arrive — the streaming twin of operators.sessionize)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("sw.start").alias("session_start"), "n_events")
    )


def stream_dedup(
    events: DataFrame, keys: list[str], *, watermark: str = "1 day"
) -> DataFrame:
    """ST5: stateful dedup on ``keys`` with state bounded by the
    watermark (the CDX digest-dedup A7, streaming)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def stream_running_counts(events: DataFrame, key: str = "user_id") -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: a
    per-key running total maintained across micro-batches — the
    arbitrary-state shape (counters, per-URL crawl budgets, dedup
    sketches) that windowed aggs and dropDuplicates can't express.

    Each micro-batch the group's Arrow batches stream through Python,
    the single-row state tuple is read/updated, and one updated total
    is emitted per key (Update output mode).  State is one bigint per
    key — bounded by key cardinality, not stream length."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key_tuple, pdf_iter, state: GroupState):
        total = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({key: [key_tuple[0]], "n_events": [total]})

    return events.groupBy(key).applyInPandasWithState(
        update,
        outputStructType=f"{key} bigint, n_events bigint",
        stateStructType="n bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_stream_join(
    views: DataFrame,
    clicks: DataFrame,
    *,
    within_seconds: int = 3600,
    watermark: str = "2 days",
) -> DataFrame:
    """ST6: watermarked stream-stream interval join — attribute each
    click to the same user's views from the preceding hour (the ad-
    attribution / crawl-fetch-to-render correlation shape).

    Both sides carry a watermark and the join condition bounds the
    event-time distance, so Spark can size the join state: each side
    buffers only rows younger than ``watermark + within`` and evicts
    as the watermark advances — state stays proportional to the
    interval, not the stream.  Inner-join matches emit as soon as both
    rows have arrived (no watermark wait), which is why the batch twin
    (``events_view_click_attrib``) is an exact-equality oracle for the
    availableNow run in tests/test_streaming.py."""
    v = views.withWatermark("ts", watermark).select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("event_id").alias("view_id"),
    )
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("click_id"),
    )
    return v.join(
        c,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("v_ts"))
        & (
            F.col("c_ts")
            <= F.col("v_ts") + F.expr(f"INTERVAL {within_seconds} SECONDS")
        ),
    ).select("v_user", "view_id", "click_id", "v_ts", "c_ts")


def stream_wet_extract(
    spark: SparkSession,
    manifest_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    *,
    min_words: int = 10,
    max_link_density: float = 0.33,
    files_per_task: int = 2,
    split_bytes: int | None = None,
    n_files: int = 2,
):
    """Streaming twin of the ``wet-extract`` chain (round 13): new
    manifest files (one response-WARC path per line) land under
    ``manifest_dir``; each micro-batch ingests ITS OWN paths with
    payload retention, runs the Arrow-pass HTML main-content
    extraction, and publishes the batch's WET shards under
    ``batch=<stream_id>-<batch_id>/`` — the incremental crawl-intake
    shape applied to text production.  Raw HTML lives only inside the
    batch's executors; the sink holds conversion-record WET files the
    engine's own reader (and Common Crawl tooling) consumes.

    Exactly-once end to end: foreachBatch is at-least-once, so each
    batch builds its WET shards under a ``tmp-`` name readers never
    match and RENAMES into its own ``batch=`` slot — a redelivered
    batch rewrites its own directory (same deterministic content), a
    crash mid-write leaves only an ignorable tmp."""
    from ..operators.html_extract import extract_main_content
    from ..sinks.zipnum import _fs_for, _join
    from ..sources.warc import index_warcs, write_wet

    sid = _stream_scope_id(checkpoint_dir)
    lines = spark.readStream.format("text").load(manifest_dir)

    def extract(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from ..functions.timestamps import from_ts14

        manifest = batch_df.select(F.col("value").alias("path"))
        kept = index_warcs(
            spark, manifest, files_per_task=files_per_task,
            split_bytes=split_bytes, keep_payload=("text/html",),
        )
        ext = extract_main_content(
            kept, keys=("urlkey", "url", "timestamp"),
            min_words=min_words, max_link_density=max_link_density,
        )
        slot = f"batch={sid}-{int(batch_id)}"
        fs, root_local = _fs_for(out_dir)
        tmp_local = _join(root_local, f"tmp-{sid}-{int(batch_id)}")
        try:
            fs.delete_dir(tmp_local)  # stale tmp from a crashed run
        except OSError:
            pass
        write_wet(
            ext.select(
                "url",
                F.date_format(
                    from_ts14(F.col("timestamp")),
                    "yyyy-MM-dd'T'HH:mm:ss'Z'",
                ).alias("date_iso"),
                "main_text",
            ),
            _join(out_dir, f"tmp-{sid}-{int(batch_id)}"),
            n_files=n_files,
        )
        final = _join(root_local, slot)
        try:
            fs.delete_dir(final)  # replay of a completed batch
        except OSError:
            pass
        fs.move(tmp_local, final)

    return (
        lines.writeStream.foreachBatch(extract)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
