"""Columnar (parquet) URL index sink + reader — the cc-index-table
successor format of the reference pipeline (SURVEY.md §2.1 S6/S8).

The reference's ZipNum cluster [U zipnumclusterjob.py] is the
pywb-servable artifact; its modern companion is the PUBLIC
``commoncrawl/cc-index-table`` layout — the same capture records as a
columnar parquet table, hive-partitioned by ``crawl`` and ``subset``
(``warc`` for 200s, ``crawldiagnostics`` for redirects/errors) and
sorted by ``url_surtkey`` inside every file, which SQL engines
(SparkSQL/Athena/DuckDB) query directly.  Column names follow the
public cc-index-table schema (``url_surtkey``, ``fetch_time``,
``fetch_status``, ``content_mime_type``, ``content_digest``,
``warc_filename``, ``warc_record_offset``, ``warc_record_length``).

Spark-first shape: ONE range shuffle (`repartitionByRange` on
``url_surtkey`` — Spark's RangePartitioner reservoir-samples the
bounds, subsuming the reference's SampleCDXJob exactly as the ZipNum
sink does) → partition-local sort → hive-partitioned parquet write.
The three query-acceleration layers come for free from layout, not
code:

* **partition pruning** — a ``crawl=``/``subset=`` predicate never
  lists, let alone reads, the other directories;
* **predicate pushdown** — a ``url_surtkey`` prefix/range reaches the
  parquet scan as ``StartsWith``/``>=`` filters;
* **row-group pruning** — because each task holds a narrow
  ``url_surtkey`` range and sorts within the file, min/max statistics
  on every row group are tight, so a pushed key range touches only
  the row groups that can contain it (the columnar analogue of the
  ZipNum secondary index's O(log blocks) + O(matched blocks) cost
  model).

At 100 TB: the single range shuffle is sized by ``range_partitions``
(CC production uses ~300 output files per crawl — same knob as the
ZipNum ``--shards``); the write streams partition-locally; no driver
collection anywhere.  Compaction/small-file hygiene is the same
repartition knob; late-arriving crawls land in NEW ``crawl=``
directories, so incremental appends never rewrite history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.timestamps import from_ts14

#: hive partition columns, in directory order.
PARTITION_COLS = ("crawl", "subset")


def to_parquet_index_shape(cdx: DataFrame) -> DataFrame:
    """11-field CDX frame (the ZipNum sink's input shape) → the
    public cc-index-table column layout.

    ``crawl`` derives from the WARC filename (basename minus
    ``.warc.gz`` — the capture's crawl batch), ``subset`` from the
    HTTP status exactly as cc-index-table splits its exports: ``warc``
    for 200s, ``crawldiagnostics`` for everything else.  ``fetch_time``
    becomes a typed UTC timestamp (ts14 is a serialization concern;
    columnar consumers filter on real timestamps)."""
    return cdx.select(
        F.col("urlkey").alias("url_surtkey"),
        F.col("url"),
        from_ts14(F.col("timestamp")).alias("fetch_time"),
        F.col("status").cast("int").alias("fetch_status"),
        F.col("mime").alias("content_mime_type"),
        F.col("digest").alias("content_digest"),
        F.col("filename").alias("warc_filename"),
        F.col("offset").cast("bigint").alias("warc_record_offset"),
        F.col("length").cast("bigint").alias("warc_record_length"),
        F.regexp_replace("filename", r"\.warc\.gz$", "").alias("crawl"),
        F.when(F.col("status") == 200, F.lit("warc"))
        .otherwise(F.lit("crawldiagnostics"))
        .alias("subset"),
    )


def write_parquet_index(
    index: DataFrame,
    out_dir: str,
    *,
    range_partitions: int = 8,
    mode: str = "error",
    zorder_by: tuple[str, ...] | None = None,
    zorder_bits: int = 8,
) -> None:
    """Write a cc-index-table-layout parquet index.

    Default layout: one range shuffle on ``url_surtkey`` gives every
    task a narrow key range; the within-task sort puts
    ``(crawl, subset)`` first so the hive writer emits one run per
    partition directory and ``url_surtkey`` order inside every file
    (tight row-group min/max stats — the pruning layer).
    ``range_partitions`` is the output file-count knob per key range
    (CC scale: hundreds).

    ``zorder_by`` (round 13) switches the layout to Z-ORDER clustering
    — the Delta/Iceberg ``OPTIMIZE ZORDER`` move on the production
    index: the listed dimensions interleave into a Morton key
    (``operators/bucketing.zorder_key``, equi-depth quantile
    bucketing — exact two-pass tiles for the string ``url_surtkey``
    dimension), and the range shuffle + local sort run on THAT key,
    so a multi-predicate box (url_surtkey prefix × fetch_time range)
    prunes row groups on every listed dimension instead of only the
    leading sort column.  Same shuffle count as the default layout —
    the clustering is free at write time beyond the boundary passes."""
    missing = [c for c in PARTITION_COLS if c not in index.columns]
    if missing:
        raise ValueError(
            f"index frame lacks partition columns {missing}; run "
            "to_parquet_index_shape (or provide them) first"
        )
    if zorder_by:
        from ..operators.bucketing import zorder_key

        staged, zcols = index, list(zorder_by)
        if "fetch_time" in zcols:
            # timestamps have no native double scale in the bucketer;
            # epoch seconds are order-isomorphic, and the staging
            # column is layout-only (dropped before the write)
            staged = staged.withColumn(
                "__ft", F.col("fetch_time").cast("double")
            )
            zcols = ["__ft" if c == "fetch_time" else c for c in zcols]
        # boundary passes (exact ntile rank + approxQuantile) each
        # re-execute the merged-epoch view — a union of epoch scans
        # with tombstone anti-joins.  Materialize ONE narrow pass of
        # just the clustering columns and derive boundaries from
        # that; the returned key column applies to the full frame
        # unchanged.  persist (NOT localCheckpoint): the blocks are
        # recomputable from lineage, so on a real cluster a lost
        # executor recomputes its slice instead of failing the job,
        # and DISK_ONLY spill bounds memory if the projection is
        # large.  The cache lives only for the boundary passes — the
        # boundaries come back as plain literals baked into the key
        # column, so it is released before the write below, which
        # still streams from source.  (Scale note: the projection is
        # two columns of index metadata, never the payload.)
        from pyspark import StorageLevel

        zproj = staged.select(*zcols).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            zcol, _meta = zorder_key(
                zproj, zcols, bits=zorder_bits, bucketing="quantile"
            )
        finally:
            zproj.unpersist()
        (
            staged.withColumn("__z", zcol)
            .repartitionByRange(range_partitions, "__z")
            .sortWithinPartitions(*PARTITION_COLS, "__z")
            .drop("__z", "__ft")
            .write.partitionBy(*PARTITION_COLS)
            .mode(mode)
            .parquet(out_dir)
        )
        return
    (
        index.repartitionByRange(range_partitions, "url_surtkey")
        .sortWithinPartitions(*PARTITION_COLS, "url_surtkey", "fetch_time")
        .write.partitionBy(*PARTITION_COLS)
        .mode(mode)
        .parquet(out_dir)
    )


def read_parquet_index(spark: SparkSession, index_dir: str) -> DataFrame:
    """Open a cc-index-table-layout index.  Plain ``spark.read`` —
    partition discovery recovers ``crawl``/``subset`` as columns, and
    every predicate on them prunes directories before any IO (assert
    with ``.explain``: PartitionFilters vs PushedFilters)."""
    return spark.read.parquet(index_dir)


# ------------------------------------------------------------------
# Incremental epoch store (parquet payload, ZipNum LSM protocol)
#
# The SAME contract as the ZipNum epoch store (sinks/zipnum.py ST1):
# one immutable ``epoch-NNNNNN`` directory per ingest batch, tombstone
# epochs for takedowns, ``compaction.inputs`` exclusion for leveled
# merges, a shared replay-safe id allocator, and ``as_of_epoch``
# snapshot reads — only the payload differs (a hive-partitioned
# parquet index instead of a sorted ZipNum cluster).  All protocol
# machinery (allocator, live-epoch listing, tombstone reading,
# snapshot cutoffs, expire-snapshots) is the zipnum module's,
# imported: two backends, ONE LSM implementation, so the randomized
# model test exercises identical semantics through both.
#
# Why it matters: the columnar index is the 100 TB production path
# [B commoncrawl/cc-index-table], and a legal takedown or a monthly
# crawl append must land WITHOUT rewriting petabytes of history —
# exactly the Iceberg posture (append epochs, tombstone deletes,
# compaction rewrites, expire-snapshots reclaims).

#: the cc-index-table column layout, for empty-store reads.
INDEX_SCHEMA = (
    "url_surtkey string, url string, fetch_time timestamp, "
    "fetch_status int, content_mime_type string, content_digest string, "
    "warc_filename string, warc_record_offset bigint, "
    "warc_record_length bigint, crawl string, subset string"
)


def _has_parquet(epoch_dir: str) -> bool:
    """True when the epoch's payload is a parquet index (vs a
    tombstone-only epoch, whose directory holds just the list)."""
    from pyarrow import fs as pafs

    from .zipnum import _fs_for

    fs, local = _fs_for(epoch_dir)
    infos = fs.get_file_info(pafs.FileSelector(local, allow_not_found=True))
    return any(
        i.type == pafs.FileType.Directory and i.base_name.startswith("crawl=")
        for i in infos
    )


def store_backend(store_dir: str) -> str | None:
    """Which payload a store's live epochs hold: ``'parquet'``
    (cc-index-table directories), ``'zipnum'`` (sorted clusters), or
    ``None`` (no live data epochs — empty or tombstone-only store).
    Lets the compaction CLI and the composed takedown plan route to
    the right merge without the operator restating what the store
    already knows."""
    from .zipnum import _has_cluster, list_epochs

    for e in list_epochs(store_dir):
        if _has_parquet(e):
            return "parquet"
        if _has_cluster(e):
            return "zipnum"
    return None


def write_parquet_index_epoch(
    index: DataFrame,
    store_dir: str,
    batch_key: str,
    *,
    range_partitions: int = 8,
) -> int:
    """One ingest batch → one immutable parquet-index epoch.

    The epoch id comes from the shared manifest allocator keyed on
    ``batch_key`` (replay-safe: a re-delivered batch rewrites ITS OWN
    slot, a batch already folded into a compaction is a no-op).  The
    write goes to an ``ingest-tmp-`` name ``list_epochs`` never
    matches, then renames into the ``epoch-NNNNNN`` slot — readers
    see either the complete epoch or nothing, never a half-committed
    parquet directory."""
    from .zipnum import _fs_for, _join, _subsumed_names, reserve_epoch_id

    eid = reserve_epoch_id(store_dir, f"parquet:{batch_key}")
    name = f"epoch-{eid:06d}"
    if name in _subsumed_names(store_dir):
        # late replay of an already-compacted batch: its rows are
        # durable in the merged epoch
        return eid
    fs, root_local = _fs_for(store_dir)
    tmp_local = _join(root_local, f"ingest-tmp-{eid:06d}")
    try:
        fs.delete_dir(tmp_local)  # stale tmp from a crashed run
    except OSError:
        pass
    write_parquet_index(
        index,
        _join(store_dir, f"ingest-tmp-{eid:06d}"),
        range_partitions=range_partitions,
        mode="overwrite",
    )
    final = _join(root_local, name)
    try:
        fs.delete_dir(final)  # replay of a completed batch: rewrite
    except OSError:
        pass
    fs.move(tmp_local, final)
    return eid


def read_parquet_index_epochs(
    spark: SparkSession,
    store_dir: str,
    *,
    as_of_epoch: int | None = None,
) -> DataFrame:
    """Merged view over every live epoch with tombstones applied —
    the parquet twin of ``read_zipnum_epochs``.

    Each epoch is an independent ``spark.read.parquet`` (so partition
    pruning and pushed key ranges apply per epoch; a filter on the
    union reaches every child scan), the survivors union, and live
    tombstones hide taken-down captures via broadcast anti-joins
    (takedown lists are metadata-sized — a court order, not a crawl).
    ``as_of_epoch`` is the Iceberg-style snapshot cutoff: later
    ingests, later takedowns, and later compactions are all invisible
    (see ``zipnum.list_epochs`` for the retention caveat)."""
    from .zipnum import _join, _read_tombstones, list_epochs

    epochs = [
        e for e in list_epochs(store_dir, as_of_epoch) if _has_parquet(e)
    ]
    if not epochs:
        return spark.createDataFrame([], INDEX_SCHEMA)
    dfs = [
        # scope the scan to the crawl= subtrees: a compacted epoch also
        # holds the protocol files (compaction.inputs, tombstones),
        # which are not parquet; basePath keeps partition discovery
        spark.read.option("basePath", e).parquet(_join(e, "crawl=*"))
        for e in epochs
    ]
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    wild, exact = _read_tombstones(store_dir, as_of_epoch)
    if wild:
        wdf = spark.createDataFrame([(k,) for k in wild], "url_surtkey string")
        out = out.join(F.broadcast(wdf), "url_surtkey", "left_anti")
    if exact:
        # tombstones carry ts14 strings (the shared cross-backend
        # format); the typed fetch_time renders back losslessly
        edf = spark.createDataFrame(
            list(exact), "__tomb_key string, __tomb_ts14 string"
        )
        out = out.withColumn(
            "__ts14", F.date_format("fetch_time", "yyyyMMddHHmmss")
        ).join(
            F.broadcast(edf),
            (F.col("url_surtkey") == F.col("__tomb_key"))
            & (F.col("__ts14") == F.col("__tomb_ts14")),
            "left_anti",
        ).drop("__ts14")
    return out


def compact_parquet_index_epochs(
    spark: SparkSession,
    store_dir: str,
    *,
    range_partitions: int = 8,
    retain_inputs: bool = False,
    zorder_by: tuple[str, ...] | None = None,
    zorder_bits: int = 8,
) -> int:
    """Fold ALL live epochs into a single new parquet epoch — the
    leveled merge, identical protocol to ``compact_zipnum_epochs``:
    build under a ``compact-tmp-`` name readers never match, record
    ``compaction.inputs``, carry the tombstone list forward (future
    ingests must stay hidden too — legal-takedown semantics), then
    one atomic rename into the slot.  The merged epoch is physically
    FREE of taken-down rows (the read path applied the tombstones),
    which is how a takedown eventually reaches the bytes on disk
    without ever rewriting history in place.  ``retain_inputs=True``
    keeps pre-merge snapshots readable (Iceberg retention;
    ``zipnum.expire_snapshots`` reclaims).  Returns the new epoch id.

    ``zorder_by`` (round 13) re-CLUSTERS the merged epoch — OPTIMIZE
    ZORDER composed into the leveled merge, the one moment the store
    rewrites bytes anyway, so the layout upgrade costs zero extra
    passes over history.  Answers are untouched (layout-only; the
    full-oracle ``parquet_index_zorder_box`` query pins this) while
    multi-predicate boxes (url_surtkey prefix × fetch_time) prune
    row-group footers on every listed dimension."""
    from .zipnum import (
        _COMPACT_INPUTS,
        _TOMBSTONES,
        _fs_for,
        _join,
        _read_tombstones,
        expire_snapshots,
        list_epochs,
        reserve_epoch_id,
    )

    if not retain_inputs:
        expire_snapshots(store_dir)
    epochs = list_epochs(store_dir)
    if not epochs:
        raise ValueError(f"no epochs to compact under {store_dir!r}")
    merged = read_parquet_index_epochs(spark, store_dir)
    in_names = [e.rsplit("/", 1)[1] for e in epochs]
    next_id = reserve_epoch_id(
        store_dir, f"compact:{in_names[0]}-{in_names[-1]}"
    )
    fs, root_local = _fs_for(store_dir)
    tmp_local = _join(root_local, f"compact-tmp-{next_id:06d}")
    try:
        fs.delete_dir(tmp_local)  # stale tmp from a crashed run
    except OSError:
        pass
    write_parquet_index(
        merged,
        _join(store_dir, f"compact-tmp-{next_id:06d}"),
        range_partitions=range_partitions,
        mode="overwrite",
        zorder_by=zorder_by,
        zorder_bits=zorder_bits,
    )
    with fs.open_output_stream(
        _join(tmp_local, _COMPACT_INPUTS), compression=None
    ) as fh:
        fh.write(("\n".join(in_names) + "\n").encode())
    wild, exact = _read_tombstones(store_dir)
    if wild or exact:
        lines = sorted(
            [f"{k}\t*" for k in wild] + [f"{k}\t{ts}" for k, ts in exact]
        )
        with fs.open_output_stream(
            _join(tmp_local, _TOMBSTONES), compression=None
        ) as fh:
            fh.write(("\n".join(lines) + "\n").encode())
    fs.move(tmp_local, _join(root_local, f"epoch-{next_id:06d}"))
    if not retain_inputs:
        for e in epochs:
            efs, local = _fs_for(e)
            efs.delete_dir(local)
    return next_id
