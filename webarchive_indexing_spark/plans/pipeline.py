"""End-to-end pipeline plans (SURVEY.md §3): the reference's three
CLI jobs as composed DataFrame plans.

Reference workflow [U README]:

1. ``indexwarcsjob.py``    manifest → one sorted ``.cdx.gz`` per WARC
2. ``samplecdxjob.py``     sample CDX keys → split-points file
3. ``zipnumclusterjob.py`` total-order sort → ZipNum cluster

Here that is either ONE call (``build_index`` — job 2 is subsumed by
``repartitionByRange``'s internal sampling, jobs 1+3 fuse into a
single lineage with one shuffle) or the same two materialized stages
(``index_to_cdx_gz`` + ``cluster_from_cdx_gz``) when the intermediate
per-WARC CDX artifact is wanted — e.g. to incrementally re-cluster
without re-parsing WARCs, which is how the reference operates at
Common Crawl scale.

``query_index`` is the cdx-server GET /index surface over the built
cluster (block-pruned reads — §3.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.cdx_query import cdx_query_zipnum
from ..session import tune
from ..sinks.zipnum import write_zipnum
from ..sources.cdx import read_cdx_gz, write_cdx_gz
from ..sources.warc import index_warcs, skip_existing


def _manifest_df(spark: SparkSession, manifest: str | DataFrame) -> DataFrame:
    tune(spark)  # idempotent: conf + ship package to python workers
    if isinstance(manifest, DataFrame):
        return manifest
    return spark.read.text(manifest).select(F.col("value").alias("path"))


def build_index(
    spark: SparkSession,
    manifest: str | DataFrame,
    out_dir: str,
    *,
    shards: int = 8,
    numlines: int = 3000,
    files_per_task: int = 2,
    record_types: tuple[str, ...] | None = None,
    post_append: bool = False,
) -> DataFrame:
    """Manifest (path file or DataFrame with ``path``) → WARC parse →
    ZipNum cluster at ``out_dir``; returns the secondary index.  One
    job, one range shuffle — the whole reference pipeline.
    ``record_types``/``post_append`` forward to ``index_warcs`` (pywb
    include-all + cdx-indexer -p semantics)."""
    from ..sources.warc import DEFAULT_RECORD_TYPES

    cdx = index_warcs(
        spark, _manifest_df(spark, manifest), files_per_task=files_per_task,
        record_types=record_types or DEFAULT_RECORD_TYPES,
        post_append=post_append,
    )
    return write_zipnum(cdx, out_dir, shards=shards, numlines=numlines)


def index_to_cdx_gz(
    spark: SparkSession,
    manifest: str | DataFrame,
    cdx_dir: str,
    *,
    files_per_task: int = 2,
    existing: DataFrame | None = None,
) -> DataFrame:
    """Stage 1 (reference job 1): manifest → sorted gzipped CDX under
    ``cdx_dir``.  ``existing`` (a DataFrame of already-indexed output
    paths) enables the --skip-existing anti-join [U ~L75-85]."""
    m = _manifest_df(spark, manifest)
    if existing is not None:
        m = skip_existing(m, existing)
    cdx = index_warcs(spark, m, files_per_task=files_per_task)
    write_cdx_gz(cdx, cdx_dir)
    return cdx


def cluster_from_cdx_gz(
    spark: SparkSession,
    cdx_dir: str,
    out_dir: str,
    *,
    shards: int = 8,
    numlines: int = 3000,
) -> DataFrame:
    """Stages 2+3 (reference jobs 2 and 3): re-read the per-WARC CDX,
    total-order it, build the ZipNum cluster; returns the secondary
    index.  The sampling job does not exist here — Spark's range
    partitioner samples bounds inside the one shuffle."""
    tune(spark)
    cdx = read_cdx_gz(spark, cdx_dir)
    return write_zipnum(cdx, out_dir, shards=shards, numlines=numlines)


def build_parquet_index(
    spark: SparkSession,
    manifest: str | DataFrame,
    out_dir: str,
    *,
    range_partitions: int = 8,
    files_per_task: int = 2,
) -> None:
    """Manifest → WARC parse → columnar (cc-index-table-layout)
    parquet index at ``out_dir`` — the SQL-engine-facing sibling of
    ``build_index``'s pywb-facing ZipNum cluster, from the same
    parse.  One job, one range shuffle (the layout IS the index; see
    sinks.parquet_index)."""
    from ..sinks.parquet_index import (
        to_parquet_index_shape,
        write_parquet_index,
    )

    cdx = index_warcs(
        spark, _manifest_df(spark, manifest), files_per_task=files_per_task
    )
    write_parquet_index(
        to_parquet_index_shape(cdx),
        out_dir,
        range_partitions=range_partitions,
        mode="overwrite",
    )


def query_index(
    spark: SparkSession, cluster_dir: str, url: str, **params
) -> DataFrame:
    """cdx-server GET /index over a built cluster: matchType, from/to,
    filter, collapse, closest, sort, fields, limit — block-pruned."""
    return cdx_query_zipnum(spark, cluster_dir, url, **params)


def update_index(
    spark: SparkSession,
    manifest: str | DataFrame,
    out_dir: str,
    *,
    indexed: DataFrame | None = None,
    shards: int = 2,
    numlines: int = 3000,
    files_per_task: int = 2,
    compact: bool = False,
    maintain_stats: bool = False,
) -> int | None:
    """Incremental crawl ingest — the composed plan a live archive
    actually runs per batch (the reference reruns all three jobs from
    scratch; here the index is the epoch LSM from sinks.zipnum):

    1. ``--skip-existing`` anti-join drops WARCs already indexed
       (``indexed`` = DataFrame of previously ingested paths);
    2. the remainder parses and lands as ONE new immutable sorted
       epoch — readers merge epochs, nothing is rewritten;
    3. ``compact=True`` folds all live epochs afterwards (crash/
       reader-safe rename protocol);
    4. ``maintain_stats=True`` updates the per-epoch host-stats
       partials (sinks.stats IVM — scans only epochs lacking one,
       i.e. the batch just written / the fresh compaction output).

    Replay-safe: the epoch id is reserved under a key derived from the
    batch's WARC paths, so a retried batch rewrites its own epoch, and
    a batch whose epoch was already folded into a compaction is a
    no-op.  Returns the epoch id, or None when there was nothing new
    to index (or the batch is already durable in a merged epoch)."""
    import hashlib

    from ..sinks.zipnum import (
        _subsumed_names,
        reserve_epoch_id,
        write_zipnum_epoch,
    )
    from ..sources.warc import index_warcs, skip_existing

    m = _manifest_df(spark, manifest)
    if indexed is not None:
        m = skip_existing(m, indexed)
    # driver-side collect is BOUNDED by construction: manifest rows are
    # file paths, not captures — one Common Crawl crawl is ~10^5 WARC
    # paths (≈ MBs); the sort exists only so the replay-idempotency key
    # below is independent of task/scan order.  A manifest too large to
    # collect would mean >>10^8 WARC files per batch — split the batch.
    paths = sorted(r["path"] for r in m.select("path").collect())
    if not paths:
        return None
    key = "update:" + hashlib.md5("\n".join(paths).encode()).hexdigest()
    epoch_id = reserve_epoch_id(out_dir, key)
    if f"epoch-{epoch_id:06d}" in _subsumed_names(out_dir):
        return None  # replay of a batch already folded by compaction
    cdx = index_warcs(spark, m, files_per_task=files_per_task)
    write_zipnum_epoch(cdx, out_dir, epoch_id, shards=shards, numlines=numlines)
    if compact:
        from ..sinks.zipnum import compact_zipnum_epochs

        compact_zipnum_epochs(spark, out_dir, shards=shards, numlines=numlines)
    if maintain_stats:
        from ..sinks.stats import materialize_host_stats

        materialize_host_stats(spark, out_dir)
    return epoch_id


def update_parquet_index(
    spark: SparkSession,
    manifest: str | DataFrame,
    out_dir: str,
    *,
    indexed: DataFrame | None = None,
    range_partitions: int = 8,
    files_per_task: int = 2,
    compact: bool = False,
    maintain_stats: bool = False,
) -> int | None:
    """Incremental crawl ingest into the COLUMNAR epoch store — the
    parquet twin of ``update_index``, same protocol (skip-existing
    anti-join, one immutable epoch per batch, replay-safe id keyed on
    the batch's WARC paths, optional fold-after, optional host-stats
    IVM maintenance — the stats layer covers parquet epochs too).  This is the 100 TB
    production shape [B commoncrawl/cc-index-table]: a monthly crawl
    appends one epoch; history is never rewritten; takedowns arrive
    as tombstone epochs through ``takedown`` and reach the bytes at
    the next compaction."""
    import hashlib

    from ..sinks.parquet_index import (
        compact_parquet_index_epochs,
        to_parquet_index_shape,
        write_parquet_index_epoch,
    )
    from ..sinks.zipnum import _subsumed_names, reserve_epoch_id
    from ..sources.warc import index_warcs, skip_existing

    m = _manifest_df(spark, manifest)
    if indexed is not None:
        m = skip_existing(m, indexed)
    # bounded collect: manifest rows are file paths (see update_index)
    paths = sorted(r["path"] for r in m.select("path").collect())
    if not paths:
        return None
    key = "update:" + hashlib.md5("\n".join(paths).encode()).hexdigest()
    # reserve under the parquet: prefix write_parquet_index_epoch uses,
    # so the write below lands in the slot reserved here on replay
    epoch_id = reserve_epoch_id(out_dir, f"parquet:{key}")
    if f"epoch-{epoch_id:06d}" in _subsumed_names(out_dir):
        return None  # replay of a batch already folded by compaction
    cdx = index_warcs(spark, m, files_per_task=files_per_task)
    write_parquet_index_epoch(
        to_parquet_index_shape(cdx), out_dir, key,
        range_partitions=range_partitions,
    )
    if compact:
        compact_parquet_index_epochs(
            spark, out_dir, range_partitions=range_partitions
        )
    if maintain_stats:
        from ..sinks.stats import materialize_host_stats

        materialize_host_stats(spark, out_dir)
    return epoch_id


def takedown(
    spark: SparkSession,
    keys,
    out_dir: str,
    *,
    batch_key: str | None = None,
    compact: bool = False,
    shards: int = 2,
    numlines: int = 3000,
) -> int:
    """Composed takedown/exclusion plan — the legal-request workflow a
    live archive runs: ``keys`` (DataFrame with ``urlkey`` +
    ``timestamp``, or a list of ``(urlkey, timestamp_or_None)``
    tuples; NULL timestamp = every capture of the urlkey) lands as ONE
    tombstone epoch through the same manifest-allocated LSM protocol
    as crawl ingest, hiding matching captures from every reader
    immediately — past epochs AND future crawls.  ``compact=True``
    additionally folds the index so the excluded rows are PHYSICALLY
    purged from storage (the tombstone list itself is carried forward
    by compaction); the merge routes to the store's payload backend —
    ZipNum or columnar parquet — automatically.  Replay-safe under
    ``batch_key`` (default: content hash of the key list)."""
    import hashlib

    from ..sinks.zipnum import compact_zipnum_epochs, write_tombstone_epoch

    if not isinstance(keys, DataFrame):
        keys = spark.createDataFrame(
            [(k, ts) for k, ts in keys], "urlkey string, timestamp string"
        )
    if batch_key is None:
        rows = sorted(
            f"{r['urlkey']}\t{r['timestamp']}"
            for r in keys.select("urlkey", "timestamp").collect()
        )
        batch_key = hashlib.md5("\n".join(rows).encode()).hexdigest()
    eid = write_tombstone_epoch(keys, out_dir, batch_key)
    if compact:
        from ..sinks.parquet_index import (
            compact_parquet_index_epochs,
            store_backend,
        )

        if store_backend(out_dir) == "parquet":
            compact_parquet_index_epochs(spark, out_dir)
        else:
            compact_zipnum_epochs(
                spark, out_dir, shards=shards, numlines=numlines
            )
    return eid
