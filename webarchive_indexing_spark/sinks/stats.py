"""Incremental view maintenance over the epoch LSM (SURVEY.md §2 ST1
companion): per-host crawl statistics maintained as PER-EPOCH PARTIAL
aggregates that merge associatively, so the rolled-up report never
re-reads old epochs.

The reference pipeline recomputes everything per crawl; a live archive
wants ``host_stats`` (the per-domain crawl report ``cdx_host_stats``
serves) kept current as epochs land.  Every statistic here is
DISTRIBUTIVE — count, sum, min, max — so the partial for each
immutable epoch is computed exactly once, stored beside the epoch's
cluster files, and the merged view is a re-aggregation of
#epochs × #hosts tiny partial rows:

* ingest cost per epoch: one scan OF THAT EPOCH (the new data);
* report cost: metadata-sized partial union — independent of corpus
  size, the IVM payoff at 100 TB;
* compaction: the merged epoch gets its own partial on first
  maintenance; subsumed epochs' partials die with their directories.

Tombstone caveat (documented, asserted in tests): partials are
computed from the epoch's rows AT WRITE TIME, so captures later
hidden by tombstone epochs still count until a compaction folds the
index (compaction physically drops them and the merged epoch's fresh
partial is exact again).  An exclusion-exact report between takedown
and compaction must recompute from ``read_zipnum_epochs``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .zipnum import _fs_for, _has_cluster, _join, list_epochs, read_zipnum

_STATS = "host_stats.parquet"

#: host = the comma-reversed authority before ')': the leading SURT
#: component, i.e. the unit per-domain reports aggregate on.
_HOST_RE = r"^([^)]*)\)"


def _epoch_stats_path(epoch_dir: str) -> str:
    return _join(epoch_dir, _STATS)


def compute_host_stats(cdx: DataFrame) -> DataFrame:
    """The partial-aggregate shape: one row per host, all fields
    distributive so partials re-aggregate losslessly."""
    return (
        cdx.withColumn("host", F.regexp_extract("urlkey", _HOST_RE, 1))
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_captures"),
            F.sum(F.col("length").cast("bigint")).alias("total_bytes"),
            F.min("timestamp").alias("first_ts"),
            F.max("timestamp").alias("last_ts"),
        )
    )


def _epoch_cdx(spark: SparkSession, epoch_dir: str) -> DataFrame | None:
    """The stats-relevant CDX columns of one epoch, whatever its
    payload: ZipNum clusters read through the pruning reader, parquet
    (cc-index-table) epochs through a crawl=-scoped scan renamed to
    the CDX shape.  None for tombstone-only epochs (no captures)."""
    if _has_cluster(epoch_dir):
        return read_zipnum(spark, epoch_dir)
    from .parquet_index import _has_parquet

    if _has_parquet(epoch_dir):
        return (
            spark.read.option("basePath", epoch_dir)
            .parquet(_join(epoch_dir, "crawl=*"))
            .select(
                F.col("url_surtkey").alias("urlkey"),
                F.date_format("fetch_time", "yyyyMMddHHmmss").alias(
                    "timestamp"
                ),
                F.col("warc_record_length").alias("length"),
            )
        )
    return None


def materialize_host_stats(spark: SparkSession, out_dir: str) -> int:
    """Compute-and-store the partial for every live data epoch that
    does not have one yet (immutable epochs ⇒ compute-once), ZipNum
    and parquet payloads alike.  Returns how many epochs were scanned
    — the maintenance cost, which stays at 'just the new epochs'
    regardless of index size."""
    from pyarrow import fs as pafs

    fs, _ = _fs_for(out_dir)
    scanned = 0
    for e in list_epochs(out_dir):
        cdx = _epoch_cdx(spark, e)
        if cdx is None:
            continue  # tombstone-only epochs carry no captures
        _, local = _fs_for(e)
        info = fs.get_file_info(_join(local, _STATS))
        if info.type != pafs.FileType.NotFound:
            continue
        compute_host_stats(cdx).write.mode("overwrite").parquet(
            _epoch_stats_path(e)
        )
        scanned += 1
    return scanned


def merged_host_stats(spark: SparkSession, out_dir: str) -> DataFrame:
    """The rolled-up report from partials alone: a union of
    #epochs × #hosts tiny rows re-aggregated — no capture is re-read.
    Raises if maintenance has not covered every live data epoch (a
    silently-partial report would be worse than an error)."""
    from .parquet_index import _has_parquet

    epochs = [
        e
        for e in list_epochs(out_dir)
        if _has_cluster(e) or _has_parquet(e)
    ]
    from pyarrow import fs as pafs

    fs, _ = _fs_for(out_dir)
    missing = [
        e
        for e in epochs
        if fs.get_file_info(_join(_fs_for(e)[1], _STATS)).type
        == pafs.FileType.NotFound
    ]
    if missing:
        raise ValueError(
            f"{len(missing)} epoch(s) lack host_stats partials — run "
            f"materialize_host_stats first: {missing[:3]}"
        )
    parts = [spark.read.parquet(_epoch_stats_path(e)) for e in epochs]
    if not parts:
        return compute_host_stats(
            read_zipnum(spark, out_dir)  # pragma: no cover - no epochs
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy("host").agg(
        F.sum("n_captures").alias("n_captures"),
        F.sum("total_bytes").alias("total_bytes"),
        F.min("first_ts").alias("first_ts"),
        F.max("last_ts").alias("last_ts"),
    )
