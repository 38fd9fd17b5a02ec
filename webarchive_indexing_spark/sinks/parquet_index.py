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
) -> None:
    """Write a cc-index-table-layout parquet index.

    One range shuffle on ``url_surtkey`` gives every task a narrow
    key range; the within-task sort puts ``(crawl, subset)`` first so
    the hive writer emits one run per partition directory and
    ``url_surtkey`` order inside every file (tight row-group min/max
    stats — the pruning layer).  ``range_partitions`` is the output
    file-count knob per key range (CC scale: hundreds)."""
    missing = [c for c in PARTITION_COLS if c not in index.columns]
    if missing:
        raise ValueError(
            f"index frame lacks partition columns {missing}; run "
            "to_parquet_index_shape (or provide them) first"
        )
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
