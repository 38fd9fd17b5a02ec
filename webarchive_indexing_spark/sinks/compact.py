"""Small-file compaction (tier-C pipeline maintenance; no reference
analogue — the ETL [U] writes one artifact per task and never revisits
file layout).

Every long-running 100 TB pipeline accumulates small-file storms:
per-micro-batch streaming commits, per-task outputs of wide shuffles,
incremental appends.  Thousands of kilobyte parquet files turn a scan
into per-file open/footer overhead and blow up driver listing memory.
Compaction = rewrite a fragmented dataset into ~target-size files.

Spark-first shape: the output file count is derived from the INPUT'S
total byte size via a filesystem content summary — a metadata-only
call (no data scan) that works on any Hadoop filesystem (file://,
hdfs://, s3a://).  The rewrite itself is one round-robin repartition
(or a range repartition when ``sort_cols`` is given, which restores
key clustering so parquet min/max stats prune again) followed by a
plain parquet write.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def dataset_bytes(spark: SparkSession, path: str) -> int:
    """Total on-disk bytes of a dataset — Hadoop ContentSummary, a
    namenode/listing call only (no executors, no data read)."""
    sc = spark.sparkContext
    jpath = sc._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())
    return fs.getContentSummary(jpath).getLength()


def plan_file_count(total_bytes: int, target_file_bytes: int) -> int:
    return max(1, math.ceil(total_bytes / max(1, target_file_bytes)))


def compact_parquet(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> DataFrame:
    """Rewrite the parquet dataset at ``in_dir`` into ``out_dir`` with
    ~``target_file_bytes`` files.  Returns the compacted DataFrame
    (lazy scan of ``out_dir``) so callers can chain validation.

    * file count = ceil(input_bytes / target) — compression ratio of
      the rewrite matches the input's (same codec, same data), so the
      input size is the right estimator and needs no data scan;
    * ``sort_cols`` → ``repartitionByRange`` + partition-local sort:
      restores the clustering that makes parquet min/max row-group
      stats prune range predicates (an unsorted round-robin compact
      keeps file counts down but loses pruning);
    * one shuffle either way; no driver collection at any size.
    """
    sc = spark.sparkContext
    hconf = sc._jsc.hadoopConfiguration()

    def qualified(p: str) -> str:
        jp = sc._jvm.org.apache.hadoop.fs.Path(p)
        fs = jp.getFileSystem(hconf)
        return str(fs.makeQualified(jp))

    # overwrite-while-reading would fail mid-job at best and, with path
    # aliasing Spark's own check misses, delete the input — fail fast.
    # In-place compaction must stage through a temp dir + rename.
    if qualified(in_dir) == qualified(out_dir):
        raise ValueError(
            f"compact_parquet: out_dir equals in_dir ({out_dir!r}); "
            "stage through a separate path and rename"
        )

    df = spark.read.parquet(in_dir)
    n = plan_file_count(dataset_bytes(spark, in_dir), target_file_bytes)
    if sort_cols:
        df = df.repartitionByRange(n, *sort_cols).sortWithinPartitions(*sort_cols)
    else:
        df = df.repartition(n)
    df.write.mode("overwrite").parquet(out_dir)
    return spark.read.parquet(out_dir)
