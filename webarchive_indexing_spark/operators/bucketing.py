"""Bucketed (pre-shuffled) tables for co-located joins (SURVEY.md §4).

At 100 TB the dominant cost of a fact-fact equi-join is shuffling both
sides.  Bucketing pays that shuffle ONCE at write time: both tables
are hash-partitioned into the same number of buckets on the join key
and each bucket sorted, so every subsequent join on that key is a
zero-exchange sort-merge of aligned bucket pairs.  This is the Spark
analogue of the reference's fixed shard layout — the ZipNum cluster is
itself a "bucketed-by-range" artifact whose reader exploits the layout
the same way.

Uses the session catalog's managed-table path (``saveAsTable`` with
``bucketBy``) — plain parquet + catalog metadata, no Hive required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    *,
    buckets: int = 8,
    mode: str = "overwrite",
) -> None:
    """Materialize ``df`` as a bucketed+sorted managed table on ``key``."""
    (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on ``key``; with matching bucket
    counts Catalyst plans a SortMergeJoin with NO exchange on either
    side (assert via .explain — see tests/test_bucketing.py)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
