"""cdx-server ``collapse`` (SURVEY.md §2.5 W2, tier B).

Public pywb semantics: scanning rows in index order, keep the FIRST
row of every run of rows whose collapse key (a field, optionally its
first N chars — ``collapseTime=10`` = first 10 timestamp digits) is
equal to the previous row's.  Run-based, NOT group-based: the same
key reappearing after a gap starts a new run and is kept again.

Spark mapping: one ``lag`` window over the index order — a single
shuffle on the partition key, no UDF, whole-stage codegen throughout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def collapse(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[str | Column],
    collapse_key: Column,
) -> DataFrame:
    """Keep the first row of each run of equal ``collapse_key``.

    ``partition_by`` scopes runs (cdx: the urlkey); ``order_by`` is
    the index order within the partition (cdx: timestamp).  Rows where
    the key differs from the previous row's survive; the first row of
    each partition always survives (lag is NULL there).
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    prev = F.lag(collapse_key).over(w)
    keep = prev.isNull() | (collapse_key != prev)
    return df.withColumn("__keep", keep).filter(F.col("__keep")).drop("__keep")
