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
    *,
    keep: str = "first",
    group_count_col: str | None = None,
) -> DataFrame:
    """Keep the first (or last) row of each run of equal ``collapse_key``.

    ``partition_by`` scopes runs (cdx: the urlkey); ``order_by`` is
    the index order within the partition (cdx: timestamp).

    ``keep="first"`` (default): rows where the key differs from the
    PREVIOUS row's survive; the first row of each partition always
    survives (lag is NULL there).  ``keep="last"`` — pywb's
    ``collapseToLast`` [U pywb query API] — mirrors it with ``lead``:
    rows where the key differs from the NEXT row's survive, so each
    run is represented by its latest capture.  Same single window,
    same one shuffle, either direction.

    ``group_count_col`` (IA cdx-server ``showGroupCount=true`` [U IA
    wayback cdx-server API]) attaches the size of each run to its kept
    representative — the "N captures collapsed here" annotation.  The
    run id is the classic gaps-and-islands running sum of change
    flags; both extra windows share the SAME partitioning and
    ordering as the lag/lead, so the whole feature stays ONE shuffle.
    """
    if keep not in ("first", "last"):
        raise ValueError(f"keep must be 'first' or 'last', got {keep!r}")
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    adj = (F.lag if keep == "first" else F.lead)(collapse_key).over(w)
    cond = adj.isNull() | (collapse_key != adj)
    if group_count_col is None:
        return df.withColumn("__keep", cond).filter(F.col("__keep")).drop("__keep")
    prev = F.lag(collapse_key).over(w)
    change = (prev.isNull() | (collapse_key != prev)).cast("bigint")
    run_id = F.sum(change).over(w.rowsBetween(Window.unboundedPreceding, 0))
    out = df.withColumn("__keep", cond).withColumn("__run", run_id)
    cw = Window.partitionBy(*partition_by, "__run")
    out = out.withColumn(group_count_col, F.count(F.lit(1)).over(cw))
    return out.filter(F.col("__keep")).drop("__keep", "__run")
