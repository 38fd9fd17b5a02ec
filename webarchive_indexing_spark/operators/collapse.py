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
    skip_count_col: str | None = None,
    skip_ts: tuple[str, str] | None = None,
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

    ``skip_count_col`` (IA cdx-server ``showSkipCount=true`` [U IA
    wayback cdx-server API]) attaches, to each kept row, how many
    captures the collapse skipped since the previously kept row —
    computed as the row-number gap between consecutive survivors, so
    it needs no per-run state.  ``skip_ts=(src_col, out_col)`` adds
    IA's companion ``lastskiptimestamp``: the ``src_col`` value of
    the most recently skipped capture (NULL when nothing was
    skipped) — in index order that capture is always the row
    immediately before the kept one, i.e. a plain ``lag`` on the
    SAME window.  The post-filter gap window re-uses the partition
    clustering, so these annotations are also shuffle-neutral.
    """
    if keep not in ("first", "last"):
        raise ValueError(f"keep must be 'first' or 'last', got {keep!r}")
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    adj = (F.lag if keep == "first" else F.lead)(collapse_key).over(w)
    cond = adj.isNull() | (collapse_key != adj)
    if group_count_col is None and skip_count_col is None:
        return df.withColumn("__keep", cond).filter(F.col("__keep")).drop("__keep")
    out = df.withColumn("__keep", cond)
    drop = ["__keep"]
    if group_count_col is not None:
        prev = F.lag(collapse_key).over(w)
        change = (prev.isNull() | (collapse_key != prev)).cast("bigint")
        run_id = F.sum(change).over(w.rowsBetween(Window.unboundedPreceding, 0))
        out = out.withColumn("__run", run_id)
        cw = Window.partitionBy(*partition_by, "__run")
        out = out.withColumn(group_count_col, F.count(F.lit(1)).over(cw))
        drop.append("__run")
    if skip_count_col is not None:
        out = out.withColumn("__rn", F.row_number().over(w))
        if skip_ts is not None:
            out = out.withColumn("__pts", F.lag(skip_ts[0]).over(w))
        out = out.filter(F.col("__keep"))
        kw = Window.partitionBy(*partition_by).orderBy(*order_by)
        gap = F.col("__rn") - F.coalesce(F.lag("__rn").over(kw), F.lit(0)) - 1
        out = out.withColumn(skip_count_col, gap)
        drop.append("__rn")
        if skip_ts is not None:
            out = out.withColumn(
                skip_ts[1],
                F.when(F.col(skip_count_col) > 0, F.col("__pts")),
            )
            drop.append("__pts")
        return out.drop(*drop)
    return out.filter(F.col("__keep")).drop(*drop)
