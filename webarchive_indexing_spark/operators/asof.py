"""As-of join (SURVEY.md §2.3 J7) — nearest earlier row per key.

cdx-server ``sort=closest`` resolves each (url, t) request to the
capture nearest in time [B]; the general shape is the as-of join that
Spark has no native operator for.

Scale-first formulation (the "union trick"): instead of an equi-join
plus per-probe aggregation (which explodes when a key has many build
rows), union probe and build rows tagged by side, sort within key by
(ts, side), and carry the most recent build row forward with
``last(ignorenulls=True)`` — ONE shuffle of probe+build, no row
explosion, no skew amplification: cost O((|P|+|B|) log) regardless of
per-key fan-out.  DuckDB oracles it natively with ``ASOF JOIN``.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    probe_ts: str,
    build_ts: str,
    payload: list[str],
    *,
    strict: bool = False,
    how: str = "inner",
    direction: str = "backward",
) -> DataFrame:
    """For each probe row, attach ``payload`` columns of the build row
    with the greatest ``build_ts`` <= ``probe_ts`` (< if ``strict``)
    within the same ``on`` key; ``direction='forward'`` flips the
    semantics to the SMALLEST ``build_ts`` >= ``probe_ts`` (> if
    strict) — the "next event after" join (post-event attribution,
    next-deploy lookup).  Forward is the same union-trick plan with
    the timestamp ordering reversed; the side tie-break is direction-
    independent (equal-ts build rows sort before the probe unless
    strict), so cost and shuffle shape are identical.

    ``how='inner'`` drops probes with no matching build row;
    ``how='left'`` keeps them with NULL payload.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    pcols = probe.columns
    p = probe.withColumn("__side", F.lit(1)).withColumn("__ts", F.col(probe_ts))
    b = build.withColumn("__side", F.lit(0)).withColumn("__ts", F.col(build_ts))

    # align schemas: probe rows carry NULL payload, build rows NULL probe cols
    for c in payload:
        if c not in pcols:
            p = p.withColumn(c, F.lit(None).cast(dict(build.dtypes)[c]))
    for c in pcols:
        if c not in build.columns:
            b = b.withColumn(c, F.lit(None).cast(dict(probe.dtypes)[c]))
    cols = [on, "__ts", "__side", *payload, *[c for c in pcols if c != on]]
    unioned = p.select(*dict.fromkeys(cols)).unionByName(b.select(*dict.fromkeys(cols)))

    # strict: a build row at exactly probe_ts must NOT match → order it
    # after the probe row; non-strict: before.  Forward direction =
    # identical construction over the REVERSED time axis.
    side_order = F.col("__side").asc() if not strict else F.col("__side").desc()
    ts_order = (
        F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    )
    w = (
        Window.partitionBy(on)
        .orderBy(ts_order, side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *[c for c in unioned.columns if c not in payload],
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in payload],
    )
    out = filled.filter(F.col("__side") == 1).drop("__side", "__ts")
    if how == "inner":
        matched = functools.reduce(
            lambda a, b: a | b, [F.col(c).isNotNull() for c in payload]
        )
        out = out.filter(matched)
    return out
