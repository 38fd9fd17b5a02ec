"""Skew mitigation patterns (SURVEY.md §4).

The reference has none — hot ZipNum shards just run long [U].  Two
standard Spark counters, exposed as reusable operators:

* ``salted_two_phase_agg`` — aggregation on a skewed key: phase 1
  aggregates on (key, salt) spreading a hot key over N reducers,
  phase 2 merges the partials.  The result is EXACTLY the plain
  groupBy result (salting only changes the physical shuffle), so the
  driver's oracle is the plain GROUP BY — correctness of the
  technique is hash-checked, not hand-waved.
* ``replicated_skew_join`` — the broadcast-replicate side of a
  skew-join: the small side is exploded once per salt value so a hot
  probe key fans out over salt_n tasks.  AQE's skewJoin does this
  adaptively at runtime (enabled in session.py); the explicit form is
  for planned hot keys at 100 TB where you know the skew up front.

Determinism: the salt is a hash of a high-cardinality column, never
``rand()`` — replays and retries see identical assignments.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_two_phase_agg(
    df: DataFrame,
    key: str,
    salt_col: str,
    aggs: dict[str, str],
    *,
    salt_n: int = 16,
) -> DataFrame:
    """Two-phase aggregation over a skewed ``key``.

    ``aggs`` maps output alias → ('sum'|'count'|'min'|'max', column).
    Only decomposable aggregates are offered (the point of the
    pattern); phase 1 runs per (key, salt), phase 2 re-merges per key.
    """
    salt = F.pmod(F.xxhash64(F.col(salt_col)), F.lit(salt_n)).alias("__salt")
    phase1_aggs = []
    phase2_aggs = []
    for alias, (fn, col) in aggs.items():
        part = f"__p_{alias}"
        if fn == "count":
            phase1_aggs.append(F.count(F.lit(1)).alias(part))
            phase2_aggs.append(F.sum(part).alias(alias))
        elif fn == "sum":
            phase1_aggs.append(F.sum(col).alias(part))
            phase2_aggs.append(F.sum(part).alias(alias))
        elif fn == "min":
            phase1_aggs.append(F.min(col).alias(part))
            phase2_aggs.append(F.min(part).alias(alias))
        elif fn == "max":
            phase1_aggs.append(F.max(col).alias(part))
            phase2_aggs.append(F.max(part).alias(alias))
        else:  # pragma: no cover
            raise ValueError(f"non-decomposable aggregate: {fn}")
    return (
        df.groupBy(F.col(key), salt)
        .agg(*phase1_aggs)
        .groupBy(key)
        .agg(*phase2_aggs)
    )


def replicated_skew_join(
    large: DataFrame,
    small: DataFrame,
    key: str,
    *,
    salt_n: int = 8,
    salt_source: str | Column | None = None,
) -> DataFrame:
    """Equi-join where ``large``'s key distribution is skewed: salt the
    large side deterministically, replicate the small side ×salt_n,
    join on (key, salt).  Result equals the plain join."""
    src = salt_source if salt_source is not None else F.monotonically_increasing_id()
    if isinstance(src, str):
        src = F.col(src)
    lg = large.withColumn("__salt", F.pmod(F.xxhash64(src), F.lit(salt_n)))
    sm = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1)).cast("array<bigint>"))
    )
    return lg.join(sm, [key, "__salt"]).drop("__salt")
