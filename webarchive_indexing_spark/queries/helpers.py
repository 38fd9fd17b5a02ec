"""Shared helpers for authoring oracle-parity queries.

Float determinism: summing doubles is reduction-order dependent, and
Spark and DuckDB reduce in different orders.  ``dsum``/``davg`` route
the per-row expression (itself deterministic IEEE-754 arithmetic,
identical in both engines) through ``DECIMAL(18,6)``, sum exactly,
round to 2 decimals and cast back to double — bit-identical on both
sides regardless of partitioning.  Use these for every aggregated
double; pass raw doubles through untouched (parquet bits match).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table

DEC = "decimal(18,6)"


def dsum(col: Column | str, alias: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.sum(c.cast(DEC)), 2).cast("double").alias(alias)


def hround(c: Column, n: int = 2) -> Column:
    """Half-up rounding as pure IEEE-754 double ops.

    Spark rounds doubles via BigDecimal's exact binary expansion;
    DuckDB via a multiply trick — they disagree at .xx5 boundaries.
    ``floor(x*10^n + 0.5)/10^n`` is the same bit-deterministic double
    arithmetic in both engines.  SQL twin: ``sql_hround``.
    """
    scale = float(10**n)
    return F.floor(c.cast("double") * scale + F.lit(0.5)).cast("double") / scale


def sql_hround(expr: str, n: int = 2) -> str:
    scale = float(10**n)
    return f"FLOOR(CAST(({expr}) AS DOUBLE) * {scale} + 0.5) / {scale}"


def py_hround(x: float, n: int = 2) -> float:
    """Python twin of hround/sql_hround — driver-side math that must
    reproduce an engine-side rounded value (e.g. IVF probe ranking)
    has to use the same floor(x·10ⁿ + 0.5)/10ⁿ formula."""
    import math

    scale = float(10**n)
    return math.floor(x * scale + 0.5) / scale


def davg(col: Column | str, alias: str) -> Column:
    # NOT avg(): Spark averages decimals exactly (half-up at .xx5),
    # DuckDB averages in double — instead both engines are given the
    # identical double (exact decimal sum → double / count) and round
    # it with identical IEEE ops (hround).
    c = F.col(col) if isinstance(col, str) else col
    return hround(F.sum(c.cast(DEC)).cast("double") / F.count(c), 2).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(ROUND(SUM(CAST({expr} AS DECIMAL(18,6))), 2) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    inner = f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) / COUNT({expr})"
    return f"{sql_hround(inner, 2)} AS {alias}"


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table (lazy parquet scan)."""
    return load_table(spark, sf_dir, name)


def widen(df: DataFrame) -> DataFrame:
    """Repartition to full parallelism ahead of a CPU-heavy map stage.

    A small parquet file scans as 1-3 partitions; a regex/hash-heavy
    projection then runs on 3 of 32 cores.  One cheap round-robin
    shuffle of the (small) input buys full-width compute — the
    standard fix when map cost dominates scan cost.  (At 100 TB the
    scan itself yields thousands of partitions and this becomes a
    no-op decision — apply only where profiling shows the mismatch.)
    """
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def widen_narrow(df: DataFrame) -> DataFrame:
    """``widen`` gated on the frame's ACTUAL planned width: a no-op
    when the plan already yields >= defaultParallelism partitions (a
    cluster-scale scan), a round-robin repartition when it is narrower
    (a small parquet fixture file plans as 1-3 partitions, so every
    downstream CPU-heavy stage — pair scoring, Lloyd assignment,
    PQ encode — would otherwise run on 1-3 of the session's cores).

    Scale-adaptive by construction (guide §2.5 "input skew", §1.2
    "fix the distributed algorithm first"): on a 100 TB corpus the
    scan is already thousands of partitions and this inserts NO
    exchange; the round-robin shuffle only ever moves a narrow
    frame's worth of rows.  Deterministic under retry because
    sortBeforeRepartition stays at its default.

    Limitations (use on SCAN-SHAPED inputs only): the gate probes
    ``df.rdd.getNumPartitions()``, which (a) compiles an extra
    physical plan per call — cheap for a scan, measurable on a wide
    tree — and (b) reports the STATIC pre-AQE width for plans that
    contain exchanges (e.g. the stock 200 shuffle partitions), so on
    such a frame the gate can wrongly no-op even though AQE coalesces
    it to 1-2 partitions at runtime.  Every call site in this repo
    feeds it a (filtered/projected) parquet scan, where the planned
    partition count is the real one."""
    sc = df.sparkSession.sparkContext
    n = sc.defaultParallelism
    if df.rdd.getNumPartitions() >= n:
        return df
    return df.repartition(n)
