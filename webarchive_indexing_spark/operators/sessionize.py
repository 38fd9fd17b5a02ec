"""Gap-based sessionization (SURVEY.md §2.9 ST3 batch equivalent).

A session ends when the gap to the next event of the same key exceeds
``gap``.  Batch formulation: lag → new-session flag → running sum =
session id.  Two stacked windows over the SAME partitioning — one
shuffle total (Catalyst reuses the exchange).  The streaming twin is
``F.session_window`` (streaming/ module).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int,
    session_col: str = "session_id",
    tiebreak: tuple[str, ...] = (),
) -> DataFrame:
    """Assign 1-based per-key session ids by inactivity gap.

    ``tiebreak`` columns extend the window's ORDER BY after ``ts`` so
    that rows with identical timestamps have a deterministic total
    order (gap flags don't care about the tie order, but the running
    SUM that numbers sessions does when a tie straddles a boundary)."""
    w = Window.partitionBy(key).orderBy(
        F.col(ts).asc(), *[F.col(c).asc() for c in tiebreak]
    )
    us = F.unix_micros(F.col(ts))
    prev = F.lag(us).over(w)
    new_session = F.when(
        prev.isNull() | ((us - prev) > gap_seconds * 1_000_000), 1
    ).otherwise(0)
    return df.withColumn(
        session_col,
        F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
