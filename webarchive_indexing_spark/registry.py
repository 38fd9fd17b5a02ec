"""Named-query registry backing ``__spark_entry__``.

Every operator from SURVEY.md §2 that is declared "done" registers a
named query here, optionally with an equivalent ANSI-SQL oracle string
that DuckDB runs on the same parquet tables (the driver's correctness
gate compares row-count + schema + order-insensitive value hash).

Authoring rules (see FIXTURES.md caveats):
* alias every computed column identically in the Spark plan and the
  oracle SQL — the driver sorts columns by NAME before hashing;
* double aggregates go through ``decimal`` so the reduction is exact
  and engine-order-independent (see ``queries.helpers``);
* never emit a raw nanosecond timestamp (Spark truncates parquet ns to
  µs; DuckDB keeps ns) — truncate or convert first.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    tier: str  # A = reference ETL op, B = cdx-server surface, C = LLM ext
    doc: str = field(default="")


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None, tier: str = "A"):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name, fn, oracle, tier, fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {q.name: q.fn for q in REGISTRY.values()}


def all_oracles() -> dict[str, str]:
    _ensure_loaded()
    return {q.name: q.oracle for q in REGISTRY.values() if q.oracle is not None}


_loaded = False


def _ensure_loaded() -> None:
    """Import the query modules (registration happens on import)."""
    global _loaded
    if _loaded:
        return
    from .queries import load_all  # noqa: PLC0415 (cycle: queries import registry)

    load_all()
    _loaded = True
