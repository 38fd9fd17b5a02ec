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


#: Queries whose SEMANTICS changed since their last green verdict —
#: surface them first so the next CORRECTNESS round records the change.
#: Round 12: none forced — the one behavior change (cdx_query
#: closest= gains the batch path's (digest, offset) tiebreak) only
#: matters at exact |Δts|+timestamp ties, which no fixture capture
#: set contains (proven: cdx_timegate / cdx_closest / the timemap
#: family re-passed sf0.001 parity AND fresh 3×/10× perturbed sweeps
#: under the new ordering), and the affected cdx_timegate /
#: cdx_timemap_* queries lead the window anyway as part of the
#: r7-stale cohort.  The 8 new round-12 queries sort first as
#: never-verified.
_VERIFY_EARLY: tuple[str, ...] = ()


def _verified_rounds() -> dict[str, int]:
    """name → latest round with a green driver verdict, parsed from the
    CORRECTNESS_r*.json files the driver drops at the repo root.  The
    driver's gate only checks the first N registered queries, so
    ordering by staleness rotates coverage automatically — no
    hand-tuned module map to fall out of date."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out: dict[str, int] = {}
    for p in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)", os.path.basename(p))
        rnd = int(m.group(1)) if m else 0
        try:
            with open(p) as f:
                data = json.load(f)
        except (OSError, ValueError):  # pragma: no cover - malformed drop
            continue
        for name, rec in data.items():
            if not isinstance(rec, dict):
                continue
            ok = bool(rec.get("hash_match")) or (
                rec.get("err") == "no_oracle" and rec.get("spark_rows") is not None
            )
            if ok:
                out[name] = max(out.get(name, 0), rnd)
    return out


def _ordered() -> list[Query]:
    _ensure_loaded()
    verified = _verified_rounds()

    def key(iq):
        i, q = iq
        if q.name in _VERIFY_EARLY:
            return (0, _VERIFY_EARLY.index(q.name), i)
        # never-verified (round 0) first, then stalest verdicts
        return (1, verified.get(q.name, 0), i)

    return [q for _, q in sorted(enumerate(REGISTRY.values()), key=key)]


def all_queries() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in _ordered()}


def all_oracles() -> dict[str, str]:
    return {q.name: q.oracle for q in _ordered() if q.oracle is not None}


_loaded = False


def _ensure_loaded() -> None:
    """Import the query modules (registration happens on import)."""
    global _loaded
    if _loaded:
        return
    from .queries import load_all  # noqa: PLC0415 (cycle: queries import registry)

    load_all()
    _loaded = True
