"""Local replica of the driver's DuckDB correctness gate.

Runs a registered query on Spark AND its oracle SQL on DuckDB over the
same parquet tables, then compares row-count + column names +
order-insensitive values, normalizing exactly the hazards the driver's
hash would see (column order, float repr, Decimal vs float, date vs
datetime).  Used by ``tests/test_oracle.py`` and ``scripts`` so a
mismatch is caught here, not in the driver's CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import datetime as _dt
import math
import os
from dataclasses import dataclass
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession

from .tables import TABLE_NAMES


def duckdb_connect(sf_dir: str):
    """DuckDB connection with the ten tables pre-registered as views
    (mirrors the driver's oracle setup)."""
    import duckdb

    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    """Normalize one value for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm(x)) for k, x in v.items()))
    if isinstance(v, bytes):
        return v.hex()
    return v


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str
    spark_rows: int = -1
    oracle_rows: int = -1


def compare(name: str, spark_df: DataFrame, con, sql: str) -> CompareResult:
    scols = sorted(spark_df.columns)
    srows = spark_df.collect()
    rel = con.sql(sql)
    ocols = sorted(rel.columns)
    orows = rel.fetchall()

    if [c.lower() for c in scols] != [c.lower() for c in ocols]:
        return CompareResult(
            name, False, f"schema mismatch: spark={scols} oracle={ocols}", len(srows), len(orows)
        )
    if len(srows) != len(orows):
        return CompareResult(
            name, False, f"row count: spark={len(srows)} oracle={len(orows)}", len(srows), len(orows)
        )

    from collections import Counter

    sidx = [spark_df.columns.index(c) for c in sorted(spark_df.columns, key=str.lower)]
    oidx = [rel.columns.index(c) for c in sorted(rel.columns, key=str.lower)]
    sset = Counter(tuple(_norm(r[i]) for i in sidx) for r in srows)
    oset = Counter(tuple(_norm(r[i]) for i in oidx) for r in orows)
    if sset != oset:
        diff_s = list((sset - oset).keys())[:3]
        diff_o = list((oset - sset).keys())[:3]
        return CompareResult(
            name,
            False,
            f"value mismatch; spark-only(3)={diff_s} oracle-only(3)={diff_o}",
            len(srows),
            len(orows),
        )
    return CompareResult(name, True, "ok", len(srows), len(orows))


def run_all(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> list[CompareResult]:
    from .registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    con = duckdb_connect(sf_dir)
    out: list[CompareResult] = []
    for q in REGISTRY.values():
        if names and q.name not in names:
            continue
        try:
            df = q.fn(spark, sf_dir)
            if q.oracle is None:
                n = df.count()
                out.append(CompareResult(q.name, n >= 0, f"rows-only: {n}", n, -1))
            else:
                out.append(compare(q.name, df, con, q.oracle))
        except Exception as e:  # surface, keep going
            out.append(CompareResult(q.name, False, f"EXCEPTION: {type(e).__name__}: {e}"))
    return out
