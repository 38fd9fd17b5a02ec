"""Spark ↔ DuckDB parity for every registered query — the local
replica of the driver's sf0.01 correctness gate (run here at sf0.001
for speed; the gate itself runs sf0.01)."""

from __future__ import annotations

import pytest

from webarchive_indexing_spark.oracle import duckdb_connect, compare
from webarchive_indexing_spark.registry import REGISTRY, _ensure_loaded

_ensure_loaded()


@pytest.fixture
def con(sf_dir):
    # fresh connection per test, mirroring oracle.run_all: a shared
    # connection's buffer/temp memory accumulates across ~268 heavy
    # oracles and OOMs mid-suite (observed on the round-14 NND DP
    # oracle, which passes in isolation and in fresh-process sweeps)
    c = duckdb_connect(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, sf_dir, con):
    q = REGISTRY[name]
    df = q.fn(spark, sf_dir)
    if q.oracle is None:
        assert df.count() >= 0, f"{name}: rows-only check failed"
        return
    res = compare(name, df, con, q.oracle)
    assert res.ok, f"{name}: {res.detail}"


def test_entry_smoke(spark):
    import __spark_entry__ as se

    df = se.entry(spark)
    assert df.count() > 0
    assert len(df.columns) > 0


def test_contract_shapes():
    import __spark_entry__ as se

    qs = se.queries()
    os_ = se.oracle_sql()
    assert qs, "queries() must not be empty"
    assert set(os_) <= set(qs), "oracle for unknown query"
