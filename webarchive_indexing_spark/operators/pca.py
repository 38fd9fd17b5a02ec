"""Power iteration for the leading principal direction of an
embedding corpus (SURVEY.md §2.11 tier C — the dimensionality-
reduction primitive: PCA whitening for SemDeDup-style pipelines, OPQ
rotation training, spectral probes of embedding health).

Spark-first shape, per iteration (the Lloyd/k-means discipline from
``operators/kmeans.py``):

1. **Projection is map-only.**  The current direction v (dim doubles)
   is a model artifact inlined as literals: per row the score
   ``s = round6(x·v)`` is a plain-double fold inside whole-stage
   codegen (6-dp rounding makes the fold engine-stable; drift ≪
   grain).
2. **The matrix-vector product shuffles one vector, not the corpus.**
   ``u_j = Σ_rows x_j·s`` is dim decimal aggregate columns with
   map-side partial aggregation — the exchange carries
   ``#partitions × dim`` decimals.
3. The driver normalizes u (decimal-exact norm, IEEE sqrt/divide —
   operations every engine reproduces bit-for-bit) and re-inlines it.

At 100 TB each iteration is one scan plus a kilobyte exchange; v0 is
the constant 1/√dim vector (exact in binary for dim=64), so the whole
run is deterministic with no RNG.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame

from ..queries.helpers import py_hround

_Q14 = Decimal("0.00000000000001")


def _round6_sql(chain: str) -> str:
    return f"(CAST(FLOOR(({chain}) * 1000000.0D + 0.5D) AS DOUBLE) / 1000000.0D)"


def _dot6_sql(vec_name: str, vals: list[float]) -> str:
    """Spark-SQL text of round6(vec·vals) as a higher-order fold (same
    left-to-right order as a flat chain; see
    similarity.sqdist6_sql_terms for why a fold and not a chain)."""
    lits = ",".join(f"{float(v)!r}D" for v in vals)
    fold = (
        f"aggregate(zip_with({vec_name}, array({lits}), "
        f"(x, y) -> CAST(x AS DOUBLE) * y), 0.0D, (a, x) -> a + x)"
    )
    return _round6_sql(fold)


def power_iteration_scores(
    embeddings: DataFrame,
    iters: int = 2,
    dim: int = 64,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Return ``(vec_id, pc1_score)``: every vector's projection onto
    the direction obtained after ``iters`` power-iteration steps of
    A^T A from v0 = 1/√dim·𝟙 (un-centered PCA — the Gram-matrix
    leading direction)."""
    assert dim & (dim - 1) == 0, "1/sqrt(dim) must be binary-exact"
    spark = embeddings.sparkSession
    v = [1.0 / math.sqrt(dim)] * dim

    for _ in range(iters - 1):
        s_sql = _dot6_sql(vec_col, v)
        proj = embeddings.selectExpr(f"{s_sql} AS s", vec_col)
        sums = ", ".join(
            f"SUM(CAST(CAST(element_at({vec_col}, {j}) AS DOUBLE) * s"
            f" AS DECIMAL(28,14))) AS u{j}"
            for j in range(1, dim + 1)
        )
        row = spark.sql(f"SELECT {sums} FROM {{p}}", p=proj).collect()[0]
        u = [float(row[f"u{j}"]) for j in range(1, dim + 1)]
        # norm: square in double (exact), quantize half-up to 14 dp
        # (the decimal cast both engines apply), exact sum, IEEE sqrt
        nrm = math.sqrt(
            float(sum(Decimal(x * x).quantize(_Q14, ROUND_HALF_UP) for x in u))
        )
        v = [x / nrm for x in u]

    return embeddings.selectExpr(
        id_col, f"{_dot6_sql(vec_col, v)} AS pc1_score"
    )


def sql_power_iteration_scores(iters: int = 2, dim: int = 64) -> str:
    """DuckDB twin — fully relational: the direction lives long-form
    as (j, vj) CTEs; ordered aggregates pin the fold order to the
    Spark expression's left-to-right chain."""
    from ..queries.helpers import sql_hround

    def dot6(v_cte: str) -> str:
        inner = (
            f"SUM(CAST(e.embedding[v.j] AS DOUBLE) * v.vj ORDER BY v.j)"
        )
        return sql_hround(inner, 6)

    parts = [
        f"dims AS (SELECT unnest(generate_series(1, {dim})) AS j)",
        f"v0 AS (SELECT j, CAST({1.0 / math.sqrt(dim)!r} AS DOUBLE) AS vj FROM dims)",
    ]
    prev = "v0"
    for it in range(1, iters):
        parts.append(
            f"""s{it} AS (
      SELECT e.vec_id, {dot6(prev)} AS s
      FROM embeddings e CROSS JOIN {prev} v GROUP BY e.vec_id
    )"""
        )
        parts.append(
            f"""u{it} AS (
      SELECT d.j,
             CAST(SUM(CAST(CAST(e.embedding[d.j] AS DOUBLE) * s{it}.s
                  AS DECIMAL(28,14))) AS DOUBLE) AS u
      FROM embeddings e
      JOIN s{it} ON e.vec_id = s{it}.vec_id
      CROSS JOIN dims d GROUP BY d.j
    )"""
        )
        parts.append(
            f"""n{it} AS (
      SELECT sqrt(CAST(SUM(CAST(u * u AS DECIMAL(28,14))) AS DOUBLE)) AS nrm
      FROM u{it}
    )"""
        )
        parts.append(
            f"v{it} AS (SELECT j, u / n{it}.nrm AS vj FROM u{it} CROSS JOIN n{it})"
        )
        prev = f"v{it}"
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT e.vec_id, {dot6(prev)} AS pc1_score
    FROM embeddings e CROSS JOIN {prev} v GROUP BY e.vec_id
    """
    )
