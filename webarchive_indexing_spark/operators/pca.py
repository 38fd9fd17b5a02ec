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


def power_iteration_direction(
    embeddings: DataFrame,
    iters: int = 2,
    dim: int = 64,
    *,
    vec_col: str = "embedding",
) -> list[float]:
    """The unit direction after ``iters`` power-iteration steps of
    A^T A from v0 = 1/√dim·𝟙 (un-centered PCA — the Gram-matrix
    leading direction), as driver floats.  Each step is one scan +
    a dim-decimals exchange; the decimal-exact update + IEEE
    normalize make the result bit-reconstructible relationally
    (``sql_power_iteration_ctes``)."""
    assert dim & (dim - 1) == 0, "1/sqrt(dim) must be binary-exact"
    spark = embeddings.sparkSession
    # each step's Gram-product scan evaluates dim decimal sums per
    # row; widen a narrow fixture scan so it runs at full width
    # (no-op on cluster-scale inputs — see queries.helpers)
    from ..queries.helpers import widen_narrow

    embeddings = widen_narrow(embeddings)
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
    return v


def power_iteration_scores(
    embeddings: DataFrame,
    iters: int = 2,
    dim: int = 64,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Return ``(vec_id, pc1_score)``: every vector's projection onto
    the ``power_iteration_direction`` unit vector."""
    v = power_iteration_direction(
        embeddings, iters, dim, vec_col=vec_col
    )
    return embeddings.selectExpr(
        id_col, f"{_dot6_sql(vec_col, v)} AS pc1_score"
    )


def sql_power_iteration_ctes(
    iters: int = 2, dim: int = 64, *, src: str = "embeddings",
    prefix: str = "",
) -> tuple[list[str], str]:
    """The relational power-iteration chain as reusable CTE parts
    plus the final (j, vj) direction CTE name — fully relational: the
    direction lives long-form, ordered aggregates pin the fold order
    to the Spark expression's left-to-right chain.  ``src`` names the
    source table (``main.embeddings`` lets a caller who later SHADOWS
    ``embeddings`` with a CTE keep training on the base rows)."""
    from ..queries.helpers import sql_hround

    def dot6(v_cte: str) -> str:
        inner = (
            f"SUM(CAST(e.embedding[v.j] AS DOUBLE) * v.vj ORDER BY v.j)"
        )
        return sql_hround(inner, 6)

    x = prefix
    parts = [
        f"{x}pdims AS (SELECT unnest(generate_series(1, {dim})) AS j)",
        f"{x}v0 AS (SELECT j, CAST({1.0 / math.sqrt(dim)!r} AS DOUBLE) AS vj FROM {x}pdims)",
    ]
    prev = f"{x}v0"
    for it in range(1, iters):
        parts.append(
            f"""{x}s{it} AS (
      SELECT e.vec_id, {dot6(prev)} AS s
      FROM {src} e CROSS JOIN {prev} v GROUP BY e.vec_id
    )"""
        )
        parts.append(
            f"""{x}u{it} AS (
      SELECT d.j,
             CAST(SUM(CAST(CAST(e.embedding[d.j] AS DOUBLE) * {x}s{it}.s
                  AS DECIMAL(28,14))) AS DOUBLE) AS u
      FROM {src} e
      JOIN {x}s{it} ON e.vec_id = {x}s{it}.vec_id
      CROSS JOIN {x}pdims d GROUP BY d.j
    )"""
        )
        parts.append(
            f"""{x}n{it} AS (
      SELECT sqrt(CAST(SUM(CAST(u * u AS DECIMAL(28,14))) AS DOUBLE)) AS nrm
      FROM {x}u{it}
    )"""
        )
        parts.append(
            f"{x}v{it} AS (SELECT j, u / {x}n{it}.nrm AS vj FROM {x}u{it} CROSS JOIN {x}n{it})"
        )
        prev = f"{x}v{it}"
    return parts, prev


def sql_power_iteration_scores(iters: int = 2, dim: int = 64) -> str:
    """DuckDB twin of ``power_iteration_scores`` over the CTE chain."""
    from ..queries.helpers import sql_hround

    parts, prev = sql_power_iteration_ctes(iters, dim)
    dot6 = sql_hround(
        "SUM(CAST(e.embedding[v.j] AS DOUBLE) * v.vj ORDER BY v.j)", 6
    )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT e.vec_id, {dot6} AS pc1_score
    FROM embeddings e CROSS JOIN {prev} v GROUP BY e.vec_id
    """
    )


# ---------------------------------------------------------------------------
# OPQ-style rotation (round 12): a Householder reflector trained from
# the power-iteration direction, applied before PQ so the dominant
# variance direction aligns with the first subspace — the energy-
# compaction preconditioning FAISS's OPQ pursues (Ge et al. 2013;
# FAISS OPQMatrix), reduced to the one-reflector form whose training
# is exactly the decimal-exact power iteration above and whose
# application is a map-side fold + zip_with (one scan, no shuffle).
# ---------------------------------------------------------------------------


def householder_rotation(v: list[float]) -> tuple[list[float], list[float]]:
    """``(u, k)`` of the reflector H = I − 2·u·uᵀ/(uᵀu) with
    ``u = v − e1``: H is orthogonal and maps the unit direction v onto
    e1, so H·x concentrates x's component along v into coordinate 1.
    ``k_j = 2·u_j / (uᵀu)`` is precomputed so application is
    ``x − (u·x)·k`` — one dot + one axpy per row.  uᵀu uses the same
    quantize-to-14dp decimal sum as the power-iteration norm, so the
    DuckDB twin (``sql_householder_rot_ctes``) reconstructs k bit for
    bit.  A v already equal to e1 yields the identity (k = 0)."""
    u = [v[0] - 1.0, *v[1:]]
    return u, householder_k(u)


def householder_k(u: list[float]) -> list[float]:
    """``k = 2·u / (uᵀu)`` with the decimal-exact uᵀu — split out so a
    store that persisted only ``u`` (pq.json ``opq_u``) re-derives the
    identical k on every append/probe."""
    uu = float(
        sum(Decimal(x * x).quantize(_Q14, ROUND_HALF_UP) for x in u)
    )
    if uu == 0.0:
        return [0.0] * len(u)
    return [2.0 * x / uu for x in u]


def py_rotate(q: list[float], u: list[float], k: list[float]) -> list[float]:
    """Driver-side H·q for a probe's query vector — the same op order
    as the executor expression (ascending-j fold rounded at 6dp, then
    per-coordinate x − s·k_j), so a rotated query ranks against the
    rotated store exactly as the relational twin does."""
    from ..queries.helpers import py_hround

    s = py_hround(sum(float(x) * w for x, w in zip(q, u)), 6)
    return [float(x) - s * kk for x, kk in zip(q, k)]


def rotate_frame(
    df: DataFrame, u: list[float], k: list[float], *, vec_col: str = "embedding"
) -> DataFrame:
    """Map-side H·x over a frame: the per-row projection s = round6
    (u·x) materializes once, then one zip_with applies the axpy —
    whole-stage codegen, no Python, no shuffle; every other column
    rides through untouched (attrs keep working on a rotated store)."""
    s_sql = _dot6_sql(f"`{vec_col}`", u)
    klits = ",".join(f"{float(x)!r}D" for x in k)
    rotated = (
        f"zip_with(transform(`{vec_col}`, x -> CAST(x AS DOUBLE)), "
        f"array({klits}), (x, kj) -> x - __s * kj) AS `{vec_col}`"
    )
    out_cols = [rotated if c == vec_col else f"`{c}`" for c in df.columns]
    return df.selectExpr("*", f"{s_sql} AS __s").selectExpr(*out_cols)


def sql_householder_rot_ctes(
    iters: int = 2, dim: int = 64, *, src: str = "embeddings",
    out: str = "rotemb", prefix: str = "",
) -> list[str]:
    """DuckDB CTE parts deriving the ROTATED corpus ``out`` =
    (vec_id, embedding) from ``src``: the power-iteration chain, the
    reflector u = v − e1, the decimal-exact uᵀu, k = 2u/uᵀu, the
    per-row 6dp projection, and the axpy — every step the exact
    relational twin of the driver/executor algebra above, so a
    rotated store's probes hash-match end to end.  The rotated
    corpus is MATERIALIZED: the IVFADC twin references it a dozen
    times (seed, per-iteration assignments of five Lloyd chains,
    query row, final assignment) and DuckDB's default CTE inlining
    would re-derive the whole rotation chain at every reference —
    measured OOM at the 10x perturbed sweep."""
    from ..queries.helpers import sql_hround

    x = prefix
    parts, vname = sql_power_iteration_ctes(
        iters, dim, src=src, prefix=prefix
    )
    sdot = sql_hround(
        "SUM(CAST(e.embedding[h.j] AS DOUBLE) * h.uj ORDER BY h.j)", 6
    )
    parts += [
        f"{x}hh AS (SELECT j, vj - CASE WHEN j = 1 THEN 1.0 ELSE 0.0 END AS uj "
        f"FROM {vname})",
        f"{x}huu AS (SELECT CAST(SUM(CAST(uj * uj AS DECIMAL(28,14))) AS DOUBLE)"
        f" AS uu FROM {x}hh)",
        f"{x}hk AS (SELECT j, 2.0 * uj / uu AS kj FROM {x}hh CROSS JOIN {x}huu)",
        f"""{x}hs AS (
      SELECT e.vec_id, {sdot} AS s
      FROM {src} e CROSS JOIN {x}hh h GROUP BY e.vec_id
    )""",
        f"""{out} AS MATERIALIZED (
      SELECT e.vec_id,
             list(CAST(e.embedding[d.j] AS DOUBLE) - {x}hs.s * {x}hk.kj
                  ORDER BY d.j) AS embedding
      FROM {src} e
      CROSS JOIN {x}pdims d
      JOIN {x}hs ON {x}hs.vec_id = e.vec_id
      JOIN {x}hk ON {x}hk.j = d.j
      GROUP BY e.vec_id
    )""",
    ]
    return parts
