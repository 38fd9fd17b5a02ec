"""Lloyd's k-means over embedding columns (SURVEY.md §2.11 L3/L4 —
the trainer that produces the IVF/PQ quantizers used by
``operators/similarity.py``).

The reference pipeline has no iterative operators at all; this is the
tier-C extension a training-data pipeline needs (cluster-balanced
sampling, IVF cell training, SemDeDup's clustering stage).

Spark-first shape, per Lloyd iteration:

1. **Assignment is map-only.**  The k×dim centroid matrix is a model
   artifact, not data: it is collected once (k rows) and inlined as
   literals, so nearest-centroid assignment is an ``array_min`` over k
   exact-decimal squared distances inside whole-stage codegen — no
   join, no shuffle, no Python.
2. **The update shuffles centroids, not vectors.**  Per-dimension sums
   are 64 decimal aggregate columns with map-side partial aggregation:
   the exchange carries ``#partitions × k`` rows of 64 decimals —
   kilobytes at any corpus size (same plan contract as
   ``emb_centroid_means``, plan-asserted in tests/test_plans.py).
3. The new centroids (k×dim doubles) come back to the driver and are
   re-inlined for the next iteration.  Driver math is limited to
   ``float(decimal_sum) / n`` — the exact operations the engines
   perform (`CAST(exact-decimal AS DOUBLE)` is correctly rounded, as
   is IEEE double division), so the driver-computed centroid literals
   are bit-identical to what a fully-relational engine derives.

At 100 TB each iteration is one scan + one kilobyte-scale exchange;
the number of *jobs* grows with iterations (inherent to Lloyd — each
update is a global barrier), not the per-iteration cost.

Determinism contract: distances accumulate in DECIMAL (see
``similarity._dec_sqdist``), argmin ties break toward the smaller
centroid id, and emitted means/inertia are rounded with ``hround`` —
so Spark and the DuckDB oracle agree bit-for-bit at any partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import DEC, _dec_sqdist, sql_dec_sqdist


def _lit_vec(vals: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vals])


def _nearest(vec_col: Column, cents: dict[int, list[float]]) -> Column:
    """struct(d, cid) of the nearest centroid — exact-decimal distance,
    ties to the smaller cid (matches the oracle's ORDER BY d, cid)."""
    cands = F.array(
        *[
            F.struct(
                _dec_sqdist(vec_col, _lit_vec(cv)).alias("d"),
                F.lit(cid).alias("cid"),
            )
            for cid, cv in sorted(cents.items())
        ]
    )
    return F.array_min(cands)


def kmeans_lloyd(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Run ``iters`` Lloyd iterations (assign → update, final iteration
    assign-only) starting from the first ``k`` vectors as centroids
    (deterministic seeding; production swaps in k-means‖ sampling —
    the plan shape per iteration is identical).

    Returns per-cluster convergence stats ``(cid, n_members,
    inertia)`` — the k-means objective per cluster after the final
    assignment, the value an operator pipeline checks for convergence.
    """
    from ..queries.helpers import hround

    rows = (
        embeddings.filter(F.col(id_col) < k).select(id_col, vec_col).collect()
    )
    cents: dict[int, list[float]] = {
        int(r[id_col]): [float(x) for x in r[vec_col]] for r in rows
    }

    xd = [
        F.element_at(F.col(vec_col), i).cast("double").cast(DEC).alias(f"x{i}")
        for i in range(1, dim + 1)
    ]
    for _ in range(iters - 1):
        assigned = embeddings.select(
            _nearest(F.col(vec_col), cents).getField("cid").alias("cid"), *xd
        )
        upd = assigned.groupBy("cid").agg(
            F.count(F.lit(1)).alias("n"),
            *[F.sum(f"x{i}").alias(f"s{i}") for i in range(1, dim + 1)],
        )
        cents = {
            int(r["cid"]): [float(r[f"s{i}"]) / int(r["n"]) for i in range(1, dim + 1)]
            for r in upd.collect()
        }

    final = embeddings.select(_nearest(F.col(vec_col), cents).alias("c"))
    return final.groupBy(F.col("c").getField("cid").alias("cid")).agg(
        F.count(F.lit(1)).alias("n_members"),
        hround(F.sum(F.col("c").getField("d")).cast("double"), 4).alias("inertia"),
    )


def sql_kmeans_lloyd(k: int = 8, iters: int = 2, dim: int = 64) -> str:
    """DuckDB twin of ``kmeans_lloyd`` — fully relational: assignment
    via window argmin over the vectors×centroids cross join, the
    centroid update via an exact-decimal per-dimension aggregate, each
    iteration one more CTE pair."""
    from ..queries.helpers import sql_hround

    d_from_vecs = sql_dec_sqdist("e.embedding", "c.cvec", 0, dim)

    parts = [
        f"c0 AS (SELECT vec_id AS cid, embedding AS cvec "
        f"FROM embeddings WHERE vec_id < {k})",
        f"dims AS (SELECT unnest(generate_series(1, {dim})) AS i)",
    ]
    prev = "c0"
    for it in range(1, iters):
        # assignment against a (cid, cvec) list-shaped centroid table
        parts.append(
            f"""a{it} AS (
      SELECT vec_id, embedding, cid FROM (
        SELECT e.vec_id, e.embedding, c.cid,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {d_from_vecs} ASC, c.cid ASC) AS rn
        FROM embeddings e CROSS JOIN {prev} c
      ) WHERE rn = 1
    )"""
        )
        # per-dimension exact-decimal mean -> (cid, i, cv) long form
        parts.append(
            f"""cl{it} AS (
      SELECT a.cid, d.i,
             CAST(SUM(CAST(CAST(a.embedding[d.i] AS DOUBLE) AS DECIMAL(28,14)))
                  AS DOUBLE) / COUNT(*) AS cv
      FROM a{it} a CROSS JOIN dims d GROUP BY a.cid, d.i
    )"""
        )
        prev = f"cl{it}"

    # final assignment against the long-form centroids: distance terms
    # per (vec, cid, dim), decimal-summed
    diff = "(CAST(e.embedding[c.i] AS DOUBLE) - c.cv)"
    parts.append(
        f"""dfin AS (
      SELECT e.vec_id, c.cid,
             SUM(CAST({diff} * {diff} AS DECIMAL(28,14))) AS d
      FROM embeddings e CROSS JOIN {prev} c
      GROUP BY e.vec_id, c.cid
    )"""
    )
    parts.append(
        """afin AS (
      SELECT vec_id, cid, d FROM (
        SELECT vec_id, cid, d,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d ASC, cid ASC) AS rn
        FROM dfin
      ) WHERE rn = 1
    )"""
    )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT cid, COUNT(*) AS n_members,
           {sql_hround('CAST(SUM(d) AS DOUBLE)', 4)} AS inertia
    FROM afin GROUP BY cid
    """
    )
