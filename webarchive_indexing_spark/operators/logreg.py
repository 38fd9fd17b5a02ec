"""Relational logistic-regression training (SURVEY.md §2.11 L5 —
the TRAINED upgrade of ``quality_linear_classifier``'s fixed-weight
scoring; north-star: the fastText/linear quality models CCNet, DCLM
and FineWeb-Edu train over their corpora).

Shape = ``lloyd_train`` transplanted to a GLM: per gradient step, ONE
scan computes the d-dimensional gradient as exact-decimal aggregate
columns (map-side partial agg, the exchange carries ``#partitions``
rows of d decimals — kilobytes at any corpus size), the d weights
come back to the driver, update, and re-inline as literals for the
next step.  At 100 TB each step is one pass over the feature columns;
iteration count is the bounded knob, exactly like Lloyd's rounds.

Determinism contract (how the DuckDB oracle re-derives the SAME
weights bit for bit):

* features are EXACT decimals built from integer arithmetic
  (``(10^s · a) div b`` scaled by a decimal literal — no float op);
* the link is the RATIONAL fast sigmoid ``σ̂(z) = 0.5 +
  z / (2·(1+|z|))`` — same monotone S-shape as the logistic CDF but
  computed with only +, *, /, abs, all CORRECTLY-ROUNDED IEEE ops
  that are bit-identical in every engine, where ``exp`` is only
  1-ulp-accurate and may differ across libm implementations (the one
  cross-engine hazard a 6-dp rounding cannot fully absorb once it
  feeds further training steps); rounded to 6 dp;
* per-row gradient terms ``x_j · (y − p)`` multiply exact decimals
  (p is the 6-dp value re-cast to DECIMAL) and SUM exactly;
* the driver update ``w_j ← hround(w_j + lr · (double(S_j)/n), 6)``
  uses only correctly-rounded ops, mirrored verbatim in the oracle's
  per-iteration CTE.

Expressions are built as SQL STRINGS and parsed once per step
(py4j-cheap; the same discipline as ``lloyd_train``), and the string
fragments are dialect-shared between Spark and DuckDB so the twins
cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..queries.helpers import py_hround, sql_hround


def fast_sigmoid6_sql(z_sql: str) -> str:
    """σ̂(z) rounded to 6 dp — dialect-shared (Spark SQL ≡ DuckDB)."""
    zd = f"CAST(({z_sql}) AS DOUBLE)"
    return sql_hround(f"0.5 + {zd} / (2.0 * (1.0 + ABS({zd})))", 6)


def _w_lit(w: float) -> str:
    return f"CAST({w:.6f} AS DECIMAL(18,6))"


def z_sql(weights: list[float], xcols: list[str]) -> str:
    """Exact-decimal dot product of 6-dp weight literals with decimal
    feature columns."""
    return " + ".join(
        f"{_w_lit(w)} * {x}" for w, x in zip(weights, xcols)
    )


def grad_terms_sql(p_sql: str, xcols: list[str], label: str) -> list[str]:
    """Per-feature exact-decimal gradient sums ``Σ x_j·(y − p)``."""
    resid = f"CAST({label} AS DECIMAL(18,6)) - CAST(({p_sql}) AS DECIMAL(18,6))"
    return [
        f"SUM({x} * ({resid})) AS g{j}" for j, x in enumerate(xcols)
    ]


def logistic_train(
    feat: DataFrame,
    xcols: list[str],
    label: str,
    *,
    iters: int = 3,
    lr: float = 2.0,
) -> list[float]:
    """``iters - 1`` full-batch gradient steps from w = 0; returns the
    trained weights (oracle-reconstructible floats — see the module
    contract).  ``feat`` must carry exact-decimal feature columns and
    an integer 0/1 ``label`` column."""
    w = [0.0] * len(xcols)
    for _ in range(iters - 1):
        p = fast_sigmoid6_sql(z_sql(w, xcols))
        row = feat.selectExpr(
            *grad_terms_sql(p, xcols, label), "COUNT(1) AS n"
        ).collect()[0]
        n = int(row["n"])
        w = [
            py_hround(w[j] + lr * (float(row[f"g{j}"]) / n), 6)
            for j in range(len(xcols))
        ]
    return w


def sql_logistic_ctes(
    feat_src: str,
    xcols: list[str],
    label: str,
    *,
    iters: int = 3,
    lr: float = 2.0,
    prefix: str = "lg",
) -> tuple[list[str], str]:
    """DuckDB twin of ``logistic_train``: per step, a gradient CTE
    over ``feat_src`` (features cross-joined with the previous 1-row
    weight CTE) and a 1-row weight-update CTE applying the identical
    ``hround(w + lr·(double(S)/n), 6)`` chain.  Returns the CTE list
    and the final weight CTE's name (columns ``w0..w{d-1}``, typed
    DECIMAL(18,6) like the Spark literals)."""
    d = len(xcols)
    parts: list[str] = []
    prev_w: str | None = None
    for it in range(1, iters):
        if prev_w is None:
            zs = z_sql([0.0] * d, [f"f.{x}" for x in xcols])
            src = f"{feat_src} f"
        else:
            zs = " + ".join(
                f"w.w{j} * f.{x}" for j, x in enumerate(xcols)
            )
            src = f"{feat_src} f CROSS JOIN {prev_w} w"
        p = fast_sigmoid6_sql(zs)
        gsel = ", ".join(grad_terms_sql(p, [f"f.{x}" for x in xcols], f"f.{label}"))
        # MATERIALIZED: each w{it} is referenced twice (next step's z
        # and its own update) — inlined CTEs would expand the chain
        # 2^iters-fold (observed: DuckDB re-opening the parquet file
        # thousands of times at iters=17)
        parts.append(
            f"{prefix}g{it} AS MATERIALIZED (SELECT {gsel}, COUNT(*) AS n FROM {src})"
        )
        upd = []
        for j in range(d):
            base = "0.000000" if prev_w is None else f"w.w{j}"
            step = sql_hround(
                f"CAST({base} AS DOUBLE) + {lr} * (CAST(g.g{j} AS DOUBLE) / g.n)",
                6,
            )
            upd.append(f"CAST({step} AS DECIMAL(18,6)) AS w{j}")
        wsrc = (
            f"{prefix}g{it} g"
            if prev_w is None
            else f"{prefix}g{it} g CROSS JOIN {prev_w} w"
        )
        parts.append(
            f"{prefix}w{it} AS MATERIALIZED (SELECT {', '.join(upd)} FROM {wsrc})"
        )
        prev_w = f"{prefix}w{it}"
    return parts, prev_w or ""
