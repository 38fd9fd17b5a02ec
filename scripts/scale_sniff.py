#!/usr/bin/env python
"""Scaling sniff test: replicate an existing SF directory K times (with
id-space offsets so keys stay unique and dedup-injection ranges stay
clear) and re-run the headline bench against it.

Purpose: empirical evidence that the engine's plans scale ~linearly in
rows on the SAME core budget — a superlinear query here means a plan
that would fall over at 100 TB (quadratic join fan-out, driver
materialization, single-task stage).  Usage:

    python scripts/scale_sniff.py [K] [src_sf_dir] [out_dir] \
        [--perturb] [--focus q1,q2,...]

defaults: K=3, src=/root/testdata/sf0.1, out=/tmp/sf_sniff_x{K}
(suffixed "_p" with --perturb).  Writes the replicated parquet once
(skips if present), then prints one JSON line per run mirroring
bench.py's format.

--perturb makes the replicas NEAR-DUP-FREE: documents get every token
tagged with the replica id (cross-replica shingle Jaccard ~ 0) and
embeddings are circularly shifted by the replica id (cross-replica
cosine ~ 0 for uncorrelated dims), while the WITHIN-replica duplicate
structure is preserved (one transformation per replica).  On exact
replicas, the pair-generating queries (MinHash-LSH, SemDeDup, CC) are
entitled to superlinear OUTPUT — every replica really is a near-dup —
which can mask a genuine shuffle pathology.  Perturbed replicas pin
output ~linear, so a superlinear TIME ratio is unambiguous.

--focus runs only the named queries and reports, per query, the timed
ratio AND the output-row ratio side by side (base vs xK), plus
work_per_row = time_ratio / row_ratio — the number that separates
"doing K times the work for K times the answer" (fine) from "doing
K^2 the work" (a scale killer).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: per-table id columns to offset per replica (keeps keys unique and,
#: for documents, stays far above the +10000/+20000 dedup-injection
#: ranges that BASE_SQL derives from doc_id).
OFFSETS = {
    "documents": [("doc_id", 1_000_000)],
    "embeddings": [("vec_id", 1_000_000)],
    "events": [("event_id", 10_000_000), ("user_id", 1_000_000)],
    "orders": [("o_orderkey", 100_000_000), ("o_custkey", 10_000_000)],
    "lineitem": [("l_orderkey", 100_000_000)],
    "customer": [("c_custkey", 10_000_000)],
    "supplier": [("s_suppkey", 10_000_000)],
    "part": [("p_partkey", 10_000_000)],
    "nation": [],
    "region": [],
}


def _perturb_expr(table: str, col: str, i: int) -> str | None:
    """Replica-i rewrite of a content column (None = keep verbatim).
    The SAME rewrite applies to every row of replica i, so duplicate
    pairs WITHIN a replica stay duplicates; ACROSS replicas the
    shingle/vector spaces are disjoint."""
    if i == 0:
        return None
    if table == "documents" and col == "text":
        # tag every token: 'a b c' -> 'a r3qb r3qc' — shingles share
        # nothing across replicas
        return f"replace(text, ' ', ' r{i}q') AS text"
    if table == "embeddings" and col == "embedding":
        s = i % 64
        if s == 0:
            return None
        # circular shift: cosine(v, shift(v)) ~ 0 for uncorrelated dims
        return (
            f"list_concat(embedding[{s + 1}:], embedding[1:{s}]) AS embedding"
        )
    return None


def replicate(src: str, out: str, k: int, *, perturb: bool = False) -> None:
    import duckdb

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for name, offs in OFFSETS.items():
        dst = os.path.join(out, f"{name}.parquet")
        if os.path.exists(dst):
            continue
        src_p = os.path.join(src, f"{name}.parquet")
        if name in ("nation", "region"):
            # dimension tables are not replicated (broadcast dims stay
            # dim-sized at any fact scale)
            con.execute(f"COPY (SELECT * FROM '{src_p}') TO '{dst}' (FORMAT PARQUET)")
            continue
        base = duckdb.connect().execute(f"SELECT * FROM '{src_p}' LIMIT 0")
        names = [d[0] for d in base.description]
        selects = []
        for i in range(k):
            repl = {c: f"{c} + {i * step} AS {c}" for c, step in offs}
            if perturb:
                for c in names:
                    p = _perturb_expr(name, c, i)
                    if p is not None:
                        repl[c] = p
            cols = [repl.get(c, c) for c in names]
            selects.append(f"SELECT {', '.join(cols)} FROM '{src_p}'")
        union = " UNION ALL ".join(selects)
        con.execute(f"COPY ({union}) TO '{dst}' (FORMAT PARQUET)")


def run_focus(queries: list[str], src: str, out: str, k: int) -> None:
    """Per-query base-vs-xK comparison: timed noop-sink write (work)
    and output row count, so superlinear output can't masquerade as —
    or hide — superlinear work."""
    from bench import materialize

    from webarchive_indexing_spark.registry import all_queries
    from webarchive_indexing_spark.session import get_session

    spark = get_session("scale-sniff-focus")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    report: dict[str, dict] = {}
    for name in queries:
        fn = qs[name]
        m: dict[str, float] = {}
        for tag, d in (("base", src), ("xk", out)):
            materialize(fn(spark, d))  # warmup: JIT/codegen/footers
            t0 = time.perf_counter()
            materialize(fn(spark, d))
            m[f"{tag}_sec"] = round(time.perf_counter() - t0, 3)
            m[f"{tag}_rows"] = fn(spark, d).count()
        tr = m["xk_sec"] / m["base_sec"] if m["base_sec"] else float("nan")
        rr = m["xk_rows"] / m["base_rows"] if m["base_rows"] else float("nan")
        report[name] = {
            **m,
            "time_ratio": round(tr, 2),
            "row_ratio": round(rr, 2),
            # work per unit of output, normalized: ~<= K/row_ratio is
            # linear work; >> that is a pathology regardless of output
            "work_per_row_ratio": round(tr / rr, 2) if rr == rr and rr else None,
        }
    print(json.dumps({"metric": "scale_sniff_focus", "k": k, "queries": report}))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    perturb = "--perturb" in sys.argv
    focus: list[str] | None = None
    for a in sys.argv[1:]:
        if a.startswith("--focus"):
            focus = a.split("=", 1)[1].split(",") if "=" in a else None
    k = int(args[0]) if args else 3
    src = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    default_out = f"/tmp/sf_sniff_x{k}" + ("_p" if perturb else "")
    out = args[2] if len(args) > 2 else default_out
    replicate(src, out, k, perturb=perturb)
    if focus:
        run_focus(focus, src, out, k)
        return
    os.environ["SPARK_GRAFT_SF_DIR"] = out
    import bench

    bench.main()


if __name__ == "__main__":
    main()
