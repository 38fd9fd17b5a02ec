#!/usr/bin/env python
"""Scaling sniff test: replicate an existing SF directory K times (with
id-space offsets so keys stay unique and dedup-injection ranges stay
clear) and re-run the headline bench against it.

Purpose: empirical evidence that the engine's plans scale ~linearly in
rows on the SAME core budget — a superlinear query here means a plan
that would fall over at 100 TB (quadratic join fan-out, driver
materialization, single-task stage).  Usage:

    python scripts/scale_sniff.py [K] [src_sf_dir] [out_dir]

defaults: K=3, src=/root/testdata/sf0.1, out=/tmp/sf_sniff_x{K}.
Writes the replicated parquet once (skips if present), then prints one
JSON line per run mirroring bench.py's format.
"""

from __future__ import annotations

import os
import sys

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


def replicate(src: str, out: str, k: int) -> None:
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
        selects = []
        for i in range(k):
            cols = ["*"] if not offs else None
            if offs:
                repl = {c: f"{c} + {i * step} AS {c}" for c, step in offs}
                base = duckdb.connect().execute(f"SELECT * FROM '{src_p}' LIMIT 0")
                names = [d[0] for d in base.description]
                cols = [repl.get(c, c) for c in names]
            selects.append(f"SELECT {', '.join(cols)} FROM '{src_p}'")
        union = " UNION ALL ".join(selects)
        con.execute(f"COPY ({union}) TO '{dst}' (FORMAT PARQUET)")


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/sf_sniff_x{k}"
    replicate(src, out, k)
    os.environ["SPARK_GRAFT_SF_DIR"] = out
    import bench

    bench.main()


if __name__ == "__main__":
    main()
