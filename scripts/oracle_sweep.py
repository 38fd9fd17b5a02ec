#!/usr/bin/env python
"""Full-registry oracle sweep on perturbed K× replicas — the
generalization evidence run (BASELINE.md "Generalization check").

Replicates sf0.01 K× with --perturb semantics (scale_sniff.replicate:
offset id spaces, per-replica token tagging, rotated embeddings), then
runs EVERY registered Spark/DuckDB pair against the replica set and
records per-query verdict + wall seconds to a JSONL file.  RESUMABLE:
already-recorded queries are skipped, so a killed run continues where
it stopped.

    python scripts/oracle_sweep.py [K] [out_jsonl] [--only a,b,c]

defaults: K=3, out=/tmp/oracle_sweep_x{K}.jsonl, replica dir
/tmp/sf_sniff001_x{K}_p (built once, reused).  ``--only`` restricts
the sweep to the named queries (targeted verification of a round's
new entries without re-running the whole registry).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_sniff import replicate  # noqa: E402


def main() -> None:
    only: set[str] | None = None
    argv = list(sys.argv[1:])
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        del argv[i:i + 2]
    k = int(argv[0]) if len(argv) > 0 else 3
    out_path = argv[1] if len(argv) > 1 else f"/tmp/oracle_sweep_x{k}.jsonl"
    data_dir = f"/tmp/sf_sniff001_x{k}_p"
    replicate("/root/testdata/sf0.01", data_dir, k, perturb=True)

    done: set[str] = set()
    if os.path.exists(out_path):
        with open(out_path) as fh:
            for ln in fh:
                try:
                    done.add(json.loads(ln)["name"])
                except (ValueError, KeyError):
                    pass

    from webarchive_indexing_spark.oracle import compare, duckdb_connect
    from webarchive_indexing_spark.registry import REGISTRY, _ensure_loaded
    from webarchive_indexing_spark.session import get_session

    _ensure_loaded()
    spark = get_session(f"oracle-sweep-x{k}")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb_connect(data_dir)

    todo = [q for q in REGISTRY.values() if q.name not in done]
    if only is not None:
        todo = [q for q in todo if q.name in only]
    print(f"sweep x{k}: {len(done)} done, {len(todo)} to go", flush=True)
    with open(out_path, "a") as out:
        for q in todo:
            t0 = time.perf_counter()
            try:
                df = q.fn(spark, data_dir)
                if q.oracle is None:
                    rec = {"name": q.name, "ok": df.count() >= 0,
                           "detail": "rows-only"}
                else:
                    r = compare(q.name, df, con, q.oracle)
                    rec = {"name": q.name, "ok": r.ok, "detail": r.detail}
            except Exception as e:  # record, keep sweeping
                rec = {"name": q.name, "ok": False,
                       "detail": f"{type(e).__name__}: {e}"[:300]}
            rec["sec"] = round(time.perf_counter() - t0, 2)
            out.write(json.dumps(rec) + "\n")
            out.flush()
            print(("OK " if rec["ok"] else "FAIL"), q.name, rec["sec"], flush=True)
    with open(out_path) as fh:
        recs = [json.loads(ln) for ln in fh]
    fails = [r for r in recs if not r["ok"]]
    print(f"TOTAL {len(recs)} queries, {len(fails)} failures, "
          f"{round(sum(r['sec'] for r in recs), 1)} s", flush=True)
    for r in fails:
        print("FAIL", r["name"], r["detail"], flush=True)


if __name__ == "__main__":
    main()
