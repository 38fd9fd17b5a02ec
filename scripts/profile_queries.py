#!/usr/bin/env python
"""Time individual registry queries with the noop sink (guide §1.4).

    python scripts/profile_queries.py emb_graph_beam_topk emb_ivfpq_opq_refined
    python scripts/profile_queries.py --reps 3 parquet_index_zorder_box

Each query is constructed AND materialized inside the timed region —
the same methodology as bench.py (fixture-store builds count, as they
do there).  One untimed warmup of the first query primes the JVM.
Prints one line per (query, rep) and a JSON summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from webarchive_indexing_spark.registry import all_queries  # noqa: E402
from webarchive_indexing_spark.session import get_session  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    reps = 1
    if args and args[0] == "--reps":
        reps = int(args[1])
        args = args[2:]
    if not args:
        sys.exit("usage: profile_queries.py [--reps N] <query> [query ...]")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("webarchive-indexing-spark-profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    # warmup: run every requested query once untimed (bench.py protocol)
    for name in args:
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    import gc

    gc.collect()
    out: dict[str, list[float]] = {}
    for name in args:
        out[name] = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"timed:{name}:{r}")
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = round(time.perf_counter() - t0, 3)
            out[name].append(dt)
            print(f"{name} rep{r}: {dt}s", flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
