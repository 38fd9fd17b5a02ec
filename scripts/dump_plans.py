#!/usr/bin/env python
"""Dump ``.explain("formatted")`` for named registry queries into
``plans/<round>/<query>_<tag>.txt`` — the before/after plan evidence the
optimization round commits alongside the code.

    python scripts/dump_plans.py before q1_pricing_summary emb_graph_beam_topk
    python scripts/dump_plans.py after --all-touched   # reads names from stdin

Queries whose function bodies build fixture stores will execute those
builds while constructing the DataFrame — that is expected (the plan
captured is the final returned query's plan, the same one the bench's
noop sink executes).
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from webarchive_indexing_spark.registry import all_queries  # noqa: E402
from webarchive_indexing_spark.session import get_session  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    if not names:
        sys.exit("usage: dump_plans.py <tag> <query> [query ...]")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(ROOT, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r16"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session("webarchive-indexing-spark-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    for name in names:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
