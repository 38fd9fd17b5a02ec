#!/usr/bin/env python
"""Dump plans for INTERNAL build-side frames into ``plans/<round>/``.

Most round-15 optimizations live in fixture-store BUILD paths (the
write side of build+serve composites), which the declared queries'
returned plans never show — they read the finished store.  This dumps
the build frames' own plans so before/after evidence exists for:

* ``internal_graph_build_exact`` — ``build_knn_graph`` (exact
  all-pairs arm) over the bounded fixture base: shows the scan width
  fix (round-robin Exchange ahead of the pair fan-out) and the join
  strategy.
* ``internal_zorder_quantile_z`` — the ``__z`` Morton-key projection
  (quantile bucketing, bits=8) over the events table: shows the
  expression-tree size (the rewrite collapses thousands of inlined
  per-bit boundary comparisons into one literal-array lookup per
  dimension).

    python scripts/dump_internal_plans.py before
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from webarchive_indexing_spark.session import get_session  # noqa: E402
from webarchive_indexing_spark.tables import load_table  # noqa: E402


def _dump(df, name: str, tag: str) -> None:
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    out_dir = os.path.join(ROOT, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r16"))
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{name}_{tag}.txt")
    with open(path, "w") as fh:
        fh.write(plan)
    print(f"wrote {path} ({len(plan.splitlines())} lines, {len(plan)} chars)")


def main() -> None:
    tag = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("webarchive-indexing-spark-internal-plans")
    spark.sparkContext.setLogLevel("ERROR")

    from webarchive_indexing_spark.operators.bucketing import zorder_key
    from webarchive_indexing_spark.operators.graph_ann import build_knn_graph

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") < 500).select("vec_id", "embedding")
    _dump(build_knn_graph(base, k_neighbors=12), "internal_graph_build_exact", tag)

    ev = load_table(spark, sf_dir, "events")
    zcol, _meta = zorder_key(
        ev, ["user_id", "value"], bits=8, bucketing="quantile"
    )
    _dump(
        ev.withColumn("__z", zcol).select("__z"),
        "internal_zorder_quantile_z",
        tag,
    )
    spark.stop()


if __name__ == "__main__":
    main()
