#!/usr/bin/env python
"""Phase-level timing of the graph-store composites (guide §1): split
``write_knn_graph`` + serving into its component actions so the
per-composite seconds attribute to build / writes / entries / walk.

    python scripts/profile_graph_phases.py [--reps 2]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from webarchive_indexing_spark.session import get_session  # noqa: E402
from webarchive_indexing_spark.tables import load_table  # noqa: E402


def main() -> None:
    reps = 2
    if len(sys.argv) > 2 and sys.argv[1] == "--reps":
        reps = int(sys.argv[2])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("webarchive-indexing-spark-phases")
    spark.sparkContext.setLogLevel("ERROR")

    from webarchive_indexing_spark.operators.graph_ann import (
        _bucketed,
        _symmetrize,
        _top_degree_entries,
        build_knn_graph,
        graph_beam_topk,
        write_knn_graph,
    )
    from webarchive_indexing_spark.operators.similarity import (
        collect_query_vector,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    qv = collect_query_vector(emb, 77)

    def phase(name, fn):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        print(f"  {name:34s} {dt:7.3f}s", flush=True)
        return out

    for r in range(reps):
        print(f"--- rep {r} ---", flush=True)
        base = emb.filter(F.col("vec_id") < 500).select(
            "vec_id", "embedding"
        )
        spark.sparkContext.setJobDescription("phase:build_exact")
        g = phase(
            "build_knn_graph (noop sink)",
            lambda: build_knn_graph(base, k_neighbors=12)
            .write.format("noop").mode("overwrite").save(),
        )
        spark.sparkContext.setJobDescription("phase:symmetrize")
        phase(
            "build+symmetrize (noop sink)",
            lambda: _symmetrize(build_knn_graph(base, k_neighbors=12))
            .write.format("noop").mode("overwrite").save(),
        )
        out = tempfile.mkdtemp(prefix="phase_graph_")
        spark.sparkContext.setJobDescription("phase:write_store")
        phase(
            "write_knn_graph (full)",
            lambda: write_knn_graph(emb, out, k_neighbors=12, n_base=500),
        )
        spark.sparkContext.setJobDescription("phase:entries_only")
        phase(
            "_top_degree_entries (re-read)",
            lambda: _top_degree_entries(
                spark.read.parquet(os.path.join(out, "graph")), 4
            ),
        )
        spark.sparkContext.setJobDescription("phase:serve_walk")
        phase(
            "graph_beam_topk serve (noop)",
            lambda: graph_beam_topk(
                spark, out, qv, k=10, beam=10, hops=3, exclude_id=77
            ).write.format("noop").mode("overwrite").save(),
        )
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
