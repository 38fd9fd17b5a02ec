#!/usr/bin/env python
"""Dump before/after plans for the round-16 INTERNAL frames.

The round-16 changes live in per-action serving plans and build-side
scheduling, which the declared queries' returned plans never show.
This dumps:

* ``internal_beam_batch_score_{before,after}`` — one scoring action of
  the batch beam walk over a real graph store.  BEFORE reconstructs
  the round-15 shape verbatim (createDataFrame pairs + TWO broadcast
  joins against a (req, qvec) table); AFTER is the round-16 shape (the
  literal id→reqs map exploded against the same statically-pruned
  vector scan, query vectors as one array-of-arrays literal).  Both
  run from the same tree so the diff isolates exactly the change.
* ``internal_nnd_round_score_{before,after}`` — one NND round's
  scoring frame with broadcast joins DISABLED
  (autoBroadcastJoinThreshold=-1) to expose the cluster-scale shuffle
  shape: BEFORE joins src then dst (window re-exchanges by src),
  AFTER joins dst then src (window reuses the src join's hash
  partitioning — one fewer Exchange).

    python scripts/dump_r16_internal.py
"""

from __future__ import annotations

import os
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from webarchive_indexing_spark.session import get_session  # noqa: E402
from webarchive_indexing_spark.tables import load_table  # noqa: E402


def _dump(df, name: str) -> None:
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    out_dir = os.path.join(
        ROOT, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r16")
    )
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{name}.txt")
    with open(path, "w") as fh:
        fh.write(plan)
    print(f"wrote {path} ({len(plan.splitlines())} lines, {len(plan)} chars)")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session("webarchive-indexing-spark-r16-plans")
    spark.sparkContext.setLogLevel("ERROR")

    import posixpath

    from webarchive_indexing_spark.operators.graph_ann import (
        _pruned_vec_scan,
        write_knn_graph,
    )
    from webarchive_indexing_spark.operators.similarity import (
        cosine,
        cosine_from_parts,
        _dec_dot,
    )
    from webarchive_indexing_spark.queries.helpers import hround

    emb = load_table(spark, sf_dir, "embeddings")
    store = tempfile.mkdtemp(prefix="r16_plan_graph_")
    meta = write_knn_graph(emb, store, k_neighbors=12, n_base=500)
    nb = meta["n_buckets"]
    vecs = spark.read.parquet(posixpath.join(store, "vectors"))

    # one representative scoring action: 2 requests × 3 candidate ids
    qvs = [
        [float(r.embedding[i]) for i in range(64)]
        for r in emb.filter(F.col("vec_id").isin([77, 123]))
        .orderBy("vec_id")
        .collect()
    ]
    pairs = [(0, 3), (0, 7), (1, 7), (1, 150)]

    # ---- BEFORE (round-15 shape): pair frame + qvec table, both
    # broadcast-joined against the pruned scan, per action
    qdf = spark.createDataFrame(
        [(i, qv) for i, qv in enumerate(qvs)], "req int, qvec array<double>"
    )
    p = spark.createDataFrame(pairs, "req int, id bigint")
    vs = _pruned_vec_scan(vecs, [i for _, i in pairs], nb, "vec_id").select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("__v")
    )
    before = (
        vs.join(F.broadcast(p), "id")
        .join(F.broadcast(qdf), "req")
        .select(
            "req", "id", hround(cosine(F.col("__v"), F.col("qvec")), 6).alias("s")
        )
    )
    _dump(before, "internal_beam_batch_score_before")

    # ---- AFTER (round-16 shape): literal map + literal qvec array
    qarr_sql = "array(" + ",".join(
        "array(" + ",".join(f"{float(x)!r}D" for x in qv) + ")" for qv in qvs
    ) + ")"
    reqs_of: dict[int, list[int]] = {}
    for req, i in pairs:
        reqs_of.setdefault(int(i), []).append(int(req))
    req_map_sql = "map(" + ",".join(
        f"{i}L,array({','.join(str(r) for r in sorted(rs))})"
        for i, rs in sorted(reqs_of.items())
    ) + ")"
    after = (
        vs.select(
            "id",
            "__v",
            F.explode(F.element_at(F.expr(req_map_sql), F.col("id"))).alias("req"),
        ).select(
            "req",
            "id",
            hround(
                cosine(F.col("__v"), F.element_at(F.expr(qarr_sql), F.col("req") + 1)),
                6,
            ).alias("s"),
        )
    )
    _dump(after, "internal_beam_batch_score_after")

    # ---- NND round scoring join order, forced to shuffle joins so the
    # cluster-scale exchange count is visible
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        v = emb.filter(F.col("vec_id") < 200).select(
            F.col("vec_id").alias("__id"),
            F.col("embedding").alias("__v"),
            F.sqrt(
                _dec_dot(F.col("embedding"), F.col("embedding")).cast("double")
            ).alias("__nrm"),
        )
        a = v.select(
            F.col("__id").alias("src"), F.col("__v").alias("a_v"),
            F.col("__nrm").alias("a_nrm"),
        )
        b = v.select(
            F.col("__id").alias("dst"), F.col("__v").alias("b_v"),
            F.col("__nrm").alias("b_nrm"),
        )
        cand = v.select(F.col("__id").alias("src")).crossJoin(
            v.select(F.col("__id").alias("dst"))
        ).filter(F.col("src") != F.col("dst")).limit(1000)
        w = Window.partitionBy("src").orderBy(
            F.col("sim").desc(), F.col("dst").asc()
        )
        sim = hround(
            cosine_from_parts(
                F.col("a_v"), F.col("b_v"), F.col("a_nrm"), F.col("b_nrm")
            ),
            6,
        ).alias("sim")

        before_nnd = (
            cand.join(a, "src").join(b, "dst")
            .select("src", "dst", sim)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= 6)
            .drop("__rn")
        )
        _dump(before_nnd, "internal_nnd_round_score_before")

        after_nnd = (
            cand.join(b, "dst").join(a, "src")
            .select("src", "dst", sim)
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= 6)
            .drop("__rn")
        )
        _dump(after_nnd, "internal_nnd_round_score_after")
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    spark.stop()


if __name__ == "__main__":
    main()
