"""Graph ANN (round 13): store roundtrip, walk semantics, and the
recall pin vs brute force and IVF-flat at comparable candidate
budget (the round-12 verdict's build-or-bury condition)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from webarchive_indexing_spark.operators.graph_ann import (
    build_knn_graph,
    graph_beam_topk,
    read_graph_meta,
    write_knn_graph,
)
from webarchive_indexing_spark.operators.similarity import (
    collect_query_vector,
    cosine_topk,
    ivf_topk,
)
from webarchive_indexing_spark.tables import load_table


@pytest.fixture(scope="module")
def store(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("graph_store"))
    emb = load_table(spark, sf_dir, "embeddings")
    write_knn_graph(emb, out, k_neighbors=12, n_base=500)
    return out


def test_store_roundtrip_and_symmetry(spark, sf_dir, store):
    meta = read_graph_meta(store)
    assert meta["k_neighbors"] == 12 and meta["symmetric"] is True
    g = spark.read.parquet(store + "/graph")
    n_nodes = spark.read.parquet(store + "/vectors").count()
    # every node has >= k out-edges (symmetrization only adds), and
    # the edge set is closed under reversal
    degs = g.groupBy("src").count()
    assert degs.filter(F.col("count") < 12).count() == 0
    assert degs.count() == n_nodes
    rev = g.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "sim"
    )
    assert g.unionByName(rev).distinct().count() == g.count()


def test_directed_knn_graph_degree_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < 50
    )
    g = build_knn_graph(emb, k_neighbors=5)
    per = g.groupBy("src").count().collect()
    assert len(per) == 50 and all(r["count"] == 5 for r in per)


def test_beam_walk_matches_visited_semantics(spark, sf_dir, store):
    """The walk's answer is top-k of the VISITED set — so growing k
    within the visited size only extends the tail, never reorders the
    head, and every hit is a real corpus neighbor of the query."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = collect_query_vector(emb, 77)
    top5 = graph_beam_topk(
        spark, store, qv, k=5, beam=10, hops=3,
        entries=(0, 150, 300, 450), exclude_id=77,
    ).collect()
    top10 = graph_beam_topk(
        spark, store, qv, k=10, beam=10, hops=3,
        entries=(0, 150, 300, 450), exclude_id=77,
    ).collect()
    assert [r.vec_id for r in top10][:5] == [r.vec_id for r in top5]
    assert all(r.vec_id != 77 for r in top10)
    sims = [r.cos_sim for r in top10]
    assert sims == sorted(sims, reverse=True)


def test_recall_pin_vs_brute_and_ivf(spark, sf_dir, store):
    """The build-or-bury condition: at a comparable candidate budget
    (beam walk scores <= |entries| + H*B*degree ~ a few hundred of
    the 500-vector base; IVF-flat at nprobe=3 of 8 cells scans ~190),
    the graph walk's recall@10 vs exact brute force must beat the
    IVF-flat envelope — the reason production vector stores serve
    from graphs.  Fixture-deterministic, so the pin is exact."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") < 500)
    beam_r, ivf_r = [], []
    for q in (77, 123, 321, 456):
        qv = collect_query_vector(emb, q)
        brute = {
            r.vec_id for r in cosine_topk(base, q, k=10).collect()
        }
        beam = {
            r.vec_id
            for r in graph_beam_topk(
                spark, store, qv, k=10, beam=10, hops=3,
                entries=(0, 150, 300, 450), exclude_id=q,
            ).collect()
        }
        ivf = {
            r.vec_id
            for r in ivf_topk(base, q, k=10, n_cents=8, nprobe=3).collect()
        }
        beam_r.append(len(beam & brute) / 10)
        ivf_r.append(len(ivf & brute) / 10)
    mean_beam = sum(beam_r) / len(beam_r)
    mean_ivf = sum(ivf_r) / len(ivf_r)
    assert mean_beam >= 0.8, (beam_r, ivf_r)
    assert mean_beam > mean_ivf, (beam_r, ivf_r)


def test_walk_plan_has_no_cartesian(spark, sf_dir, store):
    emb = load_table(spark, sf_dir, "embeddings")
    qv = collect_query_vector(emb, 77)
    df = graph_beam_topk(spark, store, qv, exclude_id=77)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
