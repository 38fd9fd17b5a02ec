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
    assert meta["n_buckets"] >= 1 and meta["build"] == "exact"
    g = spark.read.parquet(store + "/graph").select("src", "dst", "sim")
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


def test_store_layout_is_bucket_partitioned(spark, sf_dir, store):
    """The scale contract: edges land under src_bucket= hive
    directories (the frontier-pruned scan's partition key) and the
    bucket value matches src % n_buckets; same for vectors/."""
    import os

    nb = read_graph_meta(store)["n_buckets"]
    gdirs = [
        d for d in os.listdir(store + "/graph")
        if d.startswith("src_bucket=")
    ]
    assert 1 < len(gdirs) <= nb
    g = spark.read.parquet(store + "/graph")
    assert g.filter(
        F.col("src_bucket") != F.pmod(F.col("src"), F.lit(nb))
    ).count() == 0
    v = spark.read.parquet(store + "/vectors")
    assert v.filter(
        F.col("id_bucket") != F.pmod(F.col("vec_id"), F.lit(nb))
    ).count() == 0


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
    qids = [77, 123, 321, 456]
    # ONE batched walk instead of a per-query loop: the batch walk's
    # per-request rows equal the per-request graph_beam_topk answers
    # (the emb_graph_beam_batch oracle is exactly that UNION ALL), and
    # the loop was 4 walks x 7 driver actions of suite wall
    from webarchive_indexing_spark.operators.graph_ann import (
        graph_beam_batch_topk,
    )

    vmap = {
        int(r.vec_id): [float(x) for x in r.embedding]
        for r in base.filter(F.col("vec_id").isin(qids)).collect()
    }
    beams: dict[int, set[int]] = {q: set() for q in qids}
    for r in graph_beam_batch_topk(
        spark, store, [vmap[q] for q in qids], k=10, beam=10, hops=3,
        entries=(0, 150, 300, 450), exclude_ids=qids,
    ).collect():
        beams[qids[int(r.request_no)]].add(int(r.vec_id))
    beam_r, ivf_r = [], []
    for q in qids:
        brute = {
            r.vec_id for r in cosine_topk(base, q, k=10).collect()
        }
        ivf = {
            r.vec_id
            for r in ivf_topk(base, q, k=10, n_cents=8, nprobe=3).collect()
        }
        beam_r.append(len(beams[q] & brute) / 10)
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


def test_grid_build_is_exact_thresholded_and_recall_envelope(
    spark, sf_dir, store, tmp_path_factory
):
    """Round-14 verdict task 1: the grid candidate generator is
    LOSSLESS for the thresholded contract (edge set identical to the
    exact build filtered at min_sim), and the beam walk over the
    thresholded graph stays within a 0.1 recall envelope of the
    exact-build walk (measured 0.825 vs 0.875 on the fixture)."""
    from webarchive_indexing_spark.operators.graph_ann import (
        grid_threshold_candidates,
    )

    T = 0.24
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") < 500).select("vec_id", "embedding")
    g_grid = build_knn_graph(
        base, k_neighbors=12,
        candidates=grid_threshold_candidates(T), min_sim=T,
    )
    g_ref = build_knn_graph(base, k_neighbors=12, min_sim=T)
    assert g_grid.exceptAll(g_ref).count() == 0
    assert g_ref.exceptAll(g_grid).count() == 0

    out = str(tmp_path_factory.mktemp("grid_store"))
    write_knn_graph(
        emb, out, k_neighbors=12, n_base=500,
        candidates=grid_threshold_candidates(T), min_sim=T,
    )
    diffs = []
    for q in (77, 123, 321, 456):
        qv = collect_query_vector(emb, q)
        brute = {r.vec_id for r in cosine_topk(
            emb.filter(F.col("vec_id") < 500), q, k=10).collect()}
        kw = dict(k=10, beam=10, hops=3, entries=(0, 150, 300, 450),
                  exclude_id=q)
        ex = {r.vec_id for r in graph_beam_topk(spark, store, qv, **kw).collect()}
        gr = {r.vec_id for r in graph_beam_topk(spark, out, qv, **kw).collect()}
        diffs.append((len(gr & brute) - len(ex & brute)) / 10)
    assert sum(diffs) / len(diffs) >= -0.1, diffs


def test_nn_descent_converges_per_round(spark, sf_dir):
    """The NND invariant that holds on ANY geometry: each bounded
    round strictly improves edge-set recall vs the exact kNN graph
    (uniform fixture vectors are the documented worst case for the
    absolute level, so the pin is the monotone per-round gain)."""
    from webarchive_indexing_spark.operators.graph_ann import (
        nn_descent_knn_graph,
    )

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 200)
        .select("vec_id", "embedding")
    )
    exact = build_knn_graph(emb, k_neighbors=6)
    n_exact = exact.count()
    recalls = []
    for rounds in (0, 1, 2):
        g = nn_descent_knn_graph(
            emb, k_neighbors=6, rounds=rounds, stride=37, n_base=200
        )
        hits = g.select("src", "dst").intersect(
            exact.select("src", "dst")
        ).count()
        recalls.append(hits / n_exact)
    assert recalls[0] < recalls[1] < recalls[2], recalls


def test_hash_ring_seed_arbitrary_id_domain(spark, sf_dir):
    """Round 15: the hash-ring seed needs NO id-domain assumption —
    re-keying the corpus to sparse ids yields a valid seed (out-degree
    exactly k for n >> k, all endpoints in-domain, deterministic), and
    NND convergence under it matches the arithmetic ring's monotone
    per-round gain."""
    from webarchive_indexing_spark.operators.graph_ann import (
        hash_ring_seed,
        nn_descent_knn_graph,
    )

    emb = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 200)
        .select(
            (F.col("vec_id") * 17 + 1000).alias("vec_id"), "embedding"
        )
    )
    seed = hash_ring_seed(emb.select("vec_id"), k_neighbors=6)
    ids = {r.vec_id for r in emb.select("vec_id").collect()}
    rows = seed.collect()
    assert {r.src for r in rows} == ids
    assert {r.dst for r in rows} <= ids
    from collections import Counter

    deg = Counter(r.src for r in rows)
    assert set(deg.values()) == {6}, sorted(deg.items())[:3]
    # deterministic across invocations (hash order, not RNG state)
    again = {(r.src, r.dst) for r in hash_ring_seed(
        emb.select("vec_id"), k_neighbors=6
    ).collect()}
    assert again == {(r.src, r.dst) for r in rows}

    exact = build_knn_graph(emb, k_neighbors=6)
    n_exact = exact.count()
    recalls = []
    for rounds in (0, 1, 2):
        g = nn_descent_knn_graph(
            emb, k_neighbors=6, rounds=rounds, seed="hash_ring"
        )
        hits = g.select("src", "dst").intersect(
            exact.select("src", "dst")
        ).count()
        recalls.append(hits / n_exact)
    assert recalls[0] < recalls[1] < recalls[2], recalls


def test_persisted_entry_points(spark, sf_dir, store, tmp_path_factory):
    """Round 15: the store persists ring-stratified top-degree entry
    points at build time; ``entries=None`` serving reads them, an old
    store without them fails with the remedy, and compaction refreshes
    them after purging a tombstoned entry node."""
    import json
    import posixpath

    from webarchive_indexing_spark.operators.graph_ann import (
        META,
        compact_knn_graph,
        delete_from_knn_graph,
    )
    from webarchive_indexing_spark.tables import load_table as _lt

    meta = read_graph_meta(store)
    ents = meta["entries"]
    assert len(ents) == 4 and len(set(ents)) == 4
    emb = _lt(spark, sf_dir, "embeddings")
    qv = collect_query_vector(emb, 77)
    stored = graph_beam_topk(spark, store, qv, exclude_id=77).collect()
    explicit = graph_beam_topk(
        spark, store, qv, entries=tuple(ents), exclude_id=77
    ).collect()
    assert [tuple(r) for r in stored] == [tuple(r) for r in explicit]

    # pre-r15 store: no entries in meta → loud remedy, not a guess
    legacy = str(tmp_path_factory.mktemp("legacy_store"))
    import shutil

    shutil.copytree(store, legacy, dirs_exist_ok=True)
    m2 = dict(meta)
    m2.pop("entries")
    with open(posixpath.join(legacy, META), "w") as fh:
        json.dump(m2, fh)
    with pytest.raises(ValueError, match="persisted entry points"):
        graph_beam_topk(spark, legacy, qv, exclude_id=77)

    # compaction refreshes entries: tombstone one entry node, compact,
    # and the purged id must leave the persisted set
    victim = ents[0]
    mutable = str(tmp_path_factory.mktemp("compact_store"))
    shutil.copytree(store, mutable, dirs_exist_ok=True)
    delete_from_knn_graph(mutable, [victim])
    compact_knn_graph(spark, mutable)
    refreshed = read_graph_meta(mutable)["entries"]
    assert victim not in refreshed
    assert len(refreshed) == 4


def test_stored_entries_recall_beats_static(spark, sf_dir, store):
    """The round-14 verdict's done-condition for persisted entries:
    recall with the stored selection must not lose to the legacy
    static id tuple.  Measured over a 20-query panel (the 4-query
    bench set is too noisy to rank selections): ring-stratified hubs
    0.705 vs static 0.64 at sf0.001."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") < 500)
    qids = list(range(5, 500, 25))
    vmap = {
        int(r.vec_id): [float(x) for x in r.embedding]
        for r in base.filter(F.col("vec_id").isin(qids)).collect()
    }
    brutes = {
        q: {r.vec_id for r in cosine_topk(base, q, k=10).collect()}
        for q in qids
    }

    from webarchive_indexing_spark.operators.graph_ann import (
        graph_beam_batch_topk,
    )

    def mean_recall(entries):
        # one batched walk for the whole panel — per-request rows are
        # the per-request graph_beam_topk answers (oracle-pinned by
        # emb_graph_beam_batch), at 7 driver actions instead of 20x7
        hits: dict[int, set[int]] = {q: set() for q in qids}
        for r in graph_beam_batch_topk(
            spark, store, [vmap[q] for q in qids], k=10, beam=10,
            hops=3, entries=entries, exclude_ids=qids,
        ).collect():
            hits[qids[int(r.request_no)]].add(int(r.vec_id))
        return sum(
            len(hits[q] & brutes[q]) / 10 for q in qids
        ) / len(qids)

    stored = mean_recall(None)
    static = mean_recall((0, 150, 300, 450))
    assert stored >= 0.65, (stored, static)
    assert stored >= static, (stored, static)


def test_append_makes_batch_reachable_and_refuses_dup_ids(
    spark, sf_dir, tmp_path_factory
):
    """LSM append: new vectors are REACHABLE through reverse edges
    (old nodes gained routes into the batch), old edge files are
    untouched, and id collisions refuse."""
    import pytest as _pytest

    from webarchive_indexing_spark.operators.graph_ann import (
        append_knn_graph,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    out = str(tmp_path_factory.mktemp("append_store"))
    write_knn_graph(emb, out, k_neighbors=12, n_base=400)
    batch = emb.filter((F.col("vec_id") >= 400) & (F.col("vec_id") < 500))
    assert append_knn_graph(batch, out) == 100
    g = spark.read.parquet(out + "/graph")
    # old → new routes exist (reverse edges), so a walk can reach the
    # batch from old entry points
    assert g.filter(
        (F.col("src") < 400) & (F.col("dst") >= 400)
    ).count() > 0
    # every batch node has out-edges
    assert g.filter(F.col("src") >= 400).select(
        "src").distinct().count() == 100
    with _pytest.raises(ValueError, match="already in the store"):
        append_knn_graph(batch, out)


def test_delete_is_stepping_stone_then_compact_purges(
    spark, sf_dir, tmp_path_factory
):
    """Tombstoned ids vanish from RESULTS immediately but stay
    navigable (visited-through) until compaction; compact_knn_graph
    removes the nodes and their edges physically, re-trims degree,
    and clears the applied tombstone batches."""
    from webarchive_indexing_spark.operators.graph_ann import (
        compact_knn_graph,
        delete_from_knn_graph,
    )
    from webarchive_indexing_spark.sinks.ann_index import (
        read_ann_tombstones,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    out = str(tmp_path_factory.mktemp("del_store"))
    write_knn_graph(emb, out, k_neighbors=12, n_base=500)
    qv = collect_query_vector(emb, 77)
    kw = dict(k=10, beam=10, hops=3, entries=(0, 150, 300, 450),
              exclude_id=77)
    pre = [r.vec_id for r in graph_beam_topk(spark, out, qv, **kw).collect()]
    dead = pre[:2]
    delete_from_knn_graph(out, dead)
    post = [r.vec_id for r in graph_beam_topk(spark, out, qv, **kw).collect()]
    assert not set(dead) & set(post)
    # stepping stones: results beyond the dead ids are unchanged
    assert post[: len(pre) - 2] == [i for i in pre if i not in set(dead)][
        : len(pre) - 2
    ]
    compact_knn_graph(spark, out)
    assert read_ann_tombstones(out) == set()
    g = spark.read.parquet(out + "/graph")
    assert g.filter(
        F.col("src").isin(dead) | F.col("dst").isin(dead)
    ).count() == 0
    v = spark.read.parquet(out + "/vectors")
    assert v.filter(F.col("vec_id").isin(dead)).count() == 0
    # degree re-trimmed to <= 2k (sym of a k-trimmed directed graph)
    mx = g.groupBy("src").count().agg(F.max("count")).first()[0]
    assert mx <= 2 * 12
    # walk over the compacted store still excludes the dead ids
    post2 = [r.vec_id for r in graph_beam_topk(spark, out, qv, **kw).collect()]
    assert not set(dead) & set(post2)


def test_versioned_publish_and_append(spark, sf_dir, tmp_path_factory):
    """CURRENT-pointer lifecycle parity with the IVF stores: a
    versioned build resolves through the pointer, a versioned append
    clones + publishes atomically, and the pre-append version's files
    are untouched."""
    from webarchive_indexing_spark.operators.graph_ann import (
        append_knn_graph_versioned,
        write_knn_graph_versioned,
    )
    from webarchive_indexing_spark.sinks.ann_index import (
        read_store_pointer,
        resolve_store,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    root = str(tmp_path_factory.mktemp("ver_store"))
    write_knn_graph_versioned(emb, root, k_neighbors=12, n_base=400)
    v1 = read_store_pointer(root)
    assert v1 is not None
    qv = collect_query_vector(emb, 77)
    kw = dict(k=10, beam=10, hops=3, entries=(0, 150, 300, 450),
              exclude_id=77)
    pre = [r.vec_id for r in graph_beam_topk(spark, root, qv, **kw).collect()]
    batch = emb.filter((F.col("vec_id") >= 400) & (F.col("vec_id") < 500))
    assert append_knn_graph_versioned(batch, root) == 100
    v2 = read_store_pointer(root)
    assert v2 is not None and v2 != v1
    post = [r.vec_id for r in graph_beam_topk(spark, root, qv, **kw).collect()]
    # old version still serves the pre-append answer
    import posixpath

    old = [
        r.vec_id
        for r in graph_beam_topk(
            spark, posixpath.join(root, v1), qv, **kw
        ).collect()
    ]
    assert old == pre
    assert resolve_store(root).endswith(v2)
    # appended store has 500 nodes
    assert spark.read.parquet(
        posixpath.join(root, v2, "vectors")
    ).count() == 500
    del post
