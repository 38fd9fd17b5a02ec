"""Probe-pin registry: SERVING halves of the store-building queries.

The heavy registry queries that build a store in-query (epoch LSM
fixtures, trained ANN indexes) pin build+probe as one bench number, so
a regression in the cheap serving probe can hide under build noise and
/tmp pressure (BASELINE.md round-10 diagnosis).  Each entry here names
the PROBE half explicitly: ``build(spark, sf_dir) -> ctx`` constructs
the store once (untimed by the bench), ``probe(spark, ctx) ->
DataFrame`` is the serving-path plan a deployment actually pays per
request.  Entries sharing a ``family`` share one build.

bench.py times every probe against its pre-built store and reports
them beside the headline queries; PINS.json ``probe_pins`` carries
their quiet-protocol baselines, with the drift guard in
tests/test_pins.py.  Correctness is NOT re-proved here — each probe
body is the same code path its parent registry query runs under the
DuckDB oracle; tests/test_registry.py pins that parent linkage.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class Probe:
    #: registry query whose serving half this probe times
    parent: str
    #: build-sharing key: probes with equal family reuse one ctx
    family: str
    build: Callable[[SparkSession, str], object]
    probe: Callable[[SparkSession, object], DataFrame]
    #: linkage mode for tests/test_probes.py — "parent" (default):
    #: probe rows must equal the parent query's rows; "nonempty":
    #: BUILD-ONLY probes (they time the construction plan, whose
    #: output feeds the parent's store — row equality to the parent's
    #: SERVING output is not meaningful, and correctness is carried
    #: by the parent's oracle over the same build code path)
    check: str = "parent"


def _build_zipnum_epochs(spark, sf_dir):
    from .cdx_surface import _zipnum_epoch_store

    return _zipnum_epoch_store(spark, sf_dir, "probe_znstore_")


def _build_parquet_epochs(spark, sf_dir):
    from .cdx_surface import _parquet_epoch_store

    return _parquet_epoch_store(spark, sf_dir, "probe_pqstore_")


def _build_parquet_compacted(spark, sf_dir):
    from ..sinks.parquet_index import compact_parquet_index_epochs
    from .cdx_surface import _parquet_epoch_store

    store = _parquet_epoch_store(spark, sf_dir, "probe_pqcomp_")
    compact_parquet_index_epochs(spark, store, range_partitions=4)
    return store


def _build_parquet_zordered(spark, sf_dir):
    from ..sinks.parquet_index import compact_parquet_index_epochs
    from .cdx_surface import _parquet_epoch_store

    store = _parquet_epoch_store(spark, sf_dir, "probe_pqzo_")
    compact_parquet_index_epochs(
        spark, store, range_partitions=4,
        zorder_by=("url_surtkey", "fetch_time"),
    )
    return store


def _build_graph_store(spark, sf_dir):
    import tempfile

    from pyspark.sql import functions as F

    from ..operators.graph_ann import write_knn_graph
    from ..operators.similarity import collect_query_vector
    from ..tables import load_table
    from .llm import _ANN_BATCH_QIDS

    emb = load_table(spark, sf_dir, "embeddings")
    out = tempfile.mkdtemp(prefix="probe_graph_")
    write_knn_graph(emb, out, k_neighbors=12, n_base=500, attrs=("label",))
    qids = list(_ANN_BATCH_QIDS)
    vecs = {
        int(r.vec_id): [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id").isin(qids)).collect()
    }
    return {"store": out, "qv": collect_query_vector(emb, 77),
            "qids": qids, "qvs": [vecs[q] for q in qids]}


def _build_graph_store_deleted(spark, sf_dir):
    import tempfile

    from ..operators.graph_ann import delete_from_knn_graph, write_knn_graph
    from ..operators.similarity import collect_query_vector
    from ..tables import load_table
    from .llm import _GRAPH_DELETED_IDS

    emb = load_table(spark, sf_dir, "embeddings")
    out = tempfile.mkdtemp(prefix="probe_graph_del_")
    write_knn_graph(emb, out, k_neighbors=12, n_base=500)
    delete_from_knn_graph(out, list(_GRAPH_DELETED_IDS[:2]))
    delete_from_knn_graph(out, list(_GRAPH_DELETED_IDS[2:]))
    return {"store": out, "qv": collect_query_vector(emb, 77)}


def _build_graph_store_appended(spark, sf_dir):
    import tempfile

    from pyspark.sql import functions as F

    from ..operators.graph_ann import append_knn_graph, write_knn_graph
    from ..operators.similarity import collect_query_vector
    from ..tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    out = tempfile.mkdtemp(prefix="probe_graph_app_")
    write_knn_graph(emb, out, k_neighbors=12, n_base=400)
    append_knn_graph(
        emb.filter((F.col("vec_id") >= 400) & (F.col("vec_id") < 500)), out
    )
    return {"store": out, "qv": collect_query_vector(emb, 77)}


def _p_graph_beam_lifecycle(spark, ctx):
    # the shared serving half of the delete/append lifecycle parents
    # (their builds differ; the walk parameters are identical)
    from ..operators.graph_ann import graph_beam_topk

    return graph_beam_topk(
        spark, ctx["store"], ctx["qv"], k=10, beam=10, hops=3,
        entries=(0, 150, 300, 450), exclude_id=77,
    )


def _build_emb_frame(spark, sf_dir):
    from ..tables import load_table

    return load_table(spark, sf_dir, "embeddings")


def _p_grid_build_only(spark, emb):
    # BUILD-ONLY probe: the ε-grid candidate generation + min_sim
    # trim + per-src top-k — the construction plan of
    # emb_graph_grid_build, without its store write or serving walk
    from pyspark.sql import functions as F

    from ..operators.graph_ann import (
        build_knn_graph,
        grid_threshold_candidates,
    )

    base = emb.filter(F.col("vec_id") < 500).select("vec_id", "embedding")
    return build_knn_graph(
        base, k_neighbors=12,
        candidates=grid_threshold_candidates(0.24), min_sim=0.24,
    )


def _p_nnd_build_only(spark, emb):
    # BUILD-ONLY probe: the bounded NN-descent rounds of
    # emb_graph_nnd_build, without its store write or serving walk
    from pyspark.sql import functions as F

    from ..operators.graph_ann import nn_descent_knn_graph

    base = emb.filter(F.col("vec_id") < 200).select("vec_id", "embedding")
    return nn_descent_knn_graph(
        base, k_neighbors=6, rounds=2, stride=37, n_base=200
    )


def _p_graph_beam_filtered(spark, ctx):
    from ..operators.graph_ann import graph_beam_topk

    return graph_beam_topk(
        spark, ctx["store"], ctx["qv"], k=10, beam=10, hops=3,
        exclude_id=77, where="label % 2 = 0",
    )


def _p_graph_beam_batch(spark, ctx):
    from ..operators.graph_ann import graph_beam_batch_topk

    return graph_beam_batch_topk(
        spark, ctx["store"], ctx["qvs"], k=10, beam=10, hops=3,
        exclude_ids=ctx["qids"],
    )


def _p_graph_beam(spark, ctx):
    from ..operators.graph_ann import graph_beam_topk

    return graph_beam_topk(
        spark, ctx["store"], ctx["qv"], k=10, beam=10, hops=3,
        exclude_id=77,
    )


def _p_graph_beam_batch_filtered(spark, ctx):
    from ..operators.graph_ann import graph_beam_batch_topk

    return graph_beam_batch_topk(
        spark, ctx["store"], ctx["qvs"], k=10, beam=10, hops=3,
        exclude_ids=ctx["qids"],
        wheres=["label % 2 = 0", None, "label IN (1, 5)", "label % 3 = 1"],
    )


def _build_ivf_store(spark, sf_dir):
    import tempfile

    from pyspark.sql import functions as F

    from ..sinks.ann_index import write_ivf_index
    from .helpers import t
    from .llm import _ANN_BATCH_QIDS

    emb = t(spark, sf_dir, "embeddings")
    out = tempfile.mkdtemp(prefix="probe_ivf_")
    write_ivf_index(emb, out, n_cents=8, train_iters=2)
    qids = list(_ANN_BATCH_QIDS)
    want = sorted({123, *qids})
    vecs = {
        int(r.vec_id): [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id").isin(want)).collect()
    }
    return {"dir": out, "qv": vecs[123], "qids": qids,
            "qvs": [vecs[q] for q in qids]}


def _build_ivf_store_deleted(spark, sf_dir):
    from ..sinks.ann_index import delete_from_ann_index
    from .llm import _ANN_DELETED_IDS

    ctx = _build_ivf_store(spark, sf_dir)
    delete_from_ann_index(ctx["dir"], _ANN_DELETED_IDS)
    return ctx


def _build_ivfpq_store(spark, sf_dir):
    """One PQ store build serves the plain probe, the batch probe, and
    (refine='flat') the sidecar refine probe."""
    import tempfile

    from ..sinks.ann_index import write_ivfpq_index
    from .helpers import t
    from .llm import _ANN_BATCH_QIDS

    emb = t(spark, sf_dir, "embeddings")
    out = tempfile.mkdtemp(prefix="probe_ivfpq_")
    write_ivfpq_index(
        emb, out, n_cells=8, n_sub=4, k_codes=8, train_iters=2,
        refine="flat", attrs=["label"],
    )
    from pyspark.sql import functions as F

    qids = list(_ANN_BATCH_QIDS)
    vecs = {
        int(r.vec_id): [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id").isin(qids)).collect()
    }
    return {"dir": out, "qv": vecs[77], "qids": qids,
            "qvs": [vecs[q] for q in qids]}


def _build_ivfpq_store_deleted(spark, sf_dir):
    from ..sinks.ann_index import delete_from_ann_index
    from .llm import _PQ_DELETED_IDS

    ctx = _build_ivfpq_store(spark, sf_dir)
    delete_from_ann_index(ctx["dir"], _PQ_DELETED_IDS)
    return ctx


def _p_ivf_topk(spark, ctx):
    from ..sinks.ann_index import ivf_index_probe_topk

    return ivf_index_probe_topk(
        spark, ctx["dir"], ctx["qv"], k=10, nprobe=3, exclude_id=123
    )


def _p_ivfpq_topk(spark, ctx):
    from ..sinks.ann_index import ivfpq_index_probe_topk

    return ivfpq_index_probe_topk(
        spark, ctx["dir"], ctx["qv"], k=10, nprobe=3, exclude_id=77
    )


def _p_ivfpq_refined(spark, ctx):
    from ..sinks.ann_index import ivfpq_refined_topk

    return ivfpq_refined_topk(
        spark, ctx["dir"], None, ctx["qv"], k=10, k_factor=4, nprobe=3,
        exclude_id=77,
    )


def _build_ivfsq_store(spark, sf_dir):
    import tempfile

    from pyspark.sql import functions as F

    from ..operators.similarity import collect_query_vector
    from ..sinks.ann_index import write_ivfsq_index
    from .helpers import t
    from .llm import _ANN_BATCH_QIDS

    emb = t(spark, sf_dir, "embeddings")
    out = tempfile.mkdtemp(prefix="probe_ivfsq_")
    write_ivfsq_index(emb, out, n_cents=8, train_iters=2, attrs=["label"])
    qids = list(_ANN_BATCH_QIDS)
    want = sorted({123, *qids})
    vecs = {
        int(r.vec_id): [float(x) for x in r.embedding]
        for r in emb.filter(F.col("vec_id").isin(want)).collect()
    }
    return {"dir": out, "qv": vecs[123], "qids": qids,
            "qvs": [vecs[q] for q in qids]}


def _p_ivfsq_topk(spark, ctx):
    from ..sinks.ann_index import ivfsq_index_probe_topk

    return ivfsq_index_probe_topk(
        spark, ctx["dir"], ctx["qv"], k=10, nprobe=3, exclude_id=123
    )


def _p_ivf_batch(spark, ctx):
    from ..sinks.ann_index import ivf_index_probe_batch_topk

    return ivf_index_probe_batch_topk(
        spark, ctx["dir"], ctx["qvs"], k=10, nprobe=3,
        exclude_ids=ctx["qids"],
    )


def _p_ann_batch(spark, ctx):
    from ..sinks.ann_index import ivfpq_index_probe_batch_topk

    return ivfpq_index_probe_batch_topk(
        spark, ctx["dir"], ctx["qvs"], k=10, nprobe=3,
        exclude_ids=ctx["qids"],
    )


def _p_ann_refined_batch(spark, ctx):
    from ..sinks.ann_index import ivfpq_refined_batch_topk

    return ivfpq_refined_batch_topk(
        spark, ctx["dir"], ctx["qvs"], k=10, k_factor=4, nprobe=3,
        exclude_ids=ctx["qids"],
    )


def _p_ivf_filtered(spark, ctx):
    from ..sinks.ann_index import ivf_index_probe_topk

    return ivf_index_probe_topk(
        spark, ctx["dir"], ctx["qv"], k=10, nprobe=3, exclude_id=123,
        where="label = 2",
    )


def _p_ivf_range(spark, ctx):
    from ..sinks.ann_index import ivf_index_probe_range

    return ivf_index_probe_range(
        spark, ctx["dir"], ctx["qv"], 0.2, nprobe=3, exclude_id=123
    )


def _p_ivfsq_range(spark, ctx):
    from ..sinks.ann_index import ivfsq_index_probe_range

    return ivfsq_index_probe_range(
        spark, ctx["dir"], ctx["qv"], 0.15, nprobe=3, exclude_id=123,
        where="label <= 4",
    )


def _p_ivfpq_range(spark, ctx):
    from ..sinks.ann_index import ivfpq_index_probe_range

    return ivfpq_index_probe_range(
        spark, ctx["dir"], ctx["qv"], 1.05, nprobe=3, exclude_id=77
    )


def _p_ivf_range_batch(spark, ctx):
    from ..sinks.ann_index import ivf_index_probe_batch_range
    from .llm import _ANN_RANGE_RADII

    return ivf_index_probe_batch_range(
        spark, ctx["dir"], ctx["qvs"], list(_ANN_RANGE_RADII),
        nprobe=3, exclude_ids=ctx["qids"],
    )


def _p_ivf_metric_ip(spark, ctx):
    from ..sinks.ann_index import ivf_index_probe_topk

    return ivf_index_probe_topk(
        spark, ctx["dir"], ctx["qv"], k=10, nprobe=3, exclude_id=123,
        metric="ip",
    )


def _p_ivf_metric_l2(spark, ctx):
    from ..sinks.ann_index import ivf_index_probe_range

    return ivf_index_probe_range(
        spark, ctx["dir"], ctx["qv"], 1.6, nprobe=3, exclude_id=123,
        metric="l2",
    )


def _p_ivfpq_range_batch(spark, ctx):
    from ..sinks.ann_index import ivfpq_index_probe_batch_range
    from .llm import _PQ_RANGE_RADII

    return ivfpq_index_probe_batch_range(
        spark, ctx["dir"], ctx["qvs"], list(_PQ_RANGE_RADII),
        nprobe=3, exclude_ids=ctx["qids"],
    )


def _p_ivfsq_range_batch(spark, ctx):
    from ..sinks.ann_index import ivfsq_index_probe_batch_range
    from .llm import _SQ_RANGE_RADII

    return ivfsq_index_probe_batch_range(
        spark, ctx["dir"], ctx["qvs"], list(_SQ_RANGE_RADII),
        nprobe=3, exclude_ids=ctx["qids"],
    )


def _p_ivf_range_filtered_batch(spark, ctx):
    from ..sinks.ann_index import ivf_index_probe_batch_range
    from .llm import _ANN_FILTER_WHERES, _ANN_RANGE_RADII

    return ivf_index_probe_batch_range(
        spark, ctx["dir"], ctx["qvs"], list(_ANN_RANGE_RADII),
        nprobe=3, exclude_ids=ctx["qids"],
        wheres=list(_ANN_FILTER_WHERES),
    )


def _p_ivf_filtered_batch(spark, ctx):
    from ..sinks.ann_index import ivf_index_probe_batch_topk
    from .llm import _ANN_FILTER_WHERES

    return ivf_index_probe_batch_topk(
        spark, ctx["dir"], ctx["qvs"], k=10, nprobe=3,
        exclude_ids=ctx["qids"], wheres=list(_ANN_FILTER_WHERES),
    )


def _build_ivfpq_opq_store(spark, sf_dir):
    import tempfile

    from ..operators.similarity import collect_query_vector
    from ..sinks.ann_index import write_ivfpq_index
    from .helpers import t

    emb = t(spark, sf_dir, "embeddings")
    out = tempfile.mkdtemp(prefix="probe_ivfpq_opq_")
    write_ivfpq_index(
        emb, out, n_cells=8, n_sub=4, k_codes=8, train_iters=2,
        opq_iters=2, refine="flat",
    )
    return {"dir": out, "qv": collect_query_vector(emb, 77)}


def _p_ivfsq_batch(spark, ctx):
    from ..sinks.ann_index import ivfsq_index_probe_batch_topk
    from .llm import _ANN_FILTER_WHERES

    return ivfsq_index_probe_batch_topk(
        spark, ctx["dir"], ctx["qvs"], k=10, nprobe=3,
        exclude_ids=ctx["qids"], wheres=list(_ANN_FILTER_WHERES),
    )


def _p_ivfpq_refined_filtered(spark, ctx):
    from ..sinks.ann_index import ivfpq_refined_topk

    return ivfpq_refined_topk(
        spark, ctx["dir"], None, ctx["qv"], k=10, k_factor=4, nprobe=3,
        exclude_id=77, where="label IN (1, 5)",
    )


def _p_ivfpq_filtered(spark, ctx):
    from ..sinks.ann_index import ivfpq_index_probe_topk

    return ivfpq_index_probe_topk(
        spark, ctx["dir"], ctx["qv"], k=10, nprobe=3, exclude_id=77,
        where="label = 4",
    )


def _reads(mod_fn: str):
    def probe(spark, store):
        from . import cdx_surface

        return getattr(cdx_surface, mod_fn)(spark, store)

    return probe


PROBES: dict[str, Probe] = {
    "zipnum_time_travel_probe": Probe(
        "zipnum_time_travel", "zipnum_epochs",
        _build_zipnum_epochs, _reads("zipnum_time_travel_read"),
    ),
    "cdx_epoch_diff_probe": Probe(
        "cdx_epoch_diff", "zipnum_epochs",
        _build_zipnum_epochs, _reads("cdx_epoch_diff_read"),
    ),
    "cdx_epoch_query_asof_probe": Probe(
        "cdx_epoch_query_asof", "zipnum_epochs",
        _build_zipnum_epochs, _reads("cdx_epoch_query_asof_read"),
    ),
    "parquet_time_travel_probe": Probe(
        "parquet_time_travel", "parquet_epochs",
        _build_parquet_epochs, _reads("parquet_time_travel_read"),
    ),
    "cdx_parquet_takedown_probe": Probe(
        "cdx_parquet_takedown", "parquet_epochs",
        _build_parquet_epochs, _reads("cdx_parquet_takedown_read"),
    ),
    "parquet_compact_purge_probe": Probe(
        "parquet_compact_purge", "parquet_compacted",
        _build_parquet_compacted, _reads("parquet_compacted_read"),
    ),
    "parquet_index_zorder_box_probe": Probe(
        "parquet_index_zorder_box", "parquet_zordered",
        _build_parquet_zordered, _reads("parquet_zorder_box_read"),
    ),
    "emb_graph_beam_topk_probe": Probe(
        "emb_graph_beam_topk", "graph_store",
        _build_graph_store, _p_graph_beam,
    ),
    "emb_graph_beam_batch_probe": Probe(
        "emb_graph_beam_batch", "graph_store",
        _build_graph_store, _p_graph_beam_batch,
    ),
    "emb_graph_beam_filtered_probe": Probe(
        "emb_graph_beam_filtered", "graph_store",
        _build_graph_store, _p_graph_beam_filtered,
    ),
    "emb_graph_beam_batch_filtered_probe": Probe(
        "emb_graph_beam_batch_filtered", "graph_store",
        _build_graph_store, _p_graph_beam_batch_filtered,
    ),
    "emb_graph_delete_probe_probe": Probe(
        "emb_graph_delete_probe", "graph_store_deleted",
        _build_graph_store_deleted, _p_graph_beam_lifecycle,
    ),
    "emb_graph_append_walk_probe": Probe(
        "emb_graph_append_walk", "graph_store_appended",
        _build_graph_store_appended, _p_graph_beam_lifecycle,
    ),
    "emb_graph_grid_build_probe": Probe(
        "emb_graph_grid_build", "emb_frame",
        _build_emb_frame, _p_grid_build_only, check="nonempty",
    ),
    "emb_graph_nnd_build_probe": Probe(
        "emb_graph_nnd_build", "emb_frame",
        _build_emb_frame, _p_nnd_build_only, check="nonempty",
    ),
    "emb_ivf_persisted_topk_probe": Probe(
        "emb_ivf_persisted_topk", "ivf_store",
        _build_ivf_store, _p_ivf_topk,
    ),
    "emb_ivf_delete_probe_probe": Probe(
        "emb_ivf_delete_probe", "ivf_store_deleted",
        _build_ivf_store_deleted, _p_ivf_topk,
    ),
    "emb_ivfadc_persisted_topk_probe": Probe(
        "emb_ivfadc_persisted_topk", "ivfpq_store",
        _build_ivfpq_store, _p_ivfpq_topk,
    ),
    "emb_ivfpq_delete_probe_probe": Probe(
        "emb_ivfpq_delete_probe", "ivfpq_store_deleted",
        _build_ivfpq_store_deleted, _p_ivfpq_topk,
    ),
    "emb_ivfpq_refined_store_probe": Probe(
        "emb_ivfpq_refined_store", "ivfpq_store",
        _build_ivfpq_store, _p_ivfpq_refined,
    ),
    "emb_ann_query_batch_probe": Probe(
        "emb_ann_query_batch", "ivfpq_store",
        _build_ivfpq_store, _p_ann_batch,
    ),
    "emb_ann_refined_batch_probe": Probe(
        "emb_ann_refined_batch", "ivfpq_store",
        _build_ivfpq_store, _p_ann_refined_batch,
    ),
    "emb_ivf_query_batch_probe": Probe(
        "emb_ivf_query_batch", "ivf_store",
        _build_ivf_store, _p_ivf_batch,
    ),
    "emb_ivfsq_persisted_topk_probe": Probe(
        "emb_ivfsq_persisted_topk", "ivfsq_store",
        _build_ivfsq_store, _p_ivfsq_topk,
    ),
    "emb_ann_filtered_topk_probe": Probe(
        "emb_ann_filtered_topk", "ivf_store",
        _build_ivf_store, _p_ivf_filtered,
    ),
    "emb_ann_filtered_batch_probe": Probe(
        "emb_ann_filtered_batch", "ivf_store",
        _build_ivf_store, _p_ivf_filtered_batch,
    ),
    "emb_ivfpq_filtered_topk_probe": Probe(
        "emb_ivfpq_filtered_topk", "ivfpq_store",
        _build_ivfpq_store, _p_ivfpq_filtered,
    ),
    "emb_ivfpq_opq_topk_probe": Probe(
        "emb_ivfpq_opq_topk", "ivfpq_opq_store",
        _build_ivfpq_opq_store, _p_ivfpq_topk,
    ),
    "emb_ivfsq_query_batch_probe": Probe(
        "emb_ivfsq_query_batch", "ivfsq_store",
        _build_ivfsq_store, _p_ivfsq_batch,
    ),
    "emb_ivfpq_refined_filtered_probe": Probe(
        "emb_ivfpq_refined_filtered", "ivfpq_store",
        _build_ivfpq_store, _p_ivfpq_refined_filtered,
    ),
    "emb_ivfpq_opq_refined_probe": Probe(
        "emb_ivfpq_opq_refined", "ivfpq_opq_store",
        _build_ivfpq_opq_store, _p_ivfpq_refined,
    ),
    "emb_ann_range_search_probe": Probe(
        "emb_ann_range_search", "ivf_store",
        _build_ivf_store, _p_ivf_range,
    ),
    "emb_ivfsq_range_search_probe": Probe(
        "emb_ivfsq_range_search", "ivfsq_store",
        _build_ivfsq_store, _p_ivfsq_range,
    ),
    "emb_ivfpq_range_search_probe": Probe(
        "emb_ivfpq_range_search", "ivfpq_store",
        _build_ivfpq_store, _p_ivfpq_range,
    ),
    "emb_ann_range_batch_probe": Probe(
        "emb_ann_range_batch", "ivf_store",
        _build_ivf_store, _p_ivf_range_batch,
    ),
    "emb_ivf_metric_ip_probe": Probe(
        "emb_ivf_metric_ip", "ivf_store",
        _build_ivf_store, _p_ivf_metric_ip,
    ),
    "emb_ivf_metric_l2_probe": Probe(
        "emb_ivf_metric_l2", "ivf_store",
        _build_ivf_store, _p_ivf_metric_l2,
    ),
    "emb_ivfpq_range_batch_probe": Probe(
        "emb_ivfpq_range_batch", "ivfpq_store",
        _build_ivfpq_store, _p_ivfpq_range_batch,
    ),
    "emb_ivfsq_range_batch_probe": Probe(
        "emb_ivfsq_range_batch", "ivfsq_store",
        _build_ivfsq_store, _p_ivfsq_range_batch,
    ),
    "emb_ivfpq_opq_range_probe": Probe(
        "emb_ivfpq_opq_range", "ivfpq_opq_store",
        _build_ivfpq_opq_store, _p_ivfpq_range,
    ),
    "emb_ann_range_filtered_batch_probe": Probe(
        "emb_ann_range_filtered_batch", "ivf_store",
        _build_ivf_store, _p_ivf_range_filtered_batch,
    ),
}
