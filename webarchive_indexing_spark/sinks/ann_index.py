"""Persisted IVF ANN index (SURVEY.md §2.11 L3 — the production
shape: TRAIN ONCE, STORE, PROBE MANY).

Every in-query IVF variant re-trains and re-assigns per query; a
serving system builds the index once and answers queries against the
stored artifact.  The store is two pieces:

* ``centroids.json`` — the coarse quantizer, a model artifact of
  ``n_cents × dim`` floats (driver-sized by construction);
* ``vectors/`` — the corpus hive-partitioned by ``cell=`` (the IVF
  inverted lists AS directory layout).

The payoff is that a probe becomes PARTITION PRUNING: reading
``nprobe`` cells lists and scans only those directories — Spark never
touches the other ``n_cents − nprobe`` lists' files, the exact
analogue of FAISS skipping inverted lists (plan-asserted in
tests/test_plans.py: the probe scan shows ``cell`` PartitionFilters
and no full-corpus scan).  Assignment uses the SAME
``ivf_cell_expr`` the in-query probes use, so the stored layout and
any later probe's arithmetic can never disagree.

At 100 TB: the build is one training pass (``train_frac`` bounds it)
plus one assignment scan + hive write; each query then costs
O(corpus × nprobe / n_cents) scan bytes with zero shuffles.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .zipnum import _fs_for, _join

_CENTROIDS = "centroids.json"


def write_ivf_index(
    embeddings: DataFrame,
    out_dir: str,
    *,
    n_cents: int = 8,
    train_iters: int = 2,
    dim: int = 64,
    train_frac: float | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict[int, list[float]]:
    """Train the coarse quantizer (Lloyd), assign every vector to its
    cell, and write the hive-partitioned store.  Returns the trained
    centroids (also persisted as ``centroids.json``).

    The build is NOT reader-atomic (mode=overwrite in place): for live
    serving, build into a fresh directory and swap the pointer —
    index rebuilds are rare, scheduled events, the same posture as any
    search-index deployment."""
    from ..operators.kmeans import lloyd_train
    from ..operators.similarity import ivf_cell_expr

    cents = lloyd_train(
        embeddings, k=n_cents, iters=train_iters, dim=dim,
        id_col=id_col, vec_col=vec_col, train_frac=train_frac,
    )
    (
        embeddings.withColumn("cell", ivf_cell_expr(cents, vec_col))
        .write.partitionBy("cell")
        .mode("overwrite")
        .parquet(_join(out_dir, "vectors"))
    )
    fs, local = _fs_for(out_dir)
    with fs.open_output_stream(
        _join(local, _CENTROIDS), compression=None
    ) as fh:
        fh.write(
            json.dumps({str(c): v for c, v in cents.items()}).encode()
        )
    return cents


def append_ivf_index(
    embeddings: DataFrame,
    out_dir: str,
    *,
    vec_col: str = "embedding",
) -> None:
    """Add NEW vectors to an existing store: assignment uses the
    STORED quantizer (centroids are fixed once trained — probe math
    never shifts under a serving index), and the write APPENDS files
    into the ``cell=`` directories — no rewrite of existing lists,
    which is how an embedding index absorbs a new crawl's vectors at
    100 TB.  Quantizer drift (enough new data that the cells no
    longer fit) is a scheduled REBUILD, never an in-place mutation."""
    from ..operators.similarity import ivf_cell_expr

    cents = read_ivf_centroids(out_dir)
    (
        embeddings.withColumn("cell", ivf_cell_expr(cents, vec_col))
        .write.partitionBy("cell")
        .mode("append")
        .parquet(_join(out_dir, "vectors"))
    )


def compact_ivf_index(spark: SparkSession, out_dir: str) -> None:
    """Small-file hygiene for an append-heavy store: every append
    adds files to each touched ``cell=`` directory, and probe cost is
    per-file open/footer overhead × files — so periodically rewrite
    each inverted list to one file (``repartition("cell")`` puts each
    cell in one task; a cell too big for one file belongs in a store
    with more cells, i.e. a quantizer rebuild).  Staged through a tmp
    directory + renames — a reader never sees a HALF-WRITTEN store,
    though one racing the two metadata ops can catch the vectors
    directory briefly absent (generic filesystems have no atomic dir
    swap); schedule compaction off-peak, or publish versioned store
    paths for always-on serving.  The quantizer is untouched, so no
    probe's answer can change."""
    from pyarrow import fs as pafs

    vectors = _join(out_dir, "vectors")
    tmp = _join(out_dir, "vectors-compact-tmp")
    fs, local = _fs_for(out_dir)
    try:
        fs.delete_dir(_join(local, "vectors-compact-tmp"))
    except OSError:
        pass
    (
        spark.read.parquet(vectors)
        .repartition("cell")
        .write.partitionBy("cell")
        .mode("overwrite")
        .parquet(tmp)
    )
    old = _join(local, "vectors-old")
    try:
        fs.delete_dir(old)
    except OSError:
        pass
    fs.move(_join(local, "vectors"), old)
    fs.move(_join(local, "vectors-compact-tmp"), _join(local, "vectors"))
    # sanity BEFORE dropping the recovery copy, and an explicit raise
    # (a bare assert compiles out under -O): a filesystem move that
    # misbehaved without raising leaves vectors-old intact to recover
    # from instead of silently deleting the only good copy.
    if fs.get_file_info(_join(local, "vectors")).type != pafs.FileType.Directory:
        raise RuntimeError(
            f"compact_ivf_index: rename did not land at {vectors!r}; "
            f"recovery copy retained at {old!r}"
        )
    fs.delete_dir(old)


def read_ivf_centroids(out_dir: str) -> dict[int, list[float]]:
    fs, local = _fs_for(out_dir)
    with fs.open_input_stream(
        _join(local, _CENTROIDS), compression=None
    ) as fh:
        raw = json.loads(fh.read().decode())
    return {int(c): v for c, v in raw.items()}


def ivf_index_probe_topk(
    spark: SparkSession,
    out_dir: str,
    qv: list[float],
    *,
    k: int = 10,
    nprobe: int = 2,
    exclude_id: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors from the STORED index: rank the probe
    cells on the driver (quantizer-sized math), then scan ONLY those
    ``cell=`` directories — partition pruning does the inverted-list
    skip, no assignment recompute, no shuffle, top-k as
    TakeOrderedAndProject."""
    from ..operators.similarity import (
        cosine,
        ivf_probe_cells,
        lit_double_array,
    )
    from ..queries.helpers import hround

    cents = read_ivf_centroids(out_dir)
    probe = ivf_probe_cells(cents, qv, nprobe)
    df = spark.read.parquet(_join(out_dir, "vectors")).filter(
        F.col("cell").isin(probe)
    )
    if exclude_id is not None:
        df = df.filter(F.col(id_col) != exclude_id)
    out = df.select(
        F.col(id_col),
        F.col("cell"),
        hround(cosine(F.col(vec_col), lit_double_array(qv)), 6).alias(
            "cos_sim"
        ),
    )
    return out.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)
