"""Connected components over an edge DataFrame — duplicate-cluster
assembly (SURVEY.md §2.11 L2/L4 downstream).

Pairwise near-dup detection (MinHash-LSH, n-gram Jaccard, embedding
cosine) emits EDGES; a training pipeline needs CLUSTERS — transitive
groups with one canonical survivor each.  That closure is an iterative
graph algorithm, not a single SQL query, so it gets a real operator.

Algorithm: alternating **large-star / small-star** contraction
(Kiveris et al., "Connected Components in MapReduce and Beyond",
ACM SoCC 2014).  Each round is two window-min passes:

* large-star — every node links its larger neighbours to its smallest
  neighbour (or itself);
* small-star — every node links its smaller neighbours (and itself)
  to their minimum.

The edge set converges to a forest of depth-1 stars rooted at each
component's minimum id in O(log d) rounds (d = component diameter) —
unlike naive min-label propagation, which needs O(d) rounds and dies
on long chains.  Per round the only wide ops are ``Window.partitionBy``
mins and ``distinct``; edges never fan out beyond the input degree sum.

Scale notes (100 TB):
* The loop is driver-side CONTROL only — each iteration's data motion
  is distributed (no ``collect`` of nodes/edges, ever).
* Each round ``localCheckpoint``s its edge set, which truncates the
  LOGICAL plan, not just the physical one: ``persist`` alone leaves the
  analyzer re-walking one star-pass per round (the analyzed tree grows
  superlinearly and blows the driver heap on chain graphs), whereas a
  checkpointed DataFrame's plan is a flat scan of materialized blocks.
  The tradeoff — a lost block fails the stage instead of recomputing —
  is the standard one every iterative-graph library accepts
  (GraphFrames/GraphX checkpoint their iterations the same way).
  Superseded rounds' blocks are reclaimed by the ContextCleaner when
  their DataFrame references drop; live storage stays O(edge set), and
  AQE coalesces each round's shuffle to the (shrinking) edge count.
* Convergence test = (edge count, xxhash64 edge-set sum) — one tiny
  action per round instead of an ``exceptAll`` anti-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _large_star(e: DataFrame) -> DataFrame:
    """One large-star round.  Input/output edges oriented (u > v).

    Symmetrize, then per node u link every LARGER neighbour v to
    m = min(Γ(u) ∪ {u}).  Output keeps the (child > parent) invariant
    because m ≤ u < v."""
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = F.least(F.col("u"), F.min("v").over(Window.partitionBy("u")))
    return (
        sym.withColumn("m", m)
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star round.  Input edges oriented (u > v): every
    neighbour of u (all smaller) plus u itself links to m = min(Γ(u));
    m < v for every emitted (v, m), preserving the invariant."""
    m = F.min("v").over(Window.partitionBy("u"))
    return (
        e.withColumn("m", m)
        .select(F.explode(F.array(F.col("u"), F.col("v"))).alias("n"), "m")
        .filter(F.col("n") != F.col("m"))
        .select(F.col("n").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    nodes: DataFrame | None = None,
    node_col: str = "node",
    max_iter: int = 30,
) -> DataFrame:
    """Label every node with its component's minimum node id.

    ``edges``: undirected edge list (self-loops and duplicates fine).
    ``nodes``: optional full node set — isolated nodes (no rows in
    ``edges``) get their own id as label; without it every edge
    endpoint is labeled (including endpoints whose only edge is a
    self-loop).  Returns ``(node, comp)``.
    """
    # Orient + dedup ONCE, keeping self-loops, and checkpoint BEFORE
    # deriving anything else: both the node universe and the loop-free
    # edge set read the materialized blocks, so the (possibly very
    # expensive — e.g. an n-gram Jaccard self-join) upstream pair
    # pipeline executes exactly one time.  Deriving the default node
    # universe from raw ``edges`` instead would silently re-run it.
    # localCheckpoint (not persist): truncates the logical plan so each
    # round analyzes ONE star-pass, and cuts the upstream plan out of
    # every round's analysis.
    e_all = (
        edges.select(
            F.greatest(F.col(src), F.col(dst)).alias("u"),
            F.least(F.col(src), F.col(dst)).alias("v"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    if nodes is None:
        # default universe = input endpoints (from e_all, where
        # self-loops survive, so a self-loop-only node still labels
        # itself after the filter below)
        nodes = e_all.select(F.col("u").alias("node")).unionByName(
            e_all.select(F.col("v").alias("node"))
        )
        node_col = "node"
    e = e_all.filter(F.col("u") != F.col("v"))

    def sig(df: DataFrame):
        # decimal accumulator: full-range int64 hashes overflow a long
        # sum under ANSI mode; decimal(38,0) is exact and order-free
        return df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).first()

    def _persistent_ids(sc) -> set[int]:
        # ids of currently-persisted RDDs (includes localCheckpoint
        # blocks).  Best-effort JVM introspection: on failure fall back
        # to empty (then cleanup degrades to the ContextCleaner path).
        try:
            return {int(i) for i in sc._jsc.getPersistentRDDs().keySet().toArray()}
        except Exception:  # pragma: no cover - py4j surface drift
            return set()

    sc = edges.sparkSession.sparkContext
    cur = sig(e)
    prev_ids: set[int] = set()
    for _ in range(max_iter):
        before = _persistent_ids(sc)
        # lazy checkpoint: the sig() action materializes the blocks, so
        # each round is ONE job instead of checkpoint-job + sig-job
        e = _small_star(_large_star(e)).localCheckpoint(eager=False)
        nxt = sig(e)
        # Deterministic two-round peak storage: the previous round's
        # blocks are dead the moment this round is materialized, so
        # drop them NOW instead of waiting for driver GC to cue the
        # ContextCleaner (on long chain graphs several rounds of edge
        # blocks could otherwise pile up).  Only ids that appeared
        # during OUR loop are touched; e_all (persisted before the
        # loop) backs the final labeling and stays.
        if prev_ids:
            try:
                jmap = sc._jsc.getPersistentRDDs()
                for i in prev_ids:
                    rdd = jmap.get(i)
                    if rdd is not None:
                        rdd.unpersist(False)
            except Exception:  # pragma: no cover - py4j surface drift
                pass
        prev_ids = _persistent_ids(sc) - before
        if nxt == cur:
            break
        cur = nxt

    children = e.select(F.col("u").alias("node"), F.col("v").alias("comp"))
    roots = e.select(F.col("v").alias("node"), F.col("v").alias("comp")).distinct()
    out = children.unionByName(roots)
    iso = (
        nodes.select(F.col(node_col).alias("node"))
        .distinct()
        .join(out.select("node"), "node", "left_anti")
        .select("node", F.col("node").alias("comp"))
    )
    out = out.unionByName(iso)
    # At the star-forest fixpoint every node has exactly one label; the
    # min-agg only matters if max_iter cut convergence short — then the
    # smallest candidate is still the best (possibly unconverged) label.
    return out.groupBy("node").agg(F.min("comp").alias("comp"))
