"""Tier A/B relational core: scans, projections, filters, joins,
aggregations, sorts, set ops, scalar functions (SURVEY.md §2.1-2.8).

Each query is a ``(spark, sf_dir) -> DataFrame`` registered with a
DuckDB oracle.  The Spark side is DataFrame-API (declarative — Catalyst
chooses broadcast vs SMJ, pushes filters into the parquet scan, prunes
columns); the oracle is plain ANSI SQL.  Aliases match exactly.

Reference parity notes cite SURVEY.md §2 rows (upstream anchors are
[U] — /root/reference was empty; see SURVEY.md §0).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from .helpers import davg, dsum, hround, sql_davg, sql_dsum, sql_hround, t

# ---------------------------------------------------------------------------
# Flagship + aggregations (§2.4 A1-A8)
# ---------------------------------------------------------------------------


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity', 'sum_qty')},
           {sql_dsum('l_extendedprice', 'sum_base_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
           {sql_davg('l_quantity', 'avg_qty')},
           {sql_davg('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark, sf_dir):
    """Flagship: TPC-H-Q1-style scan→filter→groupBy→multi-agg (A1/A2).

    Catalyst plans partial+final hash aggregation automatically — the
    reference's unused Hadoop combiner slot [U indexwarcsjob.py] is
    free here.  Filter and the 7-column projection push into the
    parquet scan.
    """
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15'
      AND l.l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderdate ASC, l.l_orderkey ASC
    LIMIT 10
    """,
)
def q3_shipping_priority(spark, sf_dir):
    """TPC-H-Q3-style 3-table join + agg + top-k (J1/J2/A1/O4): the
    classic star-ish plan.  All three filters push into their parquet
    scans BEFORE the joins (Catalyst pushdown); the filtered customer
    side is small enough that Catalyst broadcasts it into the
    orders join, lineitem joins on the shuffled orderkey, partial
    aggregation runs map-side, and the final top-10 plans as
    TakeOrderedAndProject — k rows to the driver, never a full sort.
    Extra deterministic tie-break keys (orderdate, orderkey) keep the
    k-set engine-stable."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue, "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(
            F.col("revenue").desc(),
            F.col("o_orderdate").asc(),
            F.col("l_orderkey").asc(),
        )
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')}
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H-Q5-style 6-table join (J1/J2/A1 — the join-REORDERING
    showcase): region→nation→supplier is a chain of broadcastable
    dims; the only big-big join is lineitem⋈orders on orderkey; the
    'local supplier' condition (c_nationkey = s_nationkey) rides the
    supplier join as a second equi-key instead of a post-join filter,
    so no row survives the join only to be discarded.  Date and
    region filters push into their scans; revenue goes through the
    exact-decimal sum."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .join(
            s,
            (li["l_suppkey"] == s["s_suppkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(n, s["s_nationkey"] == n["n_nationkey"])
        .join(r, n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(dsum(revenue, "revenue"))
    )


@query(
    "agg_count_distinct",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM events GROUP BY event_type
    """,
)
def agg_count_distinct(spark, sf_dir):
    """A3 exact count-distinct — 'unique URLs per domain' index stat."""
    ev = t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "agg_approx_distinct",
    oracle="""
    SELECT lang,
           COUNT(DISTINCT source) AS n_sources_exact,
           (ABS(approx_count_distinct(source) - COUNT(DISTINCT source))
              <= GREATEST(1, CAST(FLOOR(0.05 * COUNT(DISTINCT source)) AS BIGINT)))
             AS approx_ok
    FROM documents GROUP BY lang
    """,
)
def agg_approx_distinct(spark, sf_dir):
    """A4 approx count-distinct (HLL++) — CC-index publishes unique-URL
    counts at 10^9 scale where exact distinct is a full shuffle.

    Oracle trick: both engines emit the exact count plus a boolean
    "sketch within 5% (or ±1) of exact"; at test cardinalities both
    sketches are in sparse/exact mode so the flag is stably true.
    """
    docs = t(spark, sf_dir, "documents")
    exact = F.countDistinct("source")
    approx = F.approx_count_distinct("source")
    tol = F.greatest(F.lit(1).cast("bigint"), F.floor(F.lit(0.05) * exact).cast("bigint"))
    return docs.groupBy("lang").agg(
        exact.alias("n_sources_exact"),
        (F.abs(approx - exact) <= tol).alias("approx_ok"),
    )


@query(
    "agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           {sql_dsum('l_quantity', 'sum_qty')}
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark, sf_dir):
    """A6 rollup with subtotal rows (grouped-out keys are NULL)."""
    li = t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), dsum("l_quantity", "sum_qty")
    )


@query(
    "agg_cube",
    oracle=f"""
    SELECT c_mktsegment, c_nationkey,
           COUNT(*) AS n,
           {sql_davg('c_acctbal', 'avg_bal')}
    FROM customer GROUP BY CUBE (c_mktsegment, c_nationkey)
    """,
)
def agg_cube(spark, sf_dir):
    """A6 cube — all 4 grouping-set combinations."""
    c = t(spark, sf_dir, "customer")
    return c.cube("c_mktsegment", "c_nationkey").agg(
        F.count(F.lit(1)).alias("n"), davg("c_acctbal", "avg_bal")
    )


@query(
    "agg_distinct_rows",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
)
def agg_distinct_rows(spark, sf_dir):
    """A7 distinct/dropDuplicates — CDX dedup by (urlkey,ts,digest) analogue."""
    return t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@query(
    "agg_collect_sorted",
    oracle="""
    SELECT n_nationkey,
           string_agg(s_name, ',' ORDER BY s_name) AS suppliers
    FROM nation JOIN supplier ON s_nationkey = n_nationkey
    GROUP BY n_nationkey
    """,
)
def agg_collect_sorted(spark, sf_dir):
    """A8 collect_list — ZipNum block assembly gathers rows per group
    [U zipnumclusterjob.py reducer]; sorted+joined for determinism."""
    n = t(spark, sf_dir, "nation")
    s = t(spark, sf_dir, "supplier")
    return (
        n.join(s, s.s_nationkey == n.n_nationkey)
        .groupBy("n_nationkey")
        .agg(F.array_join(F.sort_array(F.collect_list("s_name")), ",").alias("suppliers"))
    )


@query(
    "agg_percentiles",
    oracle=f"""
    SELECT l_returnflag,
           {sql_hround('quantile_cont(l_quantity, 0.5)', 4)} AS p50_qty,
           {sql_hround('quantile_cont(l_quantity, 0.95)', 4)} AS p95_qty,
           {sql_hround('quantile_cont(l_extendedprice, 0.99)', 4)} AS p99_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentiles(spark, sf_dir):
    """A5-adjacent: exact per-group percentiles (linear interpolation —
    the same h = (n−1)·p definition in Spark and DuckDB).  Exact
    percentile is a sort-based aggregate; at 100 TB swap in
    ``approx_percentile`` (QuantileSummaries sketch, mergeable
    map-side) — exact here because the oracle must hash-match."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        hround(F.percentile("l_quantity", 0.5), 4).alias("p50_qty"),
        hround(F.percentile("l_quantity", 0.95), 4).alias("p95_qty"),
        hround(F.percentile("l_extendedprice", 0.99), 4).alias("p99_price"),
    )


# ---------------------------------------------------------------------------
# Projections / filters (§2.2 P1-P5)
# ---------------------------------------------------------------------------


@query(
    "proj_fields",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
    """,
)
def proj_fields(spark, sf_dir):
    """P1 field projection (cdx-server ``fl`` param [B]) — column pruning
    reaches the parquet scan (ReadSchema shows only 3 columns)."""
    return t(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus", "o_orderpriority")


@query(
    "filter_regex",
    oracle=r"""
    SELECT p_partkey, p_name, p_brand FROM part
    WHERE regexp_matches(p_name, '^p.*[02468]$')
      AND p_brand NOT LIKE '%1%'
      AND contains(p_type, 'a')
    """,
)
def filter_regex(spark, sf_dir):
    """P2 predicate filter: regex / negation / contains (cdx-server
    ``filter=field:regex``, ``!``, ``~`` [B])."""
    p = t(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").rlike("^p.*[02468]$")
        & ~F.col("p_brand").like("%1%")
        & F.col("p_type").contains("a")
    ).select("p_partkey", "p_name", "p_brand")


@query(
    "filter_status",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n
    FROM orders WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def filter_status(spark, sf_dir):
    """P3 status filter (``status=200`` analogue) — pushed to the scan."""
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "filter_ts_range",
    oracle="""
    SELECT event_type, COUNT(*) AS n
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-20'
    GROUP BY event_type
    """,
)
def filter_ts_range(spark, sf_dir):
    """P4 from/to range — 14-digit CDX timestamps compare as strings;
    here as native timestamps (order-isomorphic)."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.filter(
            (F.col("ts") >= F.lit("2024-01-10").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-20").cast("timestamp"))
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "filter_key_prefix",
    oracle="""
    SELECT source, COUNT(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents WHERE source LIKE 'src1%'
    GROUP BY source
    """,
)
def filter_key_prefix(spark, sf_dir):
    """P5 prefix/domain match (cdx-server ``matchType=prefix`` [B]): a
    key-range predicate — on range-sorted storage this prunes to the
    shards/blocks intersecting [k, k+'~') (SURVEY.md §3.3)."""
    d = t(spark, sf_dir, "documents")
    return (
        d.filter(F.col("source").startswith("src1"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("total_chars"))
    )


# ---------------------------------------------------------------------------
# Joins (§2.3 J1-J8)
# ---------------------------------------------------------------------------


@query(
    "join_broadcast_dim",
    oracle=f"""
    SELECT p_brand,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
           COUNT(*) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def join_broadcast_dim(spark, sf_dir):
    """J1 broadcast hash join: fact ⋈ small dim, explicitly hinted.

    At 100 TB the fact side never shuffles — the dim ships to every
    executor once."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "join_large_smj",
    oracle=f"""
    SELECT o_orderpriority,
           {sql_dsum('l_extendedprice', 'gross')},
           COUNT(*) AS n
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY o_orderpriority
    """,
)
def join_large_smj(spark, sf_dir):
    """J2 large-large equi join (revisit-resolution analogue [B]) —
    Catalyst picks SMJ/SHJ; AQE re-plans on runtime stats."""
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(dsum("l_extendedprice", "gross"), F.count(F.lit(1)).alias("n"))
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS n_customers
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
    GROUP BY c_mktsegment
    """,
)
def join_semi(spark, sf_dir):
    """J3 left-semi: 'manifests with ≥1 capture' analogue."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)
def join_anti(spark, sf_dir):
    """J4 left-anti = the reference's --skip-existing probe (S7): keep
    manifest rows with no existing output [U indexwarcsjob.py ~L75-85],
    as one distributed anti-join instead of a per-file S3 HEAD."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_outer_left",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n_rows,
           COUNT(l_orderkey) AS n_matched
    FROM orders LEFT JOIN lineitem
      ON o_orderkey = l_orderkey AND l_quantity > 45
    GROUP BY o_orderstatus
    """,
)
def join_outer_left(spark, sf_dir):
    """J5 left outer with a join-side predicate (null-extended rows)."""
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    cond = (o.o_orderkey == li.l_orderkey) & (li.l_quantity > 45)
    return (
        o.join(li, cond, "left")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.count("l_orderkey").alias("n_matched"))
    )


@query(
    "join_outer_full",
    oracle="""
    WITH c AS (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer GROUP BY 1),
         s AS (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT COALESCE(c.k, s.k) AS nationkey,
           COALESCE(n_cust, 0) AS n_cust,
           COALESCE(n_supp, 0) AS n_supp
    FROM c FULL OUTER JOIN s ON c.k = s.k
    """,
)
def join_outer_full(spark, sf_dir):
    """J5 full outer over two pre-aggregated sides."""
    c = (
        t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, c.k == s.k, "full").select(
        F.coalesce(c.k, s.k).alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


@query(
    "join_theta_range",
    # banded oracle (round 6): the same (user_id, time-band) equi-join
    # + residual the engine plans — DuckDB otherwise picks an IEJoin on
    # the inequality and goes quadratic on larger replicas, which is
    # why the 3x generalization sweep had to exclude this query.  Each
    # qualifying pair meets in exactly one band (range width == band).
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, epoch_us(ts) AS us FROM events
    ), a AS (
      SELECT user_id, event_id, us,
             CAST(FLOOR(us / 60000000) AS BIGINT) + d.off AS jbkt
      FROM ev CROSS JOIN (SELECT unnest([0, 1]) AS off) d
    ), b AS (
      SELECT user_id, event_id AS b_id, us AS b_us,
             CAST(FLOOR(us / 60000000) AS BIGINT) AS jbkt
      FROM ev
    )
    SELECT a.user_id AS user_id, COUNT(*) AS n_pairs
    FROM a JOIN b ON a.user_id = b.user_id AND a.jbkt = b.jbkt
    WHERE a.event_id < b.b_id
      AND b.b_us - a.us BETWEEN 0 AND 60000000
    GROUP BY a.user_id
    """,
)
def join_theta_range(spark, sf_dir):
    """J6 theta/range join: event pairs of one user within 60 s.

    Equi part (user_id) drives the shuffle; the range predicate is a
    post-join filter.  µs epochs compare exactly in both engines."""
    ev = t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros(F.col("ts")).alias("us")
    )
    a = ev.alias("a")
    b = ev.alias("b")
    cond = (
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("a.event_id") < F.col("b.event_id"))
        & ((F.col("b.us") - F.col("a.us")).between(0, 60_000_000))
    )
    return (
        a.join(b, cond)
        .groupBy(F.col("a.user_id").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@query(
    "join_range_banded",
    # banded oracle (round 6): the same band-replicate + equi-join +
    # residual rewrite the engine plans.  The earlier unbanded twin was
    # a deliberate nested-loop formulation that proved semantics
    # equivalence at the sf0.01 gate but could not finish the 3x
    # generalization sweep; the semantics proof now lives in
    # tests/test_scale.py::test_banded_rewrites_equal_naive_joins
    # (banded engine output == naive unbanded join, per-row).
    oracle="""
    WITH ev AS (
      SELECT event_id, epoch_us(ts) AS us FROM events
    ), a AS (
      SELECT event_id, us,
             CAST(FLOOR(us / 5000000) AS BIGINT) + d.off AS jbkt
      FROM ev CROSS JOIN (SELECT unnest([0, 1]) AS off) d
    ), b AS (
      SELECT event_id AS b_id, us AS b_us,
             CAST(FLOOR(us / 5000000) AS BIGINT) AS jbkt
      FROM ev
    )
    SELECT CAST(FLOOR(a.us / 3600000000) AS BIGINT) AS hour_bucket,
           COUNT(*) AS n_pairs
    FROM a JOIN b ON a.jbkt = b.jbkt
    WHERE b.b_us - a.us BETWEEN 0 AND 5000000
      AND a.event_id <> b.b_id
    GROUP BY hour_bucket
    """,
)
def join_range_banded(spark, sf_dir):
    """J6 at scale: PURE range join (no selective equi key — all event
    pairs within 5 s, any user) via time banding.

    A bare range predicate plans as a nested-loop join — O(n·m) dies
    at 100 TB.  Banding rewrites it as an equi-join: bucket the time
    axis at the band width (= the max range), replicate the LEFT side
    into its own and the successor bucket (exactly 2×, because range
    ≤ band), equi-join on the bucket id, then apply the exact range
    residual.  Same rows, shuffle-sized cost; each (a, b) pair meets
    in exactly one bucket so no dedup pass is needed.  The oracle runs
    the same banded formulation (so it stays bounded on any replica
    scale); the banded ≡ unbanded semantics proof is pinned separately
    in tests/test_scale.py::test_banded_rewrites_equal_naive_joins."""
    BAND = 5_000_000  # µs — equals the range width
    ev = t(spark, sf_dir, "events").select("event_id", F.unix_micros("ts").alias("us"))
    a = ev.select(
        "event_id",
        "us",
        F.explode(
            F.array(F.floor(F.col("us") / BAND), F.floor(F.col("us") / BAND) + 1)
        ).alias("jbkt"),
    )
    b = ev.select(
        F.col("event_id").alias("b_id"),
        F.col("us").alias("b_us"),
        F.floor(F.col("us") / BAND).alias("jbkt"),
    )
    pairs = a.join(b, "jbkt").filter(
        (F.col("b_us") - F.col("us")).between(0, BAND)
        & (F.col("event_id") != F.col("b_id"))
    )
    return (
        pairs.groupBy(
            F.floor(F.col("us") / 3_600_000_000).cast("bigint").alias("hour_bucket")
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@query(
    "join_cross",
    oracle="""
    SELECT r1.r_name AS from_region, r2.r_name AS to_region
    FROM region r1 CROSS JOIN region r2
    WHERE r1.r_regionkey <> r2.r_regionkey
    """,
)
def join_cross(spark, sf_dir):
    """J8 guarded cross join (small-N similarity baseline shape)."""
    r1 = t(spark, sf_dir, "region").alias("r1")
    r2 = t(spark, sf_dir, "region").alias("r2")
    return (
        r1.crossJoin(r2)
        .filter(F.col("r1.r_regionkey") != F.col("r2.r_regionkey"))
        .select(F.col("r1.r_name").alias("from_region"), F.col("r2.r_name").alias("to_region"))
    )


# ---------------------------------------------------------------------------
# Sorts / limits / top-k (§2.6 O1-O5)
# ---------------------------------------------------------------------------


@query(
    "sort_total_order",
    oracle="""
    SELECT s_suppkey, s_name,
           ROW_NUMBER() OVER (ORDER BY s_acctbal DESC, s_suppkey) AS pos
    FROM supplier
    """,
)
def sort_total_order(spark, sf_dir):
    """O1 total-order sort — THE core reference op [U zipnumclusterjob
    TotalOrderPartitioner].  Spark's RangePartitioner samples bounds
    internally (subsumes the whole SampleCDXJob, A5); the rank column
    makes the global order visible to the order-insensitive hash."""
    s = t(spark, sf_dir, "supplier")
    w = Window.orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))
    return s.select("s_suppkey", "s_name", F.row_number().over(w).alias("pos"))


@query(
    "topk_desc",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def topk_desc(spark, sf_dir):
    """O4 top-k — Spark plans TakeOrderedAndProject (per-partition heap
    + driver merge; no full sort, no full shuffle).  O5 reverse order.
    ``sort=closest`` k-nearest analogue [B]."""
    o = t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "limit_paged",
    oracle="""
    SELECT o_orderkey, o_orderdate::DATE AS order_date FROM orders
    ORDER BY o_orderkey LIMIT 20 OFFSET 40
    """,
)
def limit_paged(spark, sf_dir):
    """O3 limit/pagination (cdx-server ``limit``/``page`` [B]) via
    ordered offset window."""
    o = t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", F.col("o_orderdate").cast("date").alias("order_date"))
        .orderBy("o_orderkey")
        .offset(40)
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Set operations (§2.7)
# ---------------------------------------------------------------------------


@query(
    "set_union_all",
    oracle="""
    SELECT k, COUNT(*) AS n FROM (
      SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
      UNION ALL
      SELECT o_custkey AS k FROM orders WHERE o_totalprice > 200000
    ) GROUP BY k
    """,
)
def set_union_all(spark, sf_dir):
    """Union (merging monthly crawl indexes analogue) — bag semantics."""
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    b = o.filter(F.col("o_totalprice") > 200000).select(F.col("o_custkey").alias("k"))
    return a.unionByName(b).groupBy("k").agg(F.count(F.lit(1)).alias("n"))


@query(
    "set_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_intersect(spark, sf_dir):
    """Intersect (distinct semantics, both engines)."""
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.intersect(b)


@query(
    "set_except_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_totalprice > 150000
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def set_except_all(spark, sf_dir):
    """ExceptAll (crawl-diff analogue) — multiset difference."""
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 150000).select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return a.exceptAll(b)


# ---------------------------------------------------------------------------
# Scalar functions (§2.8 F2-F10)
# ---------------------------------------------------------------------------


@query(
    "fn_timestamp14",
    oracle="""
    SELECT strftime(o_orderdate, '%Y%m%d%H%M%S') AS ts14,
           COUNT(*) AS n
    FROM orders
    WHERE strftime(o_orderdate, '%Y%m%d%H%M%S') BETWEEN '19960101000000' AND '19971231235959'
    GROUP BY ts14
    """,
)
def fn_timestamp14(spark, sf_dir):
    """F2 timestamp ↔ 14-digit CDX string; string compare is
    order-correct (P4 range semantics on the wire format)."""
    o = t(spark, sf_dir, "orders")
    ts14 = F.date_format("o_orderdate", "yyyyMMddHHmmss")
    return (
        o.select(ts14.alias("ts14"))
        .filter(F.col("ts14").between("19960101000000", "19971231235959"))
        .groupBy("ts14")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "fn_string_ops",
    oracle="""
    SELECT p_partkey,
           upper(substr(p_name, 1, 4)) AS head,
           length(p_name) AS name_len,
           lpad(CAST(p_size AS VARCHAR), 3, '0') AS size3,
           concat(p_brand, ':', trim(p_type)) AS brand_type,
           replace(p_name, 'a', '@') AS subbed
    FROM part WHERE p_size >= 25
    """,
)
def fn_string_ops(spark, sf_dir):
    """F3 string ops — CDX field munging family [U mappers]."""
    p = t(spark, sf_dir, "part")
    return p.filter(F.col("p_size") >= 25).select(
        "p_partkey",
        F.upper(F.substring("p_name", 1, 4)).alias("head"),
        F.length("p_name").alias("name_len"),
        F.lpad(F.col("p_size").cast("string"), 3, "0").alias("size3"),
        F.concat_ws(":", F.col("p_brand"), F.trim(F.col("p_type"))).alias("brand_type"),
        F.regexp_replace("p_name", "a", "@").alias("subbed"),
    )


@query(
    "fn_hash_digests",
    oracle="""
    SELECT doc_id,
           md5(text) AS text_md5,
           sha256(text) AS text_sha256
    FROM documents WHERE doc_id < 50
    """,
)
def fn_hash_digests(spark, sf_dir):
    """F4 content digests — the reference SHA-1s every payload for the
    CDX digest field [U S2]; md5/sha256 shown here (DuckDB 1.0 lacks
    sha1), sha1+xxhash64 exercised in pytest."""
    d = t(spark, sf_dir, "documents")
    return d.filter(F.col("doc_id") < 50).select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
    )


@query(
    "fn_math",
    oracle=f"""
    SELECT l_linenumber,
           CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_bucket,
           COUNT(*) AS n,
           MAX(ABS({sql_hround('l_discount - 0.05', 2)})) AS max_disc_dev,
           CAST(MIN(CEIL(l_quantity)) AS BIGINT) AS min_qty_ceil
    FROM lineitem GROUP BY l_linenumber, price_bucket
    """,
)
def fn_math(spark, sf_dir):
    """F5 math ops — offset/length arithmetic family [U S6]."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy(
        "l_linenumber",
        F.floor(F.col("l_extendedprice") / 1000).cast("bigint").alias("price_bucket"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.max(F.abs(hround(F.col("l_discount") - 0.05, 2))).alias("max_disc_dev"),
        F.min(F.ceil("l_quantity")).cast("bigint").alias("min_qty_ceil"),
    )


@query(
    "fn_datetime",
    oracle="""
    SELECT EXTRACT(YEAR FROM o_orderdate) AS yr,
           EXTRACT(MONTH FROM o_orderdate) AS mo,
           date_trunc('week', o_orderdate)::DATE AS wk_start,
           COUNT(*) AS n
    FROM orders GROUP BY yr, mo, wk_start
    """,
)
def fn_datetime(spark, sf_dir):
    """F6 date/time extraction + bucketing (events/orders tables)."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy(
        F.year("o_orderdate").cast("bigint").alias("yr"),
        F.month("o_orderdate").cast("bigint").alias("mo"),
        F.date_trunc("week", F.col("o_orderdate")).cast("date").alias("wk_start"),
    ).agg(F.count(F.lit(1)).alias("n"))


@query(
    "fn_conditional",
    oracle="""
    SELECT CASE WHEN o_totalprice >= 200000 THEN 'high'
                WHEN o_totalprice >= 100000 THEN 'mid'
                ELSE 'low' END AS bucket,
           COUNT(*) AS n,
           COUNT(NULLIF(o_orderstatus, 'O')) AS n_not_open,
           COALESCE(MAX(CASE WHEN o_orderstatus = 'P' THEN o_orderkey END), -1) AS max_pending_key
    FROM orders GROUP BY bucket
    """,
)
def fn_conditional(spark, sf_dir):
    """F7 CASE/coalesce/nullif — the CDX '-' placeholder handling."""
    o = t(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") >= 200000, "high")
        .when(F.col("o_totalprice") >= 100000, "mid")
        .otherwise("low")
    )
    return o.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.nullif(F.col("o_orderstatus"), F.lit("O"))).alias("n_not_open"),
        F.coalesce(
            F.max(F.when(F.col("o_orderstatus") == "P", F.col("o_orderkey"))), F.lit(-1)
        ).alias("max_pending_key"),
    )


@query(
    "fn_array_ops",
    oracle=f"""
    SELECT vec_id,
           len(embedding) AS dim,
           {sql_hround('CAST(list_max(embedding) AS DOUBLE)', 4)} AS max_val,
           {sql_hround('CAST(list_sum(list_transform(embedding[1:8], x -> CAST(x AS DECIMAL(18,7)))) AS DOUBLE)', 4)} AS head_sum
    FROM embeddings WHERE vec_id < 100
    """,
)
def fn_array_ops(spark, sf_dir):
    """F8 array ops over the embedding column (size/slice/max/
    aggregate) — all JVM-side higher-order functions, no UDF."""
    e = t(spark, sf_dir, "embeddings")
    head_sum = F.aggregate(
        F.slice("embedding", 1, 8),
        F.lit(0).cast("decimal(28,7)"),
        lambda acc, x: (acc + x.cast("decimal(18,7)")).cast("decimal(28,7)"),
    )
    return e.filter(F.col("vec_id") < 100).select(
        "vec_id",
        F.size("embedding").cast("bigint").alias("dim"),
        hround(F.array_max("embedding").cast("double"), 4).alias("max_val"),
        hround(head_sum.cast("double"), 4).alias("head_sum"),
    )


@query(
    "fn_json_map",
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod,
           COUNT(*) AS n,
           MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
    FROM events GROUP BY k_mod
    """,
)
def fn_json_map(spark, sf_dir):
    """F9 JSON tail parsing — CDXJ's dynamic JSON payload analogue."""
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy((k % 10).alias("k_mod")).agg(
        F.count(F.lit(1)).alias("n"), F.max(k).alias("max_k")
    )


@query(
    "fn_cast",
    oracle="""
    SELECT CAST(FLOOR(c_acctbal) AS BIGINT) AS bal_int,
           CAST(c_nationkey AS VARCHAR) AS nation_str,
           COUNT(*) AS n
    FROM customer
    WHERE CAST(FLOOR(c_acctbal) AS BIGINT) > 1000
    GROUP BY bal_int, nation_str
    """,
)
def fn_cast(spark, sf_dir):
    """F10 casts — string-wire CDX → typed columns."""
    c = t(spark, sf_dir, "customer")
    return (
        c.select(
            F.floor("c_acctbal").cast("bigint").alias("bal_int"),
            F.col("c_nationkey").cast("string").alias("nation_str"),
        )
        .filter(F.col("bal_int") > 1000)
        .groupBy("bal_int", "nation_str")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "fn_url_parse",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://www.' || source || '.example.org:8080/doc/' || doc_id
               || '?a=' || (doc_id % 5) || '&b=2#frag' AS url
      FROM documents WHERE doc_id < 300
    )
    SELECT doc_id,
           regexp_extract(url, '^([a-z]+)://', 1) AS protocol,
           regexp_extract(url, '://([^/:?#]+)', 1) AS host,
           regexp_extract(url, '://[^/?#]*(/[^?#]*)', 1) AS path,
           regexp_extract(url, '\\?([^#]*)', 1) AS query,
           regexp_extract(url, 'a=([^&#]*)', 1) AS param_a,
           regexp_extract(url, '#(.*)$', 1) AS frag
    FROM u
    """,
)
def fn_url_parse(spark, sf_dir):
    """F3/F9 URL decomposition via Spark's native ``parse_url``
    (PROTOCOL / HOST / PATH / QUERY / QUERY:key / REF) — the
    structural complement of the SURT canonicalizer for per-component
    analytics (host rollups, parameter mining).  The oracle recomputes
    every component with independent regexes, so this cross-checks
    Spark's Java-URI-based extraction against a second implementation
    rather than itself."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    url = F.concat(
        F.lit("https://www."),
        F.col("source"),
        F.lit(".example.org:8080/doc/"),
        F.col("doc_id").cast("string"),
        F.lit("?a="),
        (F.col("doc_id") % 5).cast("string"),
        F.lit("&b=2#frag"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url("url", F.lit("PROTOCOL")).alias("protocol"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("a")).alias("param_a"),
        F.parse_url("url", F.lit("REF")).alias("frag"),
    )


_LANGS = ("de", "en", "es", "fr", "zh")


@query(
    "agg_pivot_unpivot",
    oracle=f"""
    WITH p AS (
      SELECT source,
             {", ".join(f"CAST(SUM(CASE WHEN lang = '{lg}' THEN 1 ELSE 0 END) AS BIGINT) AS {lg}" for lg in _LANGS)}
      FROM documents GROUP BY source
    )
    SELECT source, lang, n FROM (
      {" UNION ALL ".join(f"SELECT source, '{lg}' AS lang, {lg} AS n FROM p" for lg in _LANGS)}
    ) WHERE n > 0
    """,
)
def agg_pivot_unpivot(spark, sf_dir):
    """Pivot + unpivot round trip: per-source document counts pivoted
    into one column per language (``groupBy().pivot(values=...)`` —
    the explicit value list keeps it one pass; value-less pivot adds a
    distinct-scan job), then melted back with ``unpivot`` and zero
    rows dropped.  The oracle states the same contract as conditional
    aggregation + UNION ALL, so the hash match pins both directions.
    Pivot at scale is just a grouped aggregate whose exchange carries
    one row per (group × |values|) — no new shuffle shape."""
    d = t(spark, sf_dir, "documents")
    p = (
        d.groupBy("source")
        .pivot("lang", list(_LANGS))
        .agg(F.count(F.lit(1)))
        .na.fill(0, list(_LANGS))
    )
    return (
        p.unpivot("source", list(_LANGS), "lang", "n")
        .filter(F.col("n") > 0)
        .select("source", "lang", F.col("n").cast("bigint").alias("n"))
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey & 255 AS BIGINT) AS lo_byte,
           CAST(o_orderkey | 4096 AS BIGINT) AS with_flag,
           CAST(xor(o_orderkey, 21845) AS BIGINT) AS xored,
           CAST(o_orderkey << 2 AS BIGINT) AS shl2,
           CAST(o_orderkey >> 3 AS BIGINT) AS shr3,
           CAST(bit_count(o_orderkey) AS INT) AS popcnt
    FROM orders WHERE o_orderkey < 2000
    """,
)
def fn_bitwise(spark, sf_dir):
    """F5-adjacent bitwise family: and/or/xor, shifts, popcount — the
    primitives the fingerprint/banding operators (SimHash, pHash,
    LSH bucketing) are built from, checked standalone."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).cast("bigint").alias("lo_byte"),
        k.bitwiseOR(F.lit(4096)).cast("bigint").alias("with_flag"),
        k.bitwiseXOR(F.lit(21845)).cast("bigint").alias("xored"),
        F.shiftleft(k, 2).cast("bigint").alias("shl2"),
        F.shiftright(k, 3).cast("bigint").alias("shr3"),
        F.bit_count(k).cast("int").alias("popcnt"),
    )


@query(
    "sql_interface_flagship",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n,
           {sql_dsum('l_quantity', 'sum_qty')}
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def sql_interface_flagship(spark, sf_dir):
    """The pure-SQL front door: tables registered as temp views
    (tables.load_tables), the query written as ``spark.sql`` text —
    proving a SQL-only consumer gets the same engine (identical
    Catalyst plan as the DataFrame chain; the decimal-routed sum
    discipline works verbatim in SQL)."""
    from ..tables import load_tables

    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n,
               CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE)
                 AS sum_qty
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        """
    )


@query(
    "ops_merge_upsert",
    oracle="""
    WITH changes AS (
      SELECT o_orderkey AS key,
             CASE WHEN o_orderkey % 11 = 3 THEN 'delete'
                  WHEN o_orderkey % 7 = 0 THEN 'update' END AS op,
             o_totalprice + 100.0 AS new_price
      FROM orders
      WHERE o_orderkey % 11 = 3 OR o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey + 1000000 AS key, 'insert' AS op,
             CAST(o_orderkey AS DOUBLE) AS new_price
      FROM orders WHERE o_orderkey % 13 = 1
    )
    SELECT COALESCE(b.o_orderkey, c.key) AS key,
           CASE WHEN c.op IS NULL THEN 'kept' ELSE c.op END AS action,
           CASE WHEN c.op = 'update' OR c.op = 'insert'
                THEN c.new_price ELSE b.o_totalprice END AS price
    FROM orders b FULL OUTER JOIN changes c ON b.o_orderkey = c.key
    WHERE c.op IS DISTINCT FROM 'delete'
    """,
)
def ops_merge_upsert(spark, sf_dir):
    """MERGE INTO semantics (upsert + delete) as a declarative plan —
    the index-maintenance op the epoch/compaction machinery implements
    physically, here at row granularity: a change batch (updates for
    keys ≡0 mod 7, deletes for ≡3 mod 11, inserts beyond the key
    space) applied to the snapshot via ONE full outer join on the key
    + conditional projection.  At scale both sides hash-shuffle once
    on the merge key (or zero times on bucketed tables); no MERGE
    statement or transactional format is required for the semantics —
    Delta/Iceberg add the commit protocol, not the plan shape."""
    o = t(spark, sf_dir, "orders")
    upd = o.filter((F.col("o_orderkey") % 11 == 3) | (F.col("o_orderkey") % 7 == 0)).select(
        F.col("o_orderkey").alias("key"),
        F.when(F.col("o_orderkey") % 11 == 3, "delete").otherwise("update").alias("op"),
        (F.col("o_totalprice") + 100.0).alias("new_price"),
    )
    ins = o.filter(F.col("o_orderkey") % 13 == 1).select(
        (F.col("o_orderkey") + 1000000).alias("key"),
        F.lit("insert").alias("op"),
        F.col("o_orderkey").cast("double").alias("new_price"),
    )
    changes = upd.unionByName(ins)
    base = o.select("o_orderkey", "o_totalprice")
    merged = base.join(changes, base["o_orderkey"] == changes["key"], "full_outer")
    return (
        merged.filter(F.col("op").isNull() | (F.col("op") != "delete"))
        .select(
            F.coalesce(F.col("o_orderkey"), F.col("key")).alias("key"),
            F.coalesce(F.col("op"), F.lit("kept")).alias("action"),
            F.when(
                F.col("op").isin("update", "insert"), F.col("new_price")
            ).otherwise(F.col("o_totalprice")).alias("price"),
        )
    )


@query(
    "agg_histogram_width_bucket",
    oracle="""
    SELECT CAST(CASE WHEN o_totalprice < 0.0 THEN 0
                     WHEN o_totalprice >= 600000.0 THEN 21
                     ELSE 1 + FLOOR(o_totalprice / 30000.0) END AS BIGINT) AS bucket,
           COUNT(*) AS n,
           CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
           CAST(MAX(o_totalprice) AS DOUBLE) AS hi
    FROM orders GROUP BY bucket
    """,
)
def agg_histogram_width_bucket(spark, sf_dir):
    """Equi-width histogram via Spark's ``width_bucket`` — the
    profiling aggregate behind data-quality dashboards and
    shard-balance checks; one partial+final aggregate, 20 groups
    cross the wire.  DuckDB ships no width_bucket, so the oracle
    states the definition explicitly — ``1 + FLOOR(v / w)`` with the
    same IEEE division/floor Spark's operator performs (bucket width
    600000/20 = 30000 is exact), under/overflow pinned to 0 / n+1."""
    o = t(spark, sf_dir, "orders")
    return (
        o.select(
            F.width_bucket("o_totalprice", F.lit(0.0), F.lit(600000.0), F.lit(20)).alias(
                "bucket"
            ),
            "o_totalprice",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").cast("double").alias("lo"),
            F.max("o_totalprice").cast("double").alias("hi"),
        )
    )
