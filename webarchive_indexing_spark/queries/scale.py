"""Scale-pattern and pandas-UDF-surface queries: skew salting (§4),
split-point quantiles (A5), grouping sets (A6), grouped-map /
grouped-agg pandas UDFs (U2/U3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.skew import replicated_skew_join, salted_two_phase_agg
from ..registry import query
from .helpers import dsum, hround, sql_dsum, sql_hround, t


@query(
    "skew_salted_agg",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n,
           {sql_dsum('value', 'total_value')},
           MAX(user_id) AS max_user
    FROM events GROUP BY event_type
    """,
)
def skew_salted_agg(spark, sf_dir):
    """§4 skew handling: two-phase salted aggregation on a low-
    cardinality (⇒ hot) key.  The oracle is the PLAIN group-by —
    salting must be physically different, logically identical.  (5
    event types over any number of rows is exactly the shape where one
    reducer eats the world at 100 TB.)"""
    ev = t(spark, sf_dir, "events").withColumn(
        "__v_dec", F.col("value").cast("decimal(18,6)")
    )
    out = salted_two_phase_agg(
        ev,
        key="event_type",
        salt_col="event_id",
        aggs={
            "n": ("count", None),
            "total_dec": ("sum", "__v_dec"),
            "max_user": ("max", "user_id"),
        },
        salt_n=16,
    )
    return out.select(
        "event_type",
        "n",
        F.round(F.col("total_dec"), 2).cast("double").alias("total_value"),
        "max_user",
    )


@query(
    "skew_replicated_join",
    oracle=f"""
    SELECT n_name, COUNT(*) AS n_cust, {sql_dsum('c_acctbal', 'total_bal')}
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def skew_replicated_join(spark, sf_dir):
    """§4 replicated skew join: salt the (skewed) fact side, replicate
    the dim ×8, join on (key, salt).  Oracle = the plain join."""
    c = t(spark, sf_dir, "customer").withColumnRenamed("c_nationkey", "nk")
    n = t(spark, sf_dir, "nation").withColumnRenamed("n_nationkey", "nk")
    joined = replicated_skew_join(c, n, "nk", salt_n=8, salt_source="c_custkey")
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_cust"), dsum("c_acctbal", "total_bal")
    )


@query(
    "quantile_split_points",
    oracle=f"""
    SELECT
      {sql_hround('quantile_cont(o_totalprice, 0.25)', 4)} AS q25,
      {sql_hround('quantile_cont(o_totalprice, 0.50)', 4)} AS q50,
      {sql_hround('quantile_cont(o_totalprice, 0.75)', 4)} AS q75,
      {sql_hround('quantile_cont(o_totalprice, 0.95)', 4)} AS q95
    FROM orders
    """,
)
def quantile_split_points(spark, sf_dir):
    """A5 split-point computation [U samplecdxjob.py]: exact quantiles
    as range-partition boundaries.  In production the engine never
    materializes these (repartitionByRange samples internally — §4);
    this is the observable twin.  Spark `percentile` and DuckDB
    `quantile_cont` share the (n-1)p linear-interpolation definition."""
    o = t(spark, sf_dir, "orders")
    return o.agg(
        *[
            hround(F.percentile("o_totalprice", F.lit(p)), 4).alias(f"q{int(p * 100)}")
            for p in (0.25, 0.50, 0.75, 0.95)
        ]
    )


@query(
    "agg_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           {sql_dsum('l_extendedprice', 'total')}
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark, sf_dir):
    """A6 explicit grouping sets (beyond rollup/cube): per-flag,
    per-status, and grand-total rows in one pass."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               {sql_dsum('l_extendedprice', 'total')}
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@query(
    "pandas_grouped_map_znorm",
    oracle=f"""
    WITH s AS (
      SELECT user_id, event_id, value,
             AVG(value)         OVER (PARTITION BY user_id) AS m,
             STDDEV_SAMP(value) OVER (PARTITION BY user_id) AS sd
      FROM events
    )
    SELECT user_id, event_id,
           {sql_hround("CASE WHEN sd IS NULL OR sd <= 0 THEN 0.0"
                       " ELSE (value - m) / sd END", 3)} AS znorm
    FROM s
    """,
)
def pandas_grouped_map_znorm(spark, sf_dir):
    """U2 grouped-map applyInPandas: per-user z-normalization of event
    values — the per-group-reshape shape that has no single built-in.

    Oracle = the window formulation (avg/stddev_samp over user_id).
    pandas (pairwise summation) and DuckDB (streaming moments) agree
    to ~1e-12 on mean/sd; rounding at 3dp absorbs that, so the UDF
    path stays hash-comparable."""
    import pandas as pd

    ev = t(spark, sf_dir, "events").select("user_id", "event_id", "value")

    def znorm(pdf: "pd.DataFrame") -> "pd.DataFrame":
        v = pdf["value"]
        sd = v.std(ddof=1)
        z = (v - v.mean()) / sd if sd and sd > 0 else v * 0.0
        return pd.DataFrame(
            {"user_id": pdf["user_id"], "event_id": pdf["event_id"], "znorm": z}
        )

    out = ev.groupBy("user_id").applyInPandas(
        znorm, "user_id bigint, event_id bigint, znorm double"
    )
    return out.select("user_id", "event_id", hround(F.col("znorm"), 3).alias("znorm"))


@query(
    "pandas_grouped_agg_gini",
    oracle=f"""
    WITH r AS (
      SELECT event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS j,
             COUNT(*)     OVER (PARTITION BY event_type) AS n,
             SUM(value)   OVER (PARTITION BY event_type) AS s
      FROM events
    )
    SELECT event_type,
           {sql_hround('(n + 1 - 2 * SUM(value * (n - j + 1)) / s) / n', 4)}
             AS gini_value
    FROM r GROUP BY event_type, n, s
    """,
)
def pandas_grouped_agg_gini(spark, sf_dir):
    """U3 grouped-agg pandas UDF: per-event-type Gini coefficient of
    value — a rank-weighted statistic not in the built-in aggregate set.

    Oracle = the closed form G = (n+1 − 2·Σ x_(j)·(n−j+1)/S)/n over
    ascending ranks, algebraically equal to the UDF's cumsum form and
    invariant to tie order (tied x contribute equally); 4dp rounding
    absorbs float reduction-order drift."""
    import numpy as np
    import pandas
    from pyspark.sql.functions import pandas_udf

    globals()["pandas"] = pandas

    @pandas_udf("double")
    def gini(v: pandas.Series) -> float:
        x = np.sort(v.to_numpy(dtype="float64"))
        n = x.size
        if n == 0 or x.sum() == 0:
            return 0.0
        cum = np.cumsum(x)
        return float((n + 1 - 2 * (cum / cum[-1]).sum()) / n)

    ev = t(spark, sf_dir, "events")
    out = ev.groupBy("event_type").agg(gini("value").alias("g"))
    return out.select("event_type", hround(F.col("g"), 4).alias("gini_value"))
