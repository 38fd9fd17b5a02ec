"""Bucketed (pre-shuffled) tables for co-located joins (SURVEY.md §4).

At 100 TB the dominant cost of a fact-fact equi-join is shuffling both
sides.  Bucketing pays that shuffle ONCE at write time: both tables
are hash-partitioned into the same number of buckets on the join key
and each bucket sorted, so every subsequent join on that key is a
zero-exchange sort-merge of aligned bucket pairs.  This is the Spark
analogue of the reference's fixed shard layout — the ZipNum cluster is
itself a "bucketed-by-range" artifact whose reader exploits the layout
the same way.

Uses the session catalog's managed-table path (``saveAsTable`` with
``bucketBy``) — plain parquet + catalog metadata, no Hive required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    *,
    buckets: int = 8,
    mode: str = "overwrite",
) -> None:
    """Materialize ``df`` as a bucketed+sorted managed table on ``key``."""
    (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on ``key``; with matching bucket
    counts Catalyst plans a SortMergeJoin with NO exchange on either
    side (assert via .explain — see tests/test_bucketing.py)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)


def zorder_key(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = 16,
    bucketing: str = "linear",
):
    """The Morton-key COLUMN for z-order clustering, plus its recipe
    metadata — factored out of ``write_zordered`` so any sink
    (``write_zordered``'s plain rewrite, the cc-index parquet store's
    OPTIMIZE-ZORDER compaction) can cluster on the same key.

    Numeric dimensions bucket by ``bucketing`` (linear min/max scale,
    or equi-depth ``approxQuantile`` boundaries — see
    ``write_zordered``).  STRING dimensions (round 13: the cc-index
    ``url_surtkey``) have no linear scale; in ``quantile`` mode their
    boundaries come from EXACT equi-depth tiles via the two-pass
    global rank (``operators/global_rank.exact_ntile`` — one narrow
    single-column shuffle per string dimension, amortized into the
    layout rewrite; no single-task sort, no driver-side data beyond
    the ≤255 boundary strings).  Boundaries shape only the LAYOUT,
    never an answer.

    Returns ``(key_column, {"bits", "bucketing", "stats", "bounds"})``
    — ``bits`` is the post-cap per-dimension resolution."""
    import functools

    from pyspark.sql import functions as F

    if bucketing not in ("linear", "quantile"):
        raise ValueError(f"unknown bucketing {bucketing!r}")
    if not cols:
        raise ValueError("zorder: need at least one column")
    ncols = len(cols)
    # the Morton key must fit a signed 64-bit long: Spark's shiftleft
    # wraps shift amounts mod 64, and bit 63 is the sign bit (largest
    # keys would sort most-negative) — so cap total interleaved bits
    # at 62 and shrink per-dimension resolution for wide column sets.
    # Past 62 columns even 1 bit each overflows into the sign bit, and
    # a >62-dimension Morton key is useless anyway (each dimension
    # would get <1 bit of locality) — refuse rather than mis-sort.
    if ncols > 62:
        raise ValueError(
            f"zorder: {ncols} columns exceed the 62-bit Morton budget "
            f"(1 bit/dimension minimum); cluster on fewer columns"
        )
    bits = max(1, min(bits, 62 // ncols))
    dtypes = dict(df.dtypes)
    str_cols = [c for c in cols if dtypes.get(c) == "string"]
    num_cols = [c for c in cols if c not in str_cols]
    if str_cols and bucketing == "linear":
        raise ValueError(
            f"zorder: string column(s) {str_cols} have no linear "
            f"scale — use bucketing='quantile'"
        )
    stats: dict[str, tuple] = {}
    terms = []
    bounds: dict[str, list] = {}
    if bucketing == "linear" and num_cols:
        row = df.agg(
            *[F.min(F.col(c).cast("double")).alias(f"mn_{j}")
              for j, c in enumerate(num_cols)],
            *[F.max(F.col(c).cast("double")).alias(f"mx_{j}")
              for j, c in enumerate(num_cols)],
        ).first()
        for j, c in enumerate(num_cols):
            if row[f"mn_{j}"] is None or row[f"mx_{j}"] is None:
                raise ValueError(
                    f"zorder: column {c!r} has no non-NULL values "
                    f"(empty input?) — nothing to cluster"
                )
            stats[c] = (float(row[f"mn_{j}"]), float(row[f"mx_{j}"]))
    if bucketing == "quantile":
        bits = min(bits, 8)
        nb = (1 << bits) - 1
        if num_cols:
            probs = [i / (nb + 1) for i in range(1, nb + 1)]
            # ONE aggregation action derives min/max AND the equi-depth
            # boundaries for every numeric column (round 16): the
            # former separate min/max agg + stat.approxQuantile pass
            # cost two sequential actions over the (possibly just
            # materialized) projection.  percentile_approx with
            # accuracy = 1/relativeError runs the same Greenwald-Khanna
            # sketch; boundaries only shape the LAYOUT (never an
            # answer), so a loose sketch error stays free.
            probs_sql = "array(" + ",".join(repr(p) for p in probs) + ")"
            row = df.agg(
                *[F.min(F.col(c).cast("double")).alias(f"mn_{j}")
                  for j, c in enumerate(num_cols)],
                *[F.max(F.col(c).cast("double")).alias(f"mx_{j}")
                  for j, c in enumerate(num_cols)],
                *[
                    F.expr(
                        f"percentile_approx(CAST(`{c}` AS DOUBLE), "
                        f"{probs_sql}, 100)"
                    ).alias(f"qs_{j}")
                    for j, c in enumerate(num_cols)
                ],
            ).first()
            for j, c in enumerate(num_cols):
                if row[f"mn_{j}"] is None or row[f"mx_{j}"] is None:
                    raise ValueError(
                        f"zorder: column {c!r} has no non-NULL values "
                        f"(empty input?) — nothing to cluster"
                    )
                stats[c] = (float(row[f"mn_{j}"]), float(row[f"mx_{j}"]))
                bounds[c] = [float(q) for q in row[f"qs_{j}"]]
        for c in str_cols:
            from .global_rank import exact_ntile

            tiles = exact_ntile(
                df.select(c).filter(F.col(c).isNotNull()),
                [c], nb + 1, tile_col="__zt",
            )
            rows = (
                tiles.groupBy("__zt")
                .agg(F.min(c).alias("b"), F.max(c).alias("t"))
                .orderBy("__zt")
                .collect()
            )
            if not rows:
                raise ValueError(
                    f"zorder: column {c!r} has no non-NULL values "
                    f"(empty input?) — nothing to cluster"
                )
            bounds[c] = [r["b"] for r in rows[1:]]
            stats[c] = (rows[0]["b"], rows[-1]["t"])
    top = (1 << bits) - 1
    # Bit-spread lookup: spread(b) places bit i of b at position
    # i*ncols, so the Morton key is sum_j spread(b_j) << j.  A literal
    # 2^bits-long table referenced by ONE element_at keeps each
    # dimension's bucket expression appearing EXACTLY ONCE in the
    # plan.  The previous per-bit loop copied the whole bucket
    # expression into every one of the ``bits`` terms — for the
    # quantile mode (a (2^bits - 1)-boundary fold) that inlined
    # thousands of comparisons per row, blew past whole-stage
    # codegen's limits into interpreted evaluation, and cost seconds
    # of py4j expression construction per call (round-15 profiling:
    # computing __z alone on an 11.5k-row index read 14.6 s; the
    # rewrite reads it in milliseconds).  Built ONLY in quantile mode,
    # where bits is capped at 8 (256 entries): linear mode's bits can
    # reach 62, where a 2^bits table would hang the driver, and its
    # arithmetic bucket is a handful of nodes so the per-bit loop
    # stays cheap.
    if bucketing == "quantile":
        spread_sql = "array(" + ",".join(
            str(sum(((b >> i) & 1) << (i * ncols) for i in range(bits))) + "L"
            for b in range(1 << bits)
        ) + ")"

    def _sql_str(s: str) -> str:
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    for j, c in enumerate(cols):
        if bucketing == "quantile" and c in str_cols:
            # count of boundaries <= value, as one array fold over a
            # literal boundary array (NULL key -> NULL bucket, the
            # same propagation as the previous literal-sum form)
            lits = ",".join(_sql_str(bv) for bv in bounds[c])
            b = F.when(
                F.col(c).isNull(), F.lit(None).cast("bigint")
            ).otherwise(
                F.expr(
                    f"size(filter(array({lits}), bd -> `{c}` >= bd))"
                ).cast("bigint")
            )
        elif bucketing == "quantile":
            # NULL values count zero boundaries -> bucket 0, matching
            # the previous CASE-fold's ELSE arm
            lits = ",".join(f"{b!r}D" for b in bounds[c])
            b = F.expr(
                f"size(filter(array({lits}), bd -> "
                f"CAST(`{c}` AS DOUBLE) >= bd))"
            ).cast("bigint")
        else:
            mn, mx = stats[c]
            span = (mx - mn) or 1.0
            scaled = (
                (F.col(c).cast("double") - F.lit(mn)) / F.lit(span)
            ) * F.lit(float(top))
            b = F.greatest(
                F.lit(0).cast("bigint"),
                F.least(
                    F.floor(scaled).cast("bigint"),
                    F.lit(top).cast("bigint"),
                ),
            )
        if bucketing == "quantile":
            terms.append(
                F.shiftleft(
                    F.element_at(
                        F.expr(spread_sql), (b + 1).cast("int")
                    ),
                    j,
                )
            )
        else:
            for i in range(bits):
                terms.append(
                    F.shiftleft(
                        F.shiftright(b, i).bitwiseAND(F.lit(1)),
                        i * ncols + j,
                    )
                )
    zval = functools.reduce(lambda x, y: x + y, terms)
    return zval, {
        "bits": bits, "bucketing": bucketing,
        "stats": stats, "bounds": bounds,
    }


def write_zordered(
    df: DataFrame,
    out_dir: str,
    cols: list[str],
    *,
    bits: int = 16,
    n_files: int = 16,
    bucketing: str = "linear",
) -> dict:
    """Z-ORDER clustering (the Delta/Iceberg ``OPTIMIZE ZORDER``
    layout technique): co-locate rows that are close in EVERY listed
    dimension, so parquet min/max stats prune multi-predicate scans.

    A single-column sort prunes only its leading column — at 100 TB a
    box query ``user BETWEEN .. AND value BETWEEN ..`` over a
    user-sorted table still reads every file for the value predicate
    (each file spans the full value range).  Interleaving the bits of
    the range-normalized dimensions into one Morton key and
    range-partitioning + sorting on it bounds BOTH dimensions per
    file, so every file's footer stats exclude it from most boxes.

    ``bucketing`` picks the normalization:

    * ``linear`` — one tiny min/max aggregate, values scaled linearly
      into ``bits`` buckets.  Right for ~uniform dimensions; a skewed
      dimension wastes buckets on its empty tail, so boxes in the
      DENSE region still touch many files.
    * ``quantile`` — ``approxQuantile`` boundaries (equi-depth, the
      Delta OPTIMIZE behavior), bucket = #boundaries ≤ value via a
      JVM-side fold; ``bits`` is capped at 8 (255 boundary literals).
      Equal rows per bucket regardless of skew, so dense-region boxes
      prune as well as tail boxes.

    Buckets are bit-interleaved into the Morton key,
    ``repartitionByRange`` + local sort on the key (dropped before
    write — layout-only, the stored schema is the input schema), plus
    a ``_zorder.json`` sidecar (underscore-prefixed so parquet
    readers ignore it) recording the recipe.  Returns the per-column
    (min, max) stats.  The read path is PLAIN ``spark.read.parquet``
    — pruning is Catalyst's ordinary pushdown meeting
    better-organized footers, no custom reader."""
    import json

    from pyspark.sql import functions as F

    zval, meta = zorder_key(df, cols, bits=bits, bucketing=bucketing)
    stats = meta["stats"]
    (
        df.withColumn("__z", zval)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    # sidecar rides the same pyarrow.fs abstraction as every other
    # sink sidecar (zipnum/ann_index) so an s3://hdfs:// out_dir works
    # end to end — a plain open() here would crash AFTER the full
    # parquet rewrite succeeded
    from ..sinks.zipnum import _fs_for, _join

    fs, local = _fs_for(out_dir)
    payload = json.dumps(
        {"cols": cols, "bits": meta["bits"], "n_files": n_files,
         "bucketing": bucketing,
         "stats": {c: list(v) for c, v in stats.items()},
         "bounds": meta["bounds"]}
    ).encode()
    with fs.open_output_stream(_join(local, "_zorder.json")) as fh:
        fh.write(payload)
    return stats


def parquet_files_intersecting(
    out_dir: str, col: str, lo: float, hi: float
) -> tuple[int, int]:
    """(intersecting, total) data files under ``out_dir`` whose
    parquet footer min/max for ``col`` intersect ``[lo, hi]`` — the
    file-skipping a stats-aware reader performs, computed from the
    same footers.  Evidence helper for layout tests; not a query
    path."""
    import posixpath

    import pyarrow.parquet as pq
    from pyarrow import fs as pafs

    from ..sinks.zipnum import _fs_for

    fs, local = _fs_for(out_dir)
    infos = fs.get_file_info(pafs.FileSelector(local))
    names = sorted(
        posixpath.basename(i.path)
        for i in infos
        if i.type == pafs.FileType.File
    )
    inter = total = 0
    for name in names:
        if not name.endswith(".parquet"):
            continue
        with fs.open_input_file(posixpath.join(local, name)) as f:
            md = pq.ParquetFile(f).metadata
        total += 1
        lo_f = hi_f = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                cc = md.row_group(rg).column(ci)
                if cc.path_in_schema == col and cc.statistics is not None:
                    mn, mx = cc.statistics.min, cc.statistics.max
                    lo_f = mn if lo_f is None else min(lo_f, mn)
                    hi_f = mx if hi_f is None else max(hi_f, mx)
        if lo_f is None or (hi_f >= lo and lo_f <= hi):
            inter += 1
    return inter, total
