"""ZipNum sharded cluster sink + block-pruning reader (SURVEY.md §1.1,
§2.1 S6, §3.2-3.3).

The queryable artifact of the reference pipeline [U zipnumclusterjob
.py reducer ~L90-200]: N shard files ``cdx-NNNNN.gz``, each a
concatenation of independent gzip members of ``numlines`` CDX lines;
a plain-text secondary index ``cluster.idx`` with one line per block
(``urlkey \\t timestamp \\t shard \\t offset \\t length`` = first key of
the block + its byte extent); and a ``.loc`` file mapping shard name →
path.  Lookup cost: O(log #blocks) on the secondary index + decompress
only the matching blocks.

Spark-first shape (§3.2): the reference needed THREE Hadoop jobs —
sample split points, total-order shuffle with TotalOrderPartitioner,
and a reducer that builds blocks.  Here it is ONE job:
``repartitionByRange(shards)`` (Spark's RangePartitioner reservoir-
samples bounds internally — the entire SampleCDXJob [U samplecdxjob
.py] is subsumed) → ``sortWithinPartitions`` → a partition-local
writer that gzips blocks and RETURNS the secondary index as a
DataFrame (byte offsets exist only inside the writer — keeping the
index a return value keeps the whole pipeline declarative).

At 100 TB: one shuffle of the CDX lines, sized by ``shards``; the
writer streams — O(numlines) memory per task; no driver collection.

IO goes through ``pyarrow.fs`` resolved from the path URI, NOT bare
``open()``: executors have no JVM gateway, so Python-side object-store
access is Arrow's C++ filesystems — ``file://``, ``s3://`` (ranged
GETs for block reads, multipart for shard writes), ``hdfs://`` via
libhdfs.  A scheme-less path means the local filesystem; ``s3a://``
(the Hadoop spelling) is normalized to ``s3://``.
"""

from __future__ import annotations

import posixpath
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.cdx import parse_cdx_lines, to_cdx_lines


def _fs_for(path: str):
    """(FileSystem, fs-local path) for a URI or plain local path —
    callable on driver AND executors (no JVM involved)."""
    from pyarrow import fs as pafs

    if path.startswith("s3a://"):
        path = "s3://" + path[len("s3a://"):]
    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def _join(base: str, *parts: str) -> str:
    return posixpath.join(base.rstrip("/"), *parts)

IDX_SCHEMA = T.StructType(
    [
        T.StructField("urlkey", T.StringType()),
        T.StructField("timestamp", T.StringType()),
        T.StructField("shard", T.StringType()),
        T.StructField("offset", T.LongType()),
        T.StructField("length", T.LongType()),
    ]
)


def _write_shard(out_dir: str, numlines: int):
    """Partition writer: lines (pre-sorted) → gzip-member blocks
    appended to one shard file; yields one secondary-index tuple per
    block.  Streamed: holds ≤ numlines lines in memory."""

    def fn(pid: int, rows):
        import gzip

        shard = f"cdx-{pid:05d}.gz"
        fs, path = _fs_for(_join(out_dir, shard))
        buf: list[str] = []
        first_key: tuple[str, str] | None = None
        offset = 0
        out = None
        try:
            for row in rows:
                line = row[0]
                if not buf:
                    k = line.split(" ", 2)
                    first_key = (k[0], k[1] if len(k) > 1 else "")
                buf.append(line)
                if len(buf) == numlines:
                    if out is None:
                        # compression=None: members are gzipped here;
                        # Arrow must not re-wrap based on .gz suffix
                        out = fs.open_output_stream(path, compression=None)
                    member = gzip.compress(
                        ("\n".join(buf) + "\n").encode("utf-8"), mtime=0
                    )
                    out.write(member)
                    yield (*first_key, shard, offset, len(member))
                    offset += len(member)
                    buf = []
            if buf:
                if out is None:
                    out = fs.open_output_stream(path, compression=None)
                member = gzip.compress(("\n".join(buf) + "\n").encode("utf-8"), mtime=0)
                out.write(member)
                yield (*first_key, shard, offset, len(member))
        finally:
            if out is not None:
                out.close()

    return fn


def write_zipnum(
    cdx: DataFrame,
    out_dir: str,
    *,
    shards: int = 8,
    numlines: int = 3000,
) -> DataFrame:
    """Build a ZipNum cluster from a (typed) CDX DataFrame; returns the
    secondary index as a DataFrame and writes ``cluster.idx`` +
    ``cluster.loc`` beside the shard files."""
    fs, local_dir = _fs_for(out_dir)
    fs.create_dir(local_dir, recursive=True)
    spark = cdx.sparkSession

    lines = to_cdx_lines(
        cdx.repartitionByRange(shards, "urlkey", "timestamp").sortWithinPartitions(
            "urlkey", "timestamp"
        )
    )
    idx_rdd = lines.rdd.mapPartitionsWithIndex(_write_shard(out_dir, numlines))
    idx = spark.createDataFrame(idx_rdd, IDX_SCHEMA)

    # secondary index is tiny (#rows / numlines); sort + single file.
    rows = idx.orderBy("urlkey", "timestamp", "shard", "offset").collect()
    with fs.open_output_stream(_join(local_dir, "cluster.idx"), compression=None) as fh:
        for r in rows:
            fh.write(
                f"{r.urlkey}\t{r.timestamp}\t{r.shard}\t{r.offset}\t{r.length}\n".encode()
            )
    shard_names = sorted({r.shard for r in rows})
    with fs.open_output_stream(_join(local_dir, "cluster.loc"), compression=None) as fh:
        for s in shard_names:
            fh.write(f"{s}\t{_join(out_dir, s)}\n".encode())
    return spark.createDataFrame(rows, IDX_SCHEMA)


@dataclass
class _Block:
    urlkey: str
    timestamp: str
    shard: str
    offset: int
    length: int


def _load_idx(out_dir: str) -> list[_Block]:
    fs, local_dir = _fs_for(out_dir)
    blocks: list[_Block] = []
    with fs.open_input_stream(_join(local_dir, "cluster.idx"), compression=None) as fh:
        for line in fh.read().decode("utf-8").splitlines():
            uk, ts, shard, off, ln = line.split("\t")
            blocks.append(_Block(uk, ts, shard, int(off), int(ln)))
    return blocks


def _prune(blocks: list[_Block], lo: str | None, hi: str | None) -> list[_Block]:
    """Keep blocks whose key range [first_key_i, first_key_{i+1})
    intersects [lo, hi) — the reader-side binary search (§3.3)."""
    out = []
    for i, b in enumerate(blocks):
        nxt = blocks[i + 1].urlkey if i + 1 < len(blocks) else None
        if hi is not None and b.urlkey >= hi:
            continue
        if lo is not None and nxt is not None and nxt < lo:
            # note: '<' not '<=': a block whose successor STARTS at lo
            # can still contain keys in [lo, nxt)
            continue
        out.append(b)
    return out


def read_zipnum(
    spark: SparkSession,
    out_dir: str,
    *,
    key_lo: str | None = None,
    key_hi: str | None = None,
) -> DataFrame:
    """Read back a ZipNum cluster as a typed CDX DataFrame, reading and
    decompressing ONLY the blocks whose key range intersects
    [key_lo, key_hi) — distributed ranged reads, one task per block
    batch, then a residual filter for exactness."""
    blocks = _prune(_load_idx(out_dir), key_lo, key_hi)
    if not blocks:
        return parse_cdx_lines(
            spark.createDataFrame([], T.StructType([T.StructField("value", T.StringType())]))
        )
    fs, local_dir = _fs_for(out_dir)
    with fs.open_input_stream(_join(local_dir, "cluster.loc"), compression=None) as fh:
        loc = dict(
            line.split("\t") for line in fh.read().decode("utf-8").splitlines()
        )
    work = [(loc[b.shard], b.offset, b.length) for b in blocks]

    def read_block(items):
        import gzip

        for path, off, ln in items:
            bfs, bpath = _fs_for(path)
            with bfs.open_input_file(bpath) as fh:  # random-access: S3 ranged GET
                fh.seek(off)
                data = fh.read(ln)
            for line in gzip.decompress(data).decode("utf-8").splitlines():
                yield (line,)

    n_slices = min(len(work), max(1, spark.sparkContext.defaultParallelism))
    rdd = spark.sparkContext.parallelize(work, n_slices).mapPartitions(read_block)
    df = parse_cdx_lines(
        spark.createDataFrame(rdd, T.StructType([T.StructField("value", T.StringType())]))
    )
    if key_lo is not None:
        df = df.filter(F.col("urlkey") >= key_lo)
    if key_hi is not None:
        df = df.filter(F.col("urlkey") < key_hi)
    return df


def zipnum_prefix_query(
    spark: SparkSession, out_dir: str, key_prefix: str
) -> DataFrame:
    """matchType=prefix over the cluster: [prefix, prefix+'~')."""
    return read_zipnum(spark, out_dir, key_lo=key_prefix, key_hi=key_prefix + "~")
