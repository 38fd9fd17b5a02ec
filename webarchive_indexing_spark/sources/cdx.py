"""CDX line scan + sink (SURVEY.md §2.1 S4/S5, §1.1).

The classic 11-field CDX line (``CDX N b a m s k r M S V g``):
``urlkey timestamp url mime status digest redirect robotflags length
offset filename`` — space-delimited, ``-`` for missing, sorted by
(urlkey, timestamp).  The reference writes one sorted ``.cdx.gz`` per
WARC [U indexwarcsjob.py::_load_and_index] and re-reads them as lines
in the sample/cluster jobs [U samplecdxjob.py / zipnumclusterjob.py
mappers].

Spark mapping: lines → ``split`` projection with typed casts (all
JVM-side); sink = ``sortWithinPartitions`` + gzip-codec text write.
CDXJ (urlkey ts {json}) parses the JSON tail with ``from_json``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CDX_FIELDS = [
    ("urlkey", T.StringType()),
    ("timestamp", T.StringType()),  # 14-digit, string-sortable
    ("url", T.StringType()),
    ("mime", T.StringType()),
    ("status", T.IntegerType()),
    ("digest", T.StringType()),
    ("redirect", T.StringType()),
    ("robotflags", T.StringType()),
    ("length", T.LongType()),
    ("offset", T.LongType()),
    ("filename", T.StringType()),
]

CDX_SCHEMA = T.StructType([T.StructField(n, t, True) for n, t in CDX_FIELDS])


def parse_cdx_lines(lines: DataFrame, column: str = "value") -> DataFrame:
    """Text lines → typed CDX DataFrame ('-' → NULL, numeric casts).

    Damage-tolerant by construction: ``try_element_at`` NULLs missing
    fields on truncated lines (``getItem`` throws under ANSI) and
    ``try_cast`` NULLs non-numeric status/length/offset instead of
    failing the task — one corrupt line must never kill a 100 TB scan."""
    parts = F.split(F.col(column), " ")
    cols = []
    for i, (name, dtype) in enumerate(CDX_FIELDS):
        c = F.try_element_at(parts, F.lit(i + 1))
        c = F.when(c == "-", F.lit(None)).otherwise(c)
        cols.append(c.try_cast(dtype).alias(name))
    return lines.select(*cols)


def to_cdx_lines(cdx: DataFrame) -> DataFrame:
    """Typed CDX DataFrame → one-column DataFrame of CDX lines
    (NULL → '-'); inverse of parse_cdx_lines."""
    parts = [
        F.coalesce(F.col(name).cast("string"), F.lit("-")) for name, _ in CDX_FIELDS
    ]
    return cdx.select(F.concat_ws(" ", *parts).alias("value"))


def write_cdx_gz(cdx: DataFrame, path: str, *, sorted_within: bool = True) -> None:
    """S4 gzipped-CDX sink: partition-local sort (the reference sorts
    each per-WARC CDX with pywb ``sort=True``) then gzip text."""
    out = cdx
    if sorted_within:
        out = out.sortWithinPartitions("urlkey", "timestamp")
    to_cdx_lines(out).write.mode("overwrite").option("compression", "gzip").text(path)


def read_cdx_gz(spark: SparkSession, path: str) -> DataFrame:
    """S5 CDX scan: gzipped (or plain) CDX text → typed DataFrame."""
    return parse_cdx_lines(spark.read.text(path))


def parse_cdxj_lines(lines: DataFrame, column: str = "value") -> DataFrame:
    """CDXJ scan: ``urlkey SP timestamp SP {json}`` → urlkey, timestamp,
    and the JSON tail as a map column (dynamic keys)."""
    v = F.col(column)
    first = F.instr(v, " ")
    rest = F.substring(v, first + 1, F.length(v))
    second = F.instr(rest, " ")
    return lines.select(
        F.substring(v, F.lit(1), first - 1).alias("urlkey"),
        F.substring(rest, F.lit(1), second - 1).alias("timestamp"),
        F.from_json(
            F.substring(rest, second + 1, F.length(rest)), "map<string,string>"
        ).alias("props"),
    )


#: classic-CDX column → CDXJ JSON key (the key names pywb/cc-index use)
CDXJ_KEYS = [
    ("url", "url"),
    ("mime", "mime"),
    ("status", "status"),
    ("digest", "digest"),
    ("redirect", "redirect"),
    ("robotflags", "robotflags"),
    ("length", "length"),
    ("offset", "offset"),
    ("filename", "filename"),
]


def to_cdxj_lines(cdx: DataFrame) -> DataFrame:
    """Typed CDX DataFrame → CDXJ lines (``urlkey ts {json}``), the
    format the Common Crawl index serves.  NULL fields are omitted
    from the JSON (CDXJ convention) rather than written as '-';
    ``to_json`` over a map built from the non-null entries keeps the
    whole conversion JVM-side."""
    entries = []
    for col, key in CDXJ_KEYS:
        entries.append(
            F.when(
                F.col(col).isNotNull(),
                F.struct(F.lit(key).alias("k"), F.col(col).cast("string").alias("v")),
            )
        )
    kvs = F.filter(F.array(*entries), lambda e: e.isNotNull())
    js = F.to_json(
        F.map_from_arrays(
            F.transform(kvs, lambda e: e.getField("k")),
            F.transform(kvs, lambda e: e.getField("v")),
        )
    )
    # concat_ws silently DROPS null args, which would shift the line to
    # two fields and corrupt the parse — key columns fall back to '-'
    # (same placeholder as the classic-CDX twin).
    return cdx.select(
        F.concat_ws(
            " ",
            F.coalesce(F.col("urlkey"), F.lit("-")),
            F.coalesce(F.col("timestamp"), F.lit("-")),
            js,
        ).alias("value")
    )


def cdxj_to_cdx(cdxj: DataFrame) -> DataFrame:
    """Typed projection of a parsed CDXJ DataFrame back to the classic
    CDX schema (missing JSON keys → NULL, numeric casts)."""
    cols = [F.col("urlkey"), F.col("timestamp")]
    types = dict(CDX_FIELDS)
    for col, key in CDXJ_KEYS:
        cols.append(F.col("props").getItem(key).cast(types[col]).alias(col))
    return cdxj.select(*cols)
