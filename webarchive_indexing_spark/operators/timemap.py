"""Memento TimeMap serializations (SURVEY.md §2 B-tier; RFC 7089 §5;
pywb /timemap/{link,json}/ endpoints).

Builds the wire-format lines from ANY typed CDX DataFrame — the same
serialization the hash-pinned registry queries (`cdx_timemap_linkformat`,
`cdx_timemap_json`) run and the CLI `timemap` subcommand serves, so
the tested grammar IS the served grammar.

Scale shape: one ranked window per urlkey (the key the index is
already range-sorted by, so per-key ordering is partition-local to
co-located data) + a map-side concat projection; ordering columns
``(urlkey, line_no)`` come back so a caller can emit the map in wire
order without a second sort key."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: default replay-URL base for memento URIs (pywb's /web/<ts>id_/<url>)
REPLAY_BASE = "https://web.archive.example/web/"


def _ranked(df: DataFrame, key_col: str, ts_col: str) -> DataFrame:
    w = Window.partitionBy(key_col)
    return (
        df.select(key_col, ts_col)
        .withColumn("rn", F.row_number().over(w.orderBy(ts_col)))
        .withColumn("n", F.count(F.lit(1)).over(w))
    )


def _rel():
    return (
        F.when((F.col("rn") == 1) & (F.col("rn") == F.col("n")), "first last memento")
        .when(F.col("rn") == 1, "first memento")
        .when(F.col("rn") == F.col("n"), "last memento")
        .otherwise("memento")
    )


def _http_date(ts_col: str):
    return F.date_format(
        F.to_timestamp(ts_col, "yyyyMMddHHmmss"),
        "EEE, dd MMM yyyy HH:mm:ss 'GMT'",
    )


def timemap_linkformat(
    df: DataFrame,
    *,
    key_col: str = "urlkey",
    ts_col: str = "ts14",
    replay_base: str = REPLAY_BASE,
) -> DataFrame:
    """application/link-format TimeMap [RFC 7089 §5]: per URI-R an
    ``<uri>; rel="original",`` header line (line_no 0) then one
    ``<memento-uri>; rel="..."; datetime="<RFC-1123>"`` link-value per
    capture, comma-continued on every line except the map's last.
    Returns (key_col, line_no, line)."""
    sub = _ranked(df, key_col, ts_col)
    mementos = sub.select(
        key_col,
        F.col("rn").alias("line_no"),
        F.concat(
            F.lit("<" + replay_base),
            F.col(ts_col),
            F.lit("id_/"),
            F.col(key_col),
            F.lit('>; rel="'),
            _rel(),
            F.lit('"; datetime="'),
            _http_date(ts_col),
            F.lit('"'),
            F.when(F.col("rn") == F.col("n"), "").otherwise(","),
        ).alias("line"),
    )
    original = (
        df.select(key_col)
        .distinct()
        .select(
            key_col,
            F.lit(0).alias("line_no"),
            F.concat(
                F.lit("<"), F.col(key_col), F.lit('>; rel="original",')
            ).alias("line"),
        )
    )
    return original.unionByName(mementos)


def timemap_json(
    df: DataFrame,
    *,
    key_col: str = "urlkey",
    ts_col: str = "ts14",
    replay_base: str = REPLAY_BASE,
) -> DataFrame:
    """pywb /timemap/json/ serialization: one JSON object per memento
    carrying urlkey, ts14, the replay URI, the rel markers, and the
    RFC-1123 datetime — emitted through the REAL ``to_json(struct)``
    serializer (the registry query's oracle pins its byte-exact
    grammar by concatenation).  Returns (key_col, line_no, line)."""
    sub = _ranked(df, key_col, ts_col)
    return sub.select(
        key_col,
        F.col("rn").alias("line_no"),
        F.to_json(
            F.struct(
                F.col(key_col).alias("urlkey"),
                F.col(ts_col).alias("timestamp"),
                F.concat(
                    F.lit(replay_base),
                    F.col(ts_col),
                    F.lit("id_/"),
                    F.col(key_col),
                ).alias("memento"),
                _rel().alias("rel"),
                _http_date(ts_col).alias("datetime"),
            )
        ).alias("line"),
    )
