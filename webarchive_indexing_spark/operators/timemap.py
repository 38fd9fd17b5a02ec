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


def timemap_linkformat_paged(
    df: DataFrame,
    *,
    page_size: int,
    key_col: str = "urlkey",
    ts_col: str = "ts14",
    replay_base: str = REPLAY_BASE,
    timemap_base: str = "https://web.archive.example/timemap/link/",
) -> DataFrame:
    """Paged application/link-format TimeMaps [RFC 7089 §5 paging —
    index + page TimeMaps]: a URI-R with millions of captures cannot
    serve one TimeMap document, so mementos split into fixed-size
    pages, each carrying its navigation link-values:

    * line 0 — ``<uri-r>; rel="original",``
    * line 1 — ``<timemap-uri?page=N>; rel="self"; type=...;
      from="<first RFC-1123 in page>"; until="<last in page>",``
    * line 2/3 — ``prev``/``next`` page ``timemap`` link-values when
      that page exists (the paging chain clients walk)
    * then the page's memento link-values, comma-continued except on
      the page's final line.

    Returns ``(key_col, page, line_no, line)``.  Scale shape: the
    SAME single ranked window as the unpaged serializer (page number
    is integer arithmetic on the rank — no second shuffle), plus a
    per-(key, page) min/max window for the from/until attributes;
    each page is emitted complete and independent, so a server can
    answer page N without touching any other page's rows."""
    if page_size < 1:
        raise ValueError("page_size must be >= 1")
    sub = _ranked(df, key_col, ts_col)
    sub = sub.withColumn(
        "page", ((F.col("rn") - 1) / page_size).cast("int")
    )
    wpage = Window.partitionBy(key_col, "page")
    sub = (
        sub.withColumn("pg_first", F.min(ts_col).over(wpage))
        .withColumn("pg_last", F.max(ts_col).over(wpage))
        .withColumn("pg_n", F.count(F.lit(1)).over(wpage))
        .withColumn("pg_rn", F.row_number().over(wpage.orderBy(ts_col)))
        .withColumn(
            "n_pages",
            F.ceil(F.col("n") / F.lit(page_size)).cast("int"),
        )
    )

    def tm_uri(page_col):
        return F.concat(
            F.lit(timemap_base), F.col(key_col), F.lit("?page="),
            page_col.cast("string"),
        )

    mementos = sub.select(
        key_col,
        "page",
        (F.col("pg_rn") + 3).alias("line_no"),
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
            F.when(F.col("pg_rn") == F.col("pg_n"), "").otherwise(","),
        ).alias("line"),
    )
    heads = sub.filter(F.col("pg_rn") == 1)
    original = heads.select(
        key_col,
        "page",
        F.lit(0).alias("line_no"),
        F.concat(
            F.lit("<"), F.col(key_col), F.lit('>; rel="original",')
        ).alias("line"),
    )
    self_link = heads.select(
        key_col,
        "page",
        F.lit(1).alias("line_no"),
        F.concat(
            F.lit("<"), tm_uri(F.col("page")),
            F.lit('>; rel="self"; type="application/link-format"; from="'),
            _http_date("pg_first"),
            F.lit('"; until="'),
            _http_date("pg_last"),
            F.lit('",'),
        ).alias("line"),
    )
    prev_link = heads.filter(F.col("page") > 0).select(
        key_col,
        "page",
        F.lit(2).alias("line_no"),
        F.concat(
            F.lit("<"), tm_uri(F.col("page") - 1),
            F.lit('>; rel="prev"; type="application/link-format",'),
        ).alias("line"),
    )
    next_link = heads.filter(F.col("page") < F.col("n_pages") - 1).select(
        key_col,
        "page",
        F.lit(3).alias("line_no"),
        F.concat(
            F.lit("<"), tm_uri(F.col("page") + 1),
            F.lit('>; rel="next"; type="application/link-format",'),
        ).alias("line"),
    )
    out = original
    for part in (self_link, prev_link, next_link, mementos):
        out = out.unionByName(part)
    return out


def timegate(
    df: DataFrame,
    accept_datetime: str,
    *,
    key_col: str = "urlkey",
    ts_col: str = "ts14",
    replay_base: str = REPLAY_BASE,
) -> DataFrame:
    """Memento TimeGate response shape [RFC 7089 §4; pywb's redirect
    half of /web/<url>]: per URI-R, the 302-redirect row for the
    memento CLOSEST to ``accept_datetime`` (a ts14 prefix; same
    abs-distance + earlier-wins ordering as the cdx-server
    ``closest=`` knob, so the gate and the query surface agree on
    which capture 'closest' means).

    Columns are the response headers a gate serves: ``status`` (302),
    ``location`` (the chosen memento's replay URI), ``vary``
    (``accept-datetime`` — the header that makes gate responses
    datetime-negotiated), and ``link`` carrying original + first/last
    memento link-values with RFC-1123 datetimes [RFC 7089 §4.2].
    One ranked window per urlkey (the index's own sort key), then a
    map-side concat — the same scale shape as the TimeMap
    serializers."""
    target = int(str(accept_datetime).ljust(14, "0"))
    w = Window.partitionBy(key_col)
    dist = F.abs(F.col(ts_col).cast("bigint") - F.lit(target))
    ranked = (
        df.select(key_col, ts_col)
        .withColumn(
            "rn",
            F.row_number().over(w.orderBy(dist.asc(), F.col(ts_col).asc())),
        )
        .withColumn("first_ts", F.min(ts_col).over(w))
        .withColumn("last_ts", F.max(ts_col).over(w))
    )
    chosen = ranked.filter(F.col("rn") == 1)

    def memento_uri(ts):
        return F.concat(F.lit(replay_base), ts, F.lit("id_/"), F.col(key_col))

    link = F.concat(
        F.lit("<"), F.col(key_col), F.lit('>; rel="original", <'),
        memento_uri(F.col("first_ts")),
        F.lit('>; rel="first memento"; datetime="'),
        _http_date("first_ts"),
        F.lit('", <'),
        memento_uri(F.col("last_ts")),
        F.lit('>; rel="last memento"; datetime="'),
        _http_date("last_ts"),
        F.lit('", <'),
        memento_uri(F.col(ts_col)),
        F.lit('>; rel="memento"; datetime="'),
        _http_date(ts_col),
        F.lit('"'),
    )
    return chosen.select(
        key_col,
        F.lit(302).alias("status"),
        memento_uri(F.col(ts_col)).alias("location"),
        F.lit("accept-datetime").alias("vary"),
        link.alias("link"),
    )


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
