"""cdx-server query API (SURVEY.md §3.3, tier B) — the composed,
user-facing query surface the reference's index exists to serve.

``cdx_query`` reproduces the pywb cdx-server parameter set over any
typed CDX DataFrame; ``cdx_query_zipnum`` runs the same semantics
against a ZipNum cluster on disk, turning the urlkey constraint into
secondary-index block pruning BEFORE decompression (the O(log) path),
then applying the identical residual pipeline.

Parameter → plan mapping:
  url/match_type  exact: key equality; prefix: [k, k+'~');
                  domain: host-reversal prefix; glob: mid-path '*'
                  wildcards — literal-prefix range + LIKE residual (P5)
  from_/to        14-digit prefix range, string compare  (P4)
  filters         'field:regex', '!field:regex', 'field~substr' (P2)
  collapse        'field' or 'field:N' run-based keep-first (W2)
  closest         per-urlkey nearest-timestamp ordering (O4/J7)
  sort_reverse    latest-first within urlkey (O5)
  fields          projection (P1)
  limit           row cap (O3)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.surt import surt_urlkey_py
from .collapse import collapse as run_collapse


def _key_range(url: str, match_type: str) -> tuple[str, str | None, str | None]:
    """→ (exact_key | None, lo, hi) for the urlkey constraint."""
    key = surt_urlkey_py(url)
    if match_type == "exact":
        return key, key, key + "!"  # '!' < any printable continuation
    if match_type == "prefix":
        return None, key, key + "~"
    if match_type in ("host", "domain"):
        host = key.split(")")[0]
        return None, host, host + "~"
    if match_type == "glob":
        # everything before the first '*' is a literal SURT prefix —
        # the range-prunable part; the full pattern is a residual
        pre = key.split("*", 1)[0]
        return None, pre, pre + "~"
    raise ValueError(f"unknown match_type {match_type!r}")


def glob_to_like(key: str) -> str:
    """SURT-key glob → SQL LIKE pattern: '*' becomes '%', everything
    else is literal (LIKE metacharacters get backslash-escaped).
    pywb's url-wildcard rules use only '*' — a '?' in a URL is the
    query separator, never a wildcard."""
    out = []
    for ch in key:
        if ch == "*":
            out.append("%")
        elif ch in ("%", "_", "\\"):
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out)


def match_glob(cdx: DataFrame, url: str) -> DataFrame:
    """P5 matchType=glob [B pywb fuzzy/url-wildcard subset]: ``url``
    may carry mid-path ``*`` wildcards.  The key range [literal-prefix,
    prefix+'~') does the heavy lifting — on ZipNum storage it prunes
    blocks exactly like matchType=prefix, so a glob over one host
    never scans the whole index — and the LIKE residual (JVM
    codegen, no UDF) finishes the match."""
    key = surt_urlkey_py(url)
    pre = key.split("*", 1)[0]
    return cdx.filter(
        (F.col("urlkey") >= pre)
        & (F.col("urlkey") < pre + "~")
        & F.col("urlkey").like(glob_to_like(key))
    )


def _apply_filters(df: DataFrame, filters: list[str]) -> DataFrame:
    for f in filters:
        neg = f.startswith("!")
        body = f[1:] if neg else f
        if "~" in body.split(":")[0] or (":" not in body and "~" in body):
            field, sub = body.split("~", 1)
            cond = F.col(field).cast("string").contains(sub)
        else:
            field, pat = body.split(":", 1)
            cond = F.col(field).cast("string").rlike(pat)
        df = df.filter(~cond if neg else cond)
    return df


def cdx_query(
    cdx: DataFrame,
    url: str,
    *,
    match_type: str = "exact",
    from_: str | None = None,
    to: str | None = None,
    filters: list[str] | None = None,
    collapse: str | None = None,
    closest: str | None = None,
    sort_reverse: bool = False,
    fields: list[str] | None = None,
    limit: int | None = None,
) -> DataFrame:
    """The full cdx-server GET /index parameter surface over a typed
    CDX DataFrame (column ``timestamp`` = 14-digit string)."""
    exact, lo, hi = _key_range(url, match_type)
    if exact is not None:
        df = cdx.filter(F.col("urlkey") == exact)
    else:
        df = cdx.filter((F.col("urlkey") >= lo) & (F.col("urlkey") < hi))
    if match_type == "glob":
        df = df.filter(F.col("urlkey").like(glob_to_like(surt_urlkey_py(url))))

    if from_ is not None:
        df = df.filter(F.col("timestamp") >= from_.ljust(14, "0"))
    if to is not None:
        df = df.filter(F.col("timestamp") <= to.ljust(14, "9"))
    if filters:
        df = _apply_filters(df, filters)

    if collapse:
        field, _, width = collapse.partition(":")
        ckey = F.col(field).cast("string")
        if width:
            ckey = F.substring(ckey, 1, int(width))
        df = run_collapse(
            df,
            partition_by=["urlkey"],
            order_by=[F.col("timestamp").asc()],
            collapse_key=ckey,
        )

    if closest is not None:
        target = int(closest.ljust(14, "0"))
        dist = F.abs(F.col("timestamp").cast("bigint") - F.lit(target))
        df = df.orderBy(dist.asc(), F.col("timestamp").asc())
    elif sort_reverse:
        df = df.orderBy(F.col("urlkey").asc(), F.col("timestamp").desc())
    else:
        df = df.orderBy(F.col("urlkey").asc(), F.col("timestamp").asc())

    if fields:
        df = df.select(*fields)
    if limit is not None:
        df = df.limit(limit)
    return df


def cdx_query_zipnum(
    spark: SparkSession,
    cluster_dir: str,
    url: str,
    *,
    match_type: str = "exact",
    **kwargs,
) -> DataFrame:
    """Same surface against a ZipNum cluster: the urlkey constraint
    prunes secondary-index blocks first (§3.3 binary-search analogue);
    everything else is the shared residual pipeline."""
    from ..sinks.zipnum import read_zipnum

    exact, lo, hi = _key_range(url, match_type)
    pruned = read_zipnum(spark, cluster_dir, key_lo=lo, key_hi=hi)
    return cdx_query(pruned, url, match_type=match_type, **kwargs)
