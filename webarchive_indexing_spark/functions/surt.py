"""SURT urlkey canonicalization (SURVEY.md §2.8 F1, §1.1).

The reference computes the urlkey with pywb's canonicalizer during
indexing [U indexwarcsjob.py → pywb write_cdx_index]; the key is THE
sort/partition key of the whole index.  ``com,example)/path?a=1`` =
lowercased host reversed comma-joined + ')' + path + sorted query.

Implemented twice with identical semantics:

* ``surt_urlkey`` — pure built-in column expressions (regexp_replace /
  split / reverse / sort_array).  Stays inside whole-stage codegen;
  this is the hot-path version (at 100 TB the canonicalizer runs per
  capture — a Python UDF here would dominate the job).
* ``surt_urlkey_py`` — plain-Python reference used by the pandas-UDF
  fallback and as the property-test oracle for the native version.

Documented subset of pywb's rules (see tests/test_surt.py):
lowercase; strip scheme / userinfo / fragment; strip ``www``+digits
host prefix; strip ports 80/443; reverse host labels with commas;
empty path → ``/``; query params sorted, empty query dropped.
Not implemented (pywb extras): session-param stripping, IDN/punycode,
percent-encoding normalization.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = "^[a-z][a-z0-9+.-]*://"
_USERINFO_RE = "^[^/?#]*@"
_WWW_RE = r"^www\d*\."


def surt_urlkey(url: Column | str) -> Column:
    """SURT urlkey as a native expression tree (JVM-side, codegen)."""
    u = F.lower(F.trim(F.col(url) if isinstance(url, str) else url))
    u = F.regexp_replace(u, _SCHEME_RE, "")
    u = F.regexp_replace(u, _USERINFO_RE, "")
    u = F.regexp_replace(u, "#.*$", "")  # fragment

    hostport = F.regexp_extract(u, "^([^/?]*)", 1)
    rest = F.substring(u, F.length(hostport) + 1, F.length(u))

    # port splits off BEFORE host reversal and re-attaches after
    # (com,example:8080); default ports drop entirely.
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    port = F.when(port.isin("", "80", "443"), F.lit("")).otherwise(F.concat(F.lit(":"), port))
    host = F.regexp_replace(hostport, r":\d+$", "")
    host = F.regexp_replace(host, _WWW_RE, "")
    rev_host = F.concat(F.concat_ws(",", F.reverse(F.split(host, "[.]"))), port)

    path = F.regexp_extract(rest, "^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.when(
        rest.contains("?"),
        F.substring(rest, F.instr(rest, "?") + 1, F.length(rest)),
    ).otherwise(F.lit(""))
    sorted_query = F.array_join(
        F.sort_array(F.filter(F.split(query, "&"), lambda x: x != "")), "&"
    )

    return F.concat(
        rev_host,
        F.lit(")"),
        path,
        F.when(sorted_query == "", F.lit("")).otherwise(F.concat(F.lit("?"), sorted_query)),
    )


def surt_urlkey_py(url: str) -> str:
    """Plain-Python reference implementation (same subset)."""
    import re

    u = url.strip().lower()
    u = re.sub(_SCHEME_RE, "", u)
    u = re.sub(_USERINFO_RE, "", u)
    u = re.sub("#.*$", "", u)

    m = re.match("^([^/?]*)", u)
    hostport = m.group(1)
    rest = u[len(hostport):]

    pm = re.search(r":(\d+)$", hostport)
    port = "" if pm is None or pm.group(1) in ("80", "443") else ":" + pm.group(1)
    host = re.sub(r":\d+$", "", hostport)
    host = re.sub(_WWW_RE, "", host)
    rev_host = ",".join(reversed(host.split("."))) + port

    qpos = rest.find("?")
    path = rest if qpos < 0 else rest[:qpos]
    if path == "":
        path = "/"
    query = "" if qpos < 0 else rest[qpos + 1 :]
    params = sorted(p for p in query.split("&") if p)
    tail = "?" + "&".join(params) if params else ""
    return f"{rev_host}){path}{tail}"


def surt_urlkey_pandas():
    """Arrow-batched pandas-UDF fallback (for plans that must match
    pywb edge cases the native subset skips — swap implementations
    here, keep call sites unchanged)."""
    import pandas  # noqa: PLC0415 — module-level global so pyspark can
    # resolve the stringified type hints (PEP 563 is active here)

    globals()["pandas"] = pandas
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _surt(urls: pandas.Series) -> pandas.Series:
        return urls.map(lambda s: surt_urlkey_py(s) if s is not None else None)

    return _surt
