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

Implemented pywb/surt rules (see tests/test_surt.py): lowercase; strip
scheme / userinfo / fragment; strip ``www``+digits host prefix; strip
ports 80/443; host dot cleanup (leading/trailing dots dropped,
``..`` collapsed); reverse host labels with commas; empty path →
``/``; path dot-segment removal (``/a/./b`` → ``/a/b``, ``/a/../b`` →
``/b``, RFC 3986 §5.2.4 stack semantics, never popping past root);
query params sorted, empty query dropped; session-id stripping per the
public surt URLRegexTransformer patterns — trailing path
``;jsessionid=<32>`` and ASP.NET ``(s(<24>))/`` segments, query params
``jsessionid/phpsessid/sid=<32 alnum>``, ``aspsessionid<8>=<24>``, and
an adjacent ``cfid=..&cftoken=..`` pair anchored at a param boundary;
percent-encoding normalization — escapes of unreserved chars (alnum
``-._~``) are decoded, double-encoded escapes (``%25XX`` with XX hex)
are unwrapped, all other escapes kept verbatim (already lowercase),
and the pass runs to FIXPOINT (round 10): escapes nested to any depth
fully unwrap (``%252541`` → ``%2541`` → ``%41`` → ``a``), matching
pywb's repeated-unquote behavior — see ``_pct_pass`` for the
termination argument, the data-derived iteration bound, and the
early-exit fold that stops paying per-pass work at the fixpoint
(round 11: verbatim-kept escapes no longer force every residual pass
to re-run the full split/transform).

Every expensive branch is gated behind a cheap ``contains`` guard
(``%``, ``;jsessionid=``, ``.aspx``, ``cfid=``, ``/.``) — a clean URL
pays one regex for the scheme and the split/reverse of its host, and
none of the session/percent/dot machinery.

Not implemented (documented divergence from pywb): IDN→punycode in
the NATIVE version — ``surt_urlkey_py`` and the pandas fallback
punycode non-ASCII hosts, the native expression expects pre-encoded
(ASCII) hosts (the hybrid router ``surt_urlkey_auto`` covers both).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = "^[a-z][a-z0-9+.-]*://"
_USERINFO_RE = "^[^/?#]*@"
_WWW_RE = r"^www\d*\."

#: surt URLRegexTransformer session-id shapes, recast to operate on the
#: already-lowercased URL: TRAILING path ;jsessionid=<32 alnum> (mid-
#: path occurrences are legitimate matrix params — stripping them would
#: merge distinct URLs under one urlkey), ASP.NET cookieless
#: (s(<24>))/ path segment (only before an .aspx page), an adjacent
#: cfid/cftoken query pair anchored at a param boundary (so it cannot
#: splice remnants out of params that merely END in 'cfid='), and
#: whole session params.
_PATH_JSESSIONID_RE = ";jsessionid=[0-9a-z]{32}$"
_PATH_ASPNET_RE = r"\((?:[a-z]\([0-9a-z]{24}\))+\)/(?=[^?]*\.aspx)"
#: replacement is '&' — the stray separator is dropped by the empty-
#: param filter below, keeping both '^cfid=..' and '..&cfid=..' safe.
_QUERY_CF_RE = "(?:^|&)cfid=[^&]+&cftoken=[^&]+(?=&|$)"
_SESSION_PARAM_RE = (
    "^(?:(?:jsessionid|phpsessid|sid)=[0-9a-z]{32}|aspsessionid[a-z]{8}=[a-z]{24})$"
)
_HEX2 = "^[0-9a-f]{2}$"


def _let(value: Column, body) -> Column:
    """Let-binding for Catalyst: evaluate ``value`` ONCE and reference
    it as a lambda variable (a leaf) inside ``body``.

    Catalyst expressions are trees, not DAGs — writing
    ``F.when(u.contains("%"), f(u)).otherwise(u)`` inlines the whole
    subtree of ``u`` three times, and a chain of such guarded steps
    multiplies: ~8 steps at 3 refs each is ~3^8 copies of the base
    expression, which blows codegen past the heap.  A single-element
    ``transform`` binds the value to a lambda variable instead, keeping
    the tree linear in the number of steps."""
    return F.element_at(F.transform(F.array(value), body), 1)


def _pct_piece(p: Column) -> Column:
    """One post-'%' fragment: decode a leading unreserved-char escape,
    unwrap a double-encoded escape (25 + two hex digits) one level, and
    otherwise re-attach the '%' untouched."""
    hx = F.substring(p, 1, 2)
    code = F.conv(hx, 16, 10).cast("int")
    unreserved = (
        ((code >= 48) & (code <= 57))
        | ((code >= 97) & (code <= 122))
        | ((code >= 65) & (code <= 90))
        | code.isin(45, 46, 95, 126)  # - . _ ~
    )
    return (
        F.when(
            (hx == "25") & F.substring(p, 3, 2).rlike(_HEX2),
            F.concat(F.lit("%"), F.substring(p, 3, F.length(p))),
        )
        .when(
            hx.rlike(_HEX2) & unreserved,
            F.concat(F.lower(F.char(code)), F.substring(p, 3, F.length(p))),
        )
        .otherwise(F.concat(F.lit("%"), p))
    )


def _pct_normalize(u: Column) -> Column:
    """One percent-encoding normalization pass.  Never produces a URL
    metacharacter (/?#&= are not unreserved), so it is safe to run on
    the whole URL before parsing.  A '%25XX' double-encoding unwraps to
    '%XX' — a second pass (gated at the call site on contains('%25'))
    then decodes it if unreserved."""
    return _let(
        F.split(u, "%"),
        lambda parts: F.concat(
            F.element_at(parts, 1),
            F.array_join(
                F.transform(F.slice(parts, 2, F.size(parts)), _pct_piece), ""
            ),
        ),
    )


def _remove_dot_segments(path: Column) -> Column:
    """RFC 3986 §5.2.4 over the split segments: '.' drops, '..' pops
    (never past root), everything else — including empty segments from
    '//' and a trailing '/' — pushes.  A trailing '.'/'..' leaves the
    directory form ('/a/b/..' → '/a/').  Pure array fold: stays in the
    JVM, no UDF."""
    return _let(
        F.split(path, "/"),
        lambda segs: _let(
            F.aggregate(
                F.slice(segs, 2, F.greatest(F.size(segs) - 1, F.lit(0))),
                F.array().cast("array<string>"),
                lambda acc, s: F.when(s == ".", acc)
                .when(
                    s == "..",
                    F.slice(acc, 1, F.greatest(F.size(acc) - 1, F.lit(0))),
                )
                .otherwise(F.concat(acc, F.array(s))),
            ),
            lambda stack: _let(
                F.concat(F.lit("/"), F.array_join(stack, "/")),
                lambda out: F.when(
                    F.element_at(segs, -1).isin(".", "..") & (F.length(out) > 1),
                    F.concat(out, F.lit("/")),
                ).otherwise(out),
            ),
        ),
    )


def _pct_pass(x: Column) -> Column:
    """Percent normalization run to FIXPOINT (pywb parity — round 10,
    closing the documented two-pass divergence): arbitrarily nested
    double-encodings fully unwrap (``%252541`` → ``%2541`` → ``%41``
    → ``a``), including escapes synthesized by juxtaposition
    (``%%325ab`` decodes ``%32``→``2`` after the bare ``%``, yielding
    ``%25ab``, which a later pass unwraps).

    A Catalyst expression is a finite tree, so "loop until unchanged"
    is expressed as ``aggregate(sequence(1, N), url, pass)`` with a
    DATA-DERIVED iteration bound N: each productive pass either
    decodes an unreserved escape (removes one ``%``, may synthesize at
    most one ``25`` juxtaposition) or unwraps one ``%25XX`` level
    (removes one ``25``), so the potential ``2·count('%') +
    count('25')`` strictly decreases and bounds the productive passes;
    the fixpoint is reached within N = that potential.

    The fold carries ``{val, done}`` (round 11): ``done`` flips the
    first time a pass returns its input unchanged, and every remaining
    iteration is then a single boolean branch that copies the struct —
    NOT another split/transform.  Without the flag, a verbatim-kept
    escape (``%ff``, ``%zz``) keeps ``contains('%')`` true forever and
    an escape-heavy URL with k escapes of length n does O(k·n) work
    per row across all N residual passes — a per-row stall hazard on
    adversarial archive URLs (pywb's Python loop early-exits; so does
    ``_pct_fixpoint_py``).  Cost after the fix: productive passes + 1
    real normalizations, clean URLs still pay ONE contains() via the
    outer guard."""
    n_pct = F.length(x) - F.length(F.regexp_replace(x, "%", ""))
    n_25 = (F.length(x) - F.length(F.regexp_replace(x, "25", ""))) / F.lit(2)
    iters = (n_pct * 2 + n_25 + 1).cast("int")
    return F.when(
        x.contains("%"),
        F.aggregate(
            F.sequence(F.lit(1), iters),
            F.struct(x.alias("val"), F.lit(False).alias("done")),
            lambda acc, _i: F.when(acc.getField("done"), acc).otherwise(
                _let(
                    _pct_normalize(acc.getField("val")),
                    lambda nv: F.struct(
                        nv.alias("val"),
                        (nv == acc.getField("val")).alias("done"),
                    ),
                )
            ),
            lambda acc: acc.getField("val"),
        ),
    ).otherwise(x)


def _rev_host(hp: Column) -> Column:
    """hostport → reversed comma-joined host (+ non-default port).
    Port splits off BEFORE host reversal and re-attaches after
    (com,example:8080); default ports drop entirely."""
    port = _let(
        F.regexp_extract(hp, r":(\d+)$", 1),
        lambda p: F.when(p.isin("", "80", "443"), F.lit("")).otherwise(
            F.concat(F.lit(":"), p)
        ),
    )
    host = F.regexp_replace(hp, r":\d+$", "")
    host = _let(
        host,
        lambda h: F.when(
            h.contains("..") | h.startswith(".") | h.endswith("."),
            F.regexp_replace(F.regexp_replace(h, r"\.{2,}", "."), r"^\.+|\.+$", ""),
        ).otherwise(h),
    )
    host = _let(
        host,
        lambda h: F.when(h.startswith("www"), F.regexp_replace(h, _WWW_RE, "")).otherwise(h),
    )
    return F.concat(F.concat_ws(",", F.reverse(F.split(host, "[.]"))), port)


def _path_query(rest: Column) -> Column:
    """path+query tail of the urlkey from the post-host remainder."""
    path = F.regexp_extract(rest, "^([^?]*)", 1)
    path = _let(
        path,
        lambda p: F.when(
            p.contains(";jsessionid="), F.regexp_replace(p, _PATH_JSESSIONID_RE, "")
        ).otherwise(p),
    )
    path = _let(
        path,
        lambda p: F.when(
            p.contains(".aspx"), F.regexp_replace(p, _PATH_ASPNET_RE, "")
        ).otherwise(p),
    )
    path = _let(path, lambda p: F.when(p == "", F.lit("/")).otherwise(p))
    # "/." catches every "." / ".." segment (each segment follows a
    # "/"); when absent the fold is an identity, so the guard is exact.
    path = _let(
        path,
        lambda p: F.when(p.contains("/."), _remove_dot_segments(p)).otherwise(p),
    )
    query = F.when(
        rest.contains("?"),
        F.substring(rest, F.instr(rest, "?") + 1, F.length(rest)),
    ).otherwise(F.lit(""))
    query = _let(
        query,
        lambda q: F.when(
            q.contains("cfid="), F.regexp_replace(q, _QUERY_CF_RE, "")
        ).otherwise(q),
    )
    sorted_query = F.array_join(
        F.sort_array(
            F.filter(
                F.split(query, "&"),
                lambda x: (x != "") & ~x.rlike(_SESSION_PARAM_RE),
            )
        ),
        "&",
    )
    return _let(
        sorted_query,
        lambda sq: F.concat(
            path,
            F.when(sq == "", F.lit("")).otherwise(F.concat(F.lit("?"), sq)),
        ),
    )


def surt_urlkey(url: Column | str) -> Column:
    """SURT urlkey as a native expression tree (JVM-side, codegen).

    `CaseWhen` branches evaluate lazily in generated code, so every
    ``F.when(guard, expensive)`` prices a clean URL at one ``contains``
    — the split/transform/regex machinery only runs on the (rare) URLs
    that actually carry the construct.  Every multi-reference
    intermediate goes through ``_let`` so the tree stays linear."""
    u = F.lower(F.trim(F.col(url) if isinstance(url, str) else url))
    u = F.regexp_replace(u, _SCHEME_RE, "")
    u = _let(
        u,
        lambda x: F.when(
            x.contains("@"), F.regexp_replace(x, _USERINFO_RE, "")
        ).otherwise(x),
    )
    u = _let(
        u,
        lambda x: F.when(x.contains("#"), F.regexp_replace(x, "#.*$", "")).otherwise(x),
    )
    u = _let(u, _pct_pass)
    return _let(
        u,
        lambda x: _let(
            F.regexp_extract(x, "^([^/?]*)", 1),
            lambda hp: _let(
                F.substring(x, F.length(hp) + 1, F.length(x)),
                lambda rest: F.concat(_rev_host(hp), F.lit(")"), _path_query(rest)),
            ),
        ),
    )


def _pct_normalize_py(s: str) -> str:
    parts = s.split("%")
    out = [parts[0]]
    for p in parts[1:]:
        h = p[:2]
        if len(h) == 2 and all(c in "0123456789abcdef" for c in h):
            if h == "25" and all(c in "0123456789abcdef" for c in p[2:4]) and len(p) >= 4:
                out.append("%" + p[2:])  # unwrap one double-encoding level
                continue
            code = int(h, 16)
            if (
                48 <= code <= 57
                or 97 <= code <= 122
                or 65 <= code <= 90
                or code in (45, 46, 95, 126)
            ):
                out.append(chr(code).lower() + p[2:])
                continue
        out.append("%" + p)
    return "".join(out)


def _pct_fixpoint_py(s: str) -> str:
    """Percent normalization to fixpoint — the Python twin of the
    native ``_pct_pass`` iteration (termination argument there)."""
    while True:
        n = _pct_normalize_py(s)
        if n == s:
            return s
        s = n


def _remove_dot_segments_py(path: str) -> str:
    segs = path.split("/")
    stack: list[str] = []
    for s in segs[1:]:
        if s == ".":
            continue
        if s == "..":
            if stack:
                stack.pop()
            continue
        stack.append(s)
    out = "/" + "/".join(stack)
    if segs[-1] in (".", "..") and len(out) > 1:
        out += "/"
    return out


def surt_urlkey_py(url: str) -> str:
    """Plain-Python reference implementation (same rules, plus
    IDN→punycode for non-ASCII hosts, which native expressions can't
    express).  Runs the percent/dot passes unconditionally — they are
    identities when the construct is absent, so output matches the
    guard-gated native expression byte for byte."""
    import re

    u = url.strip().lower()
    u = re.sub(_SCHEME_RE, "", u)
    u = re.sub(_USERINFO_RE, "", u)
    u = re.sub("#.*$", "", u)
    u = _pct_fixpoint_py(u)

    m = re.match("^([^/?]*)", u)
    hostport = m.group(1)
    rest = u[len(hostport):]

    pm = re.search(r":(\d+)$", hostport)
    port = "" if pm is None or pm.group(1) in ("80", "443") else ":" + pm.group(1)
    host = re.sub(r":\d+$", "", hostport)
    host = re.sub(r"\.{2,}", ".", host)
    host = re.sub(r"^\.+|\.+$", "", host)
    host = re.sub(_WWW_RE, "", host)
    if not host.isascii():
        try:
            host = host.encode("idna").decode("ascii")
        except UnicodeError:
            pass
    rev_host = ",".join(reversed(host.split("."))) + port

    qpos = rest.find("?")
    path = rest if qpos < 0 else rest[:qpos]
    path = re.sub(_PATH_JSESSIONID_RE, "", path)
    path = re.sub(_PATH_ASPNET_RE, "", path)
    if path == "":
        path = "/"
    path = _remove_dot_segments_py(path)
    query = "" if qpos < 0 else rest[qpos + 1 :]
    query = re.sub(_QUERY_CF_RE, "", query)
    params = sorted(
        p for p in query.split("&") if p and not re.match(_SESSION_PARAM_RE, p)
    )
    tail = "?" + "&".join(params) if params else ""
    return f"{rev_host}){path}{tail}"


def fold_method_query(
    url: Column | str,
    method: Column | str,
    content_type: Column | str,
    body: Column | str,
) -> Column:
    """pywb MethodQueryCanonicalizer as a native expression [U pywb
    warcserver/inputrequest.py MethodQueryCanonicalizer]: a non-GET
    request folds ``__wb_method=<METHOD>`` plus its request-body
    params into the URL's query BEFORE canonicalization, so POSTed
    resources (API calls, form submissions on JS-heavy sites) get
    distinct, replayable urlkeys instead of all collapsing onto the
    bare URL.  Composition with ``surt_urlkey`` gives exactly pywb's
    order of operations: append first, then the canonicalizer sorts
    params (``__wb_method`` sorts among them) and lowercases.

    Native subset (documented divergence, same posture as the SURT
    IDN split): ``application/x-www-form-urlencoded`` bodies append
    verbatim as params; ANY other body (json/multipart/binary)
    appends as pywb's opaque fallback ``__wb_post_data=<base64>`` —
    pywb's json/multipart flattening needs real parsers and lives in
    ``fold_method_query_py`` (which the WARC request-record indexer
    uses, so INDEXING gets the full grammar; this native form serves
    derived-frame queries on the shared subset).  GET/HEAD
    (and null methods) pass the URL through untouched; a bodyless
    POST still gains ``__wb_method=POST`` (the method alone changes
    what the server serves).

    Encoding note: the opaque arm base64s the STRING column's UTF-8
    bytes (Spark's string→binary cast); the Python twin receives raw
    WARC bytes and is byte-preserving (latin-1).  Identical for
    ASCII bodies — non-ASCII opaque bodies only ever reach the twin
    (real WARCs), where no re-encoding happens at all."""
    u = F.col(url) if isinstance(url, str) else url
    m = F.upper(F.col(method) if isinstance(method, str) else method)
    ct = F.col(content_type) if isinstance(content_type, str) else content_type
    b = F.col(body) if isinstance(body, str) else body
    params = F.when(
        b.isNull() | (b == ""), F.lit("")
    ).when(
        F.lower(F.coalesce(ct, F.lit(""))).contains(
            "application/x-www-form-urlencoded"
        ),
        b,
    ).otherwise(F.concat(F.lit("__wb_post_data="), F.base64(b.cast("binary"))))
    folded = F.concat(
        u,
        F.when(u.contains("?"), F.lit("&")).otherwise(F.lit("?")),
        F.lit("__wb_method="),
        m,
        F.when(params == "", F.lit("")).otherwise(F.concat(F.lit("&"), params)),
    )
    return F.when(
        m.isNull() | m.isin("GET", "HEAD"), u
    ).otherwise(folded)


def json_body_params(body: bytes | str) -> str:
    """pywb-shaped JSON body flattening [U pywb
    warcserver/inputrequest.py MethodQueryCanonicalizer.json_parse]:
    nested objects recurse keeping the LEAF key name, arrays recurse
    under the parent name, duplicate names get ``.2_``/``.3_``/…
    suffixes in encounter order, scalars render json-style (``true``/
    ``false``/``null``, numbers/strings via ``str``), and the pairs
    urlencode with quote_plus.  Raises ValueError on unparseable
    JSON (callers fall back to the opaque ``__wb_post_data``)."""
    import json
    from urllib.parse import urlencode

    if isinstance(body, bytes):
        body = body.decode("utf-8", "replace")
    try:
        obj = json.loads(body)
    except json.JSONDecodeError as e:
        raise ValueError(f"not json: {e}") from e

    data: dict[str, str] = {}
    dupes: dict[str, int] = {}

    def key_for(n: str) -> str:
        if n not in data:
            return n
        dupes[n] = dupes.get(n, 1) + 1
        return f"{n}.{dupes[n]}_"

    def walk(v, name: str) -> None:
        if isinstance(v, dict):
            for n, child in v.items():
                walk(child, n)
        elif isinstance(v, list):
            for child in v:
                walk(child, name)
        elif name:
            if v is None or isinstance(v, bool):
                data[key_for(name)] = json.dumps(v)
            else:
                data[key_for(name)] = str(v)

    walk(obj, "")
    return urlencode(data)


def multipart_body_params(body: bytes, content_type: str) -> str:
    """multipart/form-data → urlencoded params [U pywb
    MethodQueryCanonicalizer multipart handling]: parts split on the
    declared boundary; text parts contribute ``name=value``, file
    parts contribute ``name=filename`` (the upload's bytes don't
    belong in a urlkey).  Raises ValueError when the boundary is
    missing or no part parses (callers fall back to the opaque
    form)."""
    import re
    from urllib.parse import quote_plus

    m = re.search(r'boundary="?([^";,\s]+)"?', content_type)
    if not m:
        raise ValueError("multipart body without boundary=")
    boundary = m.group(1).encode("latin-1")
    # RFC 2046 §5.1.1: a delimiter is a LINE — CRLF + '--boundary' —
    # AND the boundary must be followed by transport padding (SP/HTAB),
    # CRLF, or the closing '--'.  Both anchors matter: a value that
    # merely CONTAINS the boundary octets mid-line stays intact, and a
    # boundary that is a PREFIX of a longer token in the value
    # ('\r\n--BNDx' with boundary 'BND') is NOT a part break — the
    # split pieces below are re-joined when the follow-up byte is
    # wrong.  The opening delimiter may start the body with no
    # preceding CRLF (same follow-up check applies).

    def _delim_follows(tail: bytes) -> bool:
        # RFC 2046 after '--boundary': optional transport padding
        # (SP/HTAB) then CRLF, or the closing '--', or end-of-body.
        # Checking one byte is not enough: a single '-' ('--BND-json')
        # or a bare '\r' not followed by '\n' is a LONGER token the
        # boundary merely prefixes, not a delimiter.
        t = tail.lstrip(b" \t")
        return t == b"" or t.startswith(b"--") or t.startswith(b"\r\n")

    opening = body.startswith(b"--" + boundary) and _delim_follows(
        body[2 + len(boundary):]
    )
    data = b"\r\n" + body if opening else body
    raw = data.split(b"\r\n--" + boundary)
    parts: list[bytes] = [raw[0]]
    for piece in raw[1:]:
        if _delim_follows(piece):
            parts.append(piece)
        else:
            # false split: boundary was a prefix of a longer token
            parts[-1] += b"\r\n--" + boundary + piece
    pairs: list[tuple[str, str]] = []
    for part in parts[1:]:
        if part.lstrip(b" \t").startswith(b"--"):
            break  # close delimiter; anything after is epilogue
        head, sep, val = part.partition(b"\r\n\r\n")
        if not sep:
            continue
        hm = re.search(
            rb'content-disposition:\s*form-data;\s*name="([^"]*)"'
            rb'(?:;\s*filename="([^"]*)")?',
            head,
            re.IGNORECASE,
        )
        if not hm:
            continue
        name = hm.group(1).decode("latin-1")
        if hm.group(2) is not None:
            value = hm.group(2).decode("latin-1")
        else:
            # the part's terminating CRLF belongs to the delimiter and
            # was consumed by the split — val is the exact value bytes
            value = val.decode("latin-1")
        pairs.append((name, value))
    if not pairs:
        raise ValueError("no parseable multipart parts")
    return "&".join(
        f"{quote_plus(n)}={quote_plus(v)}" for n, v in pairs
    )


def fold_method_query_py(
    url: str, method: str | None, content_type: str | None, body
) -> str:
    """Plain-Python twin of ``fold_method_query``, used by the WARC
    request-record indexer where the body is raw bytes — but with the
    FULL pywb grammar [U pywb MethodQueryCanonicalizer]: urlencoded
    bodies append verbatim; json (and text/plain, pywb's json-attempt
    mime) bodies flatten via ``json_body_params``; multipart/form-data
    parses via ``multipart_body_params``; anything else — and any
    body whose declared grammar fails to parse — base64s into the
    opaque ``__wb_post_data`` (fail-open to the lossless form, never
    a half-parsed key)."""
    import base64

    m = (method or "").upper()
    if not m or m in ("GET", "HEAD"):
        return url
    if isinstance(body, str):
        body = body.encode("latin-1", "replace")
    ct = (content_type or "").lower()
    params = None
    if not body:
        params = ""
    elif "application/x-www-form-urlencoded" in ct:
        params = body.decode("latin-1")
    elif "json" in ct or ct.split(";")[0].strip() == "text/plain":
        try:
            params = json_body_params(body)
        except (ValueError, RecursionError):
            # RecursionError: a hostile deeply-nested body must cost
            # this record its flatten (base64 fallback), not the task
            params = None
    elif "multipart/form-data" in ct:
        try:
            params = multipart_body_params(body, content_type or "")
        except ValueError:
            params = None
    if params is None:
        params = "__wb_post_data=" + base64.b64encode(body).decode("ascii")
    sep = "&" if "?" in url else "?"
    tail = "&" + params if params else ""
    return f"{url}{sep}__wb_method={m}{tail}"


def surt_urlkey_pandas():
    """Arrow-batched pandas-UDF fallback (for plans that must match
    pywb edge cases the native subset skips — swap implementations
    here, keep call sites unchanged).

    The UDF closure references module-level functions
    (``surt_urlkey_py`` and its helpers); cloudpickle serializes those
    BY REFERENCE by default, so an executor whose Python can't import
    this package (driver launched outside the repo, no --py-files)
    dies with ModuleNotFoundError.  Registering the module for
    by-value pickling ships the function bodies inside the task
    closure instead — kilobytes, once per stage — making the fallback
    deployment-independent."""
    import sys

    import pandas  # noqa: PLC0415 — module-level global so pyspark can
    # resolve the stringified type hints (PEP 563 is active here)
    from pyspark import cloudpickle  # the serializer pyspark actually uses

    globals()["pandas"] = pandas
    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _surt(urls: pandas.Series) -> pandas.Series:
        return urls.map(lambda s: surt_urlkey_py(s) if s is not None else None)

    return _surt


def surt_urlkey_auto(df, url_col: str, out_col: str = "urlkey"):
    """Hybrid canonicalizer closing the documented IDN divergence:
    ASCII URLs (the overwhelming majority of any crawl) go through the
    native expression — pure codegen, zero Python — while URLs with a
    non-ASCII byte anywhere route through the pandas fallback, whose
    Python implementation punycodes IDN hosts exactly like
    ``surt_urlkey_py``.

    A union-split, not a ``when()``: Spark extracts Python UDFs into
    their own plan node and evaluates them on EVERY row regardless of
    the branch condition, so guarding with ``when`` would put Python
    back on the 100 TB hot path.  Splitting filters each side at the
    scan (the ASCII predicate is codegen) and only the non-ASCII
    sliver ever crosses the Arrow boundary.  The cost is scanning the
    source twice — at scale, feed this a cached/checkpointed stage or
    accept two cheap pushdown scans; either way Python work stays
    proportional to the IDN fraction.

    NULL routing: ``rlike(NULL)`` is NULL, which fails BOTH a filter
    and its negation — a naive split would silently DROP rows with a
    NULL url instead of indexing them with a NULL key (real crawl
    manifests contain such rows; damage tolerance must preserve them).
    NULLs ride the fast side, whose native expression already yields
    NULL for NULL input."""
    c = F.col(url_col)
    is_ascii = c.isNull() | ~c.rlike("[^\\x00-\\x7F]")
    fast = df.filter(is_ascii).withColumn(out_col, surt_urlkey(url_col))
    slow = df.filter(c.isNotNull() & c.rlike("[^\\x00-\\x7F]")).withColumn(
        out_col, surt_urlkey_pandas()(F.col(url_col))
    )
    return fast.unionByName(slow)


#: (gateway epoch, column name) → memoized Column.  A Column holds a
#: reference into a specific JVM gateway, so a cache keyed on the name
#: alone hands back DEAD objects after the SparkSession is stopped and
#: recreated in the same Python process (failure mode: every cdx-family
#: query in the second session dies on a stale py4j handle).  Keying by
#: the active SparkContext's identity invalidates automatically on
#: restart; stale epochs are dropped so the dict never grows past one
#: session's worth of entries.
_EXPR_CACHE: dict[tuple[int, str], Column] = {}


def _gateway_epoch() -> int:
    """Identity of the live JVM gateway (0 when no context is up).
    ``id(jvm gateway)`` changes whenever the JVM is torn down and
    relaunched, which is exactly the lifetime of a cached Column."""
    from pyspark import SparkContext

    ctx = SparkContext._active_spark_context
    return id(ctx._gateway) if ctx is not None else 0


def surt_urlkey_cached(col_name: str) -> Column:
    """``surt_urlkey(F.col(col_name))`` memoized per column NAME and
    per JVM gateway.

    The native SURT tree is ~hundreds of expression nodes and costs
    ~1 s of py4j round-trips to construct (measured — it was the
    fixed driver-side overhead of every cdx-family query).  Column
    objects are immutable unresolved expressions, so one tree keyed
    on an input column name is safely reusable across DataFrames and
    queries WITHIN one JVM; the gateway-epoch key evicts entries from
    a stopped session (ADVICE r4).  Callers project their URL
    expression onto that name first (``df.withColumn("__url", url)``)."""
    key = (_gateway_epoch(), col_name)
    if key not in _EXPR_CACHE:
        # drop entries from dead gateways before inserting
        for k in [k for k in _EXPR_CACHE if k[0] != key[0]]:
            del _EXPR_CACHE[k]
        _EXPR_CACHE[key] = surt_urlkey(F.col(col_name))
    return _EXPR_CACHE[key]
