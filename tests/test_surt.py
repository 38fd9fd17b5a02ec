"""SURT canonicalizer: known pairs, native-vs-Python equivalence,
Hypothesis properties (SURVEY.md §5.3)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from webarchive_indexing_spark.functions.surt import (
    surt_urlkey,
    surt_urlkey_pandas,
    surt_urlkey_py,
)

KNOWN = [
    ("http://example.com/", "com,example)/"),
    ("https://Example.COM/Path?b=2&a=1", "com,example)/path?a=1&b=2"),
    ("http://www.example.com/page", "com,example)/page"),
    ("http://www2.example.com/page", "com,example)/page"),
    ("https://sub.Example.org:443/a/b", "org,example,sub)/a/b"),
    ("http://example.com:80/x", "com,example)/x"),
    ("http://example.com:8080/x", "com,example:8080)/x"),
    ("http://user:pw@example.com/x", "com,example)/x"),
    ("http://example.com/x#frag", "com,example)/x"),
    ("http://example.com", "com,example)/"),
    ("example.com/plain", "com,example)/plain"),
    ("HTTP://A.B.C.EXAMPLE.NET/d?z=1&y=2&x=3", "net,example,c,b,a)/d?x=3&y=2&z=1"),
    # --- session-id stripping (surt URLRegexTransformer shapes) ---
    (
        "http://example.com/app;jsessionid=1234567890abcdef1234567890abcdef?x=1",
        "com,example)/app?x=1",
    ),
    (
        "http://example.com/cart?phpsessid=0123456789abcdef0123456789abcdef&item=5",
        "com,example)/cart?item=5",
    ),
    (
        "http://example.com/p?sid=0123456789abcdef0123456789abcdef",
        "com,example)/p",
    ),
    ("http://example.com/p?cfid=123&cftoken=ab-cd&x=2", "com,example)/p?x=2"),
    (
        "http://example.com/(s(abcdefghijklmnopqrstuvwx))/page.aspx?q=1",
        "com,example)/page.aspx?q=1",
    ),
    # sid shorter than 32 chars is a legitimate param, NOT a session id
    ("http://example.com/p?sid=42", "com,example)/p?sid=42"),
    # --- percent-encoding normalization (unreserved decode only) ---
    ("http://example.com/%7Euser/%41bc", "com,example)/~user/abc"),
    ("http://example.com/a%2Fb?q=%2F", "com,example)/a%2fb?q=%2f"),
    ("http://example.com/100%25ok", "com,example)/100%25ok"),
    ("http://example.com/a%zz", "com,example)/a%zz"),
    # --- double-encoded escapes unwrap one level, then re-decode ---
    ("http://example.com/%2541bc", "com,example)/abc"),
    ("http://example.com/%252fx", "com,example)/%2fx"),
    # fixpoint decode (round 10): any nesting depth fully unwraps
    ("http://example.com/%252541", "com,example)/a"),
    ("http://example.com/%25252541x", "com,example)/ax"),
    # --- path dot-segment removal (RFC 3986 §5.2.4) ---
    ("http://example.com/a/./b", "com,example)/a/b"),
    ("http://example.com/a/../b", "com,example)/b"),
    ("http://example.com/../x", "com,example)/x"),
    ("http://example.com/a/b/..", "com,example)/a/"),
    ("http://example.com/a/.", "com,example)/a/"),
    ("http://example.com/a/b/../../c/./d", "com,example)/c/d"),
    # a dotfile segment is not a dot segment
    ("http://example.com/a/.hidden", "com,example)/a/.hidden"),
    # --- host dot cleanup ---
    ("http://example..com./x", "com,example)/x"),
    # --- mixed-case schemes and uppercase %-escapes (lower() first) ---
    ("HtTpS://Example.com/A", "com,example)/a"),
    ("http://example.com/%7EUser/%4a%4B", "com,example)/~user/jk"),
    ("http://example.com/p?u=%4A&v=%7E", "com,example)/p?u=j&v=~"),
    # bare/truncated escapes survive verbatim
    ("http://example.com/x%", "com,example)/x%"),
    ("http://example.com/x%2", "com,example)/x%2"),
    ("http://example.com/%%%", "com,example)/%%%"),
]

#: IDN hosts: surt_urlkey_py (and the pandas fallback) punycode them;
#: the NATIVE expression documents ASCII-host-only — so these pairs are
#: asserted on the Python/pandas paths, not the codegen path.
KNOWN_IDN = [
    ("http://bücher.example/", "example,xn--bcher-kva)/"),
    ("https://WWW.Bücher.Example/x?b=2&a=1", "example,xn--bcher-kva)/x?a=1&b=2"),
    ("http://☃.example/s", "example,xn--n3h)/s"),
    # already-encoded punycode passes through untouched (idempotent)
    ("http://xn--bcher-kva.example/", "example,xn--bcher-kva)/"),
]


@pytest.mark.parametrize("url,expected", KNOWN)
def test_known_pairs_python(url, expected):
    assert surt_urlkey_py(url) == expected


def test_known_pairs_native(spark):
    df = spark.createDataFrame([(u,) for u, _ in KNOWN], ["url"])
    got = [r[0] for r in df.select(surt_urlkey("url")).collect()]
    assert got == [e for _, e in KNOWN]


def test_native_matches_python_on_messy_urls(spark):
    """One Spark job over a combinatorial messy-URL corpus: the native
    expression and the Python reference must agree byte-for-byte."""
    hosts = ["example.com", "www3.Sub.example.org:8080", "a..b.net."]
    paths = [
        "/",
        "/x;jsessionid=1234567890abcdef1234567890abcdef",
        "/%7Ea/%42/%2f%GG",
        "/(s(abcdefghijklmnopqrstuvwx))/p.aspx",
        "/plain%25",
        "/a/../b/./c/%2541",
        "/a/b/..",
        "/%252541/.hidden",
        "/../../up/past/root",
        "/a//b/../../..",
        "/%2525%41",
        "/.",
        # juxtaposition-synthesized escapes: pass 1 creates '%25..' /
        # '%41' sequences the RAW url never contained ('%%325ab' →
        # '%25ab' → '%ab'; '%%341' → '%41' → 'a'), so pass 2 must be
        # gated on the pass-1 RESULT, not the raw url (ADVICE r03)
        "/%%325ab",
        "/%%341",
        "/x%%2532y",
        # bare / truncated / piled-up escapes
        "/%",
        "/x%2",
        "/%%",
        "/%25%32%35",
        "/%gg%41",
        # escape-heavy verbatim tail (round 11): many kept escapes keep
        # contains('%') true forever — the {val, done} fold must hit
        # the fixpoint early and still match the Python loop exactly
        "/" + "%ff" * 12 + "%2541",
        "/%zz" * 10,
    ]
    queries = [
        "",
        "?b=2&a=%41&sid=0123456789abcdef0123456789abcdef",
        "?cfid=9&cftoken=t0&z=1",
        "?only=%7e",
        "?U=%4A&v=%2541&w=%25",
    ]
    urls = [f"http://{h}{p}{q}" for h in hosts for p in paths for q in queries]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = [r[0] for r in df.select(surt_urlkey("url")).collect()]
    want = [surt_urlkey_py(u) for u in urls]
    assert got == want


@settings(max_examples=500, deadline=None)
@given(
    s=st.text(
        alphabet="%0123456789abcdefgzABCDEF25./?&=~_-",
        max_size=40,
    )
)
def test_pct_fixpoint_idempotent(s):
    """Property (round 10): percent normalization terminates on
    arbitrary escape soup and its result is a true fixpoint — one
    more pass changes nothing (the invariant the native iteration
    bound in functions/surt._pct_pass is derived from)."""
    from webarchive_indexing_spark.functions.surt import (
        _pct_fixpoint_py,
        _pct_normalize_py,
    )

    fp = _pct_fixpoint_py(s)
    assert _pct_normalize_py(fp) == fp
    assert _pct_fixpoint_py(fp) == fp


def test_pandas_udf_matches(spark):
    df = spark.createDataFrame([(u,) for u, _ in KNOWN], ["url"])
    udf = surt_urlkey_pandas()
    got = [r[0] for r in df.select(udf("url")).collect()]
    assert got == [e for _, e in KNOWN]


@pytest.mark.parametrize("url,expected", KNOWN_IDN)
def test_idn_punycode_python(url, expected):
    assert surt_urlkey_py(url) == expected


def test_idn_punycode_pandas(spark):
    df = spark.createDataFrame([(u,) for u, _ in KNOWN_IDN], ["url"])
    udf = surt_urlkey_pandas()
    got = [r[0] for r in df.select(udf("url")).collect()]
    assert got == [e for _, e in KNOWN_IDN]


_hosts = st.lists(
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789-", min_size=1, max_size=8),
    min_size=1,
    max_size=4,
).map(".".join)
_paths = st.text(alphabet="abcdefghijklmnopqrstuvwxyz0123456789/_.-", max_size=20)
_params = st.lists(
    st.tuples(
        st.text(alphabet="abcxyz", min_size=1, max_size=3),
        st.text(alphabet="0123456789", min_size=1, max_size=3),
    ),
    max_size=4,
)


@settings(max_examples=200, deadline=None)
@given(host=_hosts, path=_paths, params=_params, scheme=st.sampled_from(["http", "https"]))
def test_properties(host, path, params, scheme):
    q = "&".join(f"{k}={v}" for k, v in params)
    url = f"{scheme}://{host}/{path}" + (f"?{q}" if q else "")
    key = surt_urlkey_py(url)

    # deterministic + lowercase + no scheme residue
    assert key == surt_urlkey_py(url.upper()[:0] + url)  # determinism
    assert key == key.lower()
    assert "://" not in key

    # scheme-invariance
    assert surt_urlkey_py(url.replace(scheme, "http", 1)) == key

    # query-order invariance
    import random

    rnd = random.Random(42)
    shuffled = params[:]
    rnd.shuffle(shuffled)
    q2 = "&".join(f"{k}={v}" for k, v in shuffled)
    url2 = f"{scheme}://{host}/{path}" + (f"?{q2}" if q2 else "")
    assert surt_urlkey_py(url2) == key

    # domain-prefix property: deeper path under same host shares the
    # host-reversal prefix up to ')'
    deeper = f"{scheme}://{host}/{path}x/y"
    assert surt_urlkey_py(deeper).split(")")[0] == key.split(")")[0]


@settings(max_examples=100, deadline=None)
@given(host=_hosts, path=_paths)
def test_sort_prefix_ordering(host, path):
    """url prefix ⊆ domain range: every key of a host sorts inside
    [hostkey, hostkey+'~') — the range-pruning invariant (§3.3)."""
    key = surt_urlkey_py(f"http://{host}/{path}")
    hostkey = surt_urlkey_py(f"http://{host}/").split(")")[0]
    assert hostkey <= key < hostkey + "~"


def test_auto_router_punycodes_idn_hosts(spark):
    """surt_urlkey_auto must equal the Python reference on a mixed
    ASCII/IDN batch: ASCII rows via the native expression, non-ASCII
    rows punycoded by the pandas fallback."""
    from webarchive_indexing_spark.functions.surt import (
        surt_urlkey_auto,
        surt_urlkey_py,
    )

    urls = [
        "https://www.Example.COM:443/a/../b?x=2&a=1",
        "https://www.münchen.de/straße?q=1",
        "http://bücher.example:80/path",
        "https://www.日本.jp/",
        "http://plain.org/ok",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = {r.url: r.urlkey for r in surt_urlkey_auto(df, "url").collect()}
    for u in urls:
        assert got[u] == surt_urlkey_py(u), u


def test_auto_router_preserves_null_urls(spark):
    """rlike(NULL) is NULL, which fails BOTH sides of a naive
    ascii/non-ascii split — the router must still emit the row (with a
    NULL urlkey), matching the damage-tolerance contract of the plain
    surt_urlkey path (ADVICE r4 medium)."""
    from webarchive_indexing_spark.functions.surt import surt_urlkey_auto

    rows = [("https://a.example/x",), (None,), ("https://bücher.example/y",)]
    df = spark.createDataFrame(rows, "url string")
    out = surt_urlkey_auto(df, "url").collect()
    assert len(out) == 3, "NULL-url row was dropped by the router"
    by_url = {r.url: r.urlkey for r in out}
    assert by_url[None] is None
    assert by_url["https://a.example/x"] == "example,a)/x"
    assert by_url["https://bücher.example/y"] == "example,xn--bcher-kva)/y"


def test_expr_cache_keyed_by_gateway(spark):
    """The memoized SURT Column cache must not serve entries across a
    JVM restart (ADVICE r4): its keys carry the gateway epoch, and a
    different epoch's entries are evicted on next use."""
    from pyspark.sql import functions as F
    from webarchive_indexing_spark.functions import surt as m

    c1 = m.surt_urlkey_cached("__url")
    epoch = m._gateway_epoch()
    assert epoch != 0
    assert (epoch, "__url") in m._EXPR_CACHE
    # simulate a stale entry from a previous JVM: different epoch key
    m._EXPR_CACHE[(epoch - 1, "__stale")] = c1
    c2 = m.surt_urlkey_cached("__other")
    assert c2 is not None
    assert (epoch - 1, "__stale") not in m._EXPR_CACHE, (
        "stale-gateway entries must be evicted"
    )
    # same-session memoization still holds
    assert m.surt_urlkey_cached("__url") is c1


def test_auto_router_ascii_branch_has_no_python(spark):
    """The ASCII side of the split must stay pure codegen — no
    Arrow/Python eval node in its plan."""
    from pyspark.sql import functions as F
    from webarchive_indexing_spark.functions.surt import surt_urlkey

    df = spark.createDataFrame([("http://a.com/x",)], ["url"])
    fast = df.filter(~F.col("url").rlike("[^\\x00-\\x7F]")).withColumn(
        "urlkey", surt_urlkey("url")
    )
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan, plan[:400]


def test_fold_method_query_native_matches_python(spark):
    """fold_method_query (native) ∘ surt_urlkey must equal
    fold_method_query_py ∘ surt_urlkey_py row for row across the
    grammar arms: GET passthrough, urlencoded append (params sort in
    with the URL's own), base64 fallback for non-form bodies, bodyless
    POST, URL with and without an existing query."""
    from pyspark.sql import functions as F

    from webarchive_indexing_spark.functions.surt import (
        fold_method_query,
        fold_method_query_py,
        surt_urlkey,
        surt_urlkey_py,
    )

    # the SHARED subset: json/multipart flatten only in the Python
    # twin (the WARC indexing path) — documented divergence, so no
    # such rows here
    rows = [
        ("http://e.com/a?z=9", "GET", None, ""),
        ("http://e.com/a?z=9", "POST",
         "application/x-www-form-urlencoded", "b=2&a=1"),
        ("http://e.com/a", "POST",
         "application/x-www-form-urlencoded; charset=utf-8", "b=2&a=1"),
        ("http://e.com/a?x=1", "PUT", "application/octet-stream", "rawbytes"),
        ("http://e.com/a", "POST", None, ""),
        ("http://e.com/a", "HEAD", None, ""),
        ("http://e.com/a", None, None, "ignored"),
    ]
    df = spark.createDataFrame(
        rows, "url string, method string, ct string, body string"
    )
    got = [
        r["k"]
        for r in df.select(
            surt_urlkey(
                fold_method_query("url", "method", "ct", "body")
            ).alias("k")
        ).collect()
    ]
    want = [
        surt_urlkey_py(fold_method_query_py(u, m, c, b))
        for u, m, c, b in rows
    ]
    assert got == want
    # spot-pin the two interesting shapes (golden pywb-style keys)
    assert got[1] == "com,e)/a?__wb_method=post&a=1&b=2&z=9"
    assert got[4] == "com,e)/a?__wb_method=post"


def test_fold_method_query_py_json_and_multipart():
    """The Python twin's full pywb grammar [U pywb
    MethodQueryCanonicalizer]: json bodies flatten (leaf keys, arrays
    under the parent name, duplicate names suffixed .2_/.3_, scalars
    json-style, urlencoded pairs); text/plain attempts json;
    multipart parses name= / filename= parts; anything unparseable
    falls back to the lossless __wb_post_data form."""
    from webarchive_indexing_spark.functions.surt import (
        fold_method_query_py,
        json_body_params,
        multipart_body_params,
    )

    # flatten grammar, piece by piece
    assert json_body_params('{"b": 2, "a": "x y"}') == "b=2&a=x+y"
    assert json_body_params('{"outer": {"inner": 1}}') == "inner=1"
    assert json_body_params('{"a": [1, 2, 3]}') == "a=1&a.2_=2&a.3_=3"
    assert (
        json_body_params('{"q": {"a": 1}, "r": {"a": 2}}')
        == "a=1&a.2_=2"
    )
    assert json_body_params('{"t": true, "n": null}') == "t=true&n=null"

    mp = (
        b'--BND\r\ncontent-disposition: form-data; name="field"\r\n\r\n'
        b"hello world\r\n"
        b'--BND\r\nContent-Disposition: form-data; name="up"; '
        b'filename="f.bin"\r\ncontent-type: application/octet-stream'
        b"\r\n\r\n\x00\x01\r\n--BND--\r\n"
    )
    assert (
        multipart_body_params(mp, 'multipart/form-data; boundary="BND"')
        == "field=hello+world&up=f.bin"
    )

    # RFC 2046 line-anchored delimiters: a value carrying the boundary
    # octets MID-LINE stays one part (only CRLF--boundary terminates),
    # and a multi-line value keeps its interior CRLFs verbatim
    tricky = (
        b'--BND\r\ncontent-disposition: form-data; name="a"\r\n\r\n'
        b"x --BND y\r\n"
        b'--BND\r\ncontent-disposition: form-data; name="b"\r\n\r\n'
        b"line1\r\nline2\r\n--BND--\r\n"
    )
    assert (
        multipart_body_params(tricky, "multipart/form-data; boundary=BND")
        == "a=x+--BND+y&b=line1%0D%0Aline2"
    )

    # round 11 (ADVICE): a boundary that is a PREFIX of a longer token
    # in a value ('\r\n--BNDx') is NOT a delimiter — RFC 2046 requires
    # the boundary be followed by transport padding, CRLF, or the
    # closing '--'; the value stays intact
    prefix = (
        b'--BND\r\ncontent-disposition: form-data; name="a"\r\n\r\n'
        b"x\r\n--BNDx y\r\n"
        b'--BND\r\ncontent-disposition: form-data; name="b"\r\n\r\n'
        b"z\r\n--BND--\r\n"
    )
    assert (
        multipart_body_params(prefix, "multipart/form-data; boundary=BND")
        == "a=x%0D%0A--BNDx+y&b=z"
    )
    # same prefix confusion on the OPENING delimiter: '--BNDx...' is
    # preamble, not a part break
    open_conf = (
        b"--BNDx preamble\r\n--BND\r\n"
        b'content-disposition: form-data; name="a"\r\n\r\nv\r\n--BND--\r\n'
    )
    assert (
        multipart_body_params(open_conf, "multipart/form-data; boundary=BND")
        == "a=v"
    )
    # transport padding after the boundary is still a valid delimiter
    padded = (
        b"--BND \t\r\n"
        b'content-disposition: form-data; name="a"\r\n\r\npv\r\n--BND--\r\n'
    )
    assert (
        multipart_body_params(padded, "multipart/form-data; boundary=BND")
        == "a=pv"
    )
    # a single '-' or a bare '\r' after the boundary is a LONGER token,
    # not the '--' close or a CRLF — the value stays intact (round 11
    # review: one follow-up byte was not enough to decide)
    dash = (
        b'--BND\r\ncontent-disposition: form-data; name="a"\r\n\r\n'
        b"hello\r\n--BND-json more\r\n"
        b'--BND\r\ncontent-disposition: form-data; name="b"\r\n\r\n'
        b"z\r\n--BND--\r\n"
    )
    assert (
        multipart_body_params(dash, "multipart/form-data; boundary=BND")
        == "a=hello%0D%0A--BND-json+more&b=z"
    )
    bare_cr = (
        b'--BND\r\ncontent-disposition: form-data; name="a"\r\n\r\n'
        b"hello\r\n--BND\rtail\r\n--BND--\r\n"
    )
    assert (
        multipart_body_params(bare_cr, "multipart/form-data; boundary=BND")
        == "a=hello%0D%0A--BND%0Dtail"
    )

    # composed through the fold: json POST
    u = fold_method_query_py(
        "http://e.com/api", "POST", "application/json", b'{"b":2,"a":1}'
    )
    assert u == "http://e.com/api?__wb_method=POST&b=2&a=1"
    # text/plain json-attempt (pywb's mime list)
    u = fold_method_query_py(
        "http://e.com/api", "POST", "text/plain", b'{"k":"v"}'
    )
    assert u.endswith("?__wb_method=POST&k=v")
    # unparseable json falls back to the opaque form
    u = fold_method_query_py(
        "http://e.com/api", "POST", "application/json", b"{nope"
    )
    assert "__wb_post_data=" in u
    # multipart without a boundary falls back too
    u = fold_method_query_py(
        "http://e.com/api", "POST", "multipart/form-data", mp
    )
    assert "__wb_post_data=" in u
    # hostile deep nesting: RecursionError degrades to the opaque
    # form instead of killing the task (per-record damage tolerance)
    deep = ("[" * 100000) + ("]" * 100000)
    u = fold_method_query_py(
        "http://e.com/api", "POST", "application/json", deep.encode()
    )
    assert "__wb_post_data=" in u


@settings(max_examples=300, deadline=None)
@given(
    url=st.text(max_size=40),
    method=st.one_of(st.none(), st.sampled_from(
        ["GET", "POST", "PUT", "HEAD", "OPTIONS", "post", ""]
    ), st.text(max_size=8)),
    ct=st.one_of(st.none(), st.sampled_from([
        "application/x-www-form-urlencoded",
        "application/json", "text/plain",
        "multipart/form-data; boundary=XX",
        "multipart/form-data",  # missing boundary
        "application/octet-stream", "",
    ]), st.text(max_size=30)),
    body=st.one_of(st.binary(max_size=64), st.text(max_size=64)),
)
def test_fold_method_query_py_never_raises(url, method, ct, body):
    """Property: the WARC-path POST fold must never raise on damaged
    input — a malformed body/content-type degrades to the lossless
    base64 form, never a task death (the per-record damage-tolerance
    posture of the whole WARC parser)."""
    from webarchive_indexing_spark.functions.surt import fold_method_query_py

    out = fold_method_query_py(url, method, ct, body)
    assert isinstance(out, str)
    m = (method or "").upper()
    if m and m not in ("GET", "HEAD"):
        assert "__wb_method=" in out
    else:
        assert out == url
