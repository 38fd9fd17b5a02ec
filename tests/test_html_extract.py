"""HTML main-content extraction (round 13): tolerant-lexer rules,
block scoring, damage arms, and the Spark Arrow-pass face."""

from __future__ import annotations

from webarchive_indexing_spark.operators.html_extract import (
    extract_blocks,
    extract_main_text,
    extract_main_content,
)

PAGE = (
    "<!doctype html><html><head><title>My Page</title>"
    "<script>var x = 1; if (x < 2) go();</script>"
    "<style>p { margin: 0 } /* < keep out */</style></head><body>"
    '<nav><a href="/">Home</a> <a href="/a">About</a></nav>'
    "<!-- comment with <p>fake</p> markup -->"
    "<p>The quick brown fox jumps over the lazy dog near the riverbank "
    "today.</p>"
    "<div>Short promo <a href='/n'>link</a></div>"
    "<p>Another substantial paragraph follows here with enough words to "
    "clear the minimum threshold comfortably.</p>"
    "<footer><a href='/p'>Privacy</a> &copy; Example</footer>"
    "</body></html>"
)


def test_blocks_segmentation_and_scoring():
    blocks = extract_blocks(PAGE)
    texts = [b for b, _ in blocks]
    assert texts[0] == "My Page"  # title is its own (short) block
    assert "Home About" in texts[1]
    assert texts[2].startswith("The quick brown fox")
    # script/style/comment content never leaks into any block
    joined = " ".join(texts)
    assert "var x" not in joined and "margin" not in joined
    assert "fake" not in joined
    # nav is essentially all link text
    nav_density = blocks[1][1]
    assert nav_density > 0.9
    # content paragraphs carry no links
    assert blocks[2][1] == 0.0


def test_main_text_keeps_content_drops_boilerplate():
    d = extract_main_text(PAGE, min_words=10)
    assert d["n_blocks_kept"] == 2
    assert d["main_text"].startswith("The quick brown fox")
    assert "\n\n" in d["main_text"]
    assert "Privacy" not in d["main_text"]
    assert "Home" not in d["main_text"]


def test_entities_and_whitespace_normalization():
    d = extract_main_text(
        "<p>Tom &amp; Jerry   ran \t fast &#x21; over the big hill "
        "again &lt;now&gt;</p>",
        min_words=5,
    )
    assert d["main_text"] == "Tom & Jerry ran fast ! over the big hill again <now>"


def test_truncated_page_flushes_open_block():
    # cut mid-tag after the paragraph text: the partial tag swallows
    # to EOF and the open block flushes
    d = extract_main_text(
        "<html><body><p>one two three four five six seven eight nine "
        "ten eleven<p cl",
        min_words=10,
    )
    assert d["main_text"] is not None and d["main_text"].endswith("eleven")
    assert d["n_blocks_total"] == 1


def test_unterminated_script_swallows_to_eof():
    d = extract_main_text(
        "<p>alpha beta gamma delta epsilon zeta eta theta iota kappa</p>"
        "<script>var hidden = 'secret';",
        min_words=5,
    )
    assert "secret" not in (d["main_text"] or "")
    assert d["n_blocks_total"] == 1


def test_link_density_drops_linky_blocks():
    linky = (
        '<p><a href="/x">one two three four five six seven eight</a> '
        "nine ten eleven twelve</p>"
    )
    d = extract_main_text(linky, min_words=5, max_link_density=0.33)
    assert d["main_text"] is None and d["n_blocks_total"] == 1
    d2 = extract_main_text(linky, min_words=5, max_link_density=0.9)
    assert d2["n_blocks_kept"] == 1


def test_nested_and_selfclosing_anchors():
    # self-closing <a/> must not open a link span
    d = extract_blocks("<p>plain <a/>still plain words here</p>")
    assert d[0][1] == 0.0
    # unbalanced </a> never goes negative
    d2 = extract_blocks("<p>text</a> more text</p>")
    assert d2[0][1] == 0.0


def test_spark_face_binary_null_and_schema(spark):
    rows = [
        (1, PAGE.encode()),
        (2, None),
        (3, b"<p>tiny</p>"),
        (4, b"\xff\xfe garbage \x80 <p>ten little words make this "
            b"text block pass easily now</p>"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = extract_main_content(
        df, html_col="payload", keys=("doc_id",), min_words=10
    )
    assert out.columns == [
        "doc_id", "status", "main_text", "n_blocks_kept", "n_blocks_total"
    ]
    got = {r.doc_id: r for r in out.collect()}
    assert got[1].status == "ok" and got[1].n_blocks_kept == 2
    assert got[2].status == "null" and got[2].main_text is None
    assert got[3].status == "empty" and got[3].n_blocks_total == 1
    # undecodable bytes replace, parse continues
    assert got[4].status == "ok"
    assert got[4].main_text.startswith("ten little words")
    # map-side only: no exchange in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
