"""HTML main-content extraction (boilerplate removal).

The ingest→text seam every web-scale curation pipeline runs before
any text-quality operator: Common Crawl ships WET ``conversion``
records because upstream tooling performs exactly this step on the
raw HTML ``response`` payloads.  This module is the engine-native
version — an Arrow-batched, pure-Python block extractor in the
image-header-parser pattern (``operators/multimodal.py``): bytes in
an executor buffer, metadata+text out, nothing per-row crosses the
Python boundary outside one vectorized pass.

Algorithm (a deterministic jusText/trafilatura-shaped reduction):

1. strip comments and ``<script>/<style>/<noscript>`` elements with
   their content (an unterminated opener swallows to EOF — the
   tolerant-lexer rule that keeps truncated pages deterministic);
2. segment the remaining stream into text BLOCKS at block-level tag
   boundaries (``p div li h1..h6 td section article nav footer …``);
   inline tags (``a b i span em strong img``) do not split;
3. decode character entities, collapse ASCII whitespace runs;
4. score each block: word count and link density (non-whitespace
   chars inside ``<a>`` elements / all non-whitespace chars);
5. keep blocks with ``words >= min_words`` and
   ``link_density <= max_link_density``; the kept blocks joined by
   blank lines are the document's main text.

The word-count rule is deliberately expressible in ANSI SQL
(``len(string_split(norm, ' ')) >= min_words``) so fixture-grammar
oracles recompute the KEEP decision, not just the planted text.

Scale: this is a scan-side ``mapInPandas`` — payload bytes never
cross an exchange, the output carries text + counts only, and the
pass fuses with ingest (``index_warcs(keep_payload=('text/html',))``
delivers the bytes column).  At 100 TB the cost is the scan itself.

Determinism contract: whitespace normalization uses the ASCII class
``[ \\t\\r\\n\\f\\v]`` (matching RE2/DuckDB ``\\s``), so a decoded
``&nbsp;`` (U+00A0) is TEXT, not whitespace, in both engines.
"""

from __future__ import annotations

import re
from collections.abc import Iterator
from html import unescape

from pyspark.sql import DataFrame

#: tags that terminate the current text block (head/metadata tags
#: included: a <title> becomes its own — usually short, dropped —
#: block instead of gluing onto body text)
BLOCK_TAGS = frozenset(
    """html head body title main article section nav aside header
    footer p div ul ol li dl dt dd table thead tbody tfoot tr td th
    h1 h2 h3 h4 h5 h6 blockquote pre hr br form fieldset figure
    figcaption address center""".split()
)

_COMMENT_RE = re.compile(r"<!--.*?(?:-->|$)", re.S)
_CONTAINER_RE = re.compile(
    r"(?is)<(script|style|noscript)\b[^>]*(?:>.*?(?:</\1\s*>|$)|$)"
)
_TOKEN_RE = re.compile(r"<[^>]*(?:>|$)|[^<]+", re.S)
_TAGNAME_RE = re.compile(r"</?\s*([a-zA-Z][a-zA-Z0-9]*)")
_WS_RE = re.compile(r"[ \t\r\n\f\v]+")


def extract_blocks(html: str) -> list[tuple[str, float]]:
    """(normalized_text, link_density) per non-empty text block, in
    document order.  Pure function of the input string — tolerant of
    truncation (a trailing unterminated tag contributes nothing; the
    open block flushes at EOF)."""
    html = _COMMENT_RE.sub(" ", html)
    html = _CONTAINER_RE.sub(" ", html)
    blocks: list[tuple[str, float]] = []
    buf: list[str] = []
    link_chars = total_chars = 0
    link_depth = 0

    def flush() -> None:
        nonlocal buf, link_chars, total_chars, link_depth
        norm = _WS_RE.sub(" ", "".join(buf)).strip()
        if norm:
            dens = link_chars / total_chars if total_chars else 0.0
            blocks.append((norm, dens))
        buf, link_chars, total_chars, link_depth = [], 0, 0, 0

    for m in _TOKEN_RE.finditer(html):
        tok = m.group(0)
        if tok.startswith("<"):
            tm = _TAGNAME_RE.match(tok)
            if not tm:  # <!doctype, stray '<', '<3' — not markup
                continue
            name = tm.group(1).lower()
            if name == "a":
                if tok.startswith("</"):
                    link_depth = max(0, link_depth - 1)
                elif not tok.rstrip(">").endswith("/"):
                    link_depth += 1
            elif name in BLOCK_TAGS:
                flush()
        else:
            text = unescape(tok)
            n = len(_WS_RE.sub("", text))
            total_chars += n
            if link_depth > 0:
                link_chars += n
            buf.append(text)
    flush()
    return blocks


def extract_main_text(
    html: str, *, min_words: int = 10, max_link_density: float = 0.33
) -> dict:
    """Boilerplate-removal verdict for one document: kept blocks
    joined by blank lines (None when nothing qualifies), plus the
    kept/total block counts curation monitors want."""
    blocks = extract_blocks(html)
    kept = [
        text
        for text, dens in blocks
        if text.count(" ") + 1 >= min_words and dens <= max_link_density
    ]
    return {
        "main_text": "\n\n".join(kept) if kept else None,
        "n_blocks_kept": len(kept),
        "n_blocks_total": len(blocks),
    }


_MAIN_FIELDS = (
    "status string, main_text string, "
    "n_blocks_kept int, n_blocks_total int"
)


def extract_main_content(
    df: DataFrame,
    html_col: str = "payload",
    keys: tuple[str, ...] = ("urlkey", "timestamp", "url"),
    *,
    min_words: int = 10,
    max_link_density: float = 0.33,
) -> DataFrame:
    """Spark face: one Arrow pass over ``html_col`` (binary or
    string) appends ``status`` ('ok' when main text was found,
    'empty' when every block scored as boilerplate, 'null' for an
    unretained payload), the extracted ``main_text``, and block
    counts beside the caller's key columns.  Bytes decode as UTF-8
    with replacement (deterministic — no charset sniffing); the
    payload column is dropped on output, so downstream text operators
    shuffle text, never raw HTML."""
    key_list = [k for k in keys if k in df.columns]
    key_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name in key_list
    )
    out_schema = f"{key_fields}, {_MAIN_FIELDS}" if key_fields else _MAIN_FIELDS
    out_cols = [*key_list, "status", "main_text", "n_blocks_kept", "n_blocks_total"]

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                payload = pdf[html_col].iloc[i]
                if payload is None:
                    rec = {
                        "status": "null", "main_text": None,
                        "n_blocks_kept": 0, "n_blocks_total": 0,
                    }
                else:
                    if isinstance(payload, (bytes, bytearray, memoryview)):
                        text = bytes(payload).decode("utf-8", errors="replace")
                    else:
                        text = str(payload)
                    d = extract_main_text(
                        text,
                        min_words=min_words,
                        max_link_density=max_link_density,
                    )
                    rec = {
                        "status": "ok" if d["n_blocks_kept"] else "empty",
                        **d,
                    }
                rows.append({**{k: pdf[k].iloc[i] for k in key_list}, **rec})
            yield pd.DataFrame(rows, columns=out_cols)

    return df.select(*key_list, html_col).mapInPandas(fn, out_schema)
