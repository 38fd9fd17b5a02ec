"""Text-analysis functions (SURVEY.md §2.11 L5): tokenization, token
hashing, shingling, stopword/quality scoring — all native column
expressions (JVM-side; the 100 TB hot path never enters Python).

Cross-engine hashing contract: ``token_hash`` is the first 8 hex chars
of md5 parsed as an integer — identical in Spark (``conv``) and DuckDB
(``'0x'||substr(md5(..)..)::BIGINT``), which is what makes the minhash
/ simhash queries oracle-checkable.  (xxhash64 would be faster but is
Spark-specific; swap via the ``hash_expr`` seam for production.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword sets for the heuristic language scorer
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "es": ["el", "la", "de", "que", "y", "los"],
    "fr": ["le", "la", "les", "et", "des", "un"],
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (documents.text is space-separated)."""
    return F.split(text, " ")


def bpe_ish_tokens(text: Column | str) -> Column:
    """BPE-ish regex tokenization: letter runs, digit runs, single
    symbols — the pre-tokenizer shape BPE vocabularies assume."""
    return F.regexp_extract_all(
        F.col(text) if isinstance(text, str) else text, F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0
    )


def token_hash(tok: Column) -> Column:
    """md5-derived 32-bit integer hash (cross-engine deterministic).

    DuckDB twin: ``CAST('0x' || substr(md5(t), 1, 8) AS BIGINT)``."""
    return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("bigint")


def sql_token_hash(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 8)) AS BIGINT)"


def shingles(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles: [t1 t2 t3, t2 t3 t4, ...]; empty when the
    document is shorter than n tokens.

    DuckDB twin: ``list_transform(range(1, len(toks) - {n-2}),
    i -> toks[i] || ' ' || ... )`` (range is end-exclusive → empty on
    short docs, matching the guard here)."""
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    sh = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]),
    )
    return F.when(F.size(toks) >= n, sh).otherwise(F.array().cast("array<string>"))


def sql_shingles(toks_expr: str, n: int = 3) -> str:
    parts = " || ' ' || ".join(f"{toks_expr}[i + {j}]" for j in range(n))
    return f"list_transform(range(1, len({toks_expr}) - {n - 2}), i -> {parts})"


def stopword_count(toks: Column, lang: str = "en") -> Column:
    words = STOPWORDS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def sql_stopword_count(toks_expr: str, lang: str = "en") -> str:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter({toks_expr}, t -> list_contains([{lst}], t)))"
