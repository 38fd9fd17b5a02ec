"""Distributed BPE merge learning (SURVEY.md §2.11 L5 — the tokenizer-
training step upstream of ``text_bpe_token_count`` / ``text_vocab_topk``:
byte-pair encoding learns its merge table from corpus statistics,
Sennrich et al. 2016).

Spark-first shape, per merge round (the iterative model-artifact
discipline of ``operators/kmeans.py`` / ``operators/pca.py``):

1. **Pair counting is one explode + aggregate.**  Every word's symbol
   sequence yields its adjacent pairs weighted by the word's corpus
   count; partial aggregation collapses them map-side, the exchange
   carries (pair, count) rows — vocabulary-sized, not corpus-sized
   (the word list itself is the classic BPE compression: counting
   over distinct words × counts, never over raw tokens).
2. **The argmax pair is a model artifact**: top-1 by (count DESC,
   pair ASC) — one row to the driver.
3. **The merge is a map-side string replace.**  Symbol sequences ride
   as ``<sym><sym>…`` strings; ``replace(enc, '<a><b>', '<ab>')``
   scans left-to-right non-overlapping — EXACTLY greedy-leftmost BPE
   merging — and the ``<``/``>`` guards make partial-symbol matches
   impossible (``<xa><by>`` cannot match ``<a><b>``).  Both engines
   define ``replace`` identically, which is what makes the whole
   learner oracle-checkable.

At 100 TB: the word list is the only shuffled data (domain-bounded),
rounds add driver barriers (inherent to BPE — each merge depends on
the last), and each round is one scan of the compact word list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: restrict to lowercase-alpha word forms so the <>-guard alphabet is
#: provably disjoint from symbol text
WORD_RE = "^[a-z]+$"


def _pairs_sql(enc: str) -> str:
    """Spark-SQL: adjacent symbol pairs of an encoded word as
    array<struct<a,b>>.  The single-symbol case needs an explicit
    guard: Spark's ``sequence(1, 0)`` counts DOWN ([1, 0]), it is not
    empty like DuckDB's ``generate_series(1, 0)``."""
    syms = f"split(substring({enc}, 2, length({enc}) - 2), '><')"
    return (
        f"CASE WHEN size({syms}) < 2 THEN array() "
        f"ELSE transform(sequence(1, size({syms}) - 1), "
        f"i -> struct(element_at({syms}, i) AS a, element_at({syms}, i + 1) AS b)) END"
    )


def bpe_learn_merges(
    docs: DataFrame,
    n_merges: int = 3,
    *,
    text_col: str = "text",
) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges over the whitespace-
    token word list of ``docs``; returns the merge table
    ``(merge_rank, lhs, rhs, pair_count)`` — the artifact a tokenizer
    ships."""
    from ..functions.text import tokens

    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .filter(F.col("w").rlike(WORD_RE))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .selectExpr("regexp_replace(w, '(.)', '<$1>') AS enc", "c")
    )

    merges: list[tuple[int, str, str, int]] = []
    enc_expr = "enc"
    for rank in range(1, n_merges + 1):
        cur = words.selectExpr(f"{enc_expr} AS enc", "c")
        top = (
            cur.selectExpr("explode(" + _pairs_sql("enc") + ") AS p", "c")
            .groupBy("p.a", "p.b")
            .agg(F.sum("c").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        merges.append((rank, a, b, cnt))
        enc_expr = (
            f"replace({enc_expr}, '<{a}><{b}>', '<{a}{b}>')"
        )

    spark = docs.sparkSession
    return spark.createDataFrame(
        merges, "merge_rank int, lhs string, rhs string, pair_count bigint"
    )


def sql_bpe_learn_merges(n_merges: int = 3, doc_limit: int = 300) -> str:
    """DuckDB twin: the same rounds as chained CTEs — pair counts via
    unnest, the argmax via ORDER BY ... LIMIT 1, the merge via the
    identical guarded replace."""
    parts = [
        f"""words AS (
      SELECT regexp_replace(w, '(.)', '<\\1>', 'g') AS enc, COUNT(*) AS c
      FROM (
        SELECT unnest(string_split(text, ' ')) AS w
        FROM documents WHERE doc_id < {doc_limit}
      ) WHERE regexp_matches(w, '{WORD_RE}')
      GROUP BY w
    )""",
    ]

    def pairs(src: str) -> str:
        return f"""(
      SELECT syms[i] AS a, syms[i + 1] AS b, c
      FROM (
        SELECT string_split(substring(enc, 2, length(enc) - 2), '><') AS syms, c
        FROM {src}
      ), unnest(generate_series(1, len(syms) - 1)) AS t(i)
    )"""

    prev = "words"
    tops = []
    for r in range(1, n_merges + 1):
        parts.append(
            f"""top{r} AS (
      SELECT a, b, CAST(SUM(c) AS BIGINT) AS cnt
      FROM {pairs(prev)} GROUP BY a, b
      ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
    )"""
        )
        tops.append(f"SELECT {r} AS merge_rank, a AS lhs, b AS rhs, cnt AS pair_count FROM top{r}")
        parts.append(
            f"""w{r} AS (
      SELECT replace(enc, '<' || t.a || '><' || t.b || '>',
                     '<' || t.a || t.b || '>') AS enc, c
      FROM {prev} CROSS JOIN top{r} t
    )"""
        )
        prev = f"w{r}"
    return "WITH " + ",\n    ".join(parts) + "\n    " + " UNION ALL ".join(tops)
