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

#: GPT-2's byte-level pretokenizer regex, in the Java∩RE2 shared
#: subset (round 10): contractions, space-attached letter/digit/
#: punctuation runs, whitespace runs.  Documented divergence from the
#: original: the trailing-space branch ``\s+(?!\S)`` is DROPPED — RE2
#: (DuckDB) has no lookahead — so a whitespace run before a token
#: stays one ``\s+`` pretoken instead of splitting its last space
#: onto the next token.  Both engines tokenize identically under
#: this subset, which is what makes learn∘encode value-hashable.
BYTE_PRETOKEN_RE = (
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
)


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
    merges = _learn_rounds(words, n_merges)
    spark = docs.sparkSession
    return spark.createDataFrame(
        merges, "merge_rank int, lhs string, rhs string, pair_count bigint"
    )


def _learn_rounds(
    words: DataFrame, n_merges: int
) -> list[tuple[int, str, str, int]]:
    """The per-round learner loop shared by the char-level and
    byte-level learners — the symbol alphabet is whatever ``enc``
    encodes; the merge/argmax machinery is alphabet-blind."""
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
    return merges


def bpe_learn_merges_bytes(
    docs: DataFrame,
    n_merges: int = 3,
    *,
    text_col: str = "text",
) -> DataFrame:
    """BYTE-LEVEL BPE learning (round 10 — the GPT-2 tokenizer shape):
    pretokens come from ``BYTE_PRETOKEN_RE`` (contractions, space-
    attached runs — real tokenizer grammar, not whitespace split) and
    the base alphabet is the pretoken's UTF-8 BYTES, each rendered as
    its 2-hex-digit symbol via ``hex()`` (identical bytes→hex in both
    engines) — so punctuation, digits, accents and multi-byte UTF-8
    all train, with no out-of-alphabet fallback ever needed (the
    byte-level guarantee).  The <>-guard alphabet (hex digits) stays
    provably disjoint from the guards; the per-round machinery is the
    shared ``_learn_rounds``."""
    words = (
        docs.select(
            F.explode(
                F.regexp_extract_all(
                    F.col(text_col), F.lit(BYTE_PRETOKEN_RE), F.lit(0)
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .selectExpr("regexp_replace(hex(w), '(..)', '<$1>') AS enc", "c")
    )
    merges = _learn_rounds(words, n_merges)
    spark = docs.sparkSession
    return spark.createDataFrame(
        merges, "merge_rank int, lhs string, rhs string, pair_count bigint"
    )


def bpe_encode_bytes(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
) -> DataFrame:
    """Byte-level encode: pretokenize with the GPT-2 grammar subset,
    hex the UTF-8 bytes, run the learned guarded-replace chain in
    merge-rank order, then map symbols to ids — base byte symbols
    (length 2) decode to their byte value 0..255, merge ``k``
    (1-based) to ``255 + k``.  Same scale shape as ``bpe_encode``:
    the merge table rides as scan-side literals, the only exchange is
    the per-doc regroup."""
    words = docs.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all(
                F.col(text_col), F.lit(BYTE_PRETOKEN_RE), F.lit(0)
            )
        ).alias("pos", "w"),
    )
    enc = F.regexp_replace(F.hex(F.col("w")), "(..)", "<$1>")
    for a, b in merges:
        enc = F.replace(enc, F.lit(f"<{a}><{b}>"), F.lit(f"<{a}{b}>"))
    syms = F.split(F.expr(
        "substring(__enc, 2, length(__enc) - 2)"
    ), "><")

    def sym_id(s):
        out = F.when(F.length(s) == 2, F.conv(s, 16, 10).cast("int"))
        for k, (a, b) in enumerate(merges, start=1):
            out = out.when(s == a + b, F.lit(255 + k))
        return out.otherwise(F.lit(-1))

    per_word = words.withColumn("__enc", enc).select(
        "doc_id",
        "pos",
        F.transform(syms, sym_id).alias("ids"),
    )
    ordered = F.flatten(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "ids"))),
            lambda s: s["ids"],
        )
    )
    return per_word.groupBy("doc_id").agg(
        F.size(ordered).cast("bigint").alias("n_tokens"),
        F.array_join(ordered, "-").alias("ids"),
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    text_col: str = "text",
) -> DataFrame:
    """APPLY a learned merge table — the tokenizer's serving half,
    the pass that runs over every corpus byte in a real pipeline
    (learning runs once; encoding runs always).

    Per word (whitespace pre-tokens filtered to the same
    lowercase-alpha ``WORD_RE`` family the learner trained on): the
    ``<sym>`` encoding, then the guarded ``replace`` chain in MERGE
    RANK ORDER — the identical greedy-leftmost merge the learner used,
    so encode∘learn is self-consistent by construction.  Symbols then
    map to ids: base letters a-z → 0..25, merge ``k`` (1-based) →
    ``25 + k`` — a first-match-wins chain in rank order, mirrored
    exactly by the oracle's CASE.

    Scale shape: the merge table is a MODEL ARTIFACT (n_merges rows)
    riding as literals inside one scan-side projection — no join, no
    shuffle, no Python; per-doc token order is preserved through
    posexplode → array_sort(collect_list(struct(pos, ids))) — the
    only exchange is the final per-doc regroup.  Returns
    ``(doc_id, n_tokens, ids)`` with ids dash-joined (engine-neutral
    array hashing)."""
    from ..functions.text import tokens

    words = docs.select(
        "doc_id",
        F.posexplode(
            F.filter(
                tokens(F.col(text_col)), lambda w: w.rlike(WORD_RE)
            )
        ).alias("pos", "w"),
    )
    enc = F.regexp_replace(F.col("w"), "(.)", "<$1>")
    for a, b in merges:
        enc = F.replace(enc, F.lit(f"<{a}><{b}>"), F.lit(f"<{a}{b}>"))
    syms = F.split(F.expr(
        "substring(__enc, 2, length(__enc) - 2)"
    ), "><")

    def sym_id(s):
        out = F.when(F.length(s) == 1, F.ascii(s) - 97)
        for k, (a, b) in enumerate(merges, start=1):
            out = out.when(s == a + b, F.lit(25 + k))
        return out.otherwise(F.lit(-1))

    per_word = words.withColumn("__enc", enc).select(
        "doc_id",
        "pos",
        F.transform(syms, sym_id).alias("ids"),
    )
    ordered = F.flatten(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "ids"))),
            lambda s: s["ids"],
        )
    )
    return per_word.groupBy("doc_id").agg(
        F.size(ordered).cast("bigint").alias("n_tokens"),
        F.array_join(ordered, "-").alias("ids"),
    )


def sql_bpe_encode_ids(
    n_merges: int = 3, learn_limit: int = 300, encode_limit: int = 200
) -> str:
    """DuckDB twin of learn-then-encode: re-learns the merge table
    with ``sql_bpe_learn_merges``' chained CTEs, then applies the
    identical guarded-replace chain per document word and the
    identical first-match-wins id CASE."""
    learn = sql_bpe_learn_merges(n_merges, learn_limit)
    # reuse the learner's WITH-chain (words, top1..wN) and drop its
    # final UNION-ALL select: that select is the only 4-space-indented
    # "\n    SELECT" in the generated string (CTE bodies indent 6)
    parts = learn.split("\n    SELECT")[0]
    enc_chain = []
    prev = "e0"
    for r in range(1, n_merges + 1):
        enc_chain.append(
            f"""e{r} AS (
      SELECT doc_id, pos,
             replace(enc, '<' || t.a || '><' || t.b || '>',
                     '<' || t.a || t.b || '>') AS enc
      FROM {prev} CROSS JOIN top{r} t
    )"""
        )
        prev = f"e{r}"
    id_case = "\n          ".join(
        f"WHEN s = (SELECT a || b FROM top{k}) THEN {25 + k}"
        for k in range(1, n_merges + 1)
    )
    return f"""{parts},
    docw AS (
      SELECT doc_id, i AS pos, ws[i] AS w
      FROM (
        SELECT doc_id, string_split(text, ' ') AS ws
        FROM documents WHERE doc_id < {encode_limit}
      ), unnest(generate_series(1, len(ws))) AS t(i)
      WHERE regexp_matches(ws[i], '{WORD_RE}')
    ),
    e0 AS (
      SELECT doc_id, pos, regexp_replace(w, '(.)', '<\\1>', 'g') AS enc
      FROM docw
    ),
    {','.join(enc_chain)},
    symrows AS (
      SELECT doc_id, pos, j, ss[j] AS s
      FROM (
        SELECT doc_id, pos,
               string_split(substring(enc, 2, length(enc) - 2), '><') AS ss
        FROM {prev}
      ), unnest(generate_series(1, len(ss))) AS u(j)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           string_agg(
             CAST(CASE WHEN length(s) = 1 THEN ascii(s) - 97
                  {id_case}
                  ELSE -1 END AS VARCHAR),
             '-' ORDER BY pos, j) AS ids
    FROM symrows GROUP BY doc_id"""


def _sql_pairs(src: str) -> str:
    return f"""(
      SELECT syms[i] AS a, syms[i + 1] AS b, c
      FROM (
        SELECT string_split(substring(enc, 2, length(enc) - 2), '><') AS syms, c
        FROM {src}
      ), unnest(generate_series(1, len(syms) - 1)) AS t(i)
    )"""


def _sql_rounds(
    words_src: str, n_merges: int, prefix: str = ""
) -> tuple[list[str], list[str], str]:
    """The per-round CTE generator shared by the char-level and
    byte-level twins: (round CTEs, merge-table selects, final encoded
    word CTE name).  ``prefix`` namespaces the tops so both alphabets
    can coexist in one statement if ever composed."""
    parts: list[str] = []
    tops: list[str] = []
    prev = words_src
    for r in range(1, n_merges + 1):
        parts.append(
            f"""{prefix}top{r} AS (
      SELECT a, b, CAST(SUM(c) AS BIGINT) AS cnt
      FROM {_sql_pairs(prev)} GROUP BY a, b
      ORDER BY cnt DESC, a ASC, b ASC LIMIT 1
    )"""
        )
        tops.append(
            f"SELECT {r} AS merge_rank, a AS lhs, b AS rhs, cnt AS pair_count "
            f"FROM {prefix}top{r}"
        )
        parts.append(
            f"""{prefix}w{r} AS (
      SELECT replace(enc, '<' || t.a || '><' || t.b || '>',
                     '<' || t.a || t.b || '>') AS enc, c
      FROM {prev} CROSS JOIN {prefix}top{r} t
    )"""
        )
        prev = f"{prefix}w{r}"
    return parts, tops, prev


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
    rounds, tops, _prev = _sql_rounds("words", n_merges)
    parts += rounds
    return "WITH " + ",\n    ".join(parts) + "\n    " + " UNION ALL ".join(tops)


def sql_bpe_byte_level(
    n_merges: int = 4,
    learn_limit: int = 300,
    encode_limit: int = 200,
    text_sql: str = "text",
) -> str:
    """DuckDB twin of byte-level learn∘encode: pretokens from the
    shared ``BYTE_PRETOKEN_RE`` (RE2 side of the Java∩RE2 subset),
    byte symbols via the identical ``hex()`` rendering, the shared
    round CTEs (prefix ``b``), then per-document encode with the
    byte-value id CASE (hex arithmetic via instr — DuckDB has no
    ``conv``, but the VALUES match Spark's ``conv(s, 16, 10)``)."""
    pat = BYTE_PRETOKEN_RE.replace("'", "''")
    parts = [
        f"""bwords AS (
      SELECT regexp_replace(hex(w), '(..)', '<\\1>', 'g') AS enc, COUNT(*) AS c
      FROM (
        SELECT unnest(regexp_extract_all({text_sql}, '{pat}')) AS w
        FROM documents WHERE doc_id < {learn_limit}
      ) GROUP BY w
    )""",
    ]
    rounds, _tops, _prev = _sql_rounds("bwords", n_merges, prefix="b")
    parts += rounds
    parts.append(
        f"""bdocw AS (
      SELECT doc_id, i AS pos, ws[i] AS w
      FROM (
        SELECT doc_id, regexp_extract_all({text_sql}, '{pat}') AS ws
        FROM documents WHERE doc_id < {encode_limit}
      ), unnest(generate_series(1, len(ws))) AS t(i)
    )"""
    )
    parts.append(
        """be0 AS (
      SELECT doc_id, pos, regexp_replace(hex(w), '(..)', '<\\1>', 'g') AS enc
      FROM bdocw
    )"""
    )
    prev = "be0"
    for r in range(1, n_merges + 1):
        parts.append(
            f"""be{r} AS (
      SELECT doc_id, pos,
             replace(enc, '<' || t.a || '><' || t.b || '>',
                     '<' || t.a || t.b || '>') AS enc
      FROM {prev} CROSS JOIN btop{r} t
    )"""
        )
        prev = f"be{r}"
    parts.append(
        f"""bsymrows AS (
      SELECT doc_id, pos, j, ss[j] AS s
      FROM (
        SELECT doc_id, pos,
               string_split(substring(enc, 2, length(enc) - 2), '><') AS ss
        FROM {prev}
      ), unnest(generate_series(1, len(ss))) AS u(j)
    )"""
    )
    id_case = "\n          ".join(
        f"WHEN s = (SELECT a || b FROM btop{k}) THEN {255 + k}"
        for k in range(1, n_merges + 1)
    )
    hexv = (
        "(instr('0123456789ABCDEF', substring(s, 1, 1)) - 1) * 16 "
        "+ instr('0123456789ABCDEF', substring(s, 2, 1)) - 1"
    )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           string_agg(
             CAST(CASE WHEN length(s) = 2 THEN {hexv}
                  {id_case}
                  ELSE -1 END AS VARCHAR),
             '-' ORDER BY pos, j) AS ids
    FROM bsymrows GROUP BY doc_id"""
    )
