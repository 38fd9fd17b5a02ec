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


# ---------------------------------------------------------------------------
# GPT-2-format tokenizer artifacts (round 13)
# ---------------------------------------------------------------------------
#
# Real pipelines tokenize with a FIXED published tokenizer, not one
# re-learned per run: the artifact pair ``vocab.json`` (token → id)
# + ``merges.txt`` (one merge per line, rank order) is the public
# GPT-2/RoBERTa file grammar every BPE toolchain reads and writes.
# Token strings use the GPT-2 byte↔unicode bijection (every byte maps
# to one printable codepoint so the files are valid text); this
# module converts them to/from the engine's native hex-pair symbol
# alphabet, so a LOADED artifact drives the exact same guarded-merge
# machinery the in-repo learner trains — the difference between
# "token counts" and THE token counts a training run will see.


def gpt2_bytes_to_unicode() -> dict[int, str]:
    """The public GPT-2 byte→unicode bijection: printable latin-1
    bytes map to themselves; the remaining 68 bytes map to
    256, 257, … in byte order.  Deterministic, total, invertible."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(0xA1, 0xAC + 1))
        + list(range(0xAE, 0xFF + 1))
    )
    cs = list(bs)
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {b: chr(c) for b, c in zip(bs, cs)}


def write_bpe_artifacts(
    merges: list[tuple[str, str]], out_dir: str
) -> tuple[str, str]:
    """Serialize an engine merge table (hex-pair symbols, rank order)
    as the GPT-2 artifact pair.  The emitted ``vocab.json`` uses the
    engine's id scheme — base byte token → its byte value 0..255,
    merge ``k`` (1-based) → ``255 + k`` — a valid instance of the
    format (real GPT-2 assigns different numbers; the LOADER honors
    whatever the file says).  Returns (merges_path, vocab_path)."""
    import json
    import os

    b2u = gpt2_bytes_to_unicode()

    def uni(hex_sym: str) -> str:
        return "".join(b2u[b] for b in bytes.fromhex(hex_sym))

    lines = ["#version: 0.2"]
    vocab: dict[str, int] = {uni(f"{b:02X}"): b for b in range(256)}
    for k, (a, b) in enumerate(merges, start=1):
        lines.append(f"{uni(a)} {uni(b)}")
        vocab[uni(a + b)] = 255 + k
    os.makedirs(out_dir, exist_ok=True)
    mpath = os.path.join(out_dir, "merges.txt")
    vpath = os.path.join(out_dir, "vocab.json")
    with open(mpath, "w", encoding="utf-8") as fh:
        fh.write("\n".join(lines) + "\n")
    with open(vpath, "w", encoding="utf-8") as fh:
        json.dump(vocab, fh, ensure_ascii=False)
    return mpath, vpath


def load_bpe_artifacts(merges_path: str, vocab_path: str) -> dict:
    """QUARANTINE parser for the public GPT-2 artifact grammar (the
    ``sources/pywb_config.py`` discipline: a malformed model file
    must REFUSE with a precise error, never half-load and mistokenize
    a corpus).  Validates: merge lines are exactly two space-separated
    symbols over the byte↔unicode alphabet, no duplicate merges, the
    vocab is a str→int json object with unique ids that covers all
    256 base byte tokens and every merge product.  Returns
    ``{"merges": [(lhs_hex, rhs_hex), …], "vocab": {hex_sym: id}}``
    in the engine's hex-pair symbol alphabet."""
    import json

    u2b = {c: b for b, c in gpt2_bytes_to_unicode().items()}

    def to_hex(tok: str, where: str) -> str:
        out = []
        for ch in tok:
            if ch not in u2b:
                raise ValueError(
                    f"{where}: {ch!r} is outside the GPT-2 byte↔unicode "
                    f"alphabet (token {tok!r})"
                )
            out.append(f"{u2b[ch]:02X}")
        return "".join(out)

    merges: list[tuple[str, str]] = []
    seen: set[tuple[str, str]] = set()
    with open(merges_path, encoding="utf-8") as fh:
        blank_at: int | None = None
        for lineno, raw in enumerate(fh, start=1):
            ln = raw.rstrip("\n")
            if lineno == 1 and ln.startswith("#"):
                continue  # '#version: 0.2' header
            if ln == "":
                # trailing-newline tolerance only — an interior blank
                # is a corrupted artifact, refuse (round-13 ADVICE)
                if blank_at is None:
                    blank_at = lineno
                continue
            if blank_at is not None:
                raise ValueError(
                    f"merges.txt line {blank_at}: blank line before "
                    f"line {lineno} — blanks are only tolerated at EOF"
                )
            parts = ln.split(" ")
            if len(parts) != 2 or not parts[0] or not parts[1]:
                raise ValueError(
                    f"merges.txt line {lineno}: expected '<lhs> <rhs>' "
                    f"(two space-separated symbols), got {ln!r}"
                )
            pair = (
                to_hex(parts[0], f"merges.txt line {lineno}"),
                to_hex(parts[1], f"merges.txt line {lineno}"),
            )
            if pair in seen:
                raise ValueError(
                    f"merges.txt line {lineno}: duplicate merge {ln!r}"
                )
            seen.add(pair)
            merges.append(pair)

    with open(vocab_path, encoding="utf-8") as fh:
        try:
            obj = json.load(fh)
        except ValueError as e:
            raise ValueError(f"vocab.json: not valid JSON ({e})") from e
    if not isinstance(obj, dict):
        raise ValueError("vocab.json: top level must be an object")
    vocab: dict[str, int] = {}
    ids_seen: dict[int, str] = {}
    for tok, tid in obj.items():
        if not isinstance(tok, str) or not isinstance(tid, int) \
                or isinstance(tid, bool):
            raise ValueError(
                f"vocab.json: entries must be string→int, got "
                f"{tok!r}: {tid!r}"
            )
        h = to_hex(tok, "vocab.json")
        if h in vocab:
            raise ValueError(f"vocab.json: duplicate token {tok!r}")
        if tid in ids_seen:
            raise ValueError(
                f"vocab.json: id {tid} assigned to both "
                f"{ids_seen[tid]!r} and {tok!r}"
            )
        ids_seen[tid] = tok
        vocab[h] = tid
    for b in range(256):
        if f"{b:02X}" not in vocab:
            raise ValueError(
                f"vocab.json: base byte token 0x{b:02X} missing "
                f"(a byte-level vocab must cover all 256 bytes)"
            )
    for a, b in merges:
        if a + b not in vocab:
            raise ValueError(
                f"merges.txt: merge product of {a}+{b} missing from "
                f"vocab.json — inconsistent artifact pair"
            )
    return {"merges": merges, "vocab": vocab}


def _merge_pass(syms: list[str], a: str, b: str) -> list[str]:
    """One merge applied leftmost-first non-overlapping — exactly the
    semantics of the engine's guarded string ``replace``, so the
    Python and SQL/column encoders agree symbol-for-symbol."""
    out: list[str] = []
    i, n = 0, len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def bpe_encode_pretrained(
    docs: DataFrame,
    artifacts: dict,
    *,
    text_col: str = "text",
) -> DataFrame:
    """Encode with a LOADED artifact — the production serving path.

    Pretokenization stays in Spark (``regexp_extract_all`` with the
    shared ``BYTE_PRETOKEN_RE``, identical grammar to every twin);
    the merge chain + vocab lookup run per-word in ONE Arrow pass
    with the artifact riding as a broadcast-closure literal (model
    artifacts are small; corpus text never leaves the executors).
    Unlike the column-expression encoder (``bpe_encode_bytes``, whose
    plan grows one ``replace`` node per merge), this path takes a
    50k-merge production artifact without blowing up the expression
    tree — rank order applied sequentially, which is canonical BPE
    (a lower-rank pair can never be CREATED by a higher-rank merge:
    new adjacencies always involve the just-minted symbol, which
    later rules only can reference).

    Ids come from the artifact's ``vocab.json`` (whatever numbering
    it declares); symbols absent from the vocab emit ``-1`` — with a
    well-formed byte-level artifact that never fires (the loader
    enforces full base-byte coverage)."""
    from collections.abc import Iterator

    merges = list(artifacts["merges"])
    vocab = dict(artifacts["vocab"])

    words = docs.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all(
                F.col(text_col), F.lit(BYTE_PRETOKEN_RE), F.lit(0)
            )
        ).alias("pos", "w"),
    )

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids_col = []
            for w in pdf["w"]:
                syms = [f"{b:02X}" for b in str(w).encode("utf-8")]
                for a, b in merges:
                    if len(syms) < 2:
                        break
                    syms = _merge_pass(syms, a, b)
                ids_col.append([vocab.get(s, -1) for s in syms])
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "pos": pdf["pos"], "ids": ids_col}
            )

    per_word = words.mapInPandas(fn, "doc_id bigint, pos int, ids array<int>")
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
