"""WordPiece tokenization (round 15 — SURVEY.md §2.11 L5: the THIRD
dominant public tokenizer family after GPT-2 BPE (r13) and the
SentencePiece unigram LM (r14); the BERT-family token-count story).

WordPiece encoding is GREEDY LONGEST-MATCH-FIRST per word: starting
at the word head, take the longest vocabulary piece that matches
(continuation positions match ``##``-prefixed pieces), advance, and
repeat; a position with no match makes the ENTIRE word a single
``[UNK]`` token — the published BERT algorithm.  Unlike BPE's merge
ranks or unigram's Viterbi scores there is no scoring at all: the
vocabulary alone determines a unique deterministic segmentation,
which makes the family the easiest of the three to oracle.

The engine renders it with the r13/r14 artifact pattern:

* **Artifact**: the public BERT ``vocab.txt`` grammar (one token per
  line, line index = id, ``##`` continuations, bracketed controls),
  behind the quarantine parser in ``sources/model_artifacts.py``.
* **Pretokenization stays in Spark**: whitespace split (BERT's basic
  tokenizer also splits punctuation; the fixture corpus is already
  space-delimited, so the punctuation arm is exercised through the
  ``[UNK]`` path instead — characters outside the vocab alphabet
  kill the word's match chain).
* **Greedy matching runs per word in ONE Arrow pass** with the vocab
  as a broadcast-closure literal and a per-batch distinct-word
  cache — the ``sp_unigram_encode`` shape.
* **Exactness across engines**: the greedy chain is a deterministic
  single path, so the DuckDB twin (``sql_wordpiece_ids``) just
  precomputes the per-position longest match (``steps``) and unrolls
  the chain as bounded rounds — no tie-break machinery needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: BERT control tokens — never match surface text
WP_CONTROL = ("[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]")

#: fixture vocabulary (module constant shared by the Spark fixture
#: writer and the SQL twin): controls + word-initial stopwords and
#: affixes + a-z/0-9 singles + ``##`` continuation suffixes and
#: singles.  Single chars both word-initial and continuation make
#: every lowercase-alnum word segmentable; anything else exercises
#: the whole-word [UNK] arm.
WP_FIXTURE_PIECES: tuple[str, ...] = (
    WP_CONTROL
    + (
        "the", "of", "and", "to", "in", "is", "it", "on", "as", "at",
        "ing", "er", "ed", "re", "un", "over", "under",
    )
    + tuple("abcdefghijklmnopqrstuvwxyz")
    + tuple("0123456789")
    + ("##ing", "##ed", "##er", "##es", "##tion", "##ly")
    + tuple("##" + c for c in "abcdefghijklmnopqrstuvwxyz")
    + tuple("##" + c for c in "0123456789")
)


def wordpiece_encode(
    docs: DataFrame,
    vocab: list[str],
    *,
    text_col: str = "text",
) -> DataFrame:
    """Greedy longest-match-first WordPiece encode of
    ``docs[text_col]`` with a loaded ``vocab.txt`` token list —
    returns ``(doc_id, n_tokens, ids)`` with ids dash-joined in word
    order (the ``sp_unigram_encode`` / ``bpe_encode_pretrained``
    output contract).  See the module docstring for the algorithm and
    the [UNK] whole-word rule."""
    from collections.abc import Iterator

    if "[UNK]" not in vocab:
        raise ValueError("wordpiece_encode: vocab has no [UNK] token")
    pid = {p: i for i, p in enumerate(vocab) if p not in WP_CONTROL}
    unk_id = vocab.index("[UNK]")

    words = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "w"),
    ).filter(F.col("w") != "")

    def greedy(word: str) -> list[int]:
        n = len(word)
        j = 0
        out: list[int] = []
        while j < n:
            end = n
            got: tuple[int, int] | None = None
            while end > j:
                sub = word[j:end]
                key = ("##" + sub) if j > 0 else sub
                i = pid.get(key)
                if i is not None:
                    got = (i, end)
                    break
                end -= 1
            if got is None:
                return [unk_id]
            out.append(got[0])
            j = got[1]
        return out

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        cache: dict[str, list[int]] = {}
        for pdf in batches:
            ids_col = []
            for w in pdf["w"]:
                w = str(w)
                got = cache.get(w)
                if got is None:
                    got = cache[w] = greedy(w)
                ids_col.append(got)
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


def sql_wordpiece_ids(
    *,
    encode_limit: int = 200,
    rounds: int = 14,
    pieces: tuple[str, ...] = WP_FIXTURE_PIECES,
    text_sql: str = "text",
) -> str:
    """DuckDB twin: the greedy longest-match chain unrolled as
    ``rounds`` bounded rounds.  Because the greedy step at a position
    is path-independent, the per-(word, position) longest match is
    precomputed ONCE (``steps``); each round just follows the chain.
    A word whose chain dies mid-word (no match at some position)
    drops out and is re-added as a whole-word [UNK]; a guard CTE
    errors loudly when a chain is still LIVE after ``rounds`` rounds
    (budget too small — raise ``rounds``) instead of silently
    mis-encoding.  Chain CTEs are MATERIALIZED (the shared DP-round
    discipline from ``sql_sp_unigram_ids``)."""
    real = [(i, p) for i, p in enumerate(pieces) if p not in WP_CONTROL]
    unk_id = pieces.index("[UNK]")
    vals = ",\n        ".join(
        "({}, '{}')".format(i, p.replace("'", "''")) for i, p in real
    )
    parts = [
        f"""vocab AS (
      SELECT id, piece FROM (VALUES {vals}) AS t(id, piece)
    )""",
        f"""words AS (
      SELECT doc_id, wpos, w
      FROM (
        SELECT doc_id,
               generate_subscripts(toks, 1) AS wpos,
               unnest(toks) AS w
        FROM (
          SELECT doc_id, string_split({text_sql}, ' ') AS toks
          FROM documents WHERE doc_id < {encode_limit}
        )
      ) WHERE w <> ''
    )""",
        """dwords AS MATERIALIZED (
      SELECT DISTINCT w FROM words
    )""",
        """steps AS MATERIALIZED (
      SELECT w, j, id, adv FROM (
        SELECT d.w, j.j, v.id,
               CASE WHEN j.j = 0 THEN len(v.piece)
                    ELSE len(v.piece) - 2 END AS adv,
               ROW_NUMBER() OVER (
                 PARTITION BY d.w, j.j
                 ORDER BY CASE WHEN j.j = 0 THEN len(v.piece)
                               ELSE len(v.piece) - 2 END DESC
               ) AS rn
        FROM dwords d,
             LATERAL (SELECT unnest(generate_series(0, len(d.w) - 1)) AS j) j,
             vocab v
        WHERE (j.j = 0 AND v.piece NOT LIKE '##%'
               AND substr(d.w, 1, len(v.piece)) = v.piece)
           OR (j.j > 0 AND v.piece LIKE '##%' AND len(v.piece) > 2
               AND substr(d.w, j.j + 1, len(v.piece) - 2)
                   = substr(v.piece, 3))
      ) WHERE rn = 1
    )""",
        """g0 AS (
      SELECT w, 0 AS j, '' AS key, 0 AS nt FROM dwords
    )""",
    ]
    prev = "g0"
    for t in range(1, rounds + 1):
        parts.append(
            f"""g{t} AS MATERIALIZED (
      SELECT g.w, g.j + s.adv AS j,
             g.key || CAST(s.id AS VARCHAR) || '-' AS key,
             g.nt + 1 AS nt
      FROM {prev} g JOIN steps s ON s.w = g.w AND s.j = g.j
      WHERE g.j < len(g.w)
      UNION ALL
      SELECT w, j, key, nt FROM {prev} WHERE j >= len(w)
    )"""
        )
        prev = f"g{t}"
    parts.append(
        f"""segs AS MATERIALIZED (
      SELECT w, key, nt FROM {prev} WHERE j = len(w)
    )"""
    )
    parts.append(
        f"""allsegs AS (
      SELECT w, key, nt FROM segs
      UNION ALL
      SELECT d.w, CAST({unk_id} AS VARCHAR) || '-' AS key, 1 AS nt
      FROM dwords d
      WHERE NOT EXISTS (SELECT 1 FROM segs s WHERE s.w = d.w)
    )"""
    )
    # budget guard: a chain still live (j < len) after `rounds` rounds
    # means the unroll was too short — fail with the remedy instead of
    # silently emitting [UNK] for a segmentable word
    parts.append(
        f"""guard AS (
      SELECT CASE WHEN COUNT(*) > 0 THEN error(
               'sql_wordpiece_ids: ' || COUNT(*) ||
               ' word(s) still mid-chain after {rounds} rounds — '
               'raise rounds to cover the longest word'
             ) ELSE 1 END AS ok
      FROM {prev} WHERE j < len(w)
    )"""
    )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + """
    SELECT w.doc_id,
           CAST(SUM(s.nt) AS BIGINT) AS n_tokens,
           string_agg(rtrim(s.key, '-'), '-' ORDER BY w.wpos) AS ids
    FROM words w JOIN allsegs s ON s.w = w.w, guard g
    WHERE g.ok = 1
    GROUP BY w.doc_id"""
    )
