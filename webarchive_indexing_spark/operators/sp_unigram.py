"""SentencePiece unigram-LM tokenization (round 14 — SURVEY.md §2.11
L5: the OTHER dominant public tokenizer family beside GPT-2 BPE; the
Llama/T5 token-count story).

The unigram model assigns each vocabulary piece a log-probability;
encoding a word is VITERBI segmentation — the piece sequence
maximizing the summed scores.  The engine renders it the way the
round-13 BPE artifact path does:

* **Artifact**: the public ``spm_export_vocab`` text grammar
  (``<piece>\\t<score>`` per line, line order = piece id), behind the
  quarantine parser in ``sources/model_artifacts.py``.
* **Pretokenization stays in Spark**: whitespace split with the
  SentencePiece ``▁`` word-boundary convention (``split_by_whitespace
  + add_dummy_prefix``, the defaults) — each word becomes
  ``▁ + word`` and is segmented independently.
* **Viterbi runs per word in ONE Arrow pass** with the vocab as a
  broadcast-closure literal (model artifacts are small; corpus text
  never leaves the executors) and a per-batch distinct-word cache —
  the ``bpe_encode_pretrained`` shape, which takes a production-size
  vocab without expression-tree blowup.
* **Exactness across engines**: scores are 2-decimal in the artifact
  and the DP runs on CENTI-INTEGERS (score × 100) — no float
  accumulation anywhere, so the DuckDB twin (``sql_sp_unigram_ids``,
  which unrolls the DP as bounded relational rounds — the
  kmeans/beam-walk discipline) is bit-identical by construction.
  Ties (equal total score) break on the lexicographically smallest
  fixed-width id-path key, a total order both engines compute the
  same way.

Control pieces (``<unk>``, ``<s>``, ``</s>``, ``<pad>``) never match
text; characters no piece covers consume exactly one char as
``<unk>`` at ``min(vocab score) − 10.0`` — SentencePiece's default
unk penalty, re-derived from the vocab (not stored) so both engines
agree by construction.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: control symbols that never match surface text
SP_CONTROL = ("<unk>", "<s>", "</s>", "<pad>")

#: the fixture piece inventory (module constant so the Spark fixture
#: writer and the SQL twin share one source of truth): <unk> + the
#: word-boundary marker + ▁-prefixed stopwords + common English
#: bigrams/trigrams + single chars.  Scores are hash-derived (the
#: .vec fixture discipline): centi = -(100 + token_hash(piece) % 400).
SP_FIXTURE_PIECES: tuple[str, ...] = (
    "<unk>", "▁", "▁the", "▁of", "▁and", "▁to", "▁in", "▁is",
    "the", "he", "in", "er", "an", "re", "on", "ing", "at", "or",
    "es", "is", "it", "al", "ar", "st", "to", "nt", "ng", "se",
    "ha", "ou", "le",
) + tuple("abcdefghijklmnopqrstuvwxyz") + tuple("0123456789")


def _py_token_hash(s: str) -> int:
    """Plain-python twin of ``functions/text.token_hash`` (first 8 md5
    hex chars as an integer) — lets fixture writers stamp the same
    hash-derived scores the SQL twin re-derives."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16)


def sp_fixture_vocab() -> list[tuple[str, float]]:
    """The fixture vocab rows ``[(piece, score)]`` for
    ``write_sp_unigram_vocab`` — hash-derived 2-decimal scores in
    [-4.99, -1.00]; ``<unk>``'s own score is conventional (control
    pieces never match, and the encode-time unk penalty is re-derived
    from the REAL pieces)."""
    return [
        (p, -(100 + _py_token_hash(p) % 400) / 100.0)
        for p in SP_FIXTURE_PIECES
    ]


def sp_unigram_encode(
    docs: DataFrame,
    vocab: list[tuple[str, float]],
    *,
    text_col: str = "text",
) -> DataFrame:
    """Viterbi-encode ``docs[text_col]`` with a loaded unigram vocab —
    returns ``(doc_id, n_tokens, ids)`` with ids dash-joined in word
    order (the ``bpe_encode_pretrained`` output contract).  See the
    module docstring for the exactness and tie-break rules."""
    from collections.abc import Iterator

    if not any(p == "<unk>" for p, _ in vocab):
        raise ValueError("sp_unigram_encode: vocab has no <unk> piece")
    pid = {
        p: i for i, (p, _s) in enumerate(vocab) if p not in SP_CONTROL
    }
    centi = {
        i: round(s * 100)
        for i, (p, s) in enumerate(vocab)
        if p not in SP_CONTROL
    }
    unk_id = next(i for i, (p, _s) in enumerate(vocab) if p == "<unk>")
    unk_centi = min(centi.values()) - 1000
    max_len = max(len(p) for p in pid)

    words = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "w"),
    ).filter(F.col("w") != "")

    def viterbi(word: str) -> list[int]:
        w = "▁" + word
        n = len(w)
        # best[e] = (centi_score, padded_key, ids) for the optimal
        # segmentation of w[:e]; key is fixed-width so lexicographic
        # string compare == id-tuple compare (the SQL twin's order)
        best: list[tuple[int, str, list[int]] | None] = [None] * (n + 1)
        best[0] = (0, "", [])
        for e in range(1, n + 1):
            cand: list[tuple[int, str, list[int]]] = []
            for j in range(max(0, e - max_len), e):
                b = best[j]
                if b is None:
                    continue
                i = pid.get(w[j:e])
                if i is not None:
                    cand.append(
                        (b[0] + centi[i], b[1] + f"{i:05d}-", b[2] + [i])
                    )
            b = best[e - 1]
            if b is not None:
                cand.append(
                    (
                        b[0] + unk_centi,
                        b[1] + f"{unk_id:05d}-",
                        b[2] + [unk_id],
                    )
                )
            if cand:
                best[e] = min(cand, key=lambda c: (-c[0], c[1]))
        out = best[n]
        assert out is not None  # unk arm makes every word segmentable
        return out[2]

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        cache: dict[str, list[int]] = {}
        for pdf in batches:
            ids_col = []
            for w in pdf["w"]:
                w = str(w)
                got = cache.get(w)
                if got is None:
                    got = cache[w] = viterbi(w)
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


def sql_sp_unigram_ids(
    *,
    encode_limit: int = 200,
    rounds: int = 14,
    pieces: tuple[str, ...] = SP_FIXTURE_PIECES,
    text_sql: str = "text",
) -> str:
    """DuckDB twin: re-derives the hash-scored vocab AND the Viterbi
    DP as ``rounds`` unrolled relational passes (Bellman-Ford over
    the segmentation DAG: round t holds the best ≤t-token path to
    each word position; optimal-substructure holds for the
    (score, key) order too, so the fixed point equals the Spark
    path's position DP).  ``rounds`` must cover the longest word+1
    chars (every token consumes ≥1 char).  DP CTEs are MATERIALIZED:
    each round references its predecessor twice, so inlining would
    re-scan 2^rounds times (the SQL face of the localCheckpoint
    lineage discipline)."""
    from ..functions.text import sql_token_hash

    real = [
        (i, p) for i, p in enumerate(pieces) if p not in SP_CONTROL
    ]
    unk_id = pieces.index("<unk>")
    vals = ",\n        ".join(
        "({}, '{}', {})".format(i, p.replace("'", "''"), len(p))
        for i, p in real
    )
    h = sql_token_hash("piece")
    parts = [
        f"""vocab AS (
      SELECT id, piece, plen,
             -(100 + {h} % 400) AS sc
      FROM (VALUES {vals}) AS t(id, piece, plen)
    )""",
        """unk AS (
      SELECT MIN(sc) - 1000 AS sc FROM vocab
    )""",
        f"""words AS (
      SELECT doc_id, wpos, '▁' || w AS w
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
        f"""matches AS MATERIALIZED (
      SELECT d.w, j.j, j.j + v.plen AS e, v.id, v.sc
      FROM dwords d,
           LATERAL (SELECT unnest(generate_series(0, len(d.w) - 1)) AS j) j,
           vocab v
      WHERE substr(d.w, j.j + 1, v.plen) = v.piece
      UNION ALL
      SELECT d.w, j.j, j.j + 1 AS e, {unk_id} AS id, u.sc
      FROM dwords d,
           LATERAL (SELECT unnest(generate_series(0, len(d.w) - 1)) AS j) j,
           unk u
    )""",
        """p0 AS (
      SELECT w, 0 AS e, 0 AS sc, '' AS key FROM dwords
    )""",
    ]
    prev = "p0"
    for t in range(1, rounds + 1):
        parts.append(
            f"""p{t} AS MATERIALIZED (
      SELECT w, e, sc, key FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY w, e ORDER BY sc DESC, key
        ) AS rn FROM (
          SELECT w, e, sc, key FROM {prev}
          UNION ALL
          SELECT p.w, m.e, p.sc + m.sc AS sc,
                 p.key || lpad(CAST(m.id AS VARCHAR), 5, '0') || '-' AS key
          FROM {prev} p JOIN matches m ON m.w = p.w AND m.j = p.e
        )
      ) WHERE rn = 1
    )"""
        )
        prev = f"p{t}"
    parts.append(
        f"""segs AS (
      SELECT w,
             list_transform(
               string_split(rtrim(key, '-'), '-'),
               s -> CAST(CAST(s AS INT) AS VARCHAR)
             ) AS idl
      FROM {prev} WHERE e = len(w)
    )"""
    )
    # precondition guard (round-14 ADVICE): the bounded DP covers at
    # most `rounds` tokens per word (each token consumes >= 1 char, so
    # any '▁'+word longer than `rounds` chars can NEVER reach an
    # e = len(w) row) — the inner join below would silently DROP such
    # words while the Spark path tokenizes them.  Fail loudly instead:
    # the aggregate CASE runs exactly once and error()s with the
    # offending count, turning a confusing hash mismatch into a
    # "raise rounds" message.
    parts.append(
        f"""guard AS (
      SELECT CASE WHEN COUNT(*) > 0 THEN error(
               'sql_sp_unigram_ids: ' || COUNT(*) ||
               ' word(s) exceed the {rounds}-round DP budget — '
               'raise rounds to cover len(▁+word)'
             ) ELSE 1 END AS ok
      FROM dwords d
      WHERE NOT EXISTS (SELECT 1 FROM segs s WHERE s.w = d.w)
    )"""
    )
    return (
        "WITH "
        + ",\n    ".join(parts)
        + """
    SELECT w.doc_id,
           CAST(SUM(len(s.idl)) AS BIGINT) AS n_tokens,
           string_agg(array_to_string(s.idl, '-'), '-' ORDER BY w.wpos)
             AS ids
    FROM words w JOIN segs s ON s.w = w.w, guard g
    WHERE g.ok = 1
    GROUP BY w.doc_id"""
    )
