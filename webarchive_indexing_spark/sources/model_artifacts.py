"""Public model-artifact file loaders (round 13 — SURVEY.md §2.11 L5
"run a PUBLISHED quality/lang model instead of a fixture-trained
one").

Two public text grammars, each behind a QUARANTINE parser (the
``sources/pywb_config.py`` discipline: a malformed model file must
refuse with a precise error — a half-loaded model silently misscores
a corpus, which is worse than failing):

* **fastText ``.vec``** — the text word-vector format every fastText
  / word2vec toolchain exports: a ``<count> <dim>`` header line, then
  one ``token v1 … v<dim>`` line per word.
* **ARPA n-gram LM** (unigram+bigram subset) — the classic backoff
  language-model interchange format: a ``\\data\\`` section declaring
  per-order counts, ``\\1-grams:`` lines ``logprob token [backoff]``,
  ``\\2-grams:`` lines ``logprob w1 w2``, closed by ``\\end\\``.

Loaded artifacts feed the engine's existing broadcast-model slots:
parsed rows become small DataFrames joined with ``F.broadcast`` (the
"lloyd discipline" — models ride to executors once; corpus text never
shuffles for a model's sake).  Fixture writers live beside the
parsers so the full-oracle queries can prove write → parse → apply
against a relational reconstruction of the same grammar.
"""

from __future__ import annotations


def write_vec_vectors(
    rows: list[tuple[str, list[float]]], dim: int, path: str
) -> str:
    """Serialize word vectors as a fastText ``.vec`` text file
    (fixture writer; 3-decimal components round-trip exactly)."""
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(f"{len(rows)} {dim}\n")
        for tok, vec in rows:
            fh.write(tok + " " + " ".join(f"{v:.3f}" for v in vec) + "\n")
    return path


def load_vec_vectors(path: str) -> tuple[list[tuple[str, list[float]]], int]:
    """Quarantine parser for the fastText ``.vec`` grammar.  Returns
    ``(rows, dim)``; refuses on: malformed header, a row whose
    component count disagrees with the declared dim, non-numeric
    components, tokens containing spaces (impossible in the grammar),
    duplicate tokens, or a row count that disagrees with the header."""
    rows: list[tuple[str, list[float]]] = []
    seen: set[str] = set()
    with open(path, encoding="utf-8") as fh:
        header = fh.readline().rstrip("\n")
        parts = header.split(" ")
        if len(parts) != 2 or not all(p.isdigit() for p in parts):
            raise ValueError(
                f".vec header must be '<count> <dim>', got {header!r}"
            )
        n_decl, dim = int(parts[0]), int(parts[1])
        if dim < 1:
            raise ValueError(f".vec dim must be >= 1, got {dim}")
        blank_at: int | None = None
        for lineno, raw in enumerate(fh, start=2):
            ln = raw.rstrip("\n")
            if ln == "":
                # trailing-newline tolerance ONLY: blanks are legal at
                # EOF, but an INTERIOR blank means a corrupted file —
                # refuse rather than load silently (round-13 ADVICE)
                if blank_at is None:
                    blank_at = lineno
                continue
            if blank_at is not None:
                raise ValueError(
                    f".vec line {blank_at}: blank line before line "
                    f"{lineno} — blanks are only tolerated at EOF"
                )
            fields = ln.split(" ")
            if len(fields) != dim + 1:
                raise ValueError(
                    f".vec line {lineno}: expected token + {dim} "
                    f"components, got {len(fields)} fields"
                )
            tok = fields[0]
            if not tok:
                raise ValueError(f".vec line {lineno}: empty token")
            if tok in seen:
                raise ValueError(f".vec line {lineno}: duplicate token {tok!r}")
            try:
                vec = [float(v) for v in fields[1:]]
            except ValueError as e:
                raise ValueError(
                    f".vec line {lineno}: non-numeric component ({e})"
                ) from e
            seen.add(tok)
            rows.append((tok, vec))
    if len(rows) != n_decl:
        raise ValueError(
            f".vec header declares {n_decl} vectors, file holds {len(rows)}"
        )
    return rows, dim


def write_arpa_bigram(
    uni: list[tuple[str, float, float]],
    bi: list[tuple[str, str, float]],
    path: str,
) -> str:
    """Serialize a unigram+bigram backoff LM in ARPA format (fixture
    writer; ``uni`` rows are ``(token, logprob, backoff)``, ``bi``
    rows ``(w1, w2, logprob)``, all base-10 logprobs)."""
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("\\data\\\n")
        fh.write(f"ngram 1={len(uni)}\n")
        fh.write(f"ngram 2={len(bi)}\n")
        fh.write("\n\\1-grams:\n")
        for tok, lp, bo in uni:
            fh.write(f"{lp:.3f}\t{tok}\t{bo:.3f}\n")
        fh.write("\n\\2-grams:\n")
        for w1, w2, lp in bi:
            fh.write(f"{lp:.3f}\t{w1} {w2}\n")
        fh.write("\n\\end\\\n")
    return path


def load_arpa_bigram(path: str) -> dict:
    """Quarantine parser for the ARPA unigram+bigram subset.  Returns
    ``{"uni": [(token, logprob, backoff)], "bi": [(w1, w2, logprob)]}``
    in file order.  Refuses on: missing ``\\data\\`` / ``\\end\\``,
    undeclared or wrongly-counted orders, orders beyond 2 (this is
    explicitly the bigram SUBSET), malformed entry lines, non-numeric
    logprobs, or duplicate entries."""
    uni: list[tuple[str, float, float]] = []
    bi: list[tuple[str, str, float]] = []
    declared: dict[int, int] = {}
    section = None  # None | 'data' | 1 | 2 | 'end'
    seen_uni: set[str] = set()
    seen_bi: set[tuple[str, str]] = set()
    with open(path, encoding="utf-8") as fh:
        for lineno, raw in enumerate(fh, start=1):
            ln = raw.rstrip("\n").strip()
            if ln == "":
                continue
            if ln == "\\data\\":
                section = "data"
                continue
            if ln == "\\end\\":
                section = "end"
                continue
            m = ln.startswith("\\") and ln.endswith("-grams:")
            if m:
                try:
                    order = int(ln[1:].split("-")[0])
                except ValueError:
                    raise ValueError(
                        f"ARPA line {lineno}: bad section header {ln!r}"
                    ) from None
                if order not in (1, 2):
                    raise ValueError(
                        f"ARPA line {lineno}: order {order} outside the "
                        f"supported unigram+bigram subset"
                    )
                if order not in declared:
                    raise ValueError(
                        f"ARPA line {lineno}: section {ln!r} not declared "
                        f"in \\data\\"
                    )
                section = order
                continue
            if section == "data":
                parts = ln.split("=")
                if (
                    len(parts) != 2
                    or not parts[0].startswith("ngram ")
                    or not parts[1].isdigit()
                ):
                    raise ValueError(
                        f"ARPA line {lineno}: expected 'ngram N=count', "
                        f"got {ln!r}"
                    )
                order = int(parts[0][len("ngram "):])
                if order not in (1, 2):
                    raise ValueError(
                        f"ARPA line {lineno}: declared order {order} outside "
                        f"the supported unigram+bigram subset"
                    )
                declared[order] = int(parts[1])
                continue
            if section == 1:
                fields = ln.split("\t")
                if len(fields) == 1:  # space-separated variant
                    fields = ln.split(" ")
                if len(fields) not in (2, 3):
                    raise ValueError(
                        f"ARPA line {lineno}: 1-gram needs "
                        f"'logprob token [backoff]', got {ln!r}"
                    )
                try:
                    lp = float(fields[0])
                    bo = float(fields[2]) if len(fields) == 3 else 0.0
                except ValueError as e:
                    raise ValueError(
                        f"ARPA line {lineno}: non-numeric field ({e})"
                    ) from e
                tok = fields[1]
                if tok in seen_uni:
                    raise ValueError(
                        f"ARPA line {lineno}: duplicate 1-gram {tok!r}"
                    )
                seen_uni.add(tok)
                uni.append((tok, lp, bo))
                continue
            if section == 2:
                fields = ln.split("\t")
                if len(fields) == 2:
                    words = fields[1].split(" ")
                else:
                    fields = ln.split(" ")
                    words = fields[1:]
                if len(words) != 2 or not all(words):
                    raise ValueError(
                        f"ARPA line {lineno}: 2-gram needs "
                        f"'logprob w1 w2', got {ln!r}"
                    )
                try:
                    lp = float(fields[0])
                except ValueError as e:
                    raise ValueError(
                        f"ARPA line {lineno}: non-numeric logprob ({e})"
                    ) from e
                pair = (words[0], words[1])
                if pair in seen_bi:
                    raise ValueError(
                        f"ARPA line {lineno}: duplicate 2-gram {pair}"
                    )
                seen_bi.add(pair)
                bi.append((pair[0], pair[1], lp))
                continue
            raise ValueError(
                f"ARPA line {lineno}: content outside any section: {ln!r}"
            )
    if section != "end":
        raise ValueError("ARPA file not closed by \\end\\ (truncated?)")
    for order, count, got in (
        (1, declared.get(1), len(uni)),
        (2, declared.get(2), len(bi)),
    ):
        if count is None:
            raise ValueError(f"ARPA \\data\\ missing 'ngram {order}=' count")
        if count != got:
            raise ValueError(
                f"ARPA declares {count} {order}-grams, file holds {got}"
            )
    return {"uni": uni, "bi": bi}


def write_sp_unigram_vocab(rows: list[tuple[str, float]], path: str) -> str:
    """Serialize a unigram-LM tokenizer vocab in the SentencePiece
    ``spm_export_vocab`` text grammar: one ``<piece>\\t<score>`` line
    per piece, file order = piece id (fixture writer; 2-decimal
    scores round-trip exactly through the centi-integer DP)."""
    with open(path, "w", encoding="utf-8") as fh:
        for piece, score in rows:
            fh.write(f"{piece}\t{score:.2f}\n")
    return path


def load_sp_unigram_vocab(path: str) -> list[tuple[str, float]]:
    """Quarantine parser for the SentencePiece ``spm_export_vocab``
    unigram grammar (the Llama/T5 tokenizer-family interchange text
    format).  Returns ``[(piece, score)]`` in file order — the line
    index IS the piece id, the SentencePiece convention.  Refuses on:
    a line without exactly one tab, an empty piece, whitespace inside
    a piece (impossible in the grammar — SentencePiece encodes spaces
    as ``▁``), a non-numeric score, duplicate pieces, a missing
    ``<unk>`` control piece (every SentencePiece model carries one —
    a vocab without it cannot encode out-of-alphabet text), or an
    interior blank line (EOF blanks tolerated — the shared
    quarantine-parser posture)."""
    rows: list[tuple[str, float]] = []
    seen: set[str] = set()
    blank_at: int | None = None
    with open(path, encoding="utf-8") as fh:
        for lineno, raw in enumerate(fh, start=1):
            ln = raw.rstrip("\n")
            if ln == "":
                if blank_at is None:
                    blank_at = lineno
                continue
            if blank_at is not None:
                raise ValueError(
                    f"sp vocab line {blank_at}: blank line before line "
                    f"{lineno} — blanks are only tolerated at EOF"
                )
            fields = ln.split("\t")
            if len(fields) != 2:
                raise ValueError(
                    f"sp vocab line {lineno}: expected '<piece>\\t<score>'"
                    f" (exactly one tab), got {len(fields)} field(s)"
                )
            piece, score_s = fields
            if not piece:
                raise ValueError(f"sp vocab line {lineno}: empty piece")
            if any(c.isspace() for c in piece):
                raise ValueError(
                    f"sp vocab line {lineno}: whitespace inside piece "
                    f"{piece!r} — the grammar encodes spaces as ▁"
                )
            if piece in seen:
                raise ValueError(
                    f"sp vocab line {lineno}: duplicate piece {piece!r}"
                )
            try:
                score = float(score_s)
            except ValueError as e:
                raise ValueError(
                    f"sp vocab line {lineno}: non-numeric score ({e})"
                ) from e
            seen.add(piece)
            rows.append((piece, score))
    if "<unk>" not in seen:
        raise ValueError(
            "sp vocab: no <unk> control piece — every SentencePiece "
            "model declares one; refusing a vocab that cannot encode "
            "out-of-alphabet text"
        )
    return rows


def write_wordpiece_vocab(tokens: list[str], path: str) -> str:
    """Serialize a WordPiece vocabulary in the BERT ``vocab.txt``
    grammar: one token per line, line index = token id (fixture
    writer; the grammar has no scores — rank IS the model)."""
    with open(path, "w", encoding="utf-8") as fh:
        for tok in tokens:
            fh.write(tok + "\n")
    return path


def load_wordpiece_vocab(path: str) -> list[str]:
    """Quarantine parser for the BERT ``vocab.txt`` WordPiece grammar
    (one token per line, ``##`` prefix marks continuation pieces,
    bracketed controls like ``[UNK]``).  Returns tokens in file
    order — the line index IS the token id, the BERT convention.
    Refuses on: whitespace inside a token, duplicate tokens, a bare
    ``##`` continuation (zero-length advance — would loop the greedy
    matcher), a missing ``[UNK]`` control (WordPiece encodes every
    unmatched word AS ``[UNK]``; a vocab without it cannot encode),
    or an interior blank line (EOF blanks tolerated — the shared
    quarantine-parser posture)."""
    rows: list[str] = []
    seen: set[str] = set()
    blank_at: int | None = None
    with open(path, encoding="utf-8") as fh:
        for lineno, raw in enumerate(fh, start=1):
            ln = raw.rstrip("\n")
            if ln == "":
                if blank_at is None:
                    blank_at = lineno
                continue
            if blank_at is not None:
                raise ValueError(
                    f"wordpiece vocab line {blank_at}: blank line before "
                    f"line {lineno} — blanks are only tolerated at EOF"
                )
            if any(c.isspace() for c in ln):
                raise ValueError(
                    f"wordpiece vocab line {lineno}: whitespace inside "
                    f"token {ln!r} — the grammar is one token per line"
                )
            if ln == "##":
                raise ValueError(
                    f"wordpiece vocab line {lineno}: bare '##' — a "
                    "zero-length continuation would never advance the "
                    "greedy matcher"
                )
            if ln in seen:
                raise ValueError(
                    f"wordpiece vocab line {lineno}: duplicate token {ln!r}"
                )
            seen.add(ln)
            rows.append(ln)
    if "[UNK]" not in seen:
        raise ValueError(
            "wordpiece vocab: no [UNK] control token — WordPiece encodes "
            "every unmatched word as [UNK]; refusing a vocab that "
            "cannot encode"
        )
    return rows
