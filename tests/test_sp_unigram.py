"""SentencePiece unigram family (round 14): vocab grammar quarantine,
Viterbi semantics, and the artifact roundtrip the registry query
value-hashes end to end."""

from __future__ import annotations

import pytest

from webarchive_indexing_spark.operators.sp_unigram import (
    sp_fixture_vocab,
    sp_unigram_encode,
)
from webarchive_indexing_spark.sources.model_artifacts import (
    load_sp_unigram_vocab,
    write_sp_unigram_vocab,
)


def test_vocab_roundtrip(tmp_path):
    rows = sp_fixture_vocab()
    p = write_sp_unigram_vocab(rows, str(tmp_path / "m.vocab"))
    got = load_sp_unigram_vocab(p)
    assert got == [(piece, round(s, 2)) for piece, s in rows]
    # line order IS the id order — the SentencePiece convention
    assert got[0][0] == "<unk>"


@pytest.mark.parametrize(
    ("content", "err"),
    [
        ("<unk>\t0.0\nthe\n", "exactly one tab"),
        ("<unk>\t0.0\nthe\t-1.0\textra\n", "exactly one tab"),
        ("<unk>\t0.0\n\t-1.0\n", "empty piece"),
        ("<unk>\t0.0\na b\t-1.0\n", "whitespace inside piece"),
        ("<unk>\t0.0\nthe\tzz\n", "non-numeric"),
        ("<unk>\t0.0\nthe\t-1.0\nthe\t-2.0\n", "duplicate piece"),
        ("the\t-1.0\n", "no <unk>"),
        ("<unk>\t0.0\n\nthe\t-1.0\n", "blank line"),
    ],
)
def test_vocab_quarantine(tmp_path, content, err):
    p = tmp_path / "bad.vocab"
    p.write_text(content)
    with pytest.raises(ValueError, match=err):
        load_sp_unigram_vocab(str(p))


def test_vocab_trailing_blank_tolerated(tmp_path):
    p = tmp_path / "ok.vocab"
    p.write_text("<unk>\t0.0\nthe\t-1.5\n\n")
    assert load_sp_unigram_vocab(str(p)) == [("<unk>", 0.0), ("the", -1.5)]


@pytest.fixture(scope="module")
def tiny_vocab():
    # ids: 0=<unk> 1=▁ 2=▁ab 3=ab 4=a 5=b — scores chosen so ▁ab
    # (one piece, -1.0) beats ▁+a+b (-1.2-2·1.9) and ▁+ab (-3.1)
    return [
        ("<unk>", 0.0),
        ("▁", -1.2),
        ("▁ab", -1.0),
        ("ab", -1.9),
        ("a", -1.9),
        ("b", -1.9),
    ]


def _encode(spark, vocab, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    return {
        r.doc_id: (r.n_tokens, r.ids)
        for r in sp_unigram_encode(docs, vocab).collect()
    }


def test_viterbi_prefers_best_total_score(spark, tiny_vocab):
    got = _encode(spark, tiny_vocab, ["ab ab"])
    # each word = '▁ab' as ONE piece (id 2)
    assert got[0] == (2, "2-2")


def test_unk_consumes_single_chars_at_min_minus_ten(spark, tiny_vocab):
    # 'XY' has no pieces: ▁(1) + unk + unk; unk never beats a real
    # piece (min-10 penalty) but segments anything
    got = _encode(spark, tiny_vocab, ["XY ab"])
    assert got[0] == (4, "1-0-0-2")


def test_encode_refuses_vocab_without_unk(spark):
    with pytest.raises(ValueError, match="no <unk>"):
        sp_unigram_encode(
            spark.createDataFrame([(0, "x")], ["doc_id", "text"]),
            [("a", -1.0)],
        )


def test_tie_breaks_on_smallest_id_path(spark):
    # two equal-score segmentations of 'ab': ids (3,) vs (4, 5) after
    # ▁ — scores tied at -3.8; fixed-width key order picks id 3
    vocab = [
        ("<unk>", 0.0),
        ("▁", -1.2),
        ("ab", -3.8),
        ("a", -1.9),
        ("b", -1.9),
    ]
    got = _encode(spark, vocab, ["ab"])
    assert got[0] == (2, "1-2")
