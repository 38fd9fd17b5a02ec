"""WordPiece family (round 15): vocab.txt grammar quarantine, greedy
longest-match semantics, and the artifact roundtrip the registry
query value-hashes end to end."""

from __future__ import annotations

import pytest

from webarchive_indexing_spark.operators.wordpiece import (
    WP_FIXTURE_PIECES,
    wordpiece_encode,
)
from webarchive_indexing_spark.sources.model_artifacts import (
    load_wordpiece_vocab,
    write_wordpiece_vocab,
)


def test_vocab_roundtrip(tmp_path):
    p = write_wordpiece_vocab(list(WP_FIXTURE_PIECES), str(tmp_path / "v.txt"))
    got = load_wordpiece_vocab(p)
    assert got == list(WP_FIXTURE_PIECES)
    # line order IS the id order — the BERT convention
    assert got.index("[UNK]") == 1


@pytest.mark.parametrize(
    ("content", "err"),
    [
        ("[UNK]\na b\n", "whitespace inside"),
        ("[UNK]\nthe\nthe\n", "duplicate token"),
        ("[UNK]\n##\n", "bare '##'"),
        ("the\n##e\n", "no \\[UNK\\]"),
        ("[UNK]\n\nthe\n", "blank line"),
    ],
)
def test_vocab_quarantine(tmp_path, content, err):
    p = tmp_path / "bad.txt"
    p.write_text(content)
    with pytest.raises(ValueError, match=err):
        load_wordpiece_vocab(str(p))


def test_vocab_trailing_blank_tolerated(tmp_path):
    p = tmp_path / "ok.txt"
    p.write_text("[UNK]\nthe\n\n")
    assert load_wordpiece_vocab(str(p)) == ["[UNK]", "the"]


@pytest.fixture(scope="module")
def tiny_vocab():
    # ids: 0=[UNK] 1=un 2=unable 3=a 4=b 5=##able 6=##a 7=##b 8=##le
    return ["[UNK]", "un", "unable", "a", "b", "##able", "##a", "##b", "##le"]


def _encode_one(spark, vocab, word):
    df = spark.createDataFrame([(0, word)], "doc_id bigint, text string")
    row = wordpiece_encode(df, vocab).collect()[0]
    return row.ids, row.n_tokens


def test_greedy_longest_match_first(spark, tiny_vocab):
    # 'unable' matches the WHOLE word even though 'un'+'##able' also
    # segments it — longest-match-first at position 0
    assert _encode_one(spark, tiny_vocab, "unable") == ("2", 1)
    # continuation positions match ##-pieces: un + ##a + ##b
    assert _encode_one(spark, tiny_vocab, "unab") == ("1-6-7", 3)
    # greedy prefers ##able over ##a at the continuation position
    assert _encode_one(spark, tiny_vocab, "bable") == ("4-5", 2)


def test_unmatched_position_makes_whole_word_unk(spark, tiny_vocab):
    # 'z' has no piece: the whole word is ONE [UNK], not a partial
    # segmentation — the published BERT rule
    assert _encode_one(spark, tiny_vocab, "unz") == ("0", 1)
    assert _encode_one(spark, tiny_vocab, "zun") == ("0", 1)


def test_multi_word_doc_counts_and_order(spark, tiny_vocab):
    df = spark.createDataFrame(
        [(7, "unable zzz ab")], "doc_id bigint, text string"
    )
    row = wordpiece_encode(df, tiny_vocab).collect()[0]
    assert row.ids == "2-0-3-7"
    assert row.n_tokens == 4


def test_encode_refuses_vocab_without_unk(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="no \\[UNK\\]"):
        wordpiece_encode(df, ["the", "##e"])
