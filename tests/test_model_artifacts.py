"""Public model-artifact loaders (round 13): fastText .vec and ARPA
bigram-LM grammars — roundtrip, quarantine arms, broadcast-apply
plumbing."""

from __future__ import annotations

import pytest

from webarchive_indexing_spark.sources.model_artifacts import (
    load_arpa_bigram,
    load_vec_vectors,
    write_arpa_bigram,
    write_vec_vectors,
)


def test_vec_roundtrip(tmp_path):
    rows = [("the", [0.1, -0.25]), ("fast", [1.0, 0.0])]
    p = write_vec_vectors(rows, 2, str(tmp_path / "m.vec"))
    got, dim = load_vec_vectors(p)
    assert got == rows and dim == 2


@pytest.mark.parametrize(
    ("content", "err"),
    [
        ("2 x\nthe 0.1\n", "header"),
        ("x 1\nthe 0.1\n", "header"),
        ("1 0\n", "dim must be"),
        ("1 2\nthe 0.1\n", "fields"),
        ("1 2\nthe 0.1 0.2 0.3\n", "fields"),
        ("1 1\nthe zz\n", "non-numeric"),
        ("2 1\nthe 0.1\nthe 0.2\n", "duplicate token"),
        ("2 1\nthe 0.1\n", "declares 2 vectors"),
        ("1 1\n 0.1\n", "empty token"),
    ],
)
def test_vec_quarantine(tmp_path, content, err):
    p = tmp_path / "bad.vec"
    p.write_text(content)
    with pytest.raises(ValueError, match=err.replace("(", "\\(")):
        load_vec_vectors(str(p))


def test_arpa_roundtrip(tmp_path):
    uni = [("fast", -2.0, -0.1), ("the", -1.25, -0.3)]
    bi = [("the", "fast", -0.875)]
    p = write_arpa_bigram(uni, bi, str(tmp_path / "m.arpa"))
    m = load_arpa_bigram(p)
    assert m["uni"] == uni and m["bi"] == bi


@pytest.mark.parametrize(
    ("mutate", "err"),
    [
        (lambda s: s.replace("\\end\\\n", ""), "not closed"),
        (lambda s: s.replace("ngram 2=1", "ngram 2=7"), "declares 7 2-grams"),
        (lambda s: s.replace("ngram 1=2\n", ""), "not declared"),
        (lambda s: s.replace("-0.875\tthe fast", "-0.875\tthe"), "2-gram needs"),
        (lambda s: s.replace("-1.250\tthe\t-0.300", "zz\tthe\t-0.300"),
         "non-numeric"),
        (lambda s: s.replace("-2.000\tfast\t-0.100",
                             "-2.000\tfast\t-0.100\n-2.000\tfast\t-0.100"),
         "duplicate 1-gram"),
        (lambda s: s.replace("\\2-grams:", "\\3-grams:"),
         "outside the supported"),
        (lambda s: "junk\n" + s, "outside any section"),
    ],
)
def test_arpa_quarantine(tmp_path, mutate, err):
    good = write_arpa_bigram(
        [("fast", -2.0, -0.1), ("the", -1.25, -0.3)],
        [("the", "fast", -0.875)],
        str(tmp_path / "m.arpa"),
    )
    content = open(good, encoding="utf-8").read()
    bad = tmp_path / "bad.arpa"
    bad.write_text(mutate(content))
    with pytest.raises(ValueError, match=err):
        load_arpa_bigram(str(bad))


def test_arpa_space_separated_variant(tmp_path):
    """Some toolchains emit space-separated ARPA lines; the parser
    accepts both separators."""
    p = tmp_path / "m.arpa"
    p.write_text(
        "\\data\\\nngram 1=1\nngram 2=1\n\n"
        "\\1-grams:\n-1.500 the -0.200\n\n"
        "\\2-grams:\n-0.700 the the\n\n\\end\\\n"
    )
    m = load_arpa_bigram(str(p))
    assert m["uni"] == [("the", -1.5, -0.2)]
    assert m["bi"] == [("the", "the", -0.7)]


def test_three_decimal_values_roundtrip_bit_exact(tmp_path):
    """The fixture grammar emits 3-decimal rationals; %.3f-serialize
    → float() must reproduce the exact same double (the determinism
    contract the oracle parity relies on)."""
    vals = [-(1 + k % 4000) / 1000.0 for k in range(0, 40000, 977)]
    rows = [(f"t{i}", [v]) for i, v in enumerate(vals)]
    p = write_vec_vectors(rows, 1, str(tmp_path / "m.vec"))
    got, _ = load_vec_vectors(p)
    assert [v[0] for _, v in got] == vals


def test_vec_blank_lines_only_tolerated_at_eof(tmp_path):
    """Round-13 ADVICE: an INTERIOR blank line is a corrupted file and
    must refuse; trailing blank(s) at EOF stay tolerated."""
    ok = tmp_path / "ok.vec"
    ok.write_text("1 1\nthe 0.1\n\n")
    rows, dim = load_vec_vectors(str(ok))
    assert rows == [("the", [0.1])] and dim == 1
    bad = tmp_path / "bad.vec"
    bad.write_text("2 1\nthe 0.1\n\nfast 0.2\n")
    with pytest.raises(ValueError, match="blank line"):
        load_vec_vectors(str(bad))
