"""GPT-2 tokenizer artifact loading (round 13): byte↔unicode
bijection, serialize→parse roundtrip, quarantine arms, and
cross-encoder parity (expression replace-chain vs Arrow pretrained
path)."""

from __future__ import annotations

import json

import pytest

from webarchive_indexing_spark.operators.bpe import (
    bpe_encode_bytes,
    bpe_encode_pretrained,
    gpt2_bytes_to_unicode,
    load_bpe_artifacts,
    write_bpe_artifacts,
    _merge_pass,
)


def test_bytes_to_unicode_is_a_bijection():
    m = gpt2_bytes_to_unicode()
    assert len(m) == 256 and len(set(m.values())) == 256
    # printable ASCII maps to itself; control bytes map above 255
    assert m[ord("A")] == "A" and m[ord("!")] == "!"
    assert ord(m[0]) >= 256 and ord(m[ord(" ")]) >= 256


def test_artifact_roundtrip(tmp_path):
    merges = [("74", "68"), ("7468", "65"), ("20", "74")]
    mp, vp = write_bpe_artifacts(merges, str(tmp_path))
    lines = open(mp, encoding="utf-8").read().splitlines()
    assert lines[0].startswith("#version")
    assert lines[1] == "t h" and lines[2] == "th e"
    art = load_bpe_artifacts(mp, vp)
    assert art["merges"] == merges
    assert art["vocab"]["41"] == 0x41  # base byte: id = byte value
    assert art["vocab"]["7468"] == 256 and art["vocab"]["746865"] == 257


def test_quarantine_malformed_merge_line(tmp_path):
    mp, vp = write_bpe_artifacts([("74", "68")], str(tmp_path))
    bad = tmp_path / "bad_merges.txt"
    bad.write_text("#version: 0.2\nt h e\n")  # three fields
    with pytest.raises(ValueError, match="line 2"):
        load_bpe_artifacts(str(bad), vp)
    bad.write_text("#version: 0.2\nth\n")  # one field
    with pytest.raises(ValueError, match="line 2"):
        load_bpe_artifacts(str(bad), vp)
    bad.write_text("#version: 0.2\nt h\nt h\n")  # duplicate
    with pytest.raises(ValueError, match="duplicate merge"):
        load_bpe_artifacts(str(bad), vp)


def test_quarantine_vocab_arms(tmp_path):
    mp, vp = write_bpe_artifacts([("74", "68")], str(tmp_path))
    bad = tmp_path / "bad_vocab.json"
    bad.write_text("not json {")
    with pytest.raises(ValueError, match="not valid JSON"):
        load_bpe_artifacts(mp, str(bad))
    bad.write_text('["a", "b"]')
    with pytest.raises(ValueError, match="must be an object"):
        load_bpe_artifacts(mp, str(bad))
    vocab = json.load(open(vp, encoding="utf-8"))
    # drop a base byte token
    b2u = gpt2_bytes_to_unicode()
    clipped = {k: v for k, v in vocab.items() if k != b2u[0]}
    bad.write_text(json.dumps(clipped, ensure_ascii=False))
    with pytest.raises(ValueError, match="base byte token 0x00 missing"):
        load_bpe_artifacts(mp, str(bad))
    # drop the merge product
    clipped = {k: v for k, v in vocab.items() if v != 256}
    bad.write_text(json.dumps(clipped, ensure_ascii=False))
    with pytest.raises(ValueError, match="inconsistent artifact pair"):
        load_bpe_artifacts(mp, str(bad))
    # duplicate id
    dup = dict(vocab)
    dup[b2u[0x41] + b2u[0x42]] = 0
    bad.write_text(json.dumps(dup, ensure_ascii=False))
    with pytest.raises(ValueError, match="id 0 assigned to both"):
        load_bpe_artifacts(mp, str(bad))
    # non-int id
    dup = dict(vocab)
    dup["zz"] = "7"
    bad.write_text(json.dumps(dup, ensure_ascii=False))
    with pytest.raises(ValueError, match="string→int"):
        load_bpe_artifacts(mp, str(bad))


def test_quarantine_alphabet_violation(tmp_path):
    mp, vp = write_bpe_artifacts([("74", "68")], str(tmp_path))
    bad = tmp_path / "bad_merges.txt"
    # U+2603 SNOWMAN is outside the 512-codepoint byte alphabet
    bad.write_text("#version: 0.2\n☃ h\n", encoding="utf-8")
    with pytest.raises(ValueError, match="outside the GPT-2"):
        load_bpe_artifacts(str(bad), vp)


def test_merge_pass_leftmost_nonoverlapping():
    # 'aaa' with (a,a): leftmost pair merges, third stays
    assert _merge_pass(["61", "61", "61"], "61", "61") == ["6161", "61"]
    assert _merge_pass(["61"], "61", "61") == ["61"]
    assert _merge_pass([], "61", "61") == []


def test_pretrained_encoder_matches_expression_path(spark, tmp_path):
    """The Arrow pretrained path and the column replace-chain must
    produce identical (n_tokens, ids) when the vocab uses the
    engine's id scheme — three-way consistency with the SQL twin is
    the registered query's oracle."""
    rows = [
        (0, "the theme thesis the"),
        (1, "don't stop— the café 42!"),
        (2, "th"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    merges = [("74", "68"), ("7468", "65"), ("20", "7468")]
    mp, vp = write_bpe_artifacts(merges, str(tmp_path))
    art = load_bpe_artifacts(mp, vp)
    got = {
        r.doc_id: (r.n_tokens, r.ids)
        for r in bpe_encode_pretrained(docs, art).collect()
    }
    want = {
        r.doc_id: (r.n_tokens, r.ids)
        for r in bpe_encode_bytes(docs, merges).collect()
    }
    assert got == want and len(got) == 3


def test_merges_blank_lines_only_tolerated_at_eof(tmp_path):
    """Round-13 ADVICE (same posture as the .vec loader): interior
    blank in merges.txt refuses; trailing blank stays tolerated."""
    import pytest as _pytest

    from webarchive_indexing_spark.operators.bpe import load_bpe_artifacts

    vocab = tmp_path / "vocab.json"
    import json as _json

    from webarchive_indexing_spark.operators.bpe import (
        gpt2_bytes_to_unicode,
    )

    b2u = gpt2_bytes_to_unicode()
    base = {b2u[b]: b for b in range(256)}
    merged = b2u[ord("t")] + b2u[ord("h")]
    base[merged] = 256
    vocab.write_text(_json.dumps(base))
    ok = tmp_path / "ok.txt"
    ok.write_text(
        "#version: 0.2\n"
        + b2u[ord("t")] + " " + b2u[ord("h")] + "\n\n"
    )
    art = load_bpe_artifacts(str(ok), str(vocab))
    assert len(art["merges"]) == 1
    bad = tmp_path / "bad.txt"
    bad.write_text(
        "#version: 0.2\n\n" + b2u[ord("t")] + " " + b2u[ord("h")] + "\n"
    )
    with _pytest.raises(ValueError, match="blank line"):
        load_bpe_artifacts(str(bad), str(vocab))
