"""Multimodal plumbing: binary payload column + Arrow-batched decode
stage — schema, determinism, and the stubbed real-decoder seam."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from webarchive_indexing_spark.operators.multimodal import (
    attach_fake_payload,
    decode_batches,
    decode_image_real,
)
from webarchive_indexing_spark.tables import load_table


def test_decode_batches_schema_and_values(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    out = decode_batches(attach_fake_payload(docs))
    assert [f.name for f in out.schema.fields] == [
        "doc_id",
        "media_kind",
        "n_bytes",
        "first_byte",
        "content_id",
    ]
    rows = {r.doc_id: r for r in out.collect()}
    src = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    assert len(rows) == len(src)
    for doc_id, r in rows.items():
        raw = src[doc_id].encode()
        assert r.n_bytes == len(raw)
        assert r.first_byte == raw[0]
        assert r.content_id == hashlib.sha1(raw).hexdigest()[:16]
        assert r.media_kind in ("image", "audio", "video")


def test_real_decoder_seam_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG")
