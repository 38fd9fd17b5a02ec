"""Multimodal column plumbing (SURVEY.md §2.11 L6).

Images / audio / video ride through the engine as opaque ``binary``
columns plus a typed metadata struct; decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` stages so
the bytes never round-trip row-at-a-time.

The actual media decoding is STUBBED (this container ships no
image/audio libraries): ``decode_batches`` computes deterministic
pseudo-features (payload length, first-byte value, sha1 prefix) in
place of pixel decoding, and ``decode_image_real`` raises
``NotImplementedError`` at the exact seam where a real decoder (PIL /
ffmpeg) plugs in.  Everything Spark-side — schema, batching,
partition sizing — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id bigint, media_kind string, n_bytes bigint, "
    "first_byte int, content_id string"
)


def attach_fake_payload(docs: DataFrame) -> DataFrame:
    """Give each document an opaque binary payload + metadata struct —
    stand-in for reading real media with spark.read.format('binaryFile')."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.when(F.col("doc_id") % 3 == 0, "image")
            .when(F.col("doc_id") % 3 == 1, "audio")
            .otherwise("video")
            .alias("kind"),
            F.col("n_chars").alias("declared_size"),
        ).alias("media_meta"),
    )


def decode_image_real(payload: bytes) -> dict:
    """Seam for a real decoder; deliberately unimplemented here."""
    raise NotImplementedError(
        "media decoding requires PIL/ffmpeg — not available in this environment"
    )


def decode_batches(df: DataFrame) -> DataFrame:
    """Arrow-batched 'decode': one pandas batch in, one out.  At 100 TB
    this is the shape that matters — bytes stay in Arrow buffers, the
    UDF sees columnar batches, and upstream repartitioning controls
    batch memory (maxRecordsPerBatch caps it)."""

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_kind": pdf["media_meta"].map(lambda m: m["kind"]),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "first_byte": payloads.map(lambda b: b[0] if len(b) else -1).astype(
                        "int32"
                    ),
                    "content_id": payloads.map(
                        lambda b: hashlib.sha1(b).hexdigest()[:16]
                    ),
                }
            )

    return df.mapInPandas(fn, DECODED_SCHEMA)
