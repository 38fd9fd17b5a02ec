"""Multimodal column plumbing (SURVEY.md §2.11 L6).

Images / audio / video ride through the engine as opaque ``binary``
columns plus a typed metadata struct; decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` stages so
the bytes never round-trip row-at-a-time.

The actual media decoding is STUBBED (this container ships no
image/audio libraries): ``decode_batches`` computes deterministic
pseudo-features (payload length, first-byte value, sha256 prefix) in
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
                    # sha256, not sha1: same content-addressing
                    # semantics, but recomputable by every SQL engine
                    # the result might be checked against
                    "content_id": payloads.map(
                        lambda b: hashlib.sha256(b).hexdigest()[:16]
                    ),
                }
            )

    return df.mapInPandas(fn, DECODED_SCHEMA)


FEATURES_SCHEMA = "doc_id bigint, features array<float>"


def extract_features(df: DataFrame, dim: int = 16, normalize: bool = True) -> DataFrame:
    """Feature extraction over Arrow batches: payload bytes → fixed-dim
    vector (here a byte histogram folded to ``dim`` buckets — the
    deterministic stand-in for a vision/audio encoder; a real model's
    forward pass slots into the same batch loop).  Output is the
    ``array<float>`` shape the embedding operators (cosine / LSH /
    IVF) consume downstream — this stage is how the embeddings table
    gets made at 100 TB.

    ``normalize=False`` emits raw bucket counts (exactly representable
    in float32) — the oracle-checkable form; any float normalization
    then happens JVM-side in double where Spark and DuckDB agree
    bit-for-bit."""

    def fn(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            feats = []
            for b in pdf["payload"]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype("float32")
                total = hist.sum()
                feats.append(hist / total if normalize and total else hist)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return df.mapInPandas(fn, FEATURES_SCHEMA)


RESIZED_SCHEMA = (
    "doc_id bigint, media_kind string, payload binary, n_bytes bigint"
)


def resize_batches(df: DataFrame, target_bytes: int = 64) -> DataFrame:
    """'Resize' stage: every payload is re-encoded to a fixed size
    (truncate / zero-pad — the deterministic stand-in for a real
    image resample, which plugs in at the marked seam).  Demonstrates
    the payload-REWRITING batch shape: binary in, binary out, Arrow
    buffers end to end."""

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        def fit(b: bytes) -> bytes:
            b = bytes(b)
            # seam: real resample (PIL Image.resize / ffmpeg scale)
            return b[:target_bytes].ljust(target_bytes, b"\x00")

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_kind": pdf["media_meta"].map(lambda m: m["kind"]),
                    "payload": pdf["payload"].map(fit),
                    "n_bytes": target_bytes,
                }
            )

    return df.mapInPandas(fn, RESIZED_SCHEMA)


FRAMES_SCHEMA = "doc_id bigint, frame_no int, frame binary"


def sample_frames(df: DataFrame, every: int = 32, max_frames: int = 8) -> DataFrame:
    """Frame sampling: one video payload row → N frame rows (the 1→N
    explode shape, done in pandas so a real container demuxer can slot
    in).  Frames here are deterministic byte slices at ``every``-byte
    strides; only ``media_meta.kind == 'video'`` rows fan out."""

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, nos, frames = [], [], []
            for doc_id, meta, payload in zip(
                pdf["doc_id"], pdf["media_meta"], pdf["payload"]
            ):
                if meta["kind"] != "video":
                    continue
                b = bytes(payload)
                if not b:
                    continue  # no phantom frame for an empty payload
                for i in range(min(max_frames, max(1, len(b) // every))):
                    ids.append(doc_id)
                    nos.append(i)
                    frames.append(b[i * every : (i + 1) * every])
            yield pd.DataFrame({"doc_id": ids, "frame_no": nos, "frame": frames})

    return df.mapInPandas(fn, FRAMES_SCHEMA)
