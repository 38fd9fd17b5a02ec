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
        assert r.content_id == hashlib.sha256(raw).hexdigest()[:16]
        assert r.media_kind in ("image", "audio", "video")


def test_real_decoder_seam_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG")


def test_extract_features_shape_and_determinism(spark, sf_dir):
    from webarchive_indexing_spark.operators.multimodal import extract_features

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    out = extract_features(attach_fake_payload(docs), dim=16)
    rows = {r.doc_id: r.features for r in out.collect()}
    src = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    assert set(rows) == set(src)
    for doc_id, feats in rows.items():
        assert len(feats) == 16
        assert abs(sum(feats) - 1.0) < 1e-5  # normalized histogram
    # deterministic: second run identical
    again = {r.doc_id: r.features for r in
             extract_features(attach_fake_payload(docs), dim=16).collect()}
    assert rows == again
    # normalize=False emits raw bucket counts: integer-valued floats
    # whose sum is the payload byte count (the oracle-checkable form)
    raw = {r.doc_id: r.features for r in
           extract_features(attach_fake_payload(docs), dim=16,
                            normalize=False).collect()}
    for doc_id, feats in raw.items():
        assert all(f == int(f) for f in feats)
        assert int(sum(feats)) == len(src[doc_id].encode())


def test_resize_fixed_size_payloads(spark, sf_dir):
    from webarchive_indexing_spark.operators.multimodal import resize_batches

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    out = resize_batches(attach_fake_payload(docs), target_bytes=64).collect()
    assert len(out) == 20
    for r in out:
        assert len(r.payload) == 64
        assert r.n_bytes == 64


def test_sample_frames_video_only_fanout(spark, sf_dir):
    from webarchive_indexing_spark.operators.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    with_bin = attach_fake_payload(docs)
    out = sample_frames(with_bin, every=16, max_frames=4)
    rows = out.collect()
    assert rows, "expected video rows to fan out"
    video_ids = {
        r.doc_id
        for r in with_bin.select("doc_id", "media_meta.kind").collect()
        if r.kind == "video"
    }
    assert {r.doc_id for r in rows} == video_ids
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    for frames in by_doc.values():
        assert [f.frame_no for f in sorted(frames, key=lambda x: x.frame_no)] == list(
            range(len(frames))
        )
        assert all(len(f.frame) <= 16 for f in frames)


def test_decode_image_real_golden():
    """Golden decode: PPM P6/P3 (comments, arbitrary whitespace) and
    BMP (bottom-up + top-down, row padding, BGR order) all recover the
    same known image; codec formats stay behind NotImplementedError."""
    import pytest as _pytest

    from webarchive_indexing_spark.operators.multimodal import (
        build_bmp,
        build_ppm,
        decode_image_real,
    )

    rgb = [10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120]  # 2x2
    want = (2, 2, 55.0, 65.0, 75.0)

    def stats(d):
        return (d["width"], d["height"], d["mean_r"], d["mean_g"], d["mean_b"])

    assert stats(decode_image_real(build_ppm(2, 2, rgb))) == want
    assert stats(decode_image_real(build_bmp(2, 2, rgb))) == want

    # P3 ASCII with a header comment and ragged whitespace
    p3 = b"P3\n# test comment\n 2  2\n255\n" + " ".join(map(str, rgb)).encode()
    assert stats(decode_image_real(p3)) == want

    # top-down BMP (negative height): same logical image
    bottom_up = build_bmp(2, 2, rgb)
    import struct

    h = struct.unpack_from("<i", bottom_up, 22)[0]
    row_bytes = ((2 * 3 + 3) // 4) * 4
    raster = bottom_up[54:]
    flipped = b"".join(
        raster[r * row_bytes : (r + 1) * row_bytes] for r in range(h - 1, -1, -1)
    )
    top_down = bytearray(bottom_up[:54] + flipped)
    struct.pack_into("<i", top_down, 22, -h)
    assert stats(decode_image_real(bytes(top_down))) == want

    # BMP row padding must be skipped, not decoded (w=2 → 2 pad bytes)
    assert row_bytes == 8

    with _pytest.raises(NotImplementedError):
        decode_image_real(b"\xff\xd8\xff\xe0JFIF...")
    with _pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG\r\n\x1a\n...")
    with _pytest.raises(ValueError):
        decode_image_real(build_ppm(2, 2, rgb)[:-3])  # truncated raster


def test_decode_images_damage_tolerant(spark):
    """Undecodable payloads become format='unsupported' rows with NULL
    stats — per-row damage tolerance, never a task failure."""
    from webarchive_indexing_spark.operators.multimodal import (
        build_ppm,
        decode_images,
    )

    rows = [
        (1, bytearray(build_ppm(1, 1, [9, 9, 9]))),
        (2, bytearray(b"\xff\xd8jpegish")),
        (3, bytearray(b"")),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    got = {r.doc_id: r for r in decode_images(df).collect()}
    assert got[1].format == "ppm" and got[1].mean_r == 9.0
    assert got[2].format == "unsupported" and got[2].width is None
    assert got[3].format == "unsupported"


def test_parse_image_header_golden():
    """Header parser golden values: PNG IHDR (color-type channels ×
    bit depth), JPEG baseline + progressive SOF fields behind a real
    APP0 segment, PPM tokens (with comments), BMP info header, and
    the top-down-BMP height sign."""
    from webarchive_indexing_spark.operators.multimodal import (
        build_bmp,
        build_jpeg_header,
        build_png_header,
        parse_image_header,
    )

    assert parse_image_header(build_png_header(640, 480)) == {
        "format": "png", "width": 640, "height": 480, "color_depth": 24
    }
    assert parse_image_header(
        build_png_header(5, 7, bit_depth=16, color_type=6)
    ) == {"format": "png", "width": 5, "height": 7, "color_depth": 64}
    assert parse_image_header(build_jpeg_header(1920, 1080)) == {
        "format": "jpeg", "width": 1920, "height": 1080, "color_depth": 24
    }
    assert parse_image_header(
        build_jpeg_header(33, 44, progressive=True, ncomp=1)
    ) == {
        "format": "jpeg-progressive", "width": 33, "height": 44,
        "color_depth": 8,
    }
    assert parse_image_header(b"P6\n# comment\n12 9\n255\n") == {
        "format": "ppm", "width": 12, "height": 9, "color_depth": 24
    }
    assert parse_image_header(build_bmp(3, 2, [0] * 18)) == {
        "format": "bmp", "width": 3, "height": 2, "color_depth": 24
    }


def test_parse_image_header_damage_tolerance():
    """Bytes-fuzz: every truncation and every single-byte corruption
    of valid headers either parses or raises the documented
    (ValueError/NotImplementedError) pair — never an unexpected
    exception class, so image_dims' per-row quarantine is total."""
    import random

    from webarchive_indexing_spark.operators.multimodal import (
        build_jpeg_header,
        build_png_header,
        parse_image_header,
    )

    rng = random.Random(42)
    samples = [
        build_png_header(9, 4),
        build_jpeg_header(100, 50),
        build_jpeg_header(7, 7, progressive=True),
        b"P6\n4 3\n255\n" + bytes(36),
    ]
    for b in samples:
        for cut in range(len(b)):
            try:
                parse_image_header(b[:cut])
            except (ValueError, NotImplementedError):
                pass
        for _ in range(200):
            pos = rng.randrange(len(b))
            mut = b[:pos] + bytes([rng.randrange(256)]) + b[pos + 1 :]
            try:
                parse_image_header(mut)
            except (ValueError, NotImplementedError):
                pass
    # empty and garbage payloads quarantine too
    for junk in (b"", b"\x00", b"not an image at all"):
        with pytest.raises((ValueError, NotImplementedError)):
            parse_image_header(junk)


def test_parse_audio_header_golden():
    """WAV/FLAC header goldens: chunk-walked fmt/data fields, FLAC
    STREAMINFO bit unpacking, word-aligned odd chunks skipped, and
    non-PCM wav tags named."""
    from webarchive_indexing_spark.operators.multimodal import (
        build_flac_header,
        build_wav,
        parse_audio_header,
    )

    assert parse_audio_header(build_wav(2, 44100, 16, 44100)) == {
        "format": "wav-pcm", "channels": 2, "sample_rate": 44100,
        "bits": 16, "n_frames": 44100, "duration_ms": 1000,
    }
    assert parse_audio_header(build_wav(1, 8000, 8, 123, fmt_tag=7)) == {
        "format": "wav-mulaw", "channels": 1, "sample_rate": 8000,
        "bits": 8, "n_frames": 123, "duration_ms": 15,
    }
    got = parse_audio_header(build_flac_header(2, 48000, 24, 96000))
    assert got == {
        "format": "flac", "channels": 2, "sample_rate": 48000,
        "bits": 24, "n_frames": 96000, "duration_ms": 2000,
    }
    # an ODD-sized unknown chunk before fmt must word-align, not
    # desync the walk
    import struct

    w = build_wav(1, 16000, 16, 10)
    odd = b"LIST" + struct.pack("<I", 3) + b"abc\x00"  # 3 + pad byte
    spliced = w[:12] + odd + w[12:]
    spliced = b"RIFF" + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    assert parse_audio_header(spliced)["n_frames"] == 10


def test_parse_audio_header_damage_tolerance():
    """Bytes-fuzz for the audio parser: truncations and single-byte
    corruptions of valid headers either parse or raise the documented
    (ValueError/NotImplementedError) pair — audio_meta's per-row
    quarantine is total."""
    import random

    import pytest

    from webarchive_indexing_spark.operators.multimodal import (
        build_flac_header,
        build_wav,
        parse_audio_header,
    )

    rng = random.Random(43)
    samples = [
        build_wav(2, 22050, 16, 50),
        build_wav(1, 8000, 8, 3, fmt_tag=3),
        build_flac_header(1, 44100, 16, 777),
    ]
    for b in samples:
        for cut in range(len(b)):
            try:
                parse_audio_header(b[:cut])
            except (ValueError, NotImplementedError):
                pass
        for _ in range(200):
            pos = rng.randrange(len(b))
            mut = b[:pos] + bytes([rng.randrange(256)]) + b[pos + 1 :]
            try:
                parse_audio_header(mut)
            except (ValueError, NotImplementedError):
                pass
    for junk in (b"", b"RIFF", b"RIFF\x00\x00\x00\x00JUNK", b"fLaC", b"x" * 40):
        with pytest.raises((ValueError, NotImplementedError)):
            parse_audio_header(junk)


def test_parse_video_header_golden():
    """Golden MP4 + MKV headers (round 11): spec'd offsets round-trip
    the builders' parameters exactly, incl. mvhd v1, largesize boxes,
    and unknown-size (live-capture) Segments."""
    import struct

    from webarchive_indexing_spark.operators.multimodal import (
        build_mkv,
        build_mp4,
        parse_video_header,
    )

    assert parse_video_header(build_mp4(1920, 1080, 90000, 900000)) == {
        "format": "mp4", "width": 1920, "height": 1080,
        "timescale": 90000, "duration_ms": 10000,
    }
    assert parse_video_header(build_mp4(640, 352, 600, 601)) == {
        "format": "mp4", "width": 640, "height": 352,
        "timescale": 600, "duration_ms": 1001,
    }
    got = parse_video_header(build_mkv(1280, 720, 42000.0))
    assert (got["format"], got["width"], got["height"]) == ("mkv", 1280, 720)
    assert got["duration_ms"] == 42000 and got["timescale"] == 1_000_000

    # mvhd VERSION 1 (64-bit duration) — hand-built box
    def box(t, body):
        return struct.pack(">I", 8 + len(body)) + t + body

    mvhd1 = box(
        b"mvhd",
        struct.pack(">B3x", 1)
        + struct.pack(">QQIQ", 0, 0, 1000, 2**33)
        + b"\x00" * 80,
    )
    p = box(b"ftyp", b"isom") + box(b"moov", mvhd1)
    got = parse_video_header(p)
    assert got["duration_ms"] == 2**33 * 1000 // 1000
    assert got["width"] is None  # no trak — dims stay NULL

    # 64-bit largesize on the moov box itself
    body = mvhd1
    large = (
        struct.pack(">I", 1)
        + b"moov"
        + struct.pack(">Q", 16 + len(body))
        + body
    )
    assert parse_video_header(box(b"ftyp", b"isom") + large)[
        "timescale"
    ] == 1000

    # zero tkhd presentation dims (raw captures): the parser falls
    # back to the coded dims in the stsd avc1 VisualSampleEntry
    got = parse_video_header(
        build_mp4(854, 480, 25, 250, dims_in="stsd")
    )
    assert (got["width"], got["height"]) == (854, 480)
    assert got["duration_ms"] == 10000

    # unknown-size Segment (streamed matroska): all size bits set
    mkv = build_mkv(320, 240, 77.0)
    # rebuild with segment size byte forced to unknown (0xFF, 1-byte)
    seg_id = b"\x18\x53\x80\x67"
    i = mkv.index(seg_id) + 4
    n = mkv[i] & 0x7F  # original 1-byte size
    assert mkv[i + 1 + n :] == b""  # segment body runs to the end
    unk = mkv[:i] + b"\xff" + mkv[i + 1 :]
    got = parse_video_header(unk)
    assert (got["width"], got["duration_ms"]) == (320, 77)


def test_parse_video_header_damage_tolerance():
    """Bytes-fuzz for the video parser: truncations and single-byte
    corruptions of valid headers either parse or raise the documented
    (ValueError/NotImplementedError) pair — video_meta's per-row
    quarantine is total."""
    import random

    import pytest

    from webarchive_indexing_spark.operators.multimodal import (
        build_mkv,
        build_mp4,
        parse_video_header,
    )

    rng = random.Random(47)
    samples = [
        build_mp4(640, 480, 1000, 5000),
        build_mp4(16, 16, 48000, 1),
        build_mp4(854, 480, 25, 250, dims_in="stsd"),
        build_mkv(1920, 800, 123456.0),
    ]
    for b in samples:
        for cut in range(len(b)):
            try:
                parse_video_header(b[:cut])
            except (ValueError, NotImplementedError):
                pass
        for _ in range(300):
            pos = rng.randrange(len(b))
            mut = b[:pos] + bytes([rng.randrange(256)]) + b[pos + 1 :]
            try:
                parse_video_header(mut)
            except (ValueError, NotImplementedError):
                pass
    for junk in (
        b"",
        b"\x00\x00\x01\x00moovJU",
        b"\x1a\x45\xdf\xa3",
        b"x" * 40,
        b"\x00\x00\x00\x08ftyp",  # valid walk, but no moov → ValueError
        b"garbage bytes here",
    ):
        with pytest.raises((ValueError, NotImplementedError)):
            parse_video_header(junk)


def test_video_meta_quarantines_and_matches_fixture_arms(spark, sf_dir):
    """video_meta over the synthesized fixture corpus: every corrupt
    arm lands as an 'unsupported' row (task survives), every valid arm
    round-trips its arithmetic parameters."""
    from webarchive_indexing_spark.operators.multimodal import (
        synthesize_video_payloads,
        video_meta,
    )
    from webarchive_indexing_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    rows = video_meta(synthesize_video_payloads(d)).collect()
    assert len(rows) == 120
    for r in rows:
        i = r.doc_id
        if i % 3 == 2:
            assert r.format == "unsupported" and r.width is None
        else:
            assert r.format == ("mp4" if i % 3 == 0 else "mkv")
            assert r.width == 16 * (1 + i % 80)
            assert r.height == 16 * (1 + i % 45)


def test_parse_web_image_header_golden():
    """GIF + WebP builders round-trip through the parser with exact
    dims/depth for every variant, including the format-identifying
    details: GIF version bytes, palette-bit packing, VP8X alpha flag,
    VP8L packed bitfield, VP8 start code."""
    from webarchive_indexing_spark.operators.multimodal import (
        build_gif_header,
        build_webp_header,
        parse_image_header,
    )

    d = parse_image_header(build_gif_header(14, 10, version=b"87a",
                                            palette_bits=5))
    assert d == {"format": "gif87a", "width": 14, "height": 10,
                 "color_depth": 5}
    d = parse_image_header(build_gif_header(1, 1, palette_bits=1))
    assert d == {"format": "gif89a", "width": 1, "height": 1,
                 "color_depth": 1}
    d = parse_image_header(build_webp_header(300, 200, variant="vp8x",
                                             alpha=True))
    assert d == {"format": "webp-vp8x", "width": 300, "height": 200,
                 "color_depth": 32}
    d = parse_image_header(build_webp_header(300, 200, variant="vp8x"))
    assert d["color_depth"] == 24
    d = parse_image_header(build_webp_header(4095, 4095, variant="vp8l",
                                             alpha=False))
    assert d == {"format": "webp-vp8l", "width": 4095, "height": 4095,
                 "color_depth": 24}
    d = parse_image_header(build_webp_header(640, 480, variant="vp8"))
    assert d == {"format": "webp-vp8", "width": 640, "height": 480,
                 "color_depth": 24}
    from webarchive_indexing_spark.operators.multimodal import (
        build_tiff_header,
    )

    d = parse_image_header(build_tiff_header(77, 66, samples=3))
    assert d == {"format": "tiff-le", "width": 77, "height": 66,
                 "color_depth": 24}
    d = parse_image_header(
        build_tiff_header(77, 66, big_endian=True, bits=16, samples=2)
    )
    assert d == {"format": "tiff-be", "width": 77, "height": 66,
                 "color_depth": 32}
    # a VP8X container whose image chunk follows metadata chunks still
    # parses: prepend an ICCP chunk the walk must skip (word-aligned)
    import struct

    vp8x = build_webp_header(33, 21, variant="vp8x")
    iccp = b"ICCP" + struct.pack("<I", 3) + b"abc\x00"
    body = b"WEBP" + iccp + vp8x[12:]
    wrapped = b"RIFF" + struct.pack("<I", len(body)) + body
    d = parse_image_header(wrapped)
    assert (d["format"], d["width"], d["height"]) == ("webp-vp8x", 33, 21)


def test_parse_web_image_header_damage_tolerance():
    """Bytes-fuzz over the GIF/WebP grammars: every truncation and
    single-byte corruption parses or raises the documented pair —
    never an unexpected exception class."""
    import random

    import pytest

    from webarchive_indexing_spark.operators.multimodal import (
        build_gif_header,
        build_webp_header,
        parse_image_header,
    )

    rng = random.Random(7)
    samples = [
        build_gif_header(9, 4, version=b"87a", palette_bits=3),
        build_gif_header(100, 50, palette_bits=8),
        build_webp_header(12, 34, variant="vp8x", alpha=True),
        build_webp_header(12, 34, variant="vp8l", alpha=True),
        build_webp_header(12, 34, variant="vp8"),
    ]
    from webarchive_indexing_spark.operators.multimodal import (
        build_tiff_header,
    )

    samples.append(build_tiff_header(12, 34, samples=3))
    samples.append(build_tiff_header(12, 34, big_endian=True, bits=16))
    for b in samples:
        for cut in range(len(b)):
            try:
                parse_image_header(b[:cut])
            except (ValueError, NotImplementedError):
                pass
        for _ in range(200):
            pos = rng.randrange(len(b))
            mut = b[:pos] + bytes([rng.randrange(256)]) + b[pos + 1 :]
            try:
                parse_image_header(mut)
            except (ValueError, NotImplementedError):
                pass
    # bad version bytes and an imageless RIFF quarantine too
    with pytest.raises(ValueError):
        parse_image_header(b"GIF99a" + bytes(10))
    import struct

    empty = b"RIFF" + struct.pack("<I", 4) + b"WEBP"
    with pytest.raises(ValueError):
        parse_image_header(empty)


def test_web_image_builders_roundtrip_property():
    """Hypothesis: any in-range (w, h, depth knobs) round-trips
    exactly through build → parse for every web-format builder."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from webarchive_indexing_spark.operators.multimodal import (
        build_gif_header,
        build_tiff_header,
        build_webp_header,
        parse_image_header,
    )

    @settings(max_examples=120, deadline=None)
    @given(
        w=st.integers(1, 16383), h=st.integers(1, 16383),
        pal=st.integers(1, 8), be=st.booleans(),
        bits=st.sampled_from([1, 8, 16, 32]),
        samp=st.integers(1, 4), alpha=st.booleans(),
        variant=st.sampled_from(["vp8x", "vp8l", "vp8"]),
    )
    def check(w, h, pal, be, bits, samp, alpha, variant):
        d = parse_image_header(build_gif_header(
            min(w, 65535), min(h, 65535), palette_bits=pal))
        assert (d["width"], d["height"], d["color_depth"]) == (
            min(w, 65535), min(h, 65535), pal)
        d = parse_image_header(build_tiff_header(
            w, h, big_endian=be, bits=bits, samples=samp))
        assert (d["width"], d["height"], d["color_depth"]) == (
            w, h, bits * samp)
        d = parse_image_header(build_webp_header(
            w, h, variant=variant, alpha=alpha))
        assert (d["width"], d["height"]) == (w, h)
        if variant == "vp8":
            assert d["color_depth"] == 24
        else:
            assert d["color_depth"] == (32 if alpha else 24)

    check()
