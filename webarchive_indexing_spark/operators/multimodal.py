"""Multimodal column plumbing (SURVEY.md §2.11 L6).

Images / audio / video ride through the engine as opaque ``binary``
columns plus a typed metadata struct; decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` stages so
the bytes never round-trip row-at-a-time.

Decoding status (round 5): ``decode_image_real`` REALLY decodes the
two dependency-free raster formats — PPM (P3 ASCII / P6 binary) and
uncompressed 24-bpp BMP (bottom-up rows, 4-byte row padding, BGR
channel order) — header parse + per-channel pixel means in pure
Python/numpy, no PIL.  ``NotImplementedError`` remains ONLY for
formats that genuinely need an external codec (JPEG/PNG/video).
``decode_batches`` keeps the format-agnostic pseudo-feature path for
opaque payloads.  Everything Spark-side — schema, batching, partition
sizing — is real and tested either way.
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
    """Decode a raster image payload to
    ``{format, width, height, mean_r, mean_g, mean_b}``.

    Pure-Python decoders for the two formats whose specs need no
    external codec: PPM (netpbm P3/P6) and uncompressed 24-bpp BMP.
    The ``NotImplementedError`` seam now covers ONLY genuinely
    codec-requiring formats (JPEG/PNG/video — PIL/ffmpeg plug in
    here).  Means are ``int_sum / count`` — one exact integer sum and
    one IEEE division, so they are bit-reproducible by any engine."""
    b = bytes(payload)
    if b[:2] in (b"P6", b"P3"):
        return _decode_ppm(b)
    if b[:2] == b"BM":
        return _decode_bmp(b)
    raise NotImplementedError(
        "only PPM (P3/P6) and 24-bpp BMP decode natively; "
        "JPEG/PNG/video require PIL/ffmpeg — not available here"
    )


def _ppm_tokens(b: bytes):
    """netpbm header tokenizer: whitespace-separated tokens, ``#``
    comments running to end-of-line.  Yields (token, end_offset)."""
    i = 0
    while i < len(b):
        c = b[i : i + 1]
        if c == b"#":
            while i < len(b) and b[i : i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(b) and not b[j : j + 1].isspace() and b[j : j + 1] != b"#":
                j += 1
            yield b[i:j], j
            i = j


def _rgb_means(fmt: str, w: int, h: int, rgb: list[int]) -> dict:
    n = w * h
    if len(rgb) != 3 * n:
        raise ValueError(f"{fmt}: expected {3 * n} samples, got {len(rgb)}")
    return {
        "format": fmt,
        "width": w,
        "height": h,
        "mean_r": sum(rgb[0::3]) / n,
        "mean_g": sum(rgb[1::3]) / n,
        "mean_b": sum(rgb[2::3]) / n,
    }


def _decode_ppm(b: bytes) -> dict:
    toks = _ppm_tokens(b)
    magic, _ = next(toks)
    fields = []
    end = 0
    for tok, end in toks:
        fields.append(int(tok))
        if len(fields) == 3:
            break
    if len(fields) < 3:
        raise ValueError("ppm: truncated header")
    w, h, maxval = fields
    if w <= 0 or h <= 0 or not (0 < maxval < 256):
        raise ValueError(f"ppm: unsupported dims/maxval {w}x{h}/{maxval}")
    if magic == b"P6":
        # exactly ONE whitespace byte separates maxval from the raster
        raster = b[end + 1 : end + 1 + 3 * w * h]
        return _rgb_means("ppm", w, h, list(raster))
    vals = [int(tok) for tok, _ in _ppm_tokens(b[end:])]
    return _rgb_means("ppm", w, h, vals)


def _decode_bmp(b: bytes) -> dict:
    import struct

    if len(b) < 54:
        raise ValueError("bmp: truncated header")
    pix_off = struct.unpack_from("<I", b, 10)[0]
    w, h = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    compression = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"bmp: only uncompressed 24-bpp supported (got {bpp}-bpp, "
            f"compression={compression})"
        )
    top_down = h < 0
    h = abs(h)
    row_bytes = ((w * 3 + 3) // 4) * 4  # rows pad to 4-byte boundaries
    rgb: list[int] = []
    for row in range(h):
        src_row = row if top_down else h - 1 - row
        off = pix_off + src_row * row_bytes
        line = b[off : off + w * 3]
        if len(line) < w * 3:
            raise ValueError("bmp: truncated raster")
        for x in range(w):
            bl, g, r = line[3 * x : 3 * x + 3]  # BGR on disk
            rgb.extend((r, g, bl))
    return _rgb_means("bmp", w, h, rgb)


#: every SOFn marker that carries frame dimensions (C4=DHT, C8=JPG
#: extension, CC=DAC are NOT frame headers and must be skipped).
_JPEG_SOF_MARKERS = frozenset(
    range(0xC0, 0xD0)
) - {0xC4, 0xC8, 0xCC}

#: PNG color-type → sample channels (IHDR byte 25).
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def parse_image_header(payload) -> dict:
    """Image dimensions/type from HEADER bytes alone — no codec.

    Real corpora are ~all JPEG/PNG, whose RASTERS need an external
    codec (the documented ``decode_image_real`` seam) — but their
    dimensions sit in plain header structures, and dims-stats
    (aspect/size filtering, thumbnail routing, resolution curricula)
    is the multimodal-curation primitive.  Parsed here, pure Python:

    * JPEG — walk the marker segments from SOI to the first SOFn
      frame header (baseline SOF0 through SOF15, skipping
      DHT/JPG/DAC which share the Cx range); height/width/precision/
      component-count are its fixed fields.  Progressive (SOF2)
      parses identically.
    * PNG — IHDR is REQUIRED to be the first chunk after the 8-byte
      signature: width/height big-endian at fixed offsets, bit depth
      × color-type channels = pixel depth.
    * PPM / BMP — header tokens / BITMAPINFOHEADER fields (the two
      formats the full raster decoder already handles).

    Returns ``{format, width, height, color_depth}``; raises
    ValueError on damaged headers and NotImplementedError on unknown
    magics — callers map both to 'unsupported' per row (damage
    tolerance at 100 TB is per-row, never per-task)."""
    import struct

    b = bytes(payload)
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        if len(b) < 26 or b[12:16] != b"IHDR":
            raise ValueError("png: truncated or IHDR not first")
        w, h = struct.unpack_from(">II", b, 16)
        bit_depth, color_type = b[24], b[25]
        ch = _PNG_CHANNELS.get(color_type)
        if ch is None or w <= 0 or h <= 0:
            raise ValueError(f"png: bad IHDR ({w}x{h}, ct={color_type})")
        return {
            "format": "png",
            "width": w,
            "height": h,
            "color_depth": bit_depth * ch,
        }
    if b[:2] == b"\xff\xd8":
        i = 2
        while i + 1 < len(b):
            if b[i] != 0xFF:
                raise ValueError(f"jpeg: expected marker at {i}")
            marker = b[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers, no length field
                continue
            if marker in (0xD9, 0xDA):  # EOI / start-of-scan: no SOF seen
                break
            if i + 4 > len(b):
                raise ValueError("jpeg: truncated segment header")
            seg_len = struct.unpack_from(">H", b, i + 2)[0]
            if marker in _JPEG_SOF_MARKERS:
                if i + 10 > len(b):
                    raise ValueError("jpeg: truncated SOF")
                precision = b[i + 4]
                h_, w_ = struct.unpack_from(">HH", b, i + 5)
                ncomp = b[i + 9]
                if w_ <= 0 or h_ <= 0 or ncomp == 0:
                    raise ValueError(f"jpeg: bad SOF dims {w_}x{h_}")
                return {
                    "format": (
                        "jpeg-progressive" if marker == 0xC2 else "jpeg"
                    ),
                    "width": w_,
                    "height": h_,
                    "color_depth": precision * ncomp,
                }
            i += 2 + seg_len
        raise ValueError("jpeg: no SOF frame header found")
    if b[:2] in (b"P6", b"P3"):
        fields = []
        for tok, _ in _ppm_tokens(b[2:]):
            fields.append(int(tok))
            if len(fields) == 2:
                break
        if len(fields) < 2 or fields[0] <= 0 or fields[1] <= 0:
            raise ValueError("ppm: truncated header")
        return {
            "format": "ppm",
            "width": fields[0],
            "height": fields[1],
            "color_depth": 24,
        }
    if b[:2] == b"BM":
        if len(b) < 30:
            raise ValueError("bmp: truncated header")
        w, h = struct.unpack_from("<ii", b, 18)
        bpp = struct.unpack_from("<H", b, 28)[0]
        if w <= 0 or h == 0:
            raise ValueError(f"bmp: bad dims {w}x{h}")
        return {
            "format": "bmp",
            "width": w,
            "height": abs(h),
            "color_depth": bpp,
        }
    if b[:3] == b"GIF":
        # GIF87a/89a: version bytes then the Logical Screen Descriptor
        # (LE16 width/height, packed byte whose low 3 bits give the
        # global-color-table size as 2^(n+1) entries → n+1 palette
        # index bits, the honest "depth" of a palette format)
        if b[3:6] not in (b"87a", b"89a"):
            raise ValueError(f"gif: unknown version {b[3:6]!r}")
        if len(b) < 11:
            raise ValueError("gif: truncated screen descriptor")
        w, h = struct.unpack_from("<HH", b, 6)
        if w <= 0 or h <= 0:
            raise ValueError(f"gif: bad dims {w}x{h}")
        packed = b[10]
        return {
            "format": "gif" + b[3:6].decode("ascii"),
            "width": w,
            "height": h,
            "color_depth": (packed & 0x07) + 1,
        }
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        # WebP: walk the RIFF chunk list to the first image-bearing
        # chunk.  VP8X (extended) carries 24-bit canvas dims minus
        # one + an alpha flag; VP8 (lossy) a keyframe whose start
        # code precedes 14-bit LE dims; VP8L (lossless) a 5-byte
        # signature+bitfield packing width-1/height-1/alpha.
        i = 12
        while i + 8 <= len(b):
            fourcc = b[i : i + 4]
            size = struct.unpack_from("<I", b, i + 4)[0]
            p = i + 8
            if fourcc == b"VP8X":
                if p + 10 > len(b):
                    raise ValueError("webp: truncated VP8X")
                flags = b[p]
                w = int.from_bytes(b[p + 4 : p + 7], "little") + 1
                h = int.from_bytes(b[p + 7 : p + 10], "little") + 1
                return {
                    "format": "webp-vp8x",
                    "width": w,
                    "height": h,
                    "color_depth": 32 if flags & 0x10 else 24,
                }
            if fourcc == b"VP8 ":
                if p + 10 > len(b):
                    raise ValueError("webp: truncated VP8 frame")
                if b[p + 3 : p + 6] != b"\x9d\x01\x2a":
                    raise ValueError("webp: VP8 start code missing")
                w = struct.unpack_from("<H", b, p + 6)[0] & 0x3FFF
                h = struct.unpack_from("<H", b, p + 8)[0] & 0x3FFF
                if w <= 0 or h <= 0:
                    raise ValueError(f"webp: bad VP8 dims {w}x{h}")
                return {
                    "format": "webp-vp8",
                    "width": w,
                    "height": h,
                    "color_depth": 24,
                }
            if fourcc == b"VP8L":
                if p + 5 > len(b):
                    raise ValueError("webp: truncated VP8L")
                if b[p] != 0x2F:
                    raise ValueError("webp: VP8L signature missing")
                bits = struct.unpack_from("<I", b, p + 1)[0]
                w = (bits & 0x3FFF) + 1
                h = ((bits >> 14) & 0x3FFF) + 1
                alpha = (bits >> 28) & 1
                return {
                    "format": "webp-vp8l",
                    "width": w,
                    "height": h,
                    "color_depth": 32 if alpha else 24,
                }
            i = p + size + (size & 1)  # RIFF chunks are word-aligned
        raise ValueError("webp: no image chunk found")
    if b[:4] in (b"II\x2a\x00", b"MM\x00\x2a"):
        # TIFF: byte-order mark + magic 42, then a chain of IFDs whose
        # 12-byte entries carry (tag, type, count, value).  Width=256,
        # Length=257, BitsPerSample=258, SamplesPerPixel=277; SHORT(3)
        # and LONG(4) values of count 1 are inline in the value field.
        end = "<" if b[:2] == b"II" else ">"
        if len(b) < 8:
            raise ValueError("tiff: truncated header")
        ifd_off = struct.unpack_from(f"{end}I", b, 4)[0]
        if ifd_off + 2 > len(b):
            raise ValueError("tiff: IFD offset out of range")
        n = struct.unpack_from(f"{end}H", b, ifd_off)[0]
        if ifd_off + 2 + 12 * n > len(b):
            raise ValueError("tiff: truncated IFD")
        w = h = None
        bits, samples = 8, 1
        for e in range(n):
            off = ifd_off + 2 + 12 * e
            tag, typ, cnt = struct.unpack_from(f"{end}HHI", b, off)
            if typ == 3:  # SHORT — inline, left-justified per order
                val = struct.unpack_from(f"{end}H", b, off + 8)[0]
            elif typ == 4:  # LONG
                val = struct.unpack_from(f"{end}I", b, off + 8)[0]
            else:
                continue
            if cnt != 1:
                continue  # multi-valued (offset-indirect) — skip
            if tag == 256:
                w = val
            elif tag == 257:
                h = val
            elif tag == 258:
                bits = val
            elif tag == 277:
                samples = val
        if not w or not h:
            raise ValueError("tiff: IFD carries no dimensions")
        return {
            "format": "tiff-le" if end == "<" else "tiff-be",
            "width": w,
            "height": h,
            "color_depth": bits * samples,
        }
    raise NotImplementedError("unknown image magic")


def build_png_header(w: int, h: int, *, bit_depth: int = 8,
                     color_type: int = 2) -> bytes:
    """Minimal structurally-valid PNG (signature + IHDR + IEND, real
    CRCs, no raster) — fixture for the header parser."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"IEND", b"")
    )


def build_jpeg_header(w: int, h: int, *, progressive: bool = False,
                      ncomp: int = 3) -> bytes:
    """Minimal JPEG byte stream (SOI + JFIF APP0 + SOFn + EOI) — the
    marker walk the header parser performs is exactly what a real
    camera file requires, including skipping the APP0 segment."""
    import struct

    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" + struct.pack(
        ">HH", 72, 72
    ) + b"\x00\x00"
    sof_marker = b"\xff\xc2" if progressive else b"\xff\xc0"
    comps = b"".join(
        bytes((cid + 1, 0x11, 0)) for cid in range(ncomp)
    )
    sof = sof_marker + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp) + comps
    return b"\xff\xd8" + app0 + sof + b"\xff\xd9"


def build_gif_header(
    w: int, h: int, *, version: bytes = b"89a", palette_bits: int = 8
) -> bytes:
    """Minimal structurally-valid GIF (header + Logical Screen
    Descriptor + global color table + trailer).  ``palette_bits``
    (1..8) sets the GCT size field — the parser reports it back as
    color_depth, so fixtures exercise the packed-byte decode."""
    import struct

    if not 1 <= palette_bits <= 8:
        raise ValueError("gif: palette_bits must be 1..8")
    n = palette_bits - 1
    packed = 0x80 | (n << 4) | n  # GCT present, color res = GCT size
    lsd = struct.pack("<HH", w, h) + bytes((packed, 0, 0))
    gct = bytes(3 * (1 << palette_bits))
    return b"GIF" + version + lsd + gct + b"\x3b"


def build_webp_header(
    w: int, h: int, *, variant: str = "vp8x", alpha: bool = False
) -> bytes:
    """Minimal WebP container for each of the three image-bearing
    chunk grammars the parser walks: ``vp8x`` (extended, 24-bit
    canvas dims), ``vp8`` (lossy keyframe start code + 14-bit dims),
    ``vp8l`` (lossless signature + packed bitfield)."""
    import struct

    if variant == "vp8x":
        flags = 0x10 if alpha else 0
        payload = (
            bytes((flags, 0, 0, 0))
            + (w - 1).to_bytes(3, "little")
            + (h - 1).to_bytes(3, "little")
        )
        chunk = b"VP8X" + struct.pack("<I", len(payload)) + payload
    elif variant == "vp8l":
        bits = (w - 1) | ((h - 1) << 14) | ((1 if alpha else 0) << 28)
        payload = b"\x2f" + struct.pack("<I", bits)
        chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    elif variant == "vp8":
        payload = b"\x00\x00\x00\x9d\x01\x2a" + struct.pack("<HH", w, h)
        chunk = b"VP8 " + struct.pack("<I", len(payload)) + payload
    else:
        raise ValueError(f"webp: unknown variant {variant}")
    if len(chunk) & 1:
        chunk += b"\x00"
    body = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(body)) + body


def build_tiff_header(
    w: int, h: int, *, big_endian: bool = False, bits: int = 8,
    samples: int = 1,
) -> bytes:
    """Minimal single-IFD TIFF: byte-order mark, magic 42, one IFD
    with ImageWidth/ImageLength (LONG), BitsPerSample (SHORT, count
    1) and SamplesPerPixel (SHORT) — both byte orders, so the parser's
    endian dispatch is exercised."""
    import struct

    end = ">" if big_endian else "<"

    def entry(tag: int, typ: int, val: int) -> bytes:
        head = struct.pack(f"{end}HHI", tag, typ, 1)
        if typ == 3:  # SHORT is left-justified in the 4-byte field
            v = struct.pack(f"{end}H", val) + b"\x00\x00"
        else:
            v = struct.pack(f"{end}I", val)
        return head + v

    entries = [
        entry(256, 4, w),
        entry(257, 4, h),
        entry(258, 3, bits),
        entry(277, 3, samples),
    ]
    ifd = struct.pack(f"{end}H", len(entries)) + b"".join(entries) + b"\x00" * 4
    bom = b"MM\x00\x2a" if big_endian else b"II\x2a\x00"
    return bom + struct.pack(f"{end}I", 8) + ifd


def synthesize_web_image_payloads(docs: DataFrame) -> DataFrame:
    """Deterministic web-format fixtures (round 12 — the formats a
    real WARC media column is full of beyond JPEG/PNG): per doc a
    (3 + id%12)×(2 + id%9) image — GIF87a for id%7==0, GIF89a
    (palette bits 1 + id%8) for 1, WebP VP8X for 2, WebP VP8L for 3,
    WebP lossy VP8 for 4, little-endian TIFF (8-bit × 1 + id%3
    samples) for 5, big-endian TIFF (16-bit × 1 + id%2 samples) for
    6; alpha on the even ids of the VP8X arm and the odd ids of the
    VP8L arm; every id%17==0 payload truncated to 8 bytes (the
    damage arm — parsers must yield 'unsupported', not die).
    Dims/depth are pure arithmetic, so a SQL oracle recomputes them
    without touching binary."""

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h = 3 + i % 12, 2 + i % 9
                arm = i % 7
                if arm == 0:
                    p = build_gif_header(
                        w, h, version=b"87a", palette_bits=1 + i % 8
                    )
                elif arm == 1:
                    p = build_gif_header(
                        w, h, version=b"89a", palette_bits=1 + i % 8
                    )
                elif arm == 2:
                    p = build_webp_header(
                        w, h, variant="vp8x", alpha=i % 2 == 0
                    )
                elif arm == 3:
                    p = build_webp_header(
                        w, h, variant="vp8l", alpha=i % 2 == 1
                    )
                elif arm == 4:
                    p = build_webp_header(w, h, variant="vp8")
                elif arm == 5:
                    p = build_tiff_header(w, h, samples=1 + i % 3)
                else:
                    p = build_tiff_header(
                        w, h, big_endian=True, bits=16, samples=1 + i % 2
                    )
                if i % 17 == 0:
                    p = p[:8]
                ids.append(i)
                payloads.append(p)
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(fn, IMAGE_FIXTURE_SCHEMA)


def synthesize_header_payloads(docs: DataFrame) -> DataFrame:
    """Deterministic codec-format fixtures for the header parser: per
    doc a (2 + id%13)×(1 + id%11) image — PNG RGBA for id%4==0, JPEG
    baseline RGB for 1, JPEG progressive grayscale for 2, PPM P6 for
    3 — dims and depth pure arithmetic, so a SQL oracle recomputes
    them without touching binary."""

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h = 2 + i % 13, 1 + i % 11
                arm = i % 4
                if arm == 0:
                    p = build_png_header(w, h, color_type=6)  # RGBA: 32
                elif arm == 1:
                    p = build_jpeg_header(w, h)  # 3×8: 24
                elif arm == 2:
                    p = build_jpeg_header(w, h, progressive=True, ncomp=1)
                else:
                    p = build_ppm(w, h, [0] * (3 * w * h))
                ids.append(i)
                payloads.append(p)
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(fn, IMAGE_FIXTURE_SCHEMA)


IMAGE_DIMS_SCHEMA = (
    "doc_id bigint, format string, width int, height int, color_depth int"
)


def image_dims(df: DataFrame) -> DataFrame:
    """Header-only dims/type extraction over Arrow batches — the
    cheap full-corpus pass (bytes-in-buffer, no codec, no raster
    materialization) that feeds size/aspect curation filters.
    Unparseable payloads become ``format='unsupported'`` rows."""

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd
        from struct import error as struct_error

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    d = parse_image_header(bytes(payload))
                except (NotImplementedError, ValueError, struct_error):
                    d = {
                        "format": "unsupported",
                        "width": None,
                        "height": None,
                        "color_depth": None,
                    }
                rows.append({"doc_id": doc_id, **d})
            yield pd.DataFrame(rows)

    return df.mapInPandas(fn, IMAGE_DIMS_SCHEMA)


def build_ppm(w: int, h: int, rgb: list[int]) -> bytes:
    """Encode an RGB sample list as binary PPM (P6) — fixture builder
    shared by tests and the oracle-checked decode query."""
    assert len(rgb) == 3 * w * h
    return f"P6\n{w} {h}\n255\n".encode("ascii") + bytes(rgb)


def build_bmp(w: int, h: int, rgb: list[int]) -> bytes:
    """Encode an RGB sample list as an uncompressed bottom-up 24-bpp
    BMP, including the 4-byte row padding the decoder must skip."""
    import struct

    assert len(rgb) == 3 * w * h
    row_bytes = ((w * 3 + 3) // 4) * 4
    raster = bytearray()
    for row in range(h - 1, -1, -1):  # bottom-up
        line = bytearray()
        for x in range(w):
            r, g, bl = rgb[3 * (row * w + x) : 3 * (row * w + x) + 3]
            line += bytes((bl, g, r))  # BGR on disk
        line += b"\x00" * (row_bytes - len(line))
        raster += line
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
    return bytes(header) + bytes(raster)


IMAGE_FIXTURE_SCHEMA = "doc_id bigint, payload binary"


def synthesize_image_payloads(docs: DataFrame) -> DataFrame:
    """Deterministic image fixtures: per doc, a (4 + id%5)×(3 + id%4)
    image whose sample ``i`` is ``(doc_id*7 + i*13) % 256``, encoded
    PPM for even ids and BMP for odd — pure arithmetic, so a SQL
    oracle can recompute every decoded statistic without touching
    binary.  Arrow-batched like every payload stage."""

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w, h = 4 + i % 5, 3 + i % 4
                rgb = [(i * 7 + j * 13) % 256 for j in range(3 * w * h)]
                payloads.append(
                    build_ppm(w, h, rgb) if i % 2 == 0 else build_bmp(w, h, rgb)
                )
                ids.append(i)
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(fn, IMAGE_FIXTURE_SCHEMA)


DECODE_REAL_SCHEMA = (
    "doc_id bigint, format string, width int, height int, "
    "mean_r double, mean_g double, mean_b double"
)


def decode_images(df: DataFrame) -> DataFrame:
    """The REAL decode stage: Arrow-batched ``mapInPandas`` over
    ``(doc_id, payload)`` calling ``decode_image_real`` per payload.
    Decode failures surface as ``format='unsupported'`` with NULL
    stats rather than killing the task — at 100 TB a crawl's media
    column always contains undecodable members, and damage tolerance
    must be per-row."""

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    d = decode_image_real(bytes(payload))
                except (NotImplementedError, ValueError):
                    d = {
                        "format": "unsupported",
                        "width": None,
                        "height": None,
                        "mean_r": None,
                        "mean_g": None,
                        "mean_b": None,
                    }
                rows.append({"doc_id": doc_id, **d})
            yield pd.DataFrame(rows)

    return df.mapInPandas(fn, DECODE_REAL_SCHEMA)


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


# ---------------------------------------------------------------------------
# audio headers (round 10 — the image_dims analogue for the audio column)
# ---------------------------------------------------------------------------

#: WAVE fmt-tag → name for the codec-free metadata subset (the PAYLOAD
#: of compressed tags still needs a codec; their headers do not).
_WAV_FORMATS = {1: "pcm", 3: "float", 6: "alaw", 7: "mulaw"}


def parse_audio_header(payload) -> dict:
    """Audio stream metadata from HEADER bytes alone — no codec, the
    ``parse_image_header`` discipline for the audio column: duration/
    sample-rate/channel curation filters (speech-data pipelines gate
    on exactly these) need only the container header, never a PCM
    decode.

    * WAV/RIFF — walk the chunk list: ``fmt `` carries format tag,
      channels, sample rate, block align, bits; ``data``'s size /
      block align = frame count.  Chunks are word-aligned (odd sizes
      pad), and both chunks are required.
    * FLAC — the STREAMINFO block is REQUIRED to be first: sample
      rate (20 bits), channels-1 (3), bits-1 (5), total samples (36)
      packed big-endian at fixed offsets.

    Returns ``{format, channels, sample_rate, bits, n_frames,
    duration_ms}`` (duration = integer ms floor — oracle-exact);
    raises ValueError on damaged headers and NotImplementedError on
    unknown magics/format tags — callers map both to 'unsupported'
    per row (per-row damage tolerance, never task death)."""
    import struct

    b = bytes(payload)
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        i = 12
        fmt = None
        data_size = None
        while i + 8 <= len(b):
            tag = b[i : i + 4]
            size = struct.unpack_from("<I", b, i + 4)[0]
            if tag == b"fmt ":
                if size < 16 or i + 8 + 16 > len(b):
                    raise ValueError("wav: truncated fmt chunk")
                fmt = struct.unpack_from("<HHIIHH", b, i + 8)
            elif tag == b"data":
                data_size = size
            i += 8 + size + (size & 1)  # RIFF chunks are word-aligned
        if fmt is None or data_size is None:
            raise ValueError("wav: missing fmt/data chunk")
        tag_, ch, rate, _byte_rate, block, bits = fmt
        if ch == 0 or rate == 0 or block == 0:
            raise ValueError("wav: zero channels/rate/block")
        name = _WAV_FORMATS.get(tag_)
        if name is None:
            raise NotImplementedError(f"wav format tag {tag_}")
        frames = data_size // block
        return {
            "format": f"wav-{name}",
            "channels": ch,
            "sample_rate": rate,
            "bits": bits,
            "n_frames": frames,
            "duration_ms": frames * 1000 // rate,
        }
    if b[:4] == b"fLaC":
        if len(b) < 8:
            raise ValueError("flac: truncated")
        if (b[4] & 0x7F) != 0:
            raise ValueError("flac: STREAMINFO not first")
        size = int.from_bytes(b[5:8], "big")
        if size < 34 or len(b) < 8 + 34:
            raise ValueError("flac: truncated STREAMINFO")
        packed = int.from_bytes(b[18:26], "big")
        rate = packed >> 44
        ch = ((packed >> 41) & 0x7) + 1
        bits = ((packed >> 36) & 0x1F) + 1
        total = packed & ((1 << 36) - 1)
        if rate == 0:
            raise ValueError("flac: zero sample rate")
        return {
            "format": "flac",
            "channels": ch,
            "sample_rate": rate,
            "bits": bits,
            "n_frames": total,
            "duration_ms": total * 1000 // rate,
        }
    raise NotImplementedError("unknown audio magic")


def build_wav(
    channels: int, rate: int, bits: int, n_frames: int, *, fmt_tag: int = 1
) -> bytes:
    """Structurally valid WAV (RIFF + fmt + zeroed data) — fixture for
    the header parser; real files parse identically."""
    import struct

    block = channels * (bits // 8)
    data = b"\x00" * (n_frames * block)
    fmt = struct.pack("<HHIIHH", fmt_tag, channels, rate, rate * block, block, bits)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def build_flac_header(channels: int, rate: int, bits: int, total: int) -> bytes:
    """Minimal FLAC (signature + last-block STREAMINFO, no frames)."""
    import struct

    head = struct.pack(">HH", 4096, 4096) + b"\x00" * 6
    packed = (rate << 44) | ((channels - 1) << 41) | ((bits - 1) << 36) | total
    body = head + packed.to_bytes(8, "big") + b"\x00" * 16  # + raster md5
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


def synthesize_audio_payloads(docs: DataFrame) -> DataFrame:
    """Deterministic audio fixtures: per doc, arm ``id%3`` — 0 = WAV
    PCM, 1 = FLAC, 2 = a corrupt RIFF (parses to 'unsupported', so the
    damage path is part of the ORACLE, not just a fuzz test).
    channels/rate/bits/frames are pure arithmetic (see the query's SQL
    twin), so duration recomputes relationally."""

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        rates = [8000, 16000, 22050, 44100]
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                ch = 1 + i % 2
                rate = rates[i % 4]
                bits = 8 * (1 + (i % 7) % 3)
                frames = 1 + i % 500
                arm = i % 3
                if arm == 0:
                    p = build_wav(ch, rate, bits, frames)
                elif arm == 1:
                    p = build_flac_header(ch, rate, bits, frames)
                else:
                    p = b"RIFF\x00\x00\x00\x00JUNK" + bytes(4)
                ids.append(i)
                payloads.append(p)
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(fn, IMAGE_FIXTURE_SCHEMA)


AUDIO_META_SCHEMA = (
    "doc_id bigint, format string, channels int, sample_rate int, "
    "bits int, n_frames bigint, duration_ms bigint"
)


def audio_meta(df: DataFrame) -> DataFrame:
    """Header-only audio metadata over Arrow batches — the cheap
    full-corpus pass feeding duration/rate/channel curation filters.
    Unparseable payloads become ``format='unsupported'`` rows."""

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd
        from struct import error as struct_error

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    d = parse_audio_header(bytes(payload))
                except (NotImplementedError, ValueError, struct_error):
                    d = {
                        "format": "unsupported",
                        "channels": None,
                        "sample_rate": None,
                        "bits": None,
                        "n_frames": None,
                        "duration_ms": None,
                    }
                rows.append({"doc_id": doc_id, **d})
            yield pd.DataFrame(rows)

    return df.mapInPandas(fn, AUDIO_META_SCHEMA)


#: ISO-BMFF top-level box types that identify an MP4 family file when
#: the buffer doesn't lead with ftyp (fragmented/raw captures).
_MP4_TOP_BOXES = frozenset(
    (b"ftyp", b"moov", b"mdat", b"free", b"skip", b"wide", b"moof", b"styp")
)

#: EBML element ids on the path to duration + dims (matroska.org spec;
#: ids are stored WITH their length-marker bit, matched verbatim).
_EBML_MAGIC = b"\x1a\x45\xdf\xa3"
_MKV_SEGMENT = 0x18538067
_MKV_INFO = 0x1549A966
_MKV_TIMESTAMP_SCALE = 0x2AD7B1
_MKV_DURATION = 0x4489
_MKV_TRACKS = 0x1654AE6B
_MKV_TRACK_ENTRY = 0xAE
_MKV_VIDEO = 0xE0
_MKV_PIXEL_WIDTH = 0xB0
_MKV_PIXEL_HEIGHT = 0xBA


def _mp4_boxes(b: bytes, lo: int, hi: int):
    """Yield ``(type, body_lo, body_hi)`` for the ISO-BMFF boxes in
    ``b[lo:hi]``, handling 64-bit largesize (size==1) and to-end-of-
    enclosure (size==0); raises ValueError on truncated/overflowing
    declarations — per-row damage, mapped to 'unsupported' upstream."""
    import struct

    i = lo
    while i < hi:
        if i + 8 > hi:
            raise ValueError("mp4: truncated box header")
        size = struct.unpack_from(">I", b, i)[0]
        btype = b[i + 4 : i + 8]
        body = i + 8
        if size == 1:
            if i + 16 > hi:
                raise ValueError("mp4: truncated largesize")
            size = struct.unpack_from(">Q", b, i + 8)[0]
            body = i + 16
        elif size == 0:
            size = hi - i
        if size < body - i or i + size > hi:
            raise ValueError("mp4: box size overflows enclosure")
        yield btype, body, i + size
        i += size


def _parse_mp4(b: bytes) -> dict:
    """moov → mvhd (timescale + duration, v0/v1) and the first trak →
    tkhd carrying nonzero 16.16 presentation dims."""
    import struct

    timescale = duration = None
    width = height = None
    for btype, lo, hi in _mp4_boxes(b, 0, len(b)):
        if btype != b"moov":
            continue
        for ctype, clo, chi in _mp4_boxes(b, lo, hi):
            if ctype == b"mvhd":
                if clo >= chi:  # empty fullbox: no version byte to read
                    raise ValueError("mp4: truncated mvhd")
                ver = b[clo]
                if ver == 1:
                    if clo + 32 > chi:
                        raise ValueError("mp4: truncated mvhd v1")
                    timescale = struct.unpack_from(">I", b, clo + 20)[0]
                    duration = struct.unpack_from(">Q", b, clo + 24)[0]
                else:
                    if clo + 20 > chi:
                        raise ValueError("mp4: truncated mvhd")
                    timescale = struct.unpack_from(">I", b, clo + 12)[0]
                    duration = struct.unpack_from(">I", b, clo + 16)[0]
            elif ctype == b"trak" and width is None:
                for ttype, tlo, thi in _mp4_boxes(b, clo, chi):
                    if ttype == b"tkhd":
                        # width/height are the LAST 8 bytes of tkhd
                        # either version (16.16 fixed point) — no
                        # version byte needed
                        if thi - 8 < tlo:
                            raise ValueError("mp4: truncated tkhd")
                        w = struct.unpack_from(">I", b, thi - 8)[0] >> 16
                        h = struct.unpack_from(">I", b, thi - 4)[0] >> 16
                        if w and h:
                            width, height = w, h
                if width is None:
                    # zero tkhd presentation dims (common in raw
                    # captures): fall back to the coded dims in the
                    # sample description — trak/mdia/minf/stbl/stsd's
                    # first visual entry (avc1/hvc1/...)
                    wh = _stsd_dims(b, clo, chi)
                    if wh is not None:
                        width, height = wh
    if timescale is None or duration is None:
        raise ValueError("mp4: missing moov/mvhd")
    if timescale == 0:
        raise ValueError("mp4: zero timescale")
    return {
        "format": "mp4",
        "width": width,
        "height": height,
        "timescale": timescale,
        "duration_ms": duration * 1000 // timescale,
    }


#: visual sample-entry types whose VisualSampleEntry layout carries
#: coded width/height at fixed offsets (ISO 14496-12 §12.1.3 — the
#: codec payload differs, the header layout does not).
_MP4_VISUAL_ENTRIES = frozenset(
    (b"avc1", b"avc3", b"hvc1", b"hev1", b"av01", b"vp08", b"vp09",
     b"mp4v", b"encv")
)


def _stsd_dims(b: bytes, trak_lo: int, trak_hi: int) -> tuple[int, int] | None:
    """Coded dims from the trak's sample description: walk
    mdia → minf → stbl → stsd, read the first visual entry's
    VisualSampleEntry width/height (u16 at +32/+34 from the entry
    start: 8 box header + 6 reserved + 2 data-ref-index + 16
    pre_defined/reserved)."""
    import struct

    lo, hi = trak_lo, trak_hi
    for name in (b"mdia", b"minf", b"stbl"):
        found = None
        for btype, clo, chi in _mp4_boxes(b, lo, hi):
            if btype == name:
                found = (clo, chi)
                break
        if found is None:
            return None
        lo, hi = found
    for btype, clo, chi in _mp4_boxes(b, lo, hi):
        if btype != b"stsd":
            continue
        # fullbox version/flags (4) + entry_count (4), then entries
        # laid out as plain boxes
        for etype, elo, ehi in _mp4_boxes(b, clo + 8, chi):
            if etype not in _MP4_VISUAL_ENTRIES:
                continue
            if elo + 28 > ehi:
                raise ValueError("mp4: truncated visual sample entry")
            w = struct.unpack_from(">H", b, elo + 24)[0]
            h = struct.unpack_from(">H", b, elo + 26)[0]
            if w and h:
                return w, h
    return None


def _ebml_vint(b: bytes, i: int, hi: int, *, keep_marker: bool) -> tuple[int, int]:
    """One EBML variable-length integer at ``b[i:]`` — element ids
    keep their length-marker bit (spec: ids match verbatim), sizes
    strip it.  Returns (value, next_offset)."""
    if i >= hi:
        raise ValueError("ebml: truncated vint")
    first = b[i]
    if first == 0:
        raise ValueError("ebml: invalid vint lead byte")
    n = 8 - first.bit_length()  # leading zeros → extra bytes
    if i + 1 + n > hi:
        raise ValueError("ebml: truncated vint body")
    val = first if keep_marker else first & ((1 << (7 - n)) - 1)
    for j in range(1, n + 1):
        val = (val << 8) | b[i + j]
    return val, i + 1 + n


def _ebml_children(b: bytes, lo: int, hi: int):
    """Yield ``(id, body_lo, body_hi)`` for the EBML elements in
    ``b[lo:hi]``; an unknown-size element (all size bits set) extends
    to the end of its enclosure (streamed matroska writes Segment that
    way)."""
    i = lo
    while i < hi:
        eid, i = _ebml_vint(b, i, hi, keep_marker=True)
        first = b[i] if i < hi else 0
        size, i = _ebml_vint(b, i, hi, keep_marker=False)
        n_sz = 8 - first.bit_length()
        if size == (1 << (7 * (n_sz + 1))) - 1:  # all data bits 1
            size = hi - i
        if i + size > hi:
            raise ValueError("ebml: element size overflows enclosure")
        yield eid, i, i + size
        i += size


def _ebml_uint(b: bytes, lo: int, hi: int) -> int:
    return int.from_bytes(b[lo:hi], "big")


def _parse_mkv(b: bytes) -> dict:
    """Segment → Info (TimestampScale ns/unit, default 1e6; Duration
    float units) and Tracks → first TrackEntry/Video PixelWidth/
    PixelHeight."""
    import struct

    scale = 1_000_000
    duration = None
    width = height = None
    for eid, lo, hi in _ebml_children(b, 0, len(b)):
        if eid != _MKV_SEGMENT:
            continue
        for cid, clo, chi in _ebml_children(b, lo, hi):
            if cid == _MKV_INFO:
                for iid, ilo, ihi in _ebml_children(b, clo, chi):
                    if iid == _MKV_TIMESTAMP_SCALE:
                        scale = _ebml_uint(b, ilo, ihi)
                    elif iid == _MKV_DURATION:
                        n = ihi - ilo
                        if n == 8:
                            duration = struct.unpack_from(">d", b, ilo)[0]
                        elif n == 4:
                            duration = struct.unpack_from(">f", b, ilo)[0]
                        else:
                            raise ValueError("mkv: bad Duration width")
            elif cid == _MKV_TRACKS and width is None:
                for tid, tlo, thi in _ebml_children(b, clo, chi):
                    if tid != _MKV_TRACK_ENTRY:
                        continue
                    for vid, vlo, vhi in _ebml_children(b, tlo, thi):
                        if vid != _MKV_VIDEO:
                            continue
                        for pid, plo, phi in _ebml_children(b, vlo, vhi):
                            if pid == _MKV_PIXEL_WIDTH:
                                width = _ebml_uint(b, plo, phi)
                            elif pid == _MKV_PIXEL_HEIGHT:
                                height = _ebml_uint(b, plo, phi)
                    if width is not None:
                        break
    if duration is None:
        raise ValueError("mkv: missing Segment/Info/Duration")
    if scale == 0:
        raise ValueError("mkv: zero TimestampScale")
    return {
        "format": "mkv",
        "width": width,
        "height": height,
        "timescale": scale,
        # Duration × scale = ns; integer-valued doubles divide exactly
        # by the default 1e6 scale, so the floor is oracle-exact
        "duration_ms": int(duration * (scale / 1_000_000)),
    }


def parse_video_header(payload) -> dict:
    """Video container metadata from HEADER bytes alone — no codec,
    the ``parse_audio_header`` discipline for the video column:
    dims/duration curation filters (resolution buckets, clip-length
    gates) need only the container tables, never a frame decode.

    * MP4/ISO-BMFF — box walk (64-bit largesize and to-end sizes
      handled): ``moov/mvhd`` carries timescale + duration (v0 and
      v1 layouts), the first ``trak/tkhd`` with nonzero 16.16 dims
      carries width/height.
    * MKV/EBML — vint walk: Segment → Info (TimestampScale,
      Duration) and Tracks → TrackEntry → Video (PixelWidth/
      PixelHeight); unknown-size Segments (live captures) extend to
      the end of the buffer.

    Returns ``{format, width, height, timescale, duration_ms}``
    (``timescale`` = units/s for MP4, ns/unit for MKV — the
    container's own notion rides through unconverted; duration_ms is
    normalized).  Raises ValueError on damaged headers and
    NotImplementedError on unknown magics — callers map both to
    'unsupported' per row (per-row damage tolerance, never task
    death).  Reference: public ISO 14496-12 box layouts + the
    matroska.org EBML spec; no codec library involved."""
    b = bytes(payload)
    if len(b) >= 8 and b[4:8] in _MP4_TOP_BOXES:
        return _parse_mp4(b)
    if b[:4] == _EBML_MAGIC:
        return _parse_mkv(b)
    raise NotImplementedError("unknown video magic")


def _mp4_box(btype: bytes, body: bytes) -> bytes:
    import struct

    return struct.pack(">I", 8 + len(body)) + btype + body


def build_mp4(
    width: int, height: int, timescale: int, duration: int,
    *, dims_in: str = "tkhd",
) -> bytes:
    """Structurally valid MP4 skeleton (ftyp + moov[mvhd + trak[...]],
    zero media) — fixture for the header parser; real files parse
    identically because only spec'd offsets are read.
    ``dims_in='stsd'`` writes ZERO tkhd presentation dims and carries
    the coded dims in an avc1 VisualSampleEntry instead (the raw-
    capture shape the stsd fallback exists for)."""
    import struct

    matrix = struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    mvhd = _mp4_box(
        b"mvhd",
        struct.pack(">B3x", 0)
        + struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IHH8x", 0x10000, 0x100, 0)
        + matrix
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    tk_w, tk_h = (width, height) if dims_in == "tkhd" else (0, 0)
    tkhd = _mp4_box(
        b"tkhd",
        struct.pack(">B3x", 0)
        + struct.pack(">IIIxxxxI8x", 0, 0, 1, duration)
        + struct.pack(">HHHxx", 0, 0, 0)
        + matrix
        + struct.pack(">II", tk_w << 16, tk_h << 16),
    )
    trak_body = tkhd
    if dims_in == "stsd":
        avc1 = _mp4_box(
            b"avc1",
            b"\x00" * 6 + struct.pack(">H", 1)  # SampleEntry
            + struct.pack(">HH12x", 0, 0)       # pre_defined/reserved
            + struct.pack(">HH", width, height)
            + struct.pack(">IIIH", 0x480000, 0x480000, 0, 1)
            + b"\x00" * 32                       # compressorname
            + struct.pack(">Hh", 24, -1),
        )
        stsd = _mp4_box(
            b"stsd", struct.pack(">B3xI", 0, 1) + avc1
        )
        trak_body += _mp4_box(
            b"mdia", _mp4_box(b"minf", _mp4_box(b"stbl", stsd))
        )
    moov = _mp4_box(b"moov", mvhd + _mp4_box(b"trak", trak_body))
    ftyp = _mp4_box(b"ftyp", b"isom" + b"\x00\x00\x02\x00" + b"isomiso2mp41")
    return ftyp + moov


def _ebml_el(eid: int, body: bytes) -> bytes:
    """One EBML element with a 1-byte size vint (fixture sizes are
    tiny) — or 2-byte when the body crosses 127 bytes."""
    idb = eid.to_bytes((eid.bit_length() + 7) // 8, "big")
    if len(body) < 127:
        return idb + bytes([0x80 | len(body)]) + body
    return idb + bytes([0x40 | (len(body) >> 8), len(body) & 0xFF]) + body


def build_mkv(width: int, height: int, duration_units: float) -> bytes:
    """Minimal matroska: EBML header (DocType) + Segment[Info[
    TimestampScale, Duration], Tracks[TrackEntry[Video[PixelWidth,
    PixelHeight]]]]."""
    import struct

    header = _ebml_el(0x1A45DFA3, _ebml_el(0x4282, b"matroska"))
    info = _ebml_el(
        _MKV_INFO,
        _ebml_el(_MKV_TIMESTAMP_SCALE, (1_000_000).to_bytes(3, "big"))
        + _ebml_el(_MKV_DURATION, struct.pack(">d", duration_units)),
    )
    video = _ebml_el(
        _MKV_VIDEO,
        _ebml_el(_MKV_PIXEL_WIDTH, width.to_bytes(2, "big"))
        + _ebml_el(_MKV_PIXEL_HEIGHT, height.to_bytes(2, "big")),
    )
    tracks = _ebml_el(_MKV_TRACKS, _ebml_el(_MKV_TRACK_ENTRY, video))
    return header + _ebml_el(_MKV_SEGMENT, info + tracks)


def synthesize_video_payloads(docs: DataFrame) -> DataFrame:
    """Deterministic video fixtures: per doc, arm ``id%3`` — 0 = MP4,
    1 = MKV, 2 = a corrupt moov whose declared size overflows the
    buffer (parses to 'unsupported': the damage path is part of the
    ORACLE, not just a fuzz test).  dims/timescale/duration are pure
    arithmetic so the query's SQL twin recomputes them relationally."""

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd

        scales = [600, 1000, 90000, 48000]
        for pdf in batches:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                i = int(doc_id)
                w = 16 * (1 + i % 80)
                h = 16 * (1 + i % 45)
                dur = 1 + i % 100000
                arm = i % 3
                if arm == 0:
                    p = build_mp4(w, h, scales[i % 4], dur)
                elif arm == 1:
                    p = build_mkv(w, h, float(dur))
                else:
                    p = b"\x00\x00\x01\x00moovJU"  # size 256, 10 bytes
                ids.append(i)
                payloads.append(p)
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(fn, IMAGE_FIXTURE_SCHEMA)


VIDEO_META_SCHEMA = (
    "doc_id bigint, format string, width int, height int, "
    "timescale bigint, duration_ms bigint"
)


def video_meta(df: DataFrame) -> DataFrame:
    """Header-only video metadata over Arrow batches — the cheap
    full-corpus pass feeding resolution/duration curation filters.
    Unparseable payloads become ``format='unsupported'`` rows."""

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd
        from struct import error as struct_error

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    d = parse_video_header(bytes(payload))
                except (NotImplementedError, ValueError, struct_error):
                    d = {
                        "format": "unsupported",
                        "width": None,
                        "height": None,
                        "timescale": None,
                        "duration_ms": None,
                    }
                rows.append({"doc_id": doc_id, **d})
            yield pd.DataFrame(rows)

    return df.mapInPandas(fn, VIDEO_META_SCHEMA)


# ---------------------------------------------------------------------------
# WARC → media curation composition (round 12 — the ingest→curation
# seam: media payloads extracted by index_warcs(keep_payload=...)
# run header curation in the SAME pipeline, no re-fetch).
# ---------------------------------------------------------------------------

#: unified media-metadata fields appended to the caller's key columns
#: — the union of the image/audio/video header shapes, NULL where a
#: kind has no such field (an image has no sample_rate).
_MEDIA_FIELDS = (
    "media_kind string, format string, width int, height int, "
    "color_depth int, channels int, sample_rate int, bits int, "
    "n_frames bigint, timescale bigint, duration_ms bigint"
)

_MEDIA_NULLS = {
    "format": "unsupported", "width": None, "height": None,
    "color_depth": None, "channels": None, "sample_rate": None,
    "bits": None, "n_frames": None, "timescale": None,
    "duration_ms": None,
}


def parse_media_header(mime: str, payload) -> dict:
    """Route ONE payload to the image/audio/video header parser by
    its mime prefix and normalize to the unified ``_MEDIA_FIELDS``
    shape.  Raises like the underlying parsers (ValueError /
    NotImplementedError) — callers map to 'unsupported' per row."""
    kind = mime.split("/", 1)[0]
    if kind == "image":
        d = parse_image_header(payload)
    elif kind == "audio":
        d = parse_audio_header(payload)
    elif kind == "video":
        d = parse_video_header(payload)
    else:
        raise NotImplementedError(f"not a media mime: {mime!r}")
    return {**_MEDIA_NULLS, "media_kind": kind, **d}


def media_meta(
    df: DataFrame, keys: tuple[str, ...] = ("urlkey", "timestamp", "url", "mime")
) -> DataFrame:
    """Header curation over an ingest frame that carries payloads —
    the composed extractor for ``index_warcs(keep_payload=...)``
    rows: ONE Arrow-batched pass routes each retained payload to the
    image/audio/video header parser by mime prefix and emits the
    unified metadata shape beside the caller's key columns.

    Rows whose ``payload`` is NULL (mimes outside the ingest
    allowlist) are dropped — they were never retained; damaged or
    unknown-magic payloads become ``format='unsupported'`` rows (the
    per-row damage-tolerance contract of the single-kind extractors).
    Map-side only: payload bytes never cross an exchange, and the
    output carries no payload column — metadata out, bytes dropped,
    which is what lets this run at ingest scale."""
    key_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in df.schema.fields
        if f.name in keys
    )
    out_schema = f"{key_fields}, {_MEDIA_FIELDS}"
    key_list = [k for k in keys if k in df.columns]

    def fn(batches: Iterator) -> Iterator:
        import pandas as pd
        from struct import error as struct_error

        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                payload = pdf["payload"].iloc[i]
                if payload is None:
                    continue
                mime = pdf["mime"].iloc[i] or ""
                try:
                    d = parse_media_header(mime, bytes(payload))
                except (NotImplementedError, ValueError, struct_error):
                    d = {
                        **_MEDIA_NULLS,
                        "media_kind": mime.split("/", 1)[0] or None,
                    }
                rows.append(
                    {**{k: pdf[k].iloc[i] for k in key_list}, **d}
                )
            yield pd.DataFrame(
                rows,
                columns=key_list + [
                    "media_kind", "format", "width", "height",
                    "color_depth", "channels", "sample_rate", "bits",
                    "n_frames", "timescale", "duration_ms",
                ],
            )

    return df.select(*key_list, "payload").mapInPandas(fn, out_schema)
