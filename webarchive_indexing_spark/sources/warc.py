"""WARC ingestion (SURVEY.md §2.1 S1-S3, §3.1).

The reference's IndexWARCJob [U indexwarcsjob.py]: a manifest of WARC
paths fans out to tasks (~2 files each via NLineInputFormat); each
task streams a WARC, parses the gzip members into records, extracts
capture fields, SHA-1s the payload, and emits sorted CDX.

Spark shape: manifest DataFrame → ``repartition`` (task granularity)
→ ``mapPartitions`` parser → typed CDX DataFrame.  The parser is
per-partition imperative code by necessity (WARC is a byte-stream
format, records are produced imperatively — SURVEY.md §1.2); it
yields plain tuples, so everything downstream is DataFrame-land.
The skip-existing probe (S7) is a distributed left-anti join instead
of the reference's per-file S3 HEAD loop.

WARC subset implemented: gzip-member-per-record files; ``response``
``revisit`` ``request`` ``metadata`` record types; HTTP status +
Content-Type extraction; SHA-1 payload digest (hex, upstream uses
base32 — documented divergence).  Enough to index the synthetic
fixtures and any record-per-member WARC.
"""

from __future__ import annotations

import gzip
import hashlib
import io
import zlib
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.surt import surt_urlkey_py
from ..sources.cdx import CDX_SCHEMA

CRLF = b"\r\n"


# ---------------------------------------------------------------------------
# fixture writer (FIXTURES.md B2) — also the documentation of the
# exact subset the parser understands.
# ---------------------------------------------------------------------------


def build_warc_record(
    url: str,
    date_iso: str,
    payload: bytes,
    *,
    rec_type: str = "response",
    mime: str = "text/html",
    status: int = 200,
) -> bytes:
    """One WARC record as an independent gzip member."""
    if rec_type == "response":
        http = (
            f"HTTP/1.1 {status} OK\r\nContent-Type: {mime}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n"
        ).encode() + payload
    else:
        http = payload
    headers = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {rec_type}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date_iso}\r\n"
        f"Content-Length: {len(http)}\r\n"
        f"Content-Type: application/http; msgtype=response\r\n"
    ).encode()
    record = headers + CRLF + http + CRLF + CRLF
    return gzip.compress(record, mtime=0)


def write_mini_warc(path: str, records: list[dict]) -> None:
    """Concatenated gzip members → a standard .warc.gz file."""
    with open(path, "wb") as fh:
        for r in records:
            fh.write(build_warc_record(**r))


# ---------------------------------------------------------------------------
# parser
# ---------------------------------------------------------------------------


def iter_warc_members(data: bytes):
    """Yield (offset, compressed_length, record_bytes) per gzip member.

    Damage-tolerant: a corrupt or truncated member (interrupted
    uploads leave these at the tail of real crawl files) ends THIS
    file's iteration instead of raising through the task — at 100 TB
    one bad WARC must cost its own tail, not the stage."""
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            record = d.decompress(data[pos:])
        except zlib.error:
            return
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:  # no forward progress: garbage between members
            return
        yield pos, consumed, record
        pos += consumed


def _parse_headers(block: bytes) -> dict[str, str]:
    out: dict[str, str] = {}
    for line in block.split(CRLF)[1:]:  # [0] is the version/status line
        if b":" in line:
            k, v = line.split(b":", 1)
            out[k.decode("latin-1").strip().lower()] = v.decode("latin-1").strip()
    return out


def iso_to_ts14(iso: str) -> str:
    try:
        dt = datetime.fromisoformat(iso.replace("Z", "+00:00")).astimezone(timezone.utc)
    except ValueError:  # malformed WARC-Date: epoch sentinel, keep the record
        return "19700101000000"
    return dt.strftime("%Y%m%d%H%M%S")


def parse_warc_file(filename: str, data: bytes):
    """Yield one CDX tuple per indexable record (response/revisit)."""
    short = filename.rsplit("/", 1)[-1]
    for offset, clen, record in iter_warc_members(data):
        head_end = record.find(CRLF + CRLF)
        if head_end < 0:
            continue
        wheaders = _parse_headers(record[:head_end])
        first = record.split(CRLF, 1)[0]
        if not first.startswith(b"WARC/"):
            continue
        rec_type = wheaders.get("warc-type", "")
        if rec_type not in ("response", "revisit"):
            continue
        url = wheaders.get("warc-target-uri", "")
        ts14 = iso_to_ts14(wheaders.get("warc-date", "1970-01-01T00:00:00Z"))
        body = record[head_end + 4 :].rstrip(b"\r\n")

        status, mime, payload = None, None, body
        if body.startswith(b"HTTP/"):
            http_end = body.find(CRLF + CRLF)
            if http_end >= 0:
                status_line = body.split(CRLF, 1)[0].decode("latin-1", "replace")
                parts = status_line.split(" ")
                status = int(parts[1]) if len(parts) > 1 and parts[1].isdigit() else None
                hh = _parse_headers(body[:http_end])
                mime = (hh.get("content-type") or "").split(";")[0].strip() or None
                payload = body[http_end + 4 :]
        digest = hashlib.sha1(payload).hexdigest()
        yield (
            surt_urlkey_py(url),
            ts14,
            url,
            mime if rec_type != "revisit" else "warc/revisit",
            status,
            digest,
            None,
            None,
            clen,
            offset,
            short,
        )


# ---------------------------------------------------------------------------
# pipeline operators
# ---------------------------------------------------------------------------


def index_warcs(
    spark: SparkSession, manifest: DataFrame, *, files_per_task: int = 2
) -> DataFrame:
    """S1+S2: manifest (column ``path``) → typed CDX DataFrame.

    Task granularity mirrors the reference's linespermap=2 [U]; each
    task streams its files (whole-member reads, O(file) memory only
    for the fixture-scale in-memory path — the seam for true streaming
    reads is marked in the partition fn)."""
    n_files = manifest.count()
    n_parts = max(1, n_files // files_per_task)

    def parse(rows):
        for row in rows:
            path = row[0]
            with open(path, "rb") as fh:  # seam: FS/S3 streaming reader
                data = fh.read()
            yield from parse_warc_file(path, data)

    rdd = manifest.select("path").repartition(n_parts).rdd.mapPartitions(parse)
    return spark.createDataFrame(rdd, CDX_SCHEMA)


def skip_existing(manifest: DataFrame, existing: DataFrame) -> DataFrame:
    """S7 --skip-existing [U indexwarcsjob.py ~L75-85]: one left-anti
    join of the manifest against the listing of already-produced
    outputs (vs. the reference's per-file existence probe)."""
    key = F.regexp_replace(
        F.element_at(F.split(F.col("path"), "/"), -1), r"\.warc\.gz$", ""
    )
    mk = manifest.withColumn("__k", key)
    ek = existing.select(
        F.regexp_replace(
            F.element_at(F.split(F.col("path"), "/"), -1), r"\.cdx\.gz$", ""
        ).alias("__k")
    )
    return mk.join(ek, "__k", "left_anti").drop("__k")
