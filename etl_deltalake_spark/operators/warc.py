"""WARC (Web ARChive, ISO 28500) record parsing: the container
format web crawls actually ship (Common Crawl publishes WARC), and
the front door of the crawl→corpus pipeline (SURVEY §2.9
extensions). WARC is length-delimited text headers + raw bodies —
stdlib-parseable, no libraries.

Record grammar parsed here (the public spec's core):
 - version line ``WARC/1.0`` or ``WARC/1.1`` (CRLF),
 - header lines ``Name: value`` until a blank line — names are
   case-insensitive; ``Content-Length`` (required) gives the body
   byte count,
 - the body, then exactly two CRLFs before the next record.

For ``response`` records carrying HTTP (the crawl payload), the
body is itself an HTTP message: status line + headers + blank line
+ entity. ``parse_warc`` splits that too, surfacing status code,
Content-Type, and the entity bytes — so downstream HTML extraction
(operators/html_text.py) and URL canonicalization (operators/
urls.py) consume typed columns, never raw container bytes.

Gzip transport (round 11 — what crawl dumps ACTUALLY ship): real
Common Crawl segments are ``.warc.gz`` with one gzip MEMBER per
record (WARC 1.1 annex D mandates record-level members precisely so
archives stay seekable/splittable at member boundaries).
``parse_warc`` sniffs the gzip magic and demuxes member-at-a-time
through ``zlib.decompressobj`` (``unused_data`` hands each member's
tail to the next — never a whole-file decompress into one buffer
first, so a corrupt later member still yields the earlier records'
bytes before raising). ``encode_warc_gz`` writes the spec layout:
one deterministic (mtime=0) gzip member per record.

Failure posture: a malformed record raises ``WarcError`` from the
pure function; the Spark kernel maps per-PAYLOAD errors into the
``err`` column (one bad archive never kills the job). Execution is
the standard Arrow-batched ``mapInPandas`` fan-out (one row per
record, expansion inside the kernel, zero shuffles). At 100 TB the
per-file payloads arrive via ``binaryFile`` or a paged reader; the
record-walk is strictly sequential within one archive (the format
is length-delimited), so parallelism comes from MANY archives —
exactly how crawl dumps are laid out (thousands of ~1 GB segments).
The per-record gzip members additionally allow offset-indexed random
access (CDX-style) on a real cluster; this reader consumes whole
payloads, so members only need to arrive in order.

No counterpart in the reference (JSON text only, main.py:1-638);
north-star extension per SURVEY §2.9.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator
from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_CRLF = b"\r\n"
_GZIP_MAGIC = b"\x1f\x8b"


class WarcError(ValueError):
    """Malformed WARC payload (bad version line, missing
    Content-Length, truncation, bad record separator...)."""


class WarcRecord(NamedTuple):
    warc_type: str
    target_uri: str | None
    http_status: int | None  # response records only
    content_type: str | None  # the HTTP entity's type, if any
    body: bytes  # HTTP entity for responses, raw body otherwise


def _parse_headers(block: bytes, what: str) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(_CRLF):
        if not line:
            continue
        name, sep, value = line.partition(b":")
        if not sep:
            raise WarcError(f"malformed {what} header line {line[:60]!r}")
        headers[name.strip().lower().decode("latin-1")] = value.strip().decode(
            "latin-1"
        )
    return headers


def gunzip_members(data: bytes) -> bytes:
    """Member-at-a-time gzip demux (WARC 1.1 annex D: each record is
    its own gzip member; readers MUST handle multi-member streams —
    a single whole-stream ``zlib.decompress`` would stop at the
    first member's end and silently drop every later record).
    Returns the concatenated plain WARC bytes."""
    out = bytearray()
    rest = data
    while rest[:2] == _GZIP_MAGIC:
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)  # gzip header
        try:
            out += d.decompress(rest)
        except zlib.error as e:
            raise WarcError(f"corrupt gzip member: {e}") from e
        if not d.eof:
            raise WarcError("truncated gzip member")
        rest = d.unused_data
    if rest.strip(b"\x00"):  # trailing zero padding is tolerated
        raise WarcError(
            f"trailing garbage after gzip members ({len(rest)} bytes)"
        )
    return bytes(out)


def parse_warc(data: bytes) -> list[WarcRecord]:
    """Parse one WARC payload into its records (pure function — the
    kernel and tests share it). ``.warc.gz`` payloads are detected
    by the gzip magic and demuxed member-at-a-time first."""
    if data[:2] == _GZIP_MAGIC:
        data = gunzip_members(data)
    records: list[WarcRecord] = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos:].strip() == b"":
            break  # trailing padding
        eol = data.find(_CRLF, pos)
        if eol < 0:
            raise WarcError("truncated version line")
        version = data[pos:eol]
        if version not in (b"WARC/1.0", b"WARC/1.1"):
            raise WarcError(f"bad WARC version line {version[:40]!r}")
        head_end = data.find(_CRLF + _CRLF, eol)
        if head_end < 0:
            raise WarcError("truncated record headers")
        headers = _parse_headers(data[eol + 2 : head_end], "WARC")
        if "content-length" not in headers:
            raise WarcError("record missing Content-Length")
        try:
            length = int(headers["content-length"])
        except ValueError as e:
            raise WarcError(
                f"bad Content-Length {headers['content-length']!r}"
            ) from e
        body_start = head_end + 4
        body_end = body_start + length
        if body_end > n:
            raise WarcError(
                f"record body truncated ({body_end - n} bytes short)"
            )
        body = data[body_start:body_end]
        if data[body_end : body_end + 4] != _CRLF + _CRLF:
            raise WarcError("record not terminated by CRLFCRLF")
        pos = body_end + 4

        wtype = headers.get("warc-type", "")
        uri = headers.get("warc-target-uri")
        status: int | None = None
        ctype: str | None = None
        entity = body
        if wtype == "response" and headers.get("content-type", "").startswith(
            "application/http"
        ):
            split = body.find(_CRLF + _CRLF)
            if split < 0:
                raise WarcError("HTTP response without header terminator")
            http_head = body[:split]
            entity = body[split + 4 :]
            status_line, _, rest = http_head.partition(_CRLF)
            parts = status_line.split(None, 2)
            if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
                raise WarcError(f"bad HTTP status line {status_line[:60]!r}")
            try:
                status = int(parts[1])
            except ValueError as e:
                raise WarcError(
                    f"bad HTTP status {parts[1]!r}"
                ) from e
            ctype = _parse_headers(rest, "HTTP").get("content-type")
        records.append(WarcRecord(wtype, uri, status, ctype, entity))
    if not records:
        raise WarcError("no WARC records in payload")
    return records


def _encode_record(rec: dict) -> bytes:
    if "html" in rec:
        entity = rec["html"].encode("utf-8")
        body = (
            b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html; charset=utf-8\r\n"
            + b"Content-Length: " + str(len(entity)).encode() + _CRLF
            + _CRLF
            + entity
        )
        extra = b"Content-Type: application/http;msgtype=response\r\n"
    else:
        body = rec.get("body", b"")
        extra = b""
    head = (
        b"WARC/1.0\r\n"
        b"WARC-Type: " + rec["warc_type"].encode() + _CRLF
    )
    if rec.get("url"):
        head += b"WARC-Target-URI: " + rec["url"].encode() + _CRLF
    head += extra
    head += b"Content-Length: " + str(len(body)).encode() + _CRLF
    return head + _CRLF + body + _CRLF + _CRLF


def encode_warc(records: list[dict]) -> bytes:
    """Build a WARC payload (tests and oracle-paired fixtures):
    each dict has ``warc_type``, optional ``url``, and either a raw
    ``body`` (bytes) or an HTTP ``html`` string (wrapped as a 200
    response with Content-Type text/html)."""
    return b"".join(_encode_record(rec) for rec in records)


def encode_warc_gz(records: list[dict]) -> bytes:
    """The ``.warc.gz`` layout real crawl dumps use: one gzip member
    PER RECORD (WARC 1.1 annex D — record-level members keep the
    archive splittable), mtime pinned to 0 so fixtures are
    byte-deterministic across runs and engines."""
    import gzip

    return b"".join(
        gzip.compress(_encode_record(rec), mtime=0) for rec in records
    )


WARC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("rec_idx", IntegerType()),
        StructField("warc_type", StringType()),
        StructField("url", StringType()),
        StructField("http_status", IntegerType()),
        StructField("content_type", StringType()),
        StructField("body", BinaryType()),
        StructField("err", StringType()),
    ]
)


def warc_records(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """One row per WARC record per payload (Arrow-batched
    mapInPandas, fan-out inside the kernel): type, target URI, HTTP
    status/Content-Type for responses, and the entity bytes ready
    for html_to_text / decode kernels. A malformed archive yields
    one err row."""
    import pandas as pd

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for doc, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    recs = parse_warc(bytes(payload))
                except WarcError as e:
                    rows.append(
                        (int(doc), None, None, None, None, None, None, str(e))
                    )
                else:
                    for i, r in enumerate(recs):
                        rows.append(
                            (
                                int(doc), i, r.warc_type, r.target_uri,
                                r.http_status, r.content_type, r.body, None,
                            )
                        )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "rec_idx", "warc_type", "url",
                    "http_status", "content_type", "body", "err",
                ],
            ).astype(
                {
                    "doc_id": "int64",
                    "rec_idx": "Int32",
                    "http_status": "Int32",
                }
            )

    src = df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(payload_col).cast(BinaryType()).alias(payload_col),
    )
    return src.mapInPandas(kernel, schema=WARC_SCHEMA)
