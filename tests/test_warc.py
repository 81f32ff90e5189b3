"""WARC container contract (operators/warc.py): record walk with
length-delimited bodies, HTTP response splitting, strict rejection
of every malformation class, and the Spark kernel's row-per-record
+ err posture."""

from __future__ import annotations

import pytest

from etl_deltalake_spark.operators.warc import (
    WarcError,
    encode_warc,
    parse_warc,
    warc_records,
)


def _archive():
    return encode_warc(
        [
            {"warc_type": "warcinfo", "body": b"robots: all\r\n"},
            {
                "warc_type": "response",
                "url": "http://a.example/x",
                "html": "<p>hello <b>crawl</b></p>",
            },
            {
                "warc_type": "request",
                "url": "http://a.example/x",
                "body": b"GET /x HTTP/1.1\r\n",
            },
        ]
    )


def test_parse_warc_roundtrip():
    recs = parse_warc(_archive())
    assert [r.warc_type for r in recs] == ["warcinfo", "response", "request"]
    info, resp, req = recs
    assert info.target_uri is None and info.http_status is None
    assert resp.target_uri == "http://a.example/x"
    assert resp.http_status == 200
    assert resp.content_type.startswith("text/html")
    assert resp.body == b"<p>hello <b>crawl</b></p>"
    assert req.http_status is None  # requests are not HTTP-split
    assert req.body == b"GET /x HTTP/1.1\r\n"


def test_parse_warc_binary_entity_survives():
    """Entity bytes pass through untouched (a crawl archives images
    too) — including bytes that look like CRLFCRLF inside the body,
    which only Content-Length delimits correctly."""
    tricky = b"\x89PNG\r\n\r\nnot-a-record-boundary\x00\xff"
    recs = parse_warc(
        encode_warc([{"warc_type": "resource", "body": tricky}])
    )
    assert recs[0].body == tricky


@pytest.mark.parametrize(
    "mutate, match",
    [
        (lambda b: b"WARC/0.9" + b[8:], "bad WARC version"),
        (lambda b: b[:40], "truncated"),
        (lambda b: b[:-2], "not terminated"),
        (
            lambda b: b.replace(b"Content-Length", b"X-Length", 1),
            "missing Content-Length",
        ),
    ],
)
def test_parse_warc_malformations(mutate, match):
    with pytest.raises(WarcError, match=match):
        parse_warc(mutate(_archive()))


def test_parse_warc_bad_http_status():
    # same-length mutation so Content-Length still matches the body
    pay = _archive().replace(b"HTTP/1.1 200 OK", b"HTTP/1.1 2x0 OK")
    with pytest.raises(WarcError, match="bad HTTP status"):
        parse_warc(pay)


def test_parse_warc_empty_rejected():
    with pytest.raises(WarcError, match="no WARC records"):
        parse_warc(b"")


def test_warc_records_kernel(spark):
    df = spark.createDataFrame(
        [(1, _archive()), (2, b"not a warc")], ["doc_id", "payload"]
    )
    rows = warc_records(df, "doc_id", "payload").collect()
    good = sorted(
        (r for r in rows if r["doc_id"] == 1),
        key=lambda r: r["rec_idx"],
    )
    assert [r["warc_type"] for r in good] == [
        "warcinfo", "response", "request",
    ]
    assert good[1]["http_status"] == 200
    assert bytes(good[1]["body"]) == b"<p>hello <b>crawl</b></p>"
    assert all(r["err"] is None for r in good)
    bad = [r for r in rows if r["doc_id"] == 2]
    assert len(bad) == 1 and bad[0]["err"] is not None


# ---- gzip transport (round 11: real Common Crawl is .warc.gz) ----------


def test_parse_warc_gz_member_per_record():
    """A .warc.gz payload (one gzip member per record, WARC 1.1
    annex D) parses to exactly the same records as the bare bytes —
    and multi-member demux is real: a whole-stream decompress would
    see only record 0."""
    from etl_deltalake_spark.operators.warc import encode_warc_gz

    recs = [
        {"warc_type": "warcinfo", "body": b"robots: all\r\n"},
        {
            "warc_type": "response",
            "url": "http://a.example/x",
            "html": "<p>hello <b>crawl</b></p>",
        },
        {"warc_type": "resource", "body": b"\x00\xff raw"},
    ]
    gz = encode_warc_gz(recs)
    assert gz[:2] == b"\x1f\x8b"
    # genuinely one member per record: each magic starts a member
    assert gz.count(b"\x1f\x8b\x08") >= 3
    import zlib

    d = zlib.decompressobj(16 + zlib.MAX_WBITS)
    first_member_only = d.decompress(gz)
    assert b"WARC-Type: resource" not in first_member_only  # would drop
    assert parse_warc(gz) == parse_warc(encode_warc(recs))


def test_parse_warc_gz_corrupt_and_truncated():
    from etl_deltalake_spark.operators.warc import encode_warc_gz

    gz = encode_warc_gz([{"warc_type": "warcinfo", "body": b"x"}])
    with pytest.raises(WarcError, match="gzip member"):
        parse_warc(gz[: len(gz) - 4])  # truncated member
    bad = bytearray(gz)
    bad[14] ^= 0xFF  # flip a deflate byte
    with pytest.raises(WarcError, match="gzip member|record|WARC"):
        parse_warc(bytes(bad))
    with pytest.raises(WarcError, match="trailing garbage"):
        parse_warc(gz + b"not gzip")


def test_warc_records_kernel_mixed_gz_and_bare(spark):
    """The Spark kernel needs NO transport hint: gzip and bare
    payloads mix in one DataFrame and yield identical record rows."""
    from etl_deltalake_spark.operators.warc import encode_warc_gz

    recs = [
        {"warc_type": "warcinfo", "body": b"robots: all\r\n"},
        {
            "warc_type": "response",
            "url": "http://b.example/y",
            "html": "<p>zipped</p>",
        },
    ]
    df = spark.createDataFrame(
        [(0, bytearray(encode_warc(recs))), (1, bytearray(encode_warc_gz(recs)))],
        "doc_id long, payload binary",
    )
    out = warc_records(df, "doc_id", "payload").collect()
    by_doc = {}
    for r in out:
        assert r["err"] is None
        by_doc.setdefault(r["doc_id"], []).append(
            (r["rec_idx"], r["warc_type"], r["url"], r["http_status"],
             bytes(r["body"])))
    assert by_doc[0] == by_doc[1]
    assert len(by_doc[0]) == 2
