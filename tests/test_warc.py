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
