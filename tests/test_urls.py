"""URL canonicalization contract (operators/urls.py): scheme/host
case, default ports, trailing-dot hosts, dot-segment resolution,
query-param sorting with blank values, fragment removal, malformed
tolerance, and the frontier-dedup primitive."""

from __future__ import annotations

import pytest

from etl_deltalake_spark.operators.urls import (
    canonical_url_py,
    dedup_by_canonical_url,
)


@pytest.mark.parametrize(
    "raw, want",
    [
        (
            "HTTP://Example.COM:80/a/./b/../c?b=2&a=1#frag",
            "http://example.com/a/c?a=1&b=2",
        ),
        ("https://Host.Net:443/", "https://host.net/"),
        ("https://host.net:8443/x", "https://host.net:8443/x"),
        ("http://dot.host./p", "http://dot.host/p"),
        ("http://h.example", "http://h.example/"),
        ("http://h.example/a//b/", "http://h.example/a/b"),
        ("http://h.example/?z=&a=", "http://h.example/?a=&z="),
        # same key twice: sorted by (key, value), both kept
        ("http://h.example/?k=2&k=1", "http://h.example/?k=1&k=2"),
        ("  http://h.example/x  ", "http://h.example/x"),
    ],
)
def test_canonical_url_cases(raw, want):
    assert canonical_url_py(raw) == want


def test_canonical_url_idempotent():
    cases = [
        "HTTP://Example.COM:80/a/./b/../c?b=2&a=1#frag",
        "http://h.example/?z=&a=",
        "https://host.net:8443/x",
    ]
    for raw in cases:
        once = canonical_url_py(raw)
        assert canonical_url_py(once) == once


def test_canonical_url_malformed_never_raises():
    for junk in ("", "not a url", "http://", "http://[bad", "::::"):
        canonical_url_py(junk)  # must not raise


def test_dedup_by_canonical_url(spark):
    rows = [
        (1, "http://a.example/p?x=1&y=2"),
        (2, "HTTP://A.EXAMPLE:80/p?y=2&x=1#f"),   # same resource
        (3, "http://a.example/p/./q/../../p?x=1&y=2"),  # same again
        (4, "http://b.example/p?x=1&y=2"),        # different host
    ]
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    kept = sorted(
        r["doc_id"]
        for r in dedup_by_canonical_url(df, "doc_id", "url").collect()
    )
    assert kept == [1, 4]
