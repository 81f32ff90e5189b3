"""Crawl-politeness + compression-quality contracts
(operators/crawl.py): robots first-match prefix semantics with
specific-agent sections, the missing-robots convention, and the
zlib-ratio separation bands that make the Gopher-style gate work."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_deltalake_spark.operators.crawl import (
    repetition_gate_by_compression,
    robots_filter,
    zlib_ratio,
)


def test_robots_filter_semantics(spark):
    urls = spark.createDataFrame(
        [
            (1, "http://a.example/ok", "a.example"),
            (2, "http://a.example/private/x", "a.example"),
            (3, "http://a.example/privateer", "a.example"),  # prefix match
            (4, "http://a.example/secret", "a.example"),  # other agents only
            (5, "http://norobots.example/anything", "norobots.example"),
        ],
        "url_id long, url string, host string",
    )
    robots = spark.createDataFrame(
        [
            (
                "a.example",
                "User-agent: trainbot\nDisallow: /private\n\n"
                "User-agent: *\nDisallow: /secret\n",
            )
        ],
        "host string, robots_txt string",
    )
    out = {
        r["url_id"]: r["fetchable"]
        for r in robots_filter(urls, robots, agent="trainbot").collect()
    }
    assert out == {1: True, 2: False, 3: False, 4: True, 5: True}
    # a different agent falls through to the * section
    other = {
        r["url_id"]: r["fetchable"]
        for r in robots_filter(urls, robots, agent="otherbot").collect()
    }
    assert other[2] is True and other[4] is False


def test_zlib_ratio_separates_prose_repetition_junk(spark):
    import random

    rng = random.Random(7)
    words = (
        "river mountain quiet engine harvest blue seventeen walks "
        "under clouds yesterday warm signal bread theory garden "
        "slowly north lantern voice"
    ).split()
    prose = " ".join(rng.choice(words) for _ in range(260)) + "."
    repetitive = "spam ham " * 200
    junk = "".join(chr(rng.randint(0x21, 0x7E)) for _ in range(1500))
    df = spark.createDataFrame(
        [(1, prose), (2, repetitive), (3, junk), (4, ""), (5, None)],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r["ratio"]
        for r in df.select(
            "doc_id", zlib_ratio("text").alias("ratio")
        ).collect()
    }
    assert 0.15 < rows[1] < 0.7  # prose band
    assert rows[2] < 0.1  # heavy repetition
    assert rows[3] > 0.8  # incompressible junk
    assert rows[4] == 1.0 and rows[5] is None

    kept = sorted(
        r["doc_id"]
        for r in repetition_gate_by_compression(df, "text").collect()
    )
    assert kept == [1]


def test_zlib_ratio_deterministic(spark):
    df = spark.createDataFrame([(1, "abc def " * 50)], "doc_id long, text string")
    a = df.select(zlib_ratio("text").alias("r")).head()["r"]
    b = df.select(zlib_ratio("text").alias("r")).head()["r"]
    import zlib

    raw = ("abc def " * 50).encode()
    assert a == b == len(zlib.compress(raw, 6)) / len(raw)
