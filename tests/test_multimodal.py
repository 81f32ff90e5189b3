"""Multimodal binary-column plumbing: schema, metadata struct, and
the Arrow-batched mapInPandas feature path (decode kernel stubbed —
SURVEY §2.9)."""

from __future__ import annotations

import hashlib

import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

from etl_deltalake_spark.operators import multimodal as M
from etl_deltalake_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).limit(50)
    return M.with_media_meta(
        docs.withColumn("payload", F.col("text").cast(BinaryType())),
        "payload",
        media_type="image",
        fmt="raw",
    )


def test_media_meta_schema(media):
    meta = media.schema["media_meta"].dataType
    assert [f.name for f in meta.fields] == [
        "media_type",
        "format",
        "n_bytes",
        "width",
        "height",
        "duration_ms",
    ]
    row = media.select("media_meta", F.length("payload").alias("n")).head()
    assert row.media_meta.n_bytes == row.n
    assert row.media_meta.width == -1


def test_map_payload_features_matches_local(media):
    rows = media.select("doc_id", "payload").collect()
    want = {
        r.doc_id: (
            len(r.payload),
            hashlib.md5(bytes(r.payload)).hexdigest(),
            "%.3f" % (sum(r.payload) / len(r.payload)),
        )
        for r in rows
    }
    got = M.map_payload_features(media, "doc_id", "payload", frame_size=64).collect()
    assert len(got) == len(want)
    for r in got:
        n, ck, mean = want[r.doc_id]
        assert (r.n_bytes, r.checksum, r.mean_byte) == (n, ck, mean)
        assert r.n_frames == (n + 63) // 64


def test_frame_offsets(spark):
    df = spark.range(1).select(F.lit(b"x" * 1000).alias("payload"))
    offs = df.select(M.frame_offsets("payload", 100, 4).alias("o")).head().o
    assert offs == [0, 300, 600, 900]


def test_decode_image_real(spark):
    """decode_image is REAL now (stdlib PNG codec): valid payloads
    yield pixel features, corrupt/non-PNG payloads yield err rows —
    the job never dies on a bad file."""
    from etl_deltalake_spark.operators.png import encode_png

    px = bytes((i * 11) % 256 for i in range(6 * 5 * 3))
    good = encode_png(px, 6, 5, color_type=2, filter_mode="cycle")
    rows = [
        (1, good),
        (2, b"this is not a png"),
        (3, good[: len(good) // 3]),  # truncated
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r for r in M.decode_image(df, "doc_id", "payload").collect()}
    assert len(out) == 3
    ok = out[1]
    assert (ok.width, ok.height, ok.channels, ok.bit_depth) == (6, 5, 3, 8)
    assert ok.pix_sum == sum(px) and ok.n_pix == len(px)
    assert ok.err is None
    assert out[2].err is not None and out[2].width is None
    assert out[3].err is not None and out[3].pix_sum is None


def test_decode_image_over_media_payloads(media):
    """Raw text payloads (not PNGs) surface as per-row errors, not
    task failures."""
    out = M.decode_image(media.limit(5), "doc_id", "payload").collect()
    assert len(out) == 5
    assert all(r.err is not None and r.width is None for r in out)
