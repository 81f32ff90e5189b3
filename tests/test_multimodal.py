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


# ------------------------------------------------------- round 5: resize


def test_box_resize_hand_vector():
    """4x4 gray 0..15 → 2x2: each output is the round-half-up mean
    of its 2x2 box (2.5→3, 4.5→5, 10.5→11, 12.5→13)."""
    from etl_deltalake_spark.operators.multimodal import box_resize

    px = bytes(range(16))
    assert box_resize(px, 4, 4, 1, 2, 2) == bytes([3, 5, 11, 13])


def test_box_resize_matches_independent_reference():
    """Random images vs a Fraction-exact independent mean (incl.
    non-divisible shapes and multi-channel)."""
    from fractions import Fraction

    from etl_deltalake_spark.operators.multimodal import box_resize

    def ref(px, w, h, ch, tw, th):
        out = []
        for j in range(th):
            y0, y1 = j * h // th, max(j * h // th + 1, (j + 1) * h // th)
            for i in range(tw):
                x0 = i * w // tw
                x1 = max(x0 + 1, (i + 1) * w // tw)
                for c in range(ch):
                    vals = [
                        px[(y * w + x) * ch + c]
                        for y in range(y0, y1)
                        for x in range(x0, x1)
                    ]
                    m = Fraction(sum(vals), len(vals))
                    # round half up
                    out.append(int(m + Fraction(1, 2)))
        return bytes(out)

    import random

    rnd = random.Random(7)
    for w, h, ch, tw, th in [(5, 3, 1, 2, 2), (7, 7, 3, 3, 2), (4, 6, 4, 4, 3), (2, 2, 1, 3, 3)]:
        px = bytes(rnd.randrange(256) for _ in range(w * h * ch))
        assert box_resize(px, w, h, ch, tw, th) == ref(px, w, h, ch, tw, th)


def test_resize_image_end_to_end(spark):
    """Spark kernel: synthesize PNGs, resize to 2x2, verify the
    resized payload decodes to exactly box_resize(original), md5s
    are deterministic across runs, and corrupt payloads land in err."""
    import pandas as pd

    from etl_deltalake_spark.operators.multimodal import box_resize, resize_image
    from etl_deltalake_spark.operators.png import decode_png, encode_png

    rows = []
    for d in range(8):
        w, h = 3 + d % 5, 2 + d % 4
        ctype = 0 if d % 2 == 0 else 2
        ch = 1 if ctype == 0 else 3
        px = bytes((d * 31 + k) % 256 for k in range(w * h * ch))
        rows.append((d, encode_png(px, w, h, ctype, "cycle"), px, w, h, ch))
    rows.append((99, b"not a png", None, None, None, None))
    df = spark.createDataFrame(
        [(d, p) for d, p, *_ in rows], "doc_id long, payload binary"
    )
    out1 = {r["doc_id"]: r for r in resize_image(df, "doc_id", "payload", 2, 2).collect()}
    out2 = {r["doc_id"]: r for r in resize_image(df, "doc_id", "payload", 2, 2).collect()}
    assert out1[99]["err"] is not None and out1[99]["resized"] is None
    for d, _, px, w, h, ch in rows[:-1]:
        r = out1[d]
        assert r["err"] is None
        assert (r["width"], r["height"], r["out_w"], r["out_h"]) == (w, h, 2, 2)
        dec = decode_png(bytes(r["resized"]))
        assert (dec.width, dec.height, dec.channels) == (2, 2, ch)
        assert dec.pixels == box_resize(px, w, h, ch, 2, 2)
        assert r["resized_md5"] == out2[d]["resized_md5"]


# -------------------------------------------------- round 5: image aHash


def test_ahash_invariant_to_reencoding(spark):
    """The SAME pixels encoded five different ways (filter modes,
    Adam7, 16-bit left-bit-replicated widening) must produce ONE
    ahash; a visually different image must differ; corrupt payloads
    land in err."""
    from etl_deltalake_spark.operators.multimodal import image_ahash
    from etl_deltalake_spark.operators.png import encode_png

    w, h = 16, 12
    px = bytes((x * 16 + y * 3) % 256 for y in range(h) for x in range(w))
    px16 = b"".join(bytes([v, v]) for v in px)  # left-bit-replicate
    variants = [
        encode_png(px, w, h, 0, "none"),
        encode_png(px, w, h, 0, "cycle"),
        encode_png(px, w, h, 0, "cycle", interlace=True),
        encode_png(px16, w, h, 0, "none", bit_depth=16),
    ]
    # same luminance as RGB (R=G=B=gray value)
    rgb = b"".join(bytes([v, v, v]) for v in px)
    variants.append(encode_png(rgb, w, h, 2, "cycle"))
    other = bytes(255 - v for v in px)
    rows = [(i, blob) for i, blob in enumerate(variants)]
    rows.append((90, encode_png(other, w, h, 0, "none")))
    rows.append((99, b"garbage"))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: (r["ahash"], r["err"]) for r in
           image_ahash(df, "doc_id", "payload").collect()}
    base = out[0][0]
    assert base is not None
    for i in range(len(variants)):
        assert out[i] == (base, None), f"variant {i} diverged"
    assert out[90][0] is not None and out[90][0] != base
    assert out[99][0] is None and out[99][1] is not None


def test_ahash_hamming_near_dup(spark):
    """A tiny perturbation moves few bits (small Hamming distance);
    an inverted image moves most bits."""
    from etl_deltalake_spark.operators.multimodal import hamming64, image_ahash
    from etl_deltalake_spark.operators.png import encode_png

    w, h = 16, 16
    px = bytes((x * 13 + y * 7) % 256 for y in range(h) for x in range(w))
    tweaked = bytearray(px)
    tweaked[0] = (tweaked[0] + 40) % 256  # one pixel nudged
    inverted = bytes(255 - v for v in px)
    df = spark.createDataFrame(
        [
            (1, encode_png(px, w, h, 0, "none")),
            (2, encode_png(bytes(tweaked), w, h, 0, "none")),
            (3, encode_png(inverted, w, h, 0, "none")),
        ],
        "doc_id long, payload binary",
    )
    hs = image_ahash(df, "doc_id", "payload").select("doc_id", "ahash")
    a = hs.filter(F.col("doc_id") == 1).select(F.col("ahash").alias("ha"))
    pairs = (
        hs.filter(F.col("doc_id") != 1)
        .crossJoin(a)
        .select("doc_id", hamming64("ahash", "ha").alias("dist"))
        .collect()
    )
    d = {r["doc_id"]: r["dist"] for r in pairs}
    assert d[2] <= 4, f"near-dup moved {d[2]} bits"
    assert d[3] >= 32, f"inverted image only moved {d[3]} bits"


def test_decode_audio_exact_int64_sum_past_double_precision(spark):
    """samp_sum_i64 must stay exact where the double mirror rounds:
    a 32-bit-PCM clip of (2^22 + 3) max-amplitude samples has an ODD
    sum above 2^53, where doubles have spacing 2 — the double column
    visibly rounds, the Int64 column must not (round 8, ADVICE r7)."""
    from etl_deltalake_spark.operators.multimodal import decode_audio
    from etl_deltalake_spark.operators.wav import encode_wav

    n = 2**22 + 3
    v = 2**31 - 1
    payload = encode_wav([v] * n, 1, 48000, bit_depth=32)
    df = spark.createDataFrame([(1, payload)], ["doc_id", "payload"])
    row = decode_audio(df, "doc_id", "payload").collect()[0]
    exact = v * n
    assert exact > 2**53 and exact % 2 == 1
    assert row["err"] is None
    assert row["samp_sum_i64"] == exact
    assert row["samp_sum"] == float(exact)  # the rounded double mirror
    assert int(row["samp_sum"]) != exact  # ...which provably rounded


def test_decode_audio_i64_null_for_float_and_equal_for_small_int(spark):
    """Float-PCM rows leave samp_sum_i64 null (their double sum IS
    exact); small integer rows carry both columns in agreement."""
    from etl_deltalake_spark.operators.multimodal import decode_audio
    from etl_deltalake_spark.operators.wav import encode_wav

    fl = encode_wav([0.5, -0.25], 1, 8000, bit_depth=32, sample_format="float")
    it = encode_wav([10, -3, 7, 0], 2, 8000)
    df = spark.createDataFrame([(1, fl), (2, it)], ["doc_id", "payload"])
    rows = {r["doc_id"]: r for r in decode_audio(df, "doc_id", "payload").collect()}
    assert rows[1]["err"] is None and rows[1]["samp_sum_i64"] is None
    assert rows[1]["samp_sum"] == 0.25
    assert rows[2]["samp_sum_i64"] == 14 and rows[2]["samp_sum"] == 14.0


def test_image_dhash_gradient_semantics(spark):
    """On a 9x8 image (cells == pixels, pooling is identity) the
    difference hash is exactly the horizontal strict-gradient bits:
    increasing rows give 0xFF, decreasing/constant rows 0x00 —
    expected value hand-derived, not computed by either codec."""
    from etl_deltalake_spark.operators.multimodal import image_dhash
    from etl_deltalake_spark.operators.png import encode_png

    rows = []
    for y in range(8):
        if y % 2 == 0:
            rows += [10 + 3 * x for x in range(9)]   # increasing
        else:
            rows += [200 - 5 * x for x in range(9)]  # decreasing
    payload = encode_png(bytes(rows), 9, 8, 0, "cycle")
    df = spark.createDataFrame([(1, payload)], ["doc_id", "payload"])
    row = image_dhash(df, "doc_id", "payload").collect()[0]
    assert row["err"] is None
    want = 0
    for y in range(8):
        want = (want << 8) | (0xFF if y % 2 == 0 else 0x00)
    if want >= 1 << 63:
        want -= 1 << 64
    assert row["dhash"] == want


def test_image_dhash_reencoding_invariant_and_err(spark):
    """Adam7 re-encoding of the same pixels hashes identically;
    corrupt payloads land in err, never raise."""
    from etl_deltalake_spark.operators.multimodal import image_dhash
    from etl_deltalake_spark.operators.png import encode_png

    px = bytes((k * 7) % 256 for k in range(12 * 10))
    plain = encode_png(px, 12, 10, 0, "cycle")
    inter = encode_png(px, 12, 10, 0, "cycle", interlace=True)
    df = spark.createDataFrame(
        [(1, plain), (2, inter), (3, b"not a png")], ["doc_id", "payload"]
    )
    out = {r["doc_id"]: r for r in image_dhash(df, "doc_id", "payload").collect()}
    assert out[1]["err"] is None and out[2]["err"] is None
    assert out[1]["dhash"] == out[2]["dhash"]
    assert out[3]["err"] is not None and out[3]["dhash"] is None
