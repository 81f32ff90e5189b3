"""Multimodal columns: image/audio/video as opaque ``binary`` columns
with typed metadata (SURVEY §2.9 extensions).

Design (the 100 TB posture):
 - The payload is an opaque ``BinaryType`` column; metadata rides in a
   typed struct next to it. Parquet stores binary chunked+compressed;
   Spark never interprets the bytes until an explicit decode stage.
 - Decode / feature-extract / resize / frame-sample run as
   Arrow-batched ``mapInPandas`` stages: one Python worker per input
   partition, zero shuffles — throughput scales with executors.
   Repartition upstream only if payload skew is extreme (a few
   multi-GB videos in one partition).
 - PNG and WAV decoding are REAL: ``decode_image`` runs the
   pure-stdlib PNG codec in ``operators/png.py`` (zlib + struct) and
   ``decode_audio`` the pure-stdlib PCM WAV codec in
   ``operators/wav.py`` (struct + array) — no Pillow/ffmpeg needed —
   inside Arrow-batched kernels, with per-row errors captured in an
   ``err`` column rather than failing the job. Compressed formats
   (JPEG, MP3, video containers) still need codec libraries absent
   from this container; their payloads surface as decode errors, and
   ``map_payload_features`` remains the format-agnostic byte-level
   feature path. Swapping in a native decoder changes the kernel
   body only, never the plan shape.

No counterpart exists in the reference (its data is JSON text only);
this module is a north-star extension (SURVEY §2.9).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Typed metadata carried beside every payload column.
MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType()),  # image|audio|video
        StructField("format", StringType()),  # png|jpeg|wav|mp4|...
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),  # -1 when unknown/n-a
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
        StructField("mean_byte", StringType()),  # fixed 3-dec string
        StructField("n_frames", IntegerType()),
    ]
)


DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("bit_depth", IntegerType()),
        StructField("pix_sum", LongType()),
        StructField("n_pix", LongType()),
        StructField("err", StringType()),
    ]
)


def with_media_meta(
    df: DataFrame, payload_col: str, media_type: str, fmt: str
) -> DataFrame:
    """Attach the typed metadata struct next to a binary payload.

    Width/height/duration are unknown until decode → -1 sentinel;
    a real ingest fills them from container headers (cheap, no full
    decode)."""
    payload = F.col(payload_col).cast(BinaryType())
    meta = F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit(fmt).alias("format"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.lit(-1).alias("width"),
        F.lit(-1).alias("height"),
        F.lit(-1).alias("duration_ms"),
    )
    return df.withColumn(payload_col, payload).withColumn("media_meta", meta)


def decode_image(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """REAL image decode over binary payloads: parse each payload as
    PNG (pure-stdlib codec, operators/png.py — zlib inflate + chunk
    CRC walk + per-scanline unfilter) and emit typed pixel features:
    dimensions, channel count, bit depth, and the exact pixel-byte
    sum/count (mean and any downstream stats derive from those in
    Spark SQL, keeping float handling engine-side and deterministic).

    Failure posture for 100 TB corpora: a corrupt / truncated /
    unsupported payload must not kill the job, so the kernel catches
    per-row decode errors into the ``err`` column (feature columns
    null) — filter ``err IS NULL`` downstream, audit the rest.

    Arrow-batched ``mapInPandas``: one Python worker pass per input
    partition, no shuffle; scales with executors. Swapping the codec
    for a native decoder changes the kernel body only, never the plan.

    Replaces the round-1..3 ``NotImplementedError`` stub (the
    container has no Pillow/ffmpeg, but PNG needs neither).

    Round 9: payloads are format-SNIFFED — ``89 PNG`` routes to the
    PNG codec, ``FF D8`` to the JPEG codec (operators/jpeg.py,
    baseline AND progressive since round 10: Huffman + dequant +
    IDCT + YCbCr→RGB); round 10 adds ``GIF8`` → the GIF codec
    (operators/gif.py, LZW + interlace + frame composition; the
    still contract decodes the first composed frame). For every
    format, ``pix_sum``/``n_pix`` cover the decoded 8-bit buffer.
    """
    from etl_deltalake_spark.operators.gif import GifError, decode_gif
    from etl_deltalake_spark.operators.jpeg import JpegError, decode_jpeg
    from etl_deltalake_spark.operators.png import PngError, decode_png

    def _decode_any(payload: bytes):
        if payload[:2] == b"\xff\xd8":
            return decode_jpeg(payload)
        if payload[:4] == b"GIF8":
            return decode_gif(payload)
        return decode_png(payload)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, chs, bds, sums, ns, errs = [], [], [], [], [], [], [], []
            for doc, payload in zip(pdf[id_col], pdf[payload_col]):
                ids.append(doc)
                try:
                    img = _decode_any(bytes(payload))
                except (PngError, JpegError, GifError) as e:
                    ws.append(None)
                    hs.append(None)
                    chs.append(None)
                    bds.append(None)
                    sums.append(None)
                    ns.append(None)
                    errs.append(str(e))
                else:
                    ws.append(img.width)
                    hs.append(img.height)
                    chs.append(img.channels)
                    bds.append(img.bit_depth)
                    sums.append(sum(img.pixels))
                    ns.append(len(img.pixels))
                    errs.append(None)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="Int32"),
                    "height": pd.Series(hs, dtype="Int32"),
                    "channels": pd.Series(chs, dtype="Int32"),
                    "bit_depth": pd.Series(bds, dtype="Int32"),
                    "pix_sum": pd.Series(sums, dtype="Int64"),
                    "n_pix": pd.Series(ns, dtype="Int64"),
                    "err": pd.Series(errs, dtype="object"),
                }
            )

    src = df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(payload_col).cast(BinaryType()).alias(payload_col),
    )
    return src.mapInPandas(kernel, schema=DECODE_SCHEMA)


AUDIO_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("channels", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("bit_depth", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("duration_ms", LongType()),
        # doubles since round 6 (float PCM support): exact for every
        # integer sum this kernel meets (|sum| << 2^53) and the
        # float-sample sums are dyadic rationals, also exact
        StructField("samp_sum", DoubleType()),
        # round 8: the EXACT integer sum for integer-domain rows
        # (int PCM, G.711/ADPCM linear output), null for float rows.
        # Python's int sum is arbitrary-precision, so this column is
        # exact even where the double mirror would round — a
        # 32-bit-PCM clip only needs >2^21 frames (~44 s @ 48 kHz)
        # for |sum| to be able to cross 2^53
        StructField("samp_sum_i64", LongType()),
        StructField("peak_abs", DoubleType()),
        StructField("err", StringType()),
    ]
)


def decode_audio(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """REAL audio decode over binary payloads: parse each payload as
    PCM WAV (pure-stdlib codec, operators/wav.py — RIFF chunk walk
    with header cross-checks + bulk array sample decode) and emit
    typed audio features: channel count, sample rate, bit depth,
    frame count, integer duration, and the exact sample sum / peak
    absolute amplitude (means and loudness stats derive from those in
    Spark SQL, keeping float handling engine-side and deterministic).
    Integer-domain rows (int PCM, G.711/ADPCM linear output) also
    carry ``samp_sum_i64`` — the arbitrary-precision Python sum kept
    as an exact Int64 (round 8): the double mirror rounds once |sum|
    crosses 2^53, which a long 24/32-bit clip genuinely reaches.
    Float-PCM rows leave it null (their double sum is the exact one —
    dyadic rationals).

    Same failure posture as ``decode_image``: corrupt / truncated /
    non-PCM payloads land in the ``err`` column with null features —
    a bad file never kills a 100 TB job. Arrow-batched
    ``mapInPandas``, no shuffle; a native codec for compressed
    formats swaps into the same kernel signature without touching the
    plan.
    """
    from etl_deltalake_spark.operators.wav import WavError, decode_wav

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, chs, rates, bds, nfs, durs, sums, isums, peaks, errs = (
                [], [], [], [], [], [], [], [], [], [],
            )
            for doc, payload in zip(pdf[id_col], pdf[payload_col]):
                ids.append(doc)
                try:
                    au = decode_wav(bytes(payload))
                except WavError as e:
                    chs.append(None)
                    rates.append(None)
                    bds.append(None)
                    nfs.append(None)
                    durs.append(None)
                    sums.append(None)
                    isums.append(None)
                    peaks.append(None)
                    errs.append(str(e))
                else:
                    chs.append(au.channels)
                    rates.append(au.sample_rate)
                    bds.append(au.bit_depth)
                    nfs.append(au.n_frames)
                    durs.append(au.duration_ms)
                    # arbitrary-precision Python sum; exact int kept
                    # in samp_sum_i64 for integer-domain rows, the
                    # double mirror for uniform downstream SQL
                    s = sum(au.samples)
                    sums.append(float(s))
                    isums.append(s if isinstance(s, int) else None)
                    peaks.append(
                        float(max((abs(x) for x in au.samples), default=0))
                    )
                    errs.append(None)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "channels": pd.Series(chs, dtype="Int32"),
                    "sample_rate": pd.Series(rates, dtype="Int32"),
                    "bit_depth": pd.Series(bds, dtype="Int32"),
                    "n_frames": pd.Series(nfs, dtype="Int64"),
                    "duration_ms": pd.Series(durs, dtype="Int64"),
                    "samp_sum": pd.Series(sums, dtype="float64"),
                    "samp_sum_i64": pd.Series(isums, dtype="Int64"),
                    "peak_abs": pd.Series(peaks, dtype="float64"),
                    "err": pd.Series(errs, dtype="object"),
                }
            )

    src = df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(payload_col).cast(BinaryType()).alias(payload_col),
    )
    return src.mapInPandas(kernel, schema=AUDIO_DECODE_SCHEMA)


def frame_offsets(payload_col: str | Column, frame_size: int, n_frames: int) -> Column:
    """Deterministic frame sampling: byte offsets of ``n_frames``
    evenly-spaced fixed-size frames within the payload.

    Stands in for video frame-sampling: the offsets computation (the
    Spark-side part) is identical with a real container parser; only
    the per-frame decode differs.
    """
    c = F.col(payload_col) if isinstance(payload_col, str) else payload_col
    n = F.length(c).cast("long")
    usable = F.greatest(n - F.lit(frame_size), F.lit(0).cast("long"))
    idx = F.sequence(F.lit(0), F.lit(n_frames - 1))
    return F.transform(idx, lambda i: (usable * i / F.lit(max(n_frames - 1, 1))).cast("long"))


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_offset", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    frame_size: int = 64,
    n_frames: int = 4,
) -> DataFrame:
    """Frame sampling over binary payloads: ``n_frames`` evenly
    spaced fixed-size byte windows per payload, one output row per
    frame — the video-frame-extraction execution shape with a
    deterministic byte-slice kernel (a real container parser slots
    into the same mapInPandas signature; offsets follow
    ``frame_offsets``). Arrow-batched, no shuffle; rows-per-input
    multiplies by n_frames but frames are bounded-size.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs, frames = [], [], [], []
            for doc, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                usable = max(len(data) - frame_size, 0)
                for i in range(n_frames):
                    off = int(usable * i / max(n_frames - 1, 1))
                    ids.append(doc)
                    idxs.append(i)
                    offs.append(off)
                    frames.append(data[off : off + frame_size])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_offset": pd.Series(offs, dtype="int64"),
                    "frame": frames,
                }
            )

    src = df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(payload_col).cast(BinaryType()).alias(payload_col),
    )
    return src.mapInPandas(kernel, schema=FRAME_SCHEMA)


def map_payload_features(
    df: DataFrame, id_col: str, payload_col: str, frame_size: int = 64
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The real execution path a decoder would use: ``mapInPandas``
    receives Arrow record batches (payload bytes zero-copy where
    possible), emits a typed feature row per input row. The kernel
    here computes deterministic byte-level features (length, md5,
    mean byte value, frame count) so tests and the DuckDB oracle can
    verify the full pipeline without codec libraries.
    """
    import hashlib

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "checksum": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "mean_byte": payloads.map(
                        lambda b: "%.3f" % (sum(b) / len(b)) if len(b) else "0.000"
                    ),
                    "n_frames": payloads.map(
                        lambda b: max((len(b) + frame_size - 1) // frame_size, 0)
                    ).astype("int32"),
                }
            )
            yield out

    src = df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(payload_col).cast(BinaryType()).alias(payload_col),
    )
    return src.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def box_resize(
    pixels: bytes, w: int, h: int, channels: int, tw: int, th: int
) -> bytes:
    """Exact area-average (box) downsample of 8-bit interleaved
    pixels to ``tw × th``: output pixel (i, j) is the round-half-up
    mean of the input box [⌊i·w/tw⌋, ⌊(i+1)·w/tw⌋) ×
    [⌊j·h/th⌋, ⌊(j+1)·h/th⌋) per channel (boxes widened to ≥ 1 px so
    upscales degrade to nearest-neighbor rather than erroring).
    Integer arithmetic only — deterministic across platforms, so
    resized payloads hash identically everywhere (the property the
    tests pin)."""
    if tw <= 0 or th <= 0:
        raise ValueError(f"target {tw}x{th} must be positive")
    out = bytearray(tw * th * channels)
    for j in range(th):
        y0 = j * h // th
        y1 = max(y0 + 1, (j + 1) * h // th)
        for i in range(tw):
            x0 = i * w // tw
            x1 = max(x0 + 1, (i + 1) * w // tw)
            n = (y1 - y0) * (x1 - x0)
            for c in range(channels):
                s = 0
                for y in range(y0, y1):
                    base = (y * w + x0) * channels + c
                    for x in range(x1 - x0):
                        s += pixels[base + x * channels]
                out[(j * tw + i) * channels + c] = (2 * s + n) // (2 * n)
    return bytes(out)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("out_w", IntegerType()),
        StructField("out_h", IntegerType()),
        StructField("resized", BinaryType()),
        StructField("resized_md5", StringType()),
        StructField("err", StringType()),
    ]
)


def resize_image(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    target_w: int,
    target_h: int,
) -> DataFrame:
    """Thumbnail/resize stage over binary PNG payloads (the third leg
    of decode / feature-extract / RESIZE / frame-sample): decode with
    the stdlib codec, exact integer box-mean downsample
    (``box_resize``), re-encode as PNG (filter 0, fixed compression
    level → byte-deterministic output, md5 attached for cheap
    downstream comparison). 16-bit inputs downconvert to 8-bit by
    high byte before pooling (documented precision trade; palette
    inputs arrive already PLTE-expanded to RGB).

    Same execution posture as ``decode_image``: Arrow-batched
    ``mapInPandas``, zero shuffles, per-row errors in ``err`` instead
    of task failure. Gated against an independent pure-Python
    reference + hand vectors in tests/test_multimodal.py (resize is
    not SQL-expressible at reasonable cost — the BPE/isotonic
    grading precedent)."""
    import hashlib

    from etl_deltalake_spark.operators.png import (
        PngError,
        decode_png,
        encode_png,
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, ows, ohs, blobs, md5s, errs = (
                [], [], [], [], [], [], [], [],
            )
            for doc, payload in zip(pdf[id_col], pdf[payload_col]):
                ids.append(doc)
                try:
                    img = decode_png(bytes(payload))
                    px = img.pixels
                    if img.bit_depth == 16:
                        px = px[::2]  # big-endian high bytes
                    small = box_resize(
                        px, img.width, img.height, img.channels,
                        target_w, target_h,
                    )
                    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[img.channels]
                    blob = encode_png(
                        small, target_w, target_h, ctype, "none"
                    )
                except (PngError, ValueError) as e:
                    ws.append(None); hs.append(None)
                    ows.append(None); ohs.append(None)
                    blobs.append(None); md5s.append(None)
                    errs.append(str(e))
                else:
                    ws.append(img.width); hs.append(img.height)
                    ows.append(target_w); ohs.append(target_h)
                    blobs.append(blob)
                    md5s.append(hashlib.md5(blob).hexdigest())
                    errs.append(None)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="Int32"),
                    "height": pd.Series(hs, dtype="Int32"),
                    "out_w": pd.Series(ows, dtype="Int32"),
                    "out_h": pd.Series(ohs, dtype="Int32"),
                    "resized": pd.Series(blobs, dtype="object"),
                    "resized_md5": pd.Series(md5s, dtype="object"),
                    "err": pd.Series(errs, dtype="object"),
                }
            )

    src = df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(payload_col).cast(BinaryType()).alias(payload_col),
    )
    return src.mapInPandas(kernel, schema=RESIZE_SCHEMA)


AHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("ahash", LongType()),
        StructField("err", StringType()),
    ]
)


def _luma_cells_img(img, tw: int, th: int) -> bytes:
    """Image-level perceptual-hash front half: 8-bit luminance plane
    (BT.601 integer luma for RGB(A), gray channel for GA, high bytes
    for 16-bit) → exact integer box-mean pooling to ``tw × th``
    cells. Takes an already-decoded ``DecodedImage`` so still-image
    AND per-video-frame hashing share one definition."""
    px = img.pixels
    if img.bit_depth == 16:
        px = px[::2]
    ch = img.channels
    if ch >= 3:  # RGB(A) -> BT.601 luma
        lum = bytes(
            (299 * px[i * ch] + 587 * px[i * ch + 1] + 114 * px[i * ch + 2])
            // 1000
            for i in range(img.width * img.height)
        )
    elif ch == 2:  # gray+alpha -> gray channel
        lum = px[::2]
    else:
        lum = px
    return box_resize(lum, img.width, img.height, 1, tw, th)


def _luma_cells(payload: bytes, tw: int, th: int) -> bytes:
    """Payload-level front half: decode PNG, then ``_luma_cells_img``.
    Raises PngError/ValueError on bad payloads (callers map to the
    err column)."""
    from etl_deltalake_spark.operators.png import decode_png

    return _luma_cells_img(decode_png(bytes(payload)), tw, th)


def _ahash64(cells: bytes) -> int:
    """64 cells → signed aHash BIGINT (threshold at the integer
    floor-mean, ties set the bit, MSB-first)."""
    mean = sum(cells) // 64
    h = 0
    for c in cells:
        h = (h << 1) | (1 if c >= mean else 0)
    if h >= 1 << 63:
        h -= 1 << 64
    return h


def image_ahash(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Perceptual AVERAGE-HASH image fingerprints (round 5) — the
    image counterpart of text dedup's md5-of-normalized-text: decode,
    luminance-reduce, box-mean to 8×8 (``box_resize`` — the exact
    integer pooling), threshold each cell at the 64-cell mean, pack
    the 64 bits MSB-first into one BIGINT. Re-encodings of the SAME
    pixels (different scanline filters, interlace, or 16-bit widening
    by left-bit replication) hash identically, so exact groupBy on
    ``ahash`` deduplicates an image corpus the way ``fingerprint_md5``
    deduplicates text; Hamming distance between hashes ranks
    NEAR-duplicates (aHash is the classical public technique).

    Luminance: integer-rounded BT.601 (299R+587G+114B)/1000 per
    pixel for 3/4-channel images; gray(+alpha) uses the gray channel;
    16-bit uses high bytes. Threshold ties (cell == mean) set the
    bit, and the mean uses exact integer floor division —
    deterministic everywhere. Same mapInPandas posture as the other
    kernels: per-row errors in ``err``, no shuffle.
    """
    from etl_deltalake_spark.operators.png import PngError

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes, errs = [], [], []
            for doc, payload in zip(pdf[id_col], pdf[payload_col]):
                ids.append(doc)
                try:
                    hashes.append(_ahash64(_luma_cells(payload, 8, 8)))
                    errs.append(None)
                except (PngError, ValueError) as e:
                    hashes.append(None)
                    errs.append(str(e))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "ahash": pd.Series(hashes, dtype="Int64"),
                    "err": pd.Series(errs, dtype="object"),
                }
            )

    src = df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(payload_col).cast(BinaryType()).alias(payload_col),
    )
    return src.mapInPandas(kernel, schema=AHASH_SCHEMA)


DHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("dhash", LongType()),
        StructField("err", StringType()),
    ]
)


def image_dhash(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Perceptual DIFFERENCE-HASH image fingerprints (round 8): the
    gradient-based complement to ``image_ahash``. Decode → luminance
    → box-mean pool to 9×8 cells (one EXTRA column), then bit
    (x, y) = 1 iff cell(x+1, y) > cell(x, y) — 8 horizontal
    gradients per row × 8 rows packed MSB-first row-major into one
    signed BIGINT. dHash captures edge structure rather than global
    brightness, so brightness-shifted near-dups that fool aHash's
    mean threshold still collide here, while the two hashes together
    (both integer-exact, both re-encoding-invariant) give the
    image-dedup tier two independent 64-bit signals for Hamming
    ranking (``hamming64``). Same mapInPandas posture: per-row
    errors in ``err``, zero shuffle. Classical public technique
    (difference hash, widely documented alongside aHash/pHash)."""
    from etl_deltalake_spark.operators.png import PngError

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes, errs = [], [], []
            for doc, payload in zip(pdf[id_col], pdf[payload_col]):
                ids.append(doc)
                try:
                    cells = _luma_cells(payload, 9, 8)
                    h = 0
                    for y in range(8):
                        row = cells[y * 9 : y * 9 + 9]
                        for x in range(8):
                            h = (h << 1) | (1 if row[x + 1] > row[x] else 0)
                    if h >= 1 << 63:
                        h -= 1 << 64
                    hashes.append(h)
                    errs.append(None)
                except (PngError, ValueError) as e:
                    hashes.append(None)
                    errs.append(str(e))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "dhash": pd.Series(hashes, dtype="Int64"),
                    "err": pd.Series(errs, dtype="object"),
                }
            )

    src = df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(payload_col).cast(BinaryType()).alias(payload_col),
    )
    return src.mapInPandas(kernel, schema=DHASH_SCHEMA)


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit hashes as a column
    expression (bit_count of XOR) — ranks aHash near-duplicates."""
    return F.bit_count(
        (F.col(a) if isinstance(a, str) else a).bitwiseXOR(
            F.col(b) if isinstance(b, str) else b
        )
    )


VIDEO_DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("delay_ms", LongType()),
        StructField("pix_sum", LongType()),
        StructField("n_pix", LongType()),
        StructField("err", StringType()),
    ]
)


def decode_video(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """REAL frame-sequenced video decode (round 8): parse each binary
    payload as APNG (operators/apng.py — the one video-like container
    the stdlib can genuinely demux; the pixel layer is the png.py
    codec reused whole) and emit ONE ROW PER FRAME with typed frame
    features: index, dimensions, per-frame delay, exact pixel-byte
    sum/count. A plain PNG payload yields a single frame with delay
    0, so stills and animations flow through one kernel. Real
    containers (MP4/WebM) need native demuxers — their byte-slice
    stand-in stays ``frame_offsets`` — but everything Spark-side
    (row-per-frame fan-out inside mapInPandas, per-frame stats,
    temporal dedup via hashes over these rows) is identical with a
    native codec swapped in.

    Same failure posture as the other kernels: corrupt payloads give
    one row with null features and ``err`` set — a bad file never
    kills a 100 TB job. Arrow-batched mapInPandas; the per-frame
    fan-out happens inside the kernel, so no explode/shuffle.

    Round 10: payloads are format-SNIFFED like decode_image — ``GIF8``
    demuxes through operators/gif.py (disposal-aware composed frames,
    centisecond delays converted to ms), everything else through the
    APNG/PNG path; one kernel, one row shape for both animation
    containers."""
    from etl_deltalake_spark.operators.apng import decode_apng
    from etl_deltalake_spark.operators.gif import (
        GifError,
        decode_gif_frames,
        rgba_strip_alpha,
    )
    from etl_deltalake_spark.operators.png import PngError

    def _frames_any(payload: bytes):
        """[(delay_ms, pixels, width, height, channels)] per frame."""
        if payload[:4] == b"GIF8":
            w, h, has_alpha, frames = decode_gif_frames(payload)
            ch = 4 if has_alpha else 3
            return [
                (
                    delay_cs * 10,
                    rgba if ch == 4 else rgba_strip_alpha(rgba),
                    w,
                    h,
                    ch,
                )
                for delay_cs, rgba in frames
            ]
        an = decode_apng(payload)
        return [
            (delay, img.pixels, img.width, img.height, img.channels)
            for img, delay in zip(an.frames, an.delays_ms)
        ]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for doc, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    frames = _frames_any(bytes(payload))
                except (PngError, GifError, ValueError) as e:
                    rows.append(
                        (int(doc), None, None, None, None, None, None,
                         None, None, str(e))
                    )
                else:
                    for i, (delay, px, w, h, ch) in enumerate(frames):
                        rows.append(
                            (
                                int(doc), i, w, h,
                                ch, len(frames), delay,
                                sum(px), len(px), None,
                            )
                        )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_idx", "width", "height", "channels",
                    "n_frames", "delay_ms", "pix_sum", "n_pix", "err",
                ],
            ).astype(
                {
                    "doc_id": "int64",
                    "frame_idx": "Int32",
                    "width": "Int32",
                    "height": "Int32",
                    "channels": "Int32",
                    "n_frames": "Int32",
                    "delay_ms": "Int64",
                    "pix_sum": "Int64",
                    "n_pix": "Int64",
                }
            )

    src = df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(payload_col).cast(BinaryType()).alias(payload_col),
    )
    return src.mapInPandas(kernel, schema=VIDEO_DECODE_SCHEMA)


FRAME_AHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("frame_ahash", LongType()),
        StructField("err", StringType()),
    ]
)


def video_frame_ahash(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Temporal perceptual fingerprints (round 8): demux each APNG
    payload and emit one (doc, frame_idx, frame_ahash) row per frame
    — the SAME 8×8 aHash definition as still images
    (``_luma_cells_img`` + ``_ahash64``), so a video frame and the
    identical still collide by construction. Downstream this is the
    video-dedup tier: exact video dupes groupBy the ordered
    frame-hash sequence (e.g. md5 of the concatenated hashes),
    near-dup videos rank by frame-set overlap or per-frame
    ``hamming64`` — all plain relational ops over these rows.
    Arrow-batched mapInPandas, fan-out inside the kernel, zero
    shuffles; per-payload errors in ``err``."""
    from etl_deltalake_spark.operators.apng import decode_apng
    from etl_deltalake_spark.operators.png import PngError

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for doc, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    an = decode_apng(bytes(payload))
                except (PngError, ValueError) as e:
                    rows.append((int(doc), None, None, None, str(e)))
                else:
                    for i, img in enumerate(an.frames):
                        rows.append(
                            (
                                int(doc), i, an.num_frames,
                                _ahash64(_luma_cells_img(img, 8, 8)), None,
                            )
                        )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "frame_idx", "n_frames", "frame_ahash", "err",
                ],
            ).astype(
                {
                    "doc_id": "int64",
                    "frame_idx": "Int32",
                    "n_frames": "Int32",
                    "frame_ahash": "Int64",
                }
            )

    src = df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(payload_col).cast(BinaryType()).alias(payload_col),
    )
    return src.mapInPandas(kernel, schema=FRAME_AHASH_SCHEMA)
