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
 - The actual pixel/sample decoding needs codec libraries (Pillow,
   ffmpeg, torchaudio ...) that are NOT in this container, so the
   decode kernel is stubbed: ``decode_image`` raises
   ``NotImplementedError`` unless a decoder is importable, and
   ``fake_decode_features`` provides a deterministic stand-in used by
   tests/oracles. The Spark-side contract — schemas, batching, UDF
   signatures — is the real, tested part; swapping the kernel body
   for Pillow later changes no plan shape.

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


def _decoder_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


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


def decode_image(df: DataFrame, payload_col: str) -> DataFrame:
    """Decode image payloads to (width, height, mode) via Pillow.

    STUB: the container has no codec libraries; raises until a
    decoder is installed. The mapInPandas plumbing below
    (``map_payload_features``) is the tested execution path — a real
    decoder drops into the same kernel signature.
    """
    if not _decoder_available():
        raise NotImplementedError(
            "image decode requires Pillow (not in this container); "
            "use fake_decode_features / map_payload_features for the "
            "deterministic test path"
        )
    raise NotImplementedError("Pillow decode kernel not wired yet")


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
