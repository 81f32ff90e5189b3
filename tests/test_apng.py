"""Spec tests for the APNG container codec (operators/apng.py):
frame round-trips (gray / palette / delays), the plain-PNG
single-frame degenerate case, strict rejection of every container
malformation class (sequence numbers, acTL placement and count,
orphan fdAT), the honest gates (sub-region frames, OVER blending),
and the decode_video kernel's row-per-frame + err posture."""

from __future__ import annotations

import struct

import pytest

from etl_deltalake_spark.operators.apng import (
    ApngError,
    UnsupportedApngError,
    decode_apng,
    encode_apng,
)
from etl_deltalake_spark.operators.png import encode_png


def _frames(w, h, nf, seed=0):
    return [
        bytes((seed + f * 17 + k) % 256 for k in range(w * h))
        for f in range(nf)
    ]


def test_apng_roundtrip_gray():
    w, h, nf = 6, 5, 4
    frames = _frames(w, h, nf, seed=9)
    an = decode_apng(
        encode_apng(frames, w, h, delays=[(1 + f, 10) for f in range(nf)])
    )
    assert (an.width, an.height, an.num_frames, an.num_plays) == (w, h, nf, 0)
    assert [bytes(i.pixels) for i in an.frames] == frames
    assert an.delays_ms == [100, 200, 300, 400]
    assert an.duration_ms == 1000


def test_apng_roundtrip_palette_and_delay_den_zero():
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 7, 7])
    frames = [bytes((f + k) % 4 for k in range(12)) for f in range(3)]
    an = decode_apng(
        encode_apng(
            frames, 4, 3, color_type=3, bit_depth=2, palette=pal,
            delays=[(5, 0)] * 3, num_plays=2,
        )
    )
    assert an.num_plays == 2
    assert an.frames[0].channels == 3  # PLTE-expanded per frame
    assert an.delays_ms == [50, 50, 50]  # den 0 means 100 (spec)


def test_plain_png_is_one_frame_animation():
    px = bytes(range(30))
    an = decode_apng(encode_png(px, 6, 5, 0, "cycle"))
    assert an.num_frames == 1 and an.delays_ms == [0]
    assert bytes(an.frames[0].pixels) == px


def _chunks(payload):
    sig, off, out = payload[:8], 8, []
    while off < len(payload):
        n = struct.unpack_from(">I", payload, off)[0]
        out.append(payload[off : off + 12 + n])
        off += 12 + n
    return sig, out


def _rebuild(sig, chunks):
    return sig + b"".join(chunks)


def test_apng_actl_after_idat_rejected():
    pay = encode_apng(_frames(4, 4, 2), 4, 4)
    sig, chunks = _chunks(pay)
    actl = next(c for c in chunks if c[4:8] == b"acTL")
    rest = [c for c in chunks if c[4:8] != b"acTL"]
    idat_at = next(i for i, c in enumerate(rest) if c[4:8] == b"IDAT")
    rest.insert(idat_at + 1, actl)
    with pytest.raises(ApngError, match="acTL after IDAT"):
        decode_apng(_rebuild(sig, rest))


def test_apng_duplicate_actl_rejected():
    pay = encode_apng(_frames(4, 4, 2), 4, 4)
    sig, chunks = _chunks(pay)
    actl_at = next(i for i, c in enumerate(chunks) if c[4:8] == b"acTL")
    chunks.insert(actl_at, chunks[actl_at])
    with pytest.raises(ApngError, match="duplicate acTL"):
        decode_apng(_rebuild(sig, chunks))


def test_apng_frame_count_mismatch_rejected():
    pay = encode_apng(_frames(4, 4, 3), 4, 4)
    sig, chunks = _chunks(pay)
    at = next(i for i, c in enumerate(chunks) if c[4:8] == b"acTL")
    body = struct.pack(">II", 5, 0)  # claims 5 frames, holds 3
    crc = __import__("zlib").crc32(b"acTL" + body) & 0xFFFFFFFF
    chunks[at] = struct.pack(">I", 8) + b"acTL" + body + struct.pack(">I", crc)
    with pytest.raises(ApngError, match="declares 5 frames"):
        decode_apng(_rebuild(sig, chunks))


def test_apng_bad_sequence_number_rejected():
    pay = encode_apng(_frames(4, 4, 3), 4, 4)
    sig, chunks = _chunks(pay)
    # drop the second frame's fcTL → its fdAT seq arrives out of order
    fctls = [i for i, c in enumerate(chunks) if c[4:8] == b"fcTL"]
    del chunks[fctls[1]]
    with pytest.raises(ApngError, match="sequence"):
        decode_apng(_rebuild(sig, chunks))


def test_apng_orphan_fdat_rejected():
    """An fdAT directly after the default-image frame (no new fcTL)
    must error — it would silently merge into the wrong frame."""
    pay = encode_apng(_frames(4, 4, 2), 4, 4)
    sig, chunks = _chunks(pay)
    # move the second frame's fdAT before its fcTL
    fdat_at = next(i for i, c in enumerate(chunks) if c[4:8] == b"fdAT")
    fctl2_at = max(i for i, c in enumerate(chunks) if c[4:8] == b"fcTL")
    assert fctl2_at < fdat_at
    chunks[fctl2_at], chunks[fdat_at] = chunks[fdat_at], chunks[fctl2_at]
    with pytest.raises(ApngError, match="sequence|without a preceding"):
        decode_apng(_rebuild(sig, chunks))


def _mutate_fctl(pay, **over):
    sig, chunks = _chunks(pay)
    at = next(i for i, c in enumerate(chunks) if c[4:8] == b"fcTL")
    meta = list(struct.unpack(">IIIIIHHBB", chunks[at][8:34]))
    names = ["seq", "w", "h", "x", "y", "dnum", "dden", "dispose", "blend"]
    for k, v in over.items():
        meta[names.index(k)] = v
    body = struct.pack(">IIIIIHHBB", *meta)
    crc = __import__("zlib").crc32(b"fcTL" + body) & 0xFFFFFFFF
    chunks[at] = struct.pack(">I", 26) + b"fcTL" + body + struct.pack(">I", crc)
    return _rebuild(sig, chunks)


def test_apng_subregion_frame_gated():
    pay = encode_apng(_frames(4, 4, 2), 4, 4)
    with pytest.raises(UnsupportedApngError, match="sub-region"):
        decode_apng(_mutate_fctl(pay, w=2, h=2, x=1, y=1))


def test_apng_blend_over_gated():
    pay = encode_apng(_frames(4, 4, 2), 4, 4)
    with pytest.raises(UnsupportedApngError, match="blend op 1"):
        decode_apng(_mutate_fctl(pay, blend=1))


def test_apng_encoder_argument_validation():
    with pytest.raises(ValueError, match="at least one frame"):
        encode_apng([], 4, 4)
    with pytest.raises(ValueError, match="delays"):
        encode_apng(_frames(4, 4, 2), 4, 4, delays=[(1, 10)])


def test_decode_video_kernel_rows_and_err(spark):
    """One row per frame for good payloads (stills included), one
    null-feature row with err for corrupt ones — never a raise."""
    from etl_deltalake_spark.operators.multimodal import decode_video

    anim = encode_apng(_frames(5, 4, 3, seed=2), 5, 4,
                       delays=[(1, 10), (2, 10), (3, 10)])
    still = encode_png(bytes(range(20)), 5, 4, 0, "cycle")
    df = spark.createDataFrame(
        [(1, anim), (2, still), (3, b"junk")], ["doc_id", "payload"]
    )
    out = decode_video(df, "doc_id", "payload").collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 3
    assert [r["frame_idx"] for r in sorted(by_doc[1], key=lambda r: r["frame_idx"])] == [0, 1, 2]
    assert all(r["n_frames"] == 3 and r["err"] is None for r in by_doc[1])
    assert [r["delay_ms"] for r in sorted(by_doc[1], key=lambda r: r["frame_idx"])] == [100, 200, 300]
    assert len(by_doc[2]) == 1 and by_doc[2][0]["delay_ms"] == 0
    assert by_doc[2][0]["pix_sum"] == sum(range(20))
    assert len(by_doc[3]) == 1
    assert by_doc[3][0]["err"] is not None and by_doc[3][0]["width"] is None


def test_video_frame_ahash_matches_still_ahash(spark):
    """A video frame and the identical still image carry the SAME
    64-bit perceptual hash — the property that lets one Hamming /
    groupBy dedup tier span stills and video frames."""
    from etl_deltalake_spark.operators.multimodal import (
        image_ahash,
        video_frame_ahash,
    )

    w, h = 12, 10
    frames = _frames(w, h, 3, seed=41)
    anim = encode_apng(frames, w, h)
    stills = [encode_png(fr, w, h, 0, "cycle") for fr in frames]

    vdf = spark.createDataFrame([(1, anim)], ["doc_id", "payload"])
    vrows = sorted(
        video_frame_ahash(vdf, "doc_id", "payload").collect(),
        key=lambda r: r["frame_idx"],
    )
    sdf = spark.createDataFrame(
        list(enumerate(stills)), ["doc_id", "payload"]
    )
    srows = {
        r["doc_id"]: r["ahash"]
        for r in image_ahash(sdf, "doc_id", "payload").collect()
    }
    assert [r["frame_ahash"] for r in vrows] == [srows[i] for i in range(3)]
    assert all(r["err"] is None and r["n_frames"] == 3 for r in vrows)
