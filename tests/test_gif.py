"""GIF codec (operators/gif.py, round 10): LZW round-trips that
force code-width growth and the 4096-entry dictionary reset, a
hand-derived landmark stream pinning the exact bit layout, the KwKwK
special case, interlacing, transparency, multi-frame composition
under all disposal methods, and the error battery. Wire-in coverage
(decode_image sniffing) lives in test_multimodal.py's sniff test."""

from __future__ import annotations

import random

import pytest

from etl_deltalake_spark.operators.gif import (
    GifError,
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    decode_gif_frames,
    encode_gif,
)

PAL = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]


@pytest.mark.parametrize(
    "ncolors,length",
    [(4, 10), (4, 1000), (16, 5000), (64, 60000), (2, 200000)],
)
def test_lzw_roundtrip(ncolors, length):
    """Random index streams across alphabet sizes: the big ones force
    every code-width bump (3..12 bits) and — at 200k symbols over 2
    colors — the 4096-entry dictionary reset via an emitted CLEAR."""
    random.seed(ncolors * 1000 + length)
    mcs = max((ncolors - 1).bit_length(), 2)
    idx = bytes(random.randrange(ncolors) for _ in range(length))
    assert _lzw_decode(mcs, _lzw_encode(mcs, idx), length) == idx


def test_lzw_landmark_bit_layout():
    """Hand-derived stream for indices [1,1,2] at minimum code size 2
    (clear=4, EOI=5, width 3): the encoder emits CLEAR,1,1,2,EOI —
    entry 6 = (1,1) is defined but never referenced — packed
    LSB-first: 4 | 1<<3 | 1<<6 | 2<<9 | 5<<12 = bytes 4C 54. Pins the
    bit order, the code ordering, and both directions at once."""
    v = 4 | (1 << 3) | (1 << 6) | (2 << 9) | (5 << 12)
    stream = v.to_bytes(2, "little")
    assert _lzw_encode(2, bytes([1, 1, 2])) == stream
    assert _lzw_decode(2, stream, 3) == bytes([1, 1, 2])


def test_lzw_kwkwk_case():
    """[0,0,0] makes the encoder emit a code the decoder has not yet
    defined (code == table size) — the spec's KwKwK rule."""
    idx = bytes([0, 0, 0])
    enc = _lzw_encode(2, idx)
    assert _lzw_decode(2, enc, 3) == idx
    # and a longer run for repeated applications
    idx = bytes([1] * 50)
    assert _lzw_decode(2, _lzw_encode(2, idx), 50) == idx


def test_still_roundtrip_and_interlace():
    random.seed(7)
    w, h = 7, 5
    idx = bytes(random.randrange(4) for _ in range(w * h))
    img = decode_gif(encode_gif(idx, w, h, PAL))
    assert (img.width, img.height, img.channels, img.bit_depth) == (
        7, 5, 3, 8,
    )
    assert img.n_frames == 1
    assert img.pixels == b"".join(bytes(PAL[i]) for i in idx)
    # Adam-less GIF 4-pass interlace must reconstruct identically
    assert decode_gif(encode_gif(idx, w, h, PAL, interlace=True)).pixels == (
        img.pixels
    )


def test_transparency_yields_rgba():
    idx = bytes([0, 1, 2, 3] * 4)
    img = decode_gif(encode_gif(idx, 4, 4, PAL, transparent_index=2))
    assert img.channels == 4
    px = img.pixels
    for i, ci in enumerate(idx):
        if ci == 2:
            assert px[i * 4 + 3] == 0
        else:
            assert px[i * 4:i * 4 + 3] == bytes(PAL[ci])
            assert px[i * 4 + 3] == 255


def test_multiframe_disposal_background_and_previous():
    f1 = bytes([0] * 16)
    f2 = bytes([1] * 4)
    f3 = bytes([3] * 1)
    rects = [(0, 0, 4, 4), (1, 1, 2, 2), (0, 0, 1, 1)]
    # disposal 2: frame 2's rect restores to (transparent) background
    data = encode_gif(
        [f1, f2, f3], 4, 4, PAL,
        delays=[10, 20, 30], disposals=[1, 2, 0], rects=rects,
    )
    w, h, _, frames = decode_gif_frames(data)
    assert (w, h) == (4, 4)
    assert [d for d, _ in frames] == [10, 20, 30]
    c2 = frames[1][1]
    assert c2[(1 * 4 + 1) * 4:(1 * 4 + 1) * 4 + 3] == bytes(PAL[1])
    assert c2[0:3] == bytes(PAL[0])
    c3 = frames[2][1]
    assert c3[(1 * 4 + 1) * 4 + 3] == 0  # the disposal-2 hole
    assert c3[0:3] == bytes(PAL[3])
    # disposal 3: restore-to-previous brings frame 1's pixel back
    data = encode_gif(
        [f1, f2, f3], 4, 4, PAL, disposals=[1, 3, 0], rects=rects,
    )
    _, _, _, frames = decode_gif_frames(data)
    c3 = frames[2][1]
    assert c3[(1 * 4 + 1) * 4:(1 * 4 + 1) * 4 + 3] == bytes(PAL[0])
    assert c3[0:3] == bytes(PAL[3])


def test_big_palette_and_wide_image():
    """256-color palette (8-bit codes) over a wide image — the
    min-code-size-8 path plus sub-block splitting (>255-byte LZW)."""
    random.seed(11)
    pal = [(i, (i * 7) % 256, (i * 13) % 256) for i in range(256)]
    w, h = 101, 40
    idx = bytes(random.randrange(256) for _ in range(w * h))
    img = decode_gif(encode_gif(idx, w, h, pal))
    assert img.pixels == b"".join(bytes(pal[i]) for i in idx)


def test_error_battery():
    idx = bytes([0, 1, 2, 3])
    good = encode_gif(idx, 2, 2, PAL)
    for payload in (
        b"NOTAGIF" + b"\x00" * 20,
        good[:15],
        good[:-1],  # missing trailer
        good[:10],  # inside the color table
    ):
        with pytest.raises(GifError):
            decode_gif(payload)
    # frame rect outside the screen
    with pytest.raises(GifError):
        decode_gif(
            encode_gif([idx], 2, 2, PAL, rects=[(1, 1, 2, 2)])
        )
    # corrupt LZW: out-of-range code
    bad = bytearray(good)
    # the image data sub-block starts after header+GCT+descriptor+mcs
    with pytest.raises(GifError):
        _lzw_decode(2, b"\xfc\xff", 4)  # code 7 with empty table region


def test_decode_video_demuxes_gif(spark):
    """decode_video sniffs GIF8 and emits one row per composed frame
    with centisecond→ms delays, alongside APNG through the same
    kernel; corrupt GIFs land in err."""
    from etl_deltalake_spark.operators.multimodal import decode_video

    f1 = bytes([0] * 4)
    f2 = bytes([1] * 4)
    gif = encode_gif(
        [f1, f2], 2, 2, PAL, delays=[5, 7],
        rects=[(0, 0, 2, 2), (0, 0, 2, 2)],
    )
    df = spark.createDataFrame(
        [(1, bytearray(gif)), (2, bytearray(b"GIF89a bad"))],
        ["doc_id", "payload"],
    )
    rows = {
        (r["doc_id"], r["frame_idx"]): r
        for r in decode_video(df, "doc_id", "payload").collect()
    }
    r0 = rows[(1, 0)]
    assert (r0["width"], r0["height"], r0["channels"]) == (2, 2, 3)
    assert r0["n_frames"] == 2 and r0["delay_ms"] == 50
    assert r0["pix_sum"] == 4 * sum(PAL[0])
    r1 = rows[(1, 1)]
    assert r1["delay_ms"] == 70 and r1["pix_sum"] == 4 * sum(PAL[1])
    assert rows[(2, None)]["err"] is not None


def test_local_color_table_overrides_global():
    """A frame's LOCAL color table must take precedence over the
    global one (hand-built container: GCT says red/green, LCT says
    blue/white — decoded pixels follow the LCT)."""
    out = bytearray(b"GIF89a")
    out += (2).to_bytes(2, "little") + (1).to_bytes(2, "little")
    out += bytes([0x80 | 0, 0, 0])  # GCT present, 2 entries
    out += bytes([255, 0, 0, 0, 255, 0])  # global: red, green
    out += bytes([0x2C])  # image descriptor
    out += (0).to_bytes(2, "little") * 2
    out += (2).to_bytes(2, "little") + (1).to_bytes(2, "little")
    out += bytes([0x80 | 0])  # LCT present, 2 entries
    out += bytes([0, 0, 255, 255, 255, 255])  # local: blue, white
    out += bytes([2])  # LZW min code size
    lzw = _lzw_encode(2, bytes([0, 1]))
    out += bytes([len(lzw)]) + lzw + b"\x00"
    out += b"\x3B"
    img = decode_gif(bytes(out))
    assert img.pixels == bytes([0, 0, 255, 255, 255, 255])


def test_two_entry_palette_roundtrip():
    """2-color palettes still use LZW minimum code size 2 (the spec
    floor) — the smallest legal container round-trips."""
    pal2 = [(0, 0, 0), (255, 255, 255)]
    idx = bytes([0, 1, 1, 0, 1, 0, 0, 1])
    img = decode_gif(encode_gif(idx, 4, 2, pal2))
    assert img.pixels == b"".join(bytes(pal2[i]) for i in idx)


def test_netscape_loop_extension_skipped():
    """The ubiquitous NETSCAPE2.0 application extension (looping)
    must be skipped structurally, not tripped over."""
    pal2 = [(0, 0, 0), (255, 255, 255)]
    base = encode_gif(bytes([0, 1]), 2, 1, pal2)
    # splice the app extension right after the GCT (13 + 6 bytes in)
    netscape = (
        b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    )
    spliced = base[:19] + netscape + base[19:]
    img = decode_gif(spliced)
    assert img.pixels == bytes([0, 0, 0, 255, 255, 255])
