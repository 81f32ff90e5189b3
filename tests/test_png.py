"""Pure-stdlib PNG codec (operators/png.py): spec-vector decode
tests (hand-filtered bytes, independent of our encoder), encode →
decode roundtrips across color types and filter modes, and the
corrupt-input error surface the Spark kernel maps to ``err``."""

from __future__ import annotations

import struct
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_deltalake_spark.operators.png import (
    CHANNELS,
    PNG_SIGNATURE,
    PngError,
    UnsupportedPngError,
    decode_png,
    encode_png,
)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _hand_png(width, height, color_type, filtered_scanlines: bytes) -> bytes:
    """Build a PNG from pre-filtered scanline bytes WITHOUT using
    encode_png — so decode tests don't trust our own filter code."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(filtered_scanlines))
        + _chunk(b"IEND", b"")
    )


# ---------------------------------------------------------- spec vectors
# 2x2 grayscale image with raw pixels [[10, 20], [30, 45]]; each case
# filters the second scanline with a different filter type, with the
# filtered bytes derived BY HAND from the PNG spec (§9.2):


def test_decode_sub_up_hand_vector():
    # row0 Sub:  [10, 20-10=10]   row1 Up: [30-10=20, 45-20=25]
    raw = b"\x01\x0a\x0a" + b"\x02\x14\x19"
    img = decode_png(_hand_png(2, 2, 0, raw))
    assert (img.width, img.height, img.channels, img.bit_depth) == (2, 2, 1, 8)
    assert img.pixels == bytes([10, 20, 30, 45])


def test_decode_average_hand_vector():
    # row1 Average: x0: 30 - (0+10)//2 = 25 ; x1: 45 - (30+20)//2 = 20
    raw = b"\x00\x0a\x14" + b"\x03\x19\x14"
    img = decode_png(_hand_png(2, 2, 0, raw))
    assert img.pixels == bytes([10, 20, 30, 45])


def test_decode_paeth_hand_vector():
    # row1 Paeth: x0: pred=paeth(0,10,0)=10 -> 30-10=20
    #             x1: pred=paeth(30,20,10)=30 -> 45-30=15
    raw = b"\x00\x0a\x14" + b"\x04\x14\x0f"
    img = decode_png(_hand_png(2, 2, 0, raw))
    assert img.pixels == bytes([10, 20, 30, 45])


def test_decode_multi_idat():
    # IDAT payload may be split across chunks at any byte boundary
    raw = b"\x00\x0a\x14" + b"\x00\x1e\x2d"
    z = zlib.compress(raw)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    data = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", z[:3])
        + _chunk(b"IDAT", z[3:])
        + _chunk(b"IEND", b"")
    )
    assert decode_png(data).pixels == bytes([10, 20, 30, 45])


# ------------------------------------------------------------ roundtrips


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=9),
    h=st.integers(min_value=1, max_value=9),
    color_type=st.sampled_from([0, 2, 4, 6]),
    filter_mode=st.sampled_from(["none", "cycle"]),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_roundtrip_property(w, h, color_type, filter_mode, seed):
    n = w * h * CHANNELS[color_type]
    px = bytes((seed * 2654435761 + i * 97) % 256 for i in range(n))
    img = decode_png(encode_png(px, w, h, color_type, filter_mode))
    assert (img.width, img.height) == (w, h)
    assert img.channels == CHANNELS[color_type]
    assert img.pixels == px


def test_cycle_mode_exercises_all_filters():
    # height 5 + cycle => scanlines carry filter types 0,1,2,3,4
    px = bytes((i * 7) % 256 for i in range(5 * 5 * 3))
    data = encode_png(px, 5, 5, color_type=2, filter_mode="cycle")
    # pull the filtered stream back out and check the filter bytes
    pos = 8
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        if ctype == b"IDAT":
            idat.extend(data[pos + 8 : pos + 8 + length])
        pos += 12 + length
    raw = zlib.decompress(bytes(idat))
    stride = 5 * 3
    assert [raw[y * (stride + 1)] for y in range(5)] == [0, 1, 2, 3, 4]
    assert decode_png(data).pixels == px


# ------------------------------------------------------------ error surface


def test_bad_signature():
    with pytest.raises(PngError, match="signature"):
        decode_png(b"not a png at all")


def test_truncated_payload():
    good = encode_png(bytes(12), 4, 3, 0, "none")
    with pytest.raises(PngError):
        decode_png(good[: len(good) // 2])


def test_crc_corruption_detected():
    good = bytearray(encode_png(bytes(12), 4, 3, 0, "none"))
    # flip one byte inside the IHDR body (offset 8 sig + 8 header)
    good[18] ^= 0xFF
    with pytest.raises(PngError, match="CRC"):
        decode_png(bytes(good))


def test_unsupported_interlace_and_depth_and_palette():
    def ihdr_png(bit_depth, color_type, _unused=0, interlace=0):
        ihdr = struct.pack(">IIBBBBB", 2, 2, bit_depth, color_type, 0, 0, interlace)
        return (
            PNG_SIGNATURE
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
            + _chunk(b"IEND", b"")
        )

    # interlace methods beyond 0/1 are malformed
    with pytest.raises(PngError, match="interlace method"):
        decode_png(ihdr_png(8, 0, 0, interlace=2))
    # spec-ILLEGAL depth/type combinations are malformed, not gated
    with pytest.raises(PngError, match="invalid"):
        decode_png(ihdr_png(3, 0, 0))
    with pytest.raises(PngError, match="invalid"):
        decode_png(ihdr_png(16, 3, 0))
    with pytest.raises(PngError, match="invalid"):
        decode_png(ihdr_png(4, 2, 0))
    with pytest.raises(UnsupportedPngError, match="color type"):
        decode_png(ihdr_png(8, 7, 0))


# ------------------------------------------------ round 5: palette + 16-bit


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=7),
    h=st.integers(min_value=1, max_value=7),
    color_type=st.sampled_from([0, 2, 4, 6]),
    filter_mode=st.sampled_from(["none", "cycle"]),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_roundtrip_16bit(w, h, color_type, filter_mode, seed):
    """16-bit samples survive encode→decode byte-exactly (big-endian
    2-byte samples, no downsampling)."""
    n = w * h * CHANNELS[color_type] * 2
    px = bytes((seed * 2654435761 + i * 193) % 256 for i in range(n))
    img = decode_png(encode_png(px, w, h, color_type, filter_mode, bit_depth=16))
    assert (img.width, img.height, img.bit_depth) == (w, h, 16)
    assert img.channels == CHANNELS[color_type]
    assert img.pixels == px


def test_roundtrip_palette_expands_to_rgb():
    palette = bytes(
        [255, 0, 0, 0, 255, 0, 0, 0, 255, 17, 34, 51]
    )  # 4 entries
    idx = bytes([0, 1, 2, 3, 3, 2, 1, 0, 0, 0, 1, 1, 2, 2, 3, 3, 0, 2, 1, 3])
    img = decode_png(
        encode_png(idx, 4, 5, color_type=3, filter_mode="cycle", palette=palette)
    )
    assert (img.width, img.height, img.channels, img.bit_depth) == (4, 5, 3, 8)
    want = b"".join(palette[3 * i : 3 * i + 3] for i in idx)
    assert img.pixels == want


def test_palette_error_surface():
    palette = bytes([1, 2, 3, 4, 5, 6])  # 2 entries
    # index out of range caught at expansion
    data = encode_png(bytes([0, 1, 1, 2]), 2, 2, 3, "none", palette=palette)
    with pytest.raises(PngError, match="palette index"):
        decode_png(data)
    # missing PLTE
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    raw = zlib.compress(b"\x00\x00\x00\x00\x00\x00")
    no_plte = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", raw)
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(PngError, match="missing PLTE"):
        decode_png(no_plte)
    # tRNS decodes now (round 6) — this 2x2 all-index-0 image with a
    # half-transparent entry-0 expands to RGBA with alpha 0x80
    trns = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", palette)
        + _chunk(b"tRNS", b"\x80")
        + _chunk(b"IDAT", raw)
        + _chunk(b"IEND", b"")
    )
    t = decode_png(trns)
    assert (t.channels, t.bit_depth) == (4, 8)
    assert t.pixels == bytes([1, 2, 3, 0x80]) * 4
    # tRNS ordering/shape errors stay PngError
    bad_order = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"tRNS", b"\x80")
        + _chunk(b"PLTE", palette)
        + _chunk(b"IDAT", raw)
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(PngError, match="tRNS before PLTE"):
        decode_png(bad_order)
    # encoder guards
    with pytest.raises(PngError, match="palette"):
        encode_png(bytes(4), 2, 2, 3, "none")  # no palette given
    with pytest.raises(PngError, match="invalid"):
        encode_png(bytes(4), 2, 2, 0, "none", bit_depth=12)


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=9),
    h=st.integers(min_value=1, max_value=9),
    depth=st.sampled_from([1, 2, 4]),
    filter_mode=st.sampled_from(["none", "cycle"]),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_roundtrip_packed_gray(w, h, depth, filter_mode, seed):
    """1/2/4-bit gray roundtrips: packed MSB-first scanlines decode
    back to the left-bit-replicated 8-bit samples that were encoded
    (encode∘decode identity, including non-byte-aligned row ends)."""
    scale = {1: 255, 2: 85, 4: 17}[depth]
    px = bytes(
        ((seed * 2654435761 + i * 131) % (1 << depth)) * scale
        for i in range(w * h)
    )
    img = decode_png(encode_png(px, w, h, 0, filter_mode, bit_depth=depth))
    assert (img.width, img.height, img.channels, img.bit_depth) == (w, h, 1, 8)
    assert img.pixels == px


def test_roundtrip_packed_palette():
    """2-bit palette: indices pack 4-per-byte, expand through PLTE."""
    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
    idx = bytes([(i * 3) % 4 for i in range(5 * 4)])  # width 5: pad bits
    img = decode_png(
        encode_png(idx, 5, 4, 3, "cycle", bit_depth=2, palette=palette)
    )
    assert (img.width, img.height, img.channels, img.bit_depth) == (5, 4, 3, 8)
    assert img.pixels == b"".join(palette[3 * i : 3 * i + 3] for i in idx)


def test_packed_gray_hand_vector():
    """Spec vector independent of our encoder: 1-bit 10×2 image with
    pattern 1010101010 / 0101010101 packed by hand (0xAA80? no — MSB
    first: 10101010 10______ → 0xAA,0x80 row0; 01010101 01______ →
    0x55,0x40 row1), filter 0."""
    raw = b"\x00\xaa\x80" + b"\x00\x55\x40"
    ihdr = struct.pack(">IIBBBBB", 10, 2, 1, 0, 0, 0, 0)
    data = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    img = decode_png(data)
    row0 = bytes([255, 0] * 5)
    row1 = bytes([0, 255] * 5)
    assert img.pixels == row0 + row1


def test_size_mismatch_rejected():
    with pytest.raises(PngError, match="pixel buffer"):
        encode_png(bytes(5), 2, 2, 0, "none")
    # decompressed stream shorter than height*(stride+1)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    data = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00\x0a\x14"))  # one row only
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(PngError, match="decompressed size"):
        decode_png(data)


# ------------------------------------------------ round 5: Adam7 interlace


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=11),
    h=st.integers(min_value=1, max_value=11),
    color_type=st.sampled_from([0, 2, 4, 6]),
    depth=st.sampled_from([8, 16]),
    filter_mode=st.sampled_from(["none", "cycle"]),
    seed=st.integers(min_value=0, max_value=2**31),
)
def test_roundtrip_adam7(w, h, color_type, depth, filter_mode, seed):
    """Adam7 roundtrips across color types and depths — including
    dimensions where some passes are empty (w or h < 5)."""
    n = w * h * CHANNELS[color_type] * (depth // 8)
    px = bytes((seed * 2654435761 + i * 151) % 256 for i in range(n))
    img = decode_png(
        encode_png(
            px, w, h, color_type, filter_mode, bit_depth=depth, interlace=True
        )
    )
    assert (img.width, img.height, img.bit_depth) == (w, h, depth)
    assert img.pixels == px


def test_roundtrip_adam7_packed_and_palette():
    """Adam7 composes with sub-byte packing and palette expansion."""
    # 2-bit gray, 9x9 (all 7 passes non-empty)
    px = bytes(((i * 5) % 4) * 85 for i in range(9 * 9))
    img = decode_png(
        encode_png(px, 9, 9, 0, "cycle", bit_depth=2, interlace=True)
    )
    assert img.pixels == px
    # 4-bit palette
    palette = bytes(b for i in range(16) for b in (i * 16, 255 - i * 16, i))
    idx = bytes((i * 7) % 16 for i in range(6 * 7))
    img2 = decode_png(
        encode_png(idx, 6, 7, 3, "cycle", bit_depth=4, palette=palette,
                   interlace=True)
    )
    assert img2.pixels == b"".join(palette[3 * i : 3 * i + 3] for i in idx)


def test_adam7_interlace_flag_in_container():
    """The written IHDR carries interlace=1 and decode uses the
    7-pass layout (byte streams differ from the sequential form)."""
    px = bytes(range(64))
    seq = encode_png(px, 8, 8, 0, "none")
    il = encode_png(px, 8, 8, 0, "none", interlace=True)
    assert seq[28] == 0 and il[28] == 1  # IHDR interlace byte
    assert decode_png(il).pixels == decode_png(seq).pixels == px


def test_trns_palette_partial_table_rest_opaque():
    """Entries past the tRNS table default to alpha 255 (spec
    §11.3.2) — the common case of one transparent background entry."""
    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # 3 entries
    idx = bytes([0, 1, 2, 2, 1, 0])
    img = decode_png(
        encode_png(idx, 3, 2, 3, "cycle", palette=palette, trns=b"\x00")
    )
    assert (img.channels, img.bit_depth) == (4, 8)
    alphas = [img.pixels[4 * i + 3] for i in range(6)]
    assert alphas == [0, 255, 255, 255, 255, 0]
    rgbs = [tuple(img.pixels[4 * i : 4 * i + 3]) for i in range(6)]
    assert rgbs[0] == (255, 0, 0) and rgbs[1] == (0, 255, 0)


def test_trns_gray_key_8bit_and_16bit():
    # 8-bit: key 0x2A transparent, others opaque
    px = bytes([0x2A, 0x10, 0x2A, 0xFF])
    img = decode_png(
        encode_png(px, 2, 2, 0, "cycle", trns=struct.pack(">H", 0x2A))
    )
    assert (img.channels, img.bit_depth) == (2, 8)
    assert img.pixels == bytes([0x2A, 0, 0x10, 255, 0x2A, 0, 0xFF, 255])
    # 16-bit: full-range key, 2-byte alpha samples
    px16 = struct.pack(">4H", 0x1234, 0xABCD, 0x1234, 0x0001)
    img16 = decode_png(
        encode_png(
            px16, 2, 2, 0, "none", bit_depth=16,
            trns=struct.pack(">H", 0x1234),
        )
    )
    assert (img16.channels, img16.bit_depth) == (2, 16)
    want = struct.pack(
        ">8H", 0x1234, 0, 0xABCD, 0xFFFF, 0x1234, 0, 0x0001, 0xFFFF
    )
    assert img16.pixels == want


def test_trns_gray_subbyte_key_replicates():
    """A 4-bit key compares against the SAME left-bit-replicated
    8-bit samples the decoder emits: key 5 → sample 85."""
    px = bytes([5 * 17, 3 * 17, 5 * 17, 15 * 17])  # replicated samples
    img = decode_png(
        encode_png(
            px, 2, 2, 0, "none", bit_depth=4,
            trns=struct.pack(">H", 5),
        )
    )
    assert img.pixels == bytes(
        [85, 0, 51, 255, 85, 0, 255, 255]
    )


def test_trns_rgb_key():
    key = (10, 200, 30)
    px = bytes([10, 200, 30, 11, 200, 30, 10, 200, 30, 0, 0, 0])
    img = decode_png(
        encode_png(px, 2, 2, 2, "cycle", trns=struct.pack(">3H", *key))
    )
    assert (img.channels, img.bit_depth) == (4, 8)
    alphas = [img.pixels[4 * i + 3] for i in range(4)]
    assert alphas == [0, 255, 0, 255]
    # 16-bit RGB key
    px16 = struct.pack(">6H", 1, 2, 3, 1, 2, 4)
    img16 = decode_png(
        encode_png(
            px16, 2, 1, 2, "none", bit_depth=16,
            trns=struct.pack(">3H", 1, 2, 3),
        )
    )
    a16 = struct.unpack(">8H", img16.pixels)
    assert (a16[3], a16[7]) == (0, 0xFFFF)


def test_trns_forbidden_on_alpha_types():
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 4, 0, 0, 0)
    raw = zlib.compress(b"\x00\x01\x02")
    bad = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"tRNS", b"\x00\x00")
        + _chunk(b"IDAT", raw)
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(PngError, match="forbidden"):
        decode_png(bad)
    with pytest.raises(PngError, match="forbidden"):
        encode_png(bytes([1, 2]), 1, 1, 4, "none", trns=b"\x00\x00")


def test_chunk_ordering_trns_and_plte(  # round 8 (ADVICE r7)
):
    """Spec §5.6 ordering: tRNS and PLTE must precede the first IDAT,
    and neither may repeat — a late or duplicate ancillary chunk
    silently changing decoded pixels is exactly the corrupt-header
    class this codec errors on."""
    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    good = encode_png(
        bytes([0, 1, 2, 2]), 2, 2, 3, "cycle", palette=palette, trns=b"\x00"
    )

    def split(payload):
        sig, off, chunks = payload[:8], 8, []
        while off < len(payload):
            n = struct.unpack_from(">I", payload, off)[0]
            chunks.append(payload[off : off + 12 + n])
            off += 12 + n
        return sig, chunks

    sig, chunks = split(good)
    by_type = {c[4:8]: c for c in chunks}

    def rebuild(order):
        return sig + b"".join(order)

    # move tRNS after the first IDAT
    reordered = [
        c for c in chunks if c[4:8] != b"tRNS"
    ]
    idat_at = next(i for i, c in enumerate(reordered) if c[4:8] == b"IDAT")
    reordered.insert(idat_at + 1, by_type[b"tRNS"])
    with pytest.raises(PngError, match="tRNS after IDAT"):
        decode_png(rebuild(reordered))

    # duplicate tRNS (both before IDAT)
    dup = list(chunks)
    trns_at = next(i for i, c in enumerate(dup) if c[4:8] == b"tRNS")
    dup.insert(trns_at, by_type[b"tRNS"])
    with pytest.raises(PngError, match="duplicate tRNS"):
        decode_png(rebuild(dup))

    # move PLTE after the first IDAT
    reordered = [c for c in chunks if c[4:8] != b"PLTE"]
    idat_at = next(i for i, c in enumerate(reordered) if c[4:8] == b"IDAT")
    reordered.insert(idat_at + 1, by_type[b"PLTE"])
    with pytest.raises(PngError, match="PLTE after IDAT|palette tRNS before PLTE"):
        decode_png(rebuild(reordered))

    # duplicate PLTE
    dup = list(chunks)
    plte_at = next(i for i, c in enumerate(dup) if c[4:8] == b"PLTE")
    dup.insert(plte_at, by_type[b"PLTE"])
    with pytest.raises(PngError, match="duplicate PLTE"):
        decode_png(rebuild(dup))

    # the untouched payload still decodes
    assert decode_png(good).channels == 4
