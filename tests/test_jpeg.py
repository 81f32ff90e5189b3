"""Baseline JPEG codec gates (operators/jpeg.py, round 9).

Test strategy = the round-8 WAV/ADPCM precedent: an INDEPENDENT
in-test decoder written straight from the public spec (ITU-T.81)
with its own structure (string-keyed Huffman walk, quadruple-loop
cosine IDCT via math.cos — no shared helpers with the production
module), landmark pixel vectors derived from the spec formulas by
hand in-test, a malformed-header rejection battery, and the
DC-exactness contract the driver-graded q_media_decode branch rides.
"""

from __future__ import annotations

import math
import random

import pytest

from etl_deltalake_spark.operators.jpeg import (
    FLAT_Q8,
    JpegError,
    UnsupportedJpegError,
    decode_jpeg,
    encode_jpeg,
)

# ---------------------------------------------------------------- helpers


def _flat_blocks_gray(wb: int, hb: int, vals):
    """Block-constant grayscale image bytes (the exactness contract)."""
    w, h = 8 * wb, 8 * hb
    return (
        bytes(vals[(y // 8) * wb + (x // 8)] for y in range(h) for x in range(w)),
        w,
        h,
    )


# ------------------------------------------- independent spec decoder


def _ref_decode(data: bytes):
    """From-scratch baseline JPEG decode per ITU-T.81 — no code or
    helpers shared with operators/jpeg.py. Returns (width, height,
    channels, pixels bytes). Grayscale and YCbCr, any sampling,
    restart intervals; raises on anything else."""
    assert data[:2] == b"\xff\xd8"
    # zigzag written out longhand (the spec's Figure A.6 order)
    zz = [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
    i = 2
    quant = {}
    hufftab = {}  # (class, id) -> {bitstring: symbol}
    frame = None
    dri = 0
    while True:
        assert data[i] == 0xFF
        m = data[i + 1]
        i += 2
        if m == 0xD9:
            raise AssertionError("EOI before scan")
        ln = (data[i] << 8) | data[i + 1]
        seg = data[i + 2:i + ln]
        i += ln
        if m == 0xDB:
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                j += 1
                t = [0] * 64
                for k in range(64):
                    if pq:
                        t[zz[k]] = (seg[j] << 8) | seg[j + 1]
                        j += 2
                    else:
                        t[zz[k]] = seg[j]
                        j += 1
                quant[tq] = t
        elif m == 0xC4:
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                counts = seg[j + 1:j + 17]
                j += 17
                table = {}
                code = 0
                for length in range(1, 17):
                    for _ in range(counts[length - 1]):
                        table[format(code, f"0{length}b")] = seg[j]
                        j += 1
                        code += 1
                    code <<= 1
                hufftab[(tc, th)] = table
        elif m in (0xC0, 0xC1):
            assert seg[0] == 8
            H = (seg[1] << 8) | seg[2]
            W = (seg[3] << 8) | seg[4]
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append([cid, hv >> 4, hv & 15, tq, 0, 0])
            frame = (W, H, comps)
        elif m == 0xDD:
            dri = (seg[0] << 8) | seg[1]
        elif m == 0xDA:
            W, H, comps = frame
            for j in range(seg[0]):
                cid, t = seg[1 + 2 * j], seg[2 + 2 * j]
                for c in comps:
                    if c[0] == cid:
                        c[4], c[5] = t >> 4, t & 15
            break
    # entropy decode
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (W + 8 * hmax - 1) // (8 * hmax)
    mcuy = (H + 8 * vmax - 1) // (8 * vmax)
    planes = {
        c[0]: [
            [0.0] * (mcux * c[1] * 8) for _ in range(mcuy * c[2] * 8)
        ]
        for c in comps
    }

    bits = []
    pos = i

    def fill():
        nonlocal pos
        b = data[pos]
        if b == 0xFF:
            assert data[pos + 1] == 0x00, "marker inside entropy data"
            pos += 2
        else:
            pos += 1
        bits.extend(int(x) for x in format(b, "08b"))

    def getbits(n):
        while len(bits) < n:
            fill()
        out = bits[:n]
        del bits[:n]
        return out

    def huffdec(table):
        s = ""
        while True:
            s += str(getbits(1)[0])
            if s in table:
                return table[s]
            assert len(s) <= 16

    def extend(v, s):
        return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

    def val(n):
        v = 0
        for b in getbits(n):
            v = (v << 1) | b
        return v

    pred = {c[0]: 0 for c in comps}
    nmcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and nmcu and nmcu % dri == 0:
                bits.clear()
                assert data[pos] == 0xFF and data[pos + 1] == 0xD0 + rst
                pos += 2
                rst = (rst + 1) % 8
                pred = {c[0]: 0 for c in comps}
            for cid, ch, cv, tq, td, ta in comps:
                for by in range(cv):
                    for bx in range(ch):
                        coef = [0] * 64
                        s = huffdec(hufftab[(0, td)])
                        pred[cid] += extend(val(s), s) if s else 0
                        coef[0] = pred[cid] * quant[tq][0]
                        k = 1
                        while k < 64:
                            rs = huffdec(hufftab[(1, ta)])
                            r, sz = rs >> 4, rs & 15
                            if sz == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break
                            k += r
                            coef[zz[k]] = extend(val(sz), sz) * quant[tq][zz[k]]
                            k += 1
                        # direct quadruple-loop IDCT from the spec
                        for y in range(8):
                            for x in range(8):
                                acc = 0.0
                                for u in range(8):
                                    cu = 1 / math.sqrt(2) if u == 0 else 1.0
                                    for v in range(8):
                                        if coef[u * 8 + v] == 0:
                                            continue
                                        cvv = (
                                            1 / math.sqrt(2) if v == 0 else 1.0
                                        )
                                        acc += (
                                            cu * cvv * coef[u * 8 + v]
                                            * math.cos((2 * y + 1) * u * math.pi / 16)
                                            * math.cos((2 * x + 1) * v * math.pi / 16)
                                        )
                                planes[cid][(my * cv + by) * 8 + y][
                                    (mx * ch + bx) * 8 + x
                                ] = acc / 4 + 128
            nmcu += 1

    def clamp8(v):
        return max(0, min(255, int(round(v))))

    if len(comps) == 1:
        plane = planes[comps[0][0]]
        return W, H, 1, bytes(
            clamp8(plane[y][x]) for y in range(H) for x in range(W)
        )
    out = bytearray()
    for y in range(H):
        for x in range(W):
            samp = []
            for cid, ch, cv, *_ in comps:
                samp.append(planes[cid][y * cv // vmax][x * ch // hmax])
            Y, Cb, Cr = samp
            out.append(clamp8(Y + 1.402 * (Cr - 128)))
            out.append(
                clamp8(Y - 0.344136 * (Cb - 128) - 0.714136 * (Cr - 128))
            )
            out.append(clamp8(Y + 1.772 * (Cb - 128)))
    return W, H, 3, bytes(out)


# ----------------------------------------------------------------- tests


def test_dc_exactness_contract():
    """Flat blocks + flat-8s quant round-trip BIT-EXACTLY — the
    invariant the driver-graded q_media_decode JPEG branch rides."""
    for seed in range(5):
        wb, hb = 1 + seed % 3, 1 + seed % 2
        vals = [(seed * 31 + b) % 256 for b in range(wb * hb)]
        px, w, h = _flat_blocks_gray(wb, hb, vals)
        img = decode_jpeg(encode_jpeg(px, w, h, 1))
        assert (img.width, img.height, img.channels) == (w, h, 1)
        assert img.pixels == px


def test_against_independent_decoder_gray():
    """Production decoder vs the from-scratch in-test spec decoder on
    full-AC grayscale content: same dims, pixels within ±1 (the two
    IDCTs sum float terms in different orders), ≥99% exactly equal."""
    random.seed(11)
    px = bytes(random.randrange(256) for _ in range(19 * 13))
    blob = encode_jpeg(px, 19, 13, 1, quant=[1] * 64)
    img = decode_jpeg(blob)
    rw, rh, rc, rpx = _ref_decode(blob)
    assert (rw, rh, rc) == (img.width, img.height, img.channels)
    diffs = [abs(a - b) for a, b in zip(img.pixels, rpx)]
    assert max(diffs) <= 1
    assert diffs.count(0) / len(diffs) >= 0.99


@pytest.mark.parametrize("subsample", ["444", "420"])
def test_against_independent_decoder_color(subsample):
    random.seed(13)
    px = bytes(random.randrange(256) for _ in range(12 * 10 * 3))
    blob = encode_jpeg(px, 12, 10, 3, quant=[2] * 64, subsample=subsample)
    img = decode_jpeg(blob)
    rw, rh, rc, rpx = _ref_decode(blob)
    assert (rw, rh, rc) == (img.width, img.height, 3)
    diffs = [abs(a - b) for a, b in zip(img.pixels, rpx)]
    assert max(diffs) <= 1
    assert diffs.count(0) / len(diffs) >= 0.99


def test_restart_interval_roundtrip_and_independent():
    px, w, h = _flat_blocks_gray(3, 2, [10, 60, 110, 160, 210, 255])
    blob = encode_jpeg(px, w, h, 1, restart_interval=2)
    assert b"\xff\xd0" in blob  # RST0 actually emitted
    assert decode_jpeg(blob).pixels == px
    assert _ref_decode(blob)[3] == px


def test_landmark_single_ac_coefficient():
    """Hand-derived landmark: a stream whose only nonzero quantized
    coefficient is AC(0,1)=a with q=1 must decode to
    clamp(round(0.25·(1/√2)·a·cos((2x+1)π/16)) + 128) per column —
    computed here straight from the spec formula, then compared
    against the production decode of an encoder-built stream whose
    pixel input is crafted to quantize to exactly that spectrum."""
    a = 40
    # target spatial surface for coefficient AC(v=1) along x
    col = [
        0.25 * (1 / math.sqrt(2)) * a * math.cos((2 * x + 1) * math.pi / 16)
        for x in range(8)
    ]
    target = bytes(
        max(0, min(255, round(128 + col[x]))) for _ in range(8) for x in range(8)
    )
    # encode with q=1: forward DCT of this (already-rounded) image
    # yields AC(0,1)≈a plus small residues; decode and compare to the
    # true surface within ±1 (the rounding of `target` itself)
    img = decode_jpeg(encode_jpeg(target, 8, 8, 1, quant=[1] * 64))
    diffs = [abs(p - t) for p, t in zip(img.pixels, target)]
    assert max(diffs) <= 1
    # and the independent decoder agrees with production exactly ±1
    rpx = _ref_decode(encode_jpeg(target, 8, 8, 1, quant=[1] * 64))[3]
    assert max(abs(p - t) for p, t in zip(img.pixels, rpx)) <= 1


def test_sixteen_bit_dqt_accepted():
    """A 16-bit-precision DQT (pq=1) must parse: rewrite the encoder's
    8-bit table segment into the wide form and re-decode."""
    px, w, h = _flat_blocks_gray(2, 1, [77, 200])
    blob = bytearray(encode_jpeg(px, w, h, 1))
    i = blob.find(b"\xff\xdb")
    ln = (blob[i + 2] << 8) | blob[i + 3]
    body = blob[i + 4:i + 2 + ln]
    assert body[0] == 0x00 and len(body) == 65
    wide = bytes([0x10]) + b"".join(
        int(b).to_bytes(2, "big") for b in body[1:]
    )
    new = (
        bytes(blob[:i])
        + b"\xff\xdb"
        + (len(wide) + 2).to_bytes(2, "big")
        + wide
        + bytes(blob[i + 2 + ln:])
    )
    assert decode_jpeg(new).pixels == px


def test_unsupported_variants_raise_honestly():
    px, w, h = _flat_blocks_gray(1, 1, [128])
    blob = bytearray(encode_jpeg(px, w, h, 1))
    i = blob.find(b"\xff\xc0")
    for marker, msg in [
        (0xC3, "lossless"),
        (0xC9, "arithmetic"),
        (0xC5, "non-baseline"),
    ]:
        mutated = bytearray(blob)
        mutated[i + 1] = marker
        with pytest.raises(UnsupportedJpegError, match=msg):
            decode_jpeg(bytes(mutated))
    # SOF2 is SUPPORTED since round 10 — but a baseline scan header
    # (Ss=0, Se=63) inside a progressive file is malformed, so the
    # naive marker swap now fails as a corrupt file, not as an
    # unsupported variant
    mutated = bytearray(blob)
    mutated[i + 1] = 0xC2
    with pytest.raises(JpegError, match="Se=0"):
        decode_jpeg(bytes(mutated))
    # 12-bit precision
    mutated = bytearray(blob)
    mutated[i + 4] = 12
    with pytest.raises(UnsupportedJpegError, match="12-bit"):
        decode_jpeg(bytes(mutated))


def test_malformed_battery():
    px, w, h = _flat_blocks_gray(2, 1, [30, 220])
    blob = encode_jpeg(px, w, h, 1)
    with pytest.raises(JpegError, match="SOI"):
        decode_jpeg(b"\x00" * 8)
    with pytest.raises(JpegError):
        decode_jpeg(blob[:10])  # truncated in headers
    with pytest.raises(JpegError):
        decode_jpeg(blob[:-20])  # truncated entropy stream
    # zero dimensions
    bad = bytearray(blob)
    i = bad.find(b"\xff\xc0")
    bad[i + 5:i + 7] = (0).to_bytes(2, "big")
    with pytest.raises(JpegError, match="zero image dimensions"):
        decode_jpeg(bytes(bad))
    # scan referencing a missing quant table (SOF comp layout after
    # FF C0 len prec hh ww nc: id @ i+10, hv @ i+11, tq @ i+12)
    bad = bytearray(blob)
    bad[i + 12] = 3  # component tq -> undefined table 3
    with pytest.raises(JpegError, match="missing DQT"):
        decode_jpeg(bytes(bad))


def test_decode_image_sniffs_jpeg_png_gif(spark):
    """multimodal.decode_image routes FF D8 to the JPEG codec,
    GIF8 to the GIF codec (round 10), and keeps PNG working in the
    same kernel, with per-row error capture for corrupt payloads of
    every format."""
    from etl_deltalake_spark.operators.gif import encode_gif
    from etl_deltalake_spark.operators.multimodal import decode_image
    from etl_deltalake_spark.operators.png import encode_png

    px, w, h = _flat_blocks_gray(2, 1, [40, 90])
    jpeg_blob = encode_jpeg(px, w, h, 1)
    png_blob = encode_png(bytes([1, 2, 3, 4, 5, 6]), 3, 2, 0, "cycle")
    pal = [(9, 8, 7), (1, 2, 3)]
    gif_blob = encode_gif(bytes([0, 1, 1, 0, 1, 0]), 3, 2, pal)
    rows = [
        (1, bytearray(jpeg_blob)),
        (2, bytearray(png_blob)),
        (3, bytearray(b"\xff\xd8garbage")),
        (4, bytearray(gif_blob)),
        (5, bytearray(b"GIF89a truncated")),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "payload"])
    got = {
        r["doc_id"]: r for r in decode_image(df, "doc_id", "payload").collect()
    }
    assert (got[1]["width"], got[1]["height"], got[1]["channels"]) == (w, h, 1)
    assert got[1]["pix_sum"] == sum(px) and got[1]["err"] is None
    assert (got[2]["width"], got[2]["height"]) == (3, 2)
    assert got[2]["pix_sum"] == 21
    assert got[3]["err"] is not None and got[3]["width"] is None
    assert (got[4]["width"], got[4]["height"], got[4]["channels"]) == (3, 2, 3)
    assert got[4]["pix_sum"] == 3 * (9 + 8 + 7) + 3 * (1 + 2 + 3)
    assert got[4]["err"] is None
    assert got[5]["err"] is not None and got[5]["width"] is None


def test_ycbcr_input_mcu_constant_color_exactness():
    """The color-exactness contract behind q_media_decode mode 6:
    MCU-constant YCbCr planes fed via ycbcr_input survive
    DCT/quant/4:2:0-box-average bit-exactly, so decoded RGB equals
    the closed-form conversion of the ORIGINAL YCbCr."""

    def clamp8(v):
        return max(0, min(255, round(v)))

    d = 9  # arbitrary doc-style seed
    tx, ty = 2, 2
    w, h = 16 * tx, 16 * ty
    buf = bytearray()
    for yy in range(h):
        for xx in range(w):
            t = (yy // 16) * tx + (xx // 16)
            buf += bytes(
                (
                    (d * 31 + 5 * t) % 256,
                    4 * ((d * 17 + 7 * t) % 60) + 4,
                    4 * ((d * 13 + 11 * t) % 60) + 4,
                )
            )
    img = decode_jpeg(
        encode_jpeg(bytes(buf), w, h, 3, subsample="420", ycbcr_input=True)
    )
    expected = bytearray()
    for yy in range(h):
        for xx in range(w):
            t = (yy // 16) * tx + (xx // 16)
            Y = (d * 31 + 5 * t) % 256
            Cb = 4 * ((d * 17 + 7 * t) % 60) + 4
            Cr = 4 * ((d * 13 + 11 * t) % 60) + 4
            expected.append(clamp8(Y + 1.402 * (Cr - 128)))
            expected.append(
                clamp8(Y - 0.344136 * (Cb - 128) - 0.714136 * (Cr - 128))
            )
            expected.append(clamp8(Y + 1.772 * (Cb - 128)))
    assert img.pixels == bytes(expected)


def test_rgb_rounding_never_hits_half_for_mode6_domain():
    """Enumerated proof for the oracle's rounding-rule independence:
    over the FULL mode-6 fixture domain (any integer Y, chroma a
    multiple of 4 in [4, 240]), no RGB conversion term lands on an
    exact .5 float64 boundary — so numpy's half-to-even and SQL's
    half-away-from-zero agree everywhere the oracle replays."""
    import math

    def frac_is_half(x):
        return math.floor(x) + 0.5 == x

    chroma = range(4, 241, 4)
    assert not any(frac_is_half(1.402 * (c - 128)) for c in chroma)
    assert not any(frac_is_half(1.772 * (c - 128)) for c in chroma)
    assert not any(
        frac_is_half(-0.344136 * (cb - 128) - 0.714136 * (cr - 128))
        for cb in chroma
        for cr in chroma
    )


# -------------------------------------------- progressive (round 10)

def _prog():
    from etl_deltalake_spark.operators.jpeg import (
        DEFAULT_SCANS_COLOR,
        DEFAULT_SCANS_GRAY,
        encode_jpeg_progressive,
    )

    return encode_jpeg_progressive, DEFAULT_SCANS_GRAY, DEFAULT_SCANS_COLOR


@pytest.mark.parametrize(
    "w,h", [(8, 8), (16, 16), (17, 9), (24, 31), (40, 40)]
)
def test_progressive_equals_baseline_gray(w, h):
    """The equivalence gate: a full progressive script reconstructs
    exactly the sequential coefficient array, so progressive decode
    must be PIXEL-IDENTICAL to the (independently cross-engine-
    graded) baseline decode of the same input — on arbitrary random
    content, not just the closed-form fixtures."""
    enc_prog, _, _ = _prog()
    random.seed(w * 100 + h)
    px = bytes(random.randrange(256) for _ in range(w * h))
    base = decode_jpeg(encode_jpeg(px, w, h, 1))
    prog = decode_jpeg(enc_prog(px, w, h, 1))
    assert (prog.width, prog.height, prog.channels) == (w, h, 1)
    assert prog.pixels == base.pixels


@pytest.mark.parametrize("subsample", ["444", "420"])
def test_progressive_equals_baseline_color(subsample):
    """Interleaved DC scans + per-component AC scans over both
    subsampling layouts (the 4:2:0 luma grid is wider than its
    non-interleaved chroma grids — the MCU-vs-component block-count
    split the spec requires)."""
    enc_prog, _, _ = _prog()
    random.seed(17)
    w, h = 21, 18
    px = bytes(random.randrange(256) for _ in range(w * h * 3))
    base = decode_jpeg(encode_jpeg(px, w, h, 3, subsample=subsample))
    prog = decode_jpeg(enc_prog(px, w, h, 3, subsample=subsample))
    assert prog.pixels == base.pixels


def test_progressive_restart_markers():
    enc_prog, _, _ = _prog()
    random.seed(23)
    w, h = 32, 24
    px = bytes(random.randrange(256) for _ in range(w * h))
    blob = enc_prog(px, w, h, 1, restart_interval=2)
    assert b"\xff\xd0" in blob  # RST actually emitted inside scans
    base = decode_jpeg(encode_jpeg(px, w, h, 1))
    assert decode_jpeg(blob).pixels == base.pixels


def test_progressive_spectral_selection_split_bands():
    """Band-split script (1-5 / 6-63) with a refinement pass whose
    band matches its first scan — exercises per-band EOBRUN state."""
    enc_prog, _, _ = _prog()
    scans = (
        ((0,), 0, 0, 0, 0),
        ((0,), 1, 5, 0, 1),
        ((0,), 6, 63, 0, 0),
        ((0,), 1, 5, 1, 0),
    )
    random.seed(29)
    w, h = 24, 24
    px = bytes(random.randrange(256) for _ in range(w * h))
    base = decode_jpeg(encode_jpeg(px, w, h, 1))
    assert decode_jpeg(enc_prog(px, w, h, 1, scans=scans)).pixels == base.pixels


def test_progressive_eobrun_spans_blocks():
    """A mostly-flat image makes most blocks' AC bands empty, forcing
    EOBn runs > 1 (the r>0 EOBRUN path with appended magnitude bits)
    in both the first and refinement AC scans; the refinement run
    carries buffered correction bits across blocks."""
    enc_prog, scans_gray, _ = _prog()
    # 64x8: eight blocks, only the last has AC energy
    w, h = 64, 8
    px = bytearray([77] * (w * h))
    for y in range(8):
        for x in range(56, 64):
            px[y * w + x] = (x * 37 + y * 91) % 256
    px = bytes(px)
    blob = enc_prog(px, w, h, 1)
    base = decode_jpeg(encode_jpeg(px, w, h, 1))
    assert decode_jpeg(blob).pixels == base.pixels


def test_progressive_dc_exactness_closed_form():
    """The q_media_decode mode-7 contract: block-constant gray + the
    flat all-8s quant table decodes BIT-EXACTLY through any full
    progressive script — the closed form the SQL oracle re-derives."""
    enc_prog, _, _ = _prog()
    px, w, h = _flat_blocks_gray(3, 2, [10, 60, 110, 160, 210, 255])
    assert decode_jpeg(enc_prog(px, w, h, 1)).pixels == px
    # and under a deliberately different script
    scans = (
        ((0,), 0, 0, 0, 2),
        ((0,), 0, 0, 2, 1),
        ((0,), 0, 0, 1, 0),
        ((0,), 1, 63, 0, 0),
    )
    assert decode_jpeg(enc_prog(px, w, h, 1, scans=scans)).pixels == px


def test_progressive_against_independent_decoder():
    """The in-test from-scratch spec decoder cannot read SOF2, but
    the baseline re-encode of the progressive DECODE must match it —
    closing the loop without trusting either progressive codec
    half."""
    enc_prog, _, _ = _prog()
    random.seed(31)
    w, h = 16, 16
    px = bytes(random.randrange(256) for _ in range(w * h))
    prog_pixels = decode_jpeg(enc_prog(px, w, h, 1)).pixels
    blob2 = encode_jpeg(prog_pixels, w, h, 1)
    assert _ref_decode(blob2)[3] == decode_jpeg(blob2).pixels


def test_progressive_error_paths():
    enc_prog, _, _ = _prog()
    px, w, h = _flat_blocks_gray(1, 1, [128])
    blob = bytearray(enc_prog(px, w, h, 1))
    # truncate mid-scan → JpegError, not a crash
    with pytest.raises(JpegError):
        decode_jpeg(bytes(blob[: len(blob) // 2]))
    # AC scan naming two components is illegal in progressive
    from etl_deltalake_spark.operators.jpeg import (
        encode_jpeg_progressive,
    )

    with pytest.raises(JpegError):
        # craft via a legal file then corrupt the SOS ns byte of an
        # AC scan: find the second SOS (first is DC, interleaved ok)
        data = encode_jpeg_progressive(
            bytes(random.randrange(256) for _ in range(16 * 16 * 3)),
            16, 16, 3,
        )
        i = data.find(b"\xff\xda")
        j = data.find(b"\xff\xda", i + 2)
        bad = bytearray(data)
        # ns byte follows the 2-byte length
        bad[j + 4] = 2
        bad[j + 3] = bad[j + 3] + 2  # keep the length consistent
        decode_jpeg(bytes(bad))


def test_fill_bytes_before_markers():
    """Round-11 regression (ADVICE r10): T.81 B.1.1.2 allows any
    number of 0xFF fill bytes before a marker code — real-crawl
    encoders pad with them. Insert fills before header markers, a
    progressive scan's SOS, the RST markers, and EOI; decode must be
    pixel-identical to the unpadded stream, not JpegError."""
    random.seed(411)
    w, h = 24, 16
    px = bytes(random.randrange(256) for _ in range(w * h))
    blob = encode_jpeg(px, w, h, 1)
    want = decode_jpeg(blob).pixels

    # fill before every header marker segment (DQT/DHT/SOF/SOS): the
    # header area is everything before the first SOS payload
    sos = blob.index(b"\xff\xda")
    padded = blob[:2]
    pos = 2
    while pos <= sos:
        assert blob[pos] == 0xFF
        padded += b"\xff\xff" + blob[pos : pos + 2]
        seglen = int.from_bytes(blob[pos + 2 : pos + 4], "big")
        padded += blob[pos + 2 : pos + 2 + seglen]
        pos += 2 + seglen
    padded += blob[pos:]
    assert decode_jpeg(padded).pixels == want

    # progressive: fill before each scan's SOS and before EOI
    # (exercises the post-scan marker search), plus padded RSTs
    enc_prog, _, _ = _prog()
    blob_p = enc_prog(px, w, h, 1, restart_interval=2)
    want_p = decode_jpeg(blob_p).pixels
    out = bytearray()
    i = 0
    while i < len(blob_p) - 1:
        if blob_p[i] == 0xFF and blob_p[i + 1] in (0xDA, 0xD9) or (
            blob_p[i] == 0xFF and 0xD0 <= blob_p[i + 1] <= 0xD7
        ):
            out += b"\xff"
        out += blob_p[i : i + 1]
        i += 1
    out += blob_p[i:]
    assert decode_jpeg(bytes(out)).pixels == want_p
