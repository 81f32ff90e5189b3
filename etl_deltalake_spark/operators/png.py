"""Pure-stdlib PNG codec: the real decode kernel behind
``multimodal.decode_image`` (SURVEY §2.9 multimodal extensions).

PNG is zlib-deflate over per-scanline filtered pixel bytes — both
``zlib`` and ``struct`` are stdlib, so decoding needs no codec
libraries. This replaces the round-1..3 ``NotImplementedError`` stub:
the container has no Pillow/ffmpeg, but PNG (the fixture format) is
fully decodable from first principles.

Scope (honest gates, not padding):
 - every spec-legal depth/type combination, interlaced or not: gray
   at 1/2/4/8/16 bits (packed depths unpack MSB-first and left-bit-
   replicate to 8-bit samples, spec §12.5), RGB/GA/RGBA at 8/16
   bits (16-bit keeps big-endian 2-byte samples), palette at
   1/2/4/8-bit indices expanded through PLTE to RGB, Adam7
   interlace (seven independently-filtered sub-images scattered
   back, spec §8.2), and tRNS transparency for all three non-alpha
   color types (round 6): palette entries gain their table alpha
   (→RGBA), gray/RGB transparency KEYS expand to GA/RGBA with
   exact-match pixels transparent (spec §11.3.2). Unknown color
   types raise ``UnsupportedPngError`` with the reason; spec-ILLEGAL
   combinations (depth 3, 16-bit palette, tRNS on alpha types, …)
   raise ``PngError``. A corrupt or unsupported payload must not kill a
   100 TB job, so the Spark kernel maps both to an ``err`` column
   instead of failing the task (see multimodal.decode_image).
 - The per-scanline unfilter (Sub/Up/Average/Paeth, PNG spec §9) is
   sequential along x by construction (each byte's predictor uses the
   reconstructed byte bpp positions back), so the inner loop is
   Python-per-byte. That is fine for the thumbnail/fixture sizes this
   engine decodes inline; production-scale image corpora would swap
   this kernel for a native decoder behind the same mapInPandas
   signature — the Spark plan is identical either way.

The encoder exists so tests and oracle-paired queries can synthesize
deterministic images (and as a synthesis/thumbnail-write op in its
own right). It can apply a fixed filter or cycle filters 0-4 per
scanline, which makes a single small image exercise every unfilter
branch of the decoder.

No counterpart in the reference (JSON text only, main.py:1-638);
north-star extension per SURVEY §2.9.
"""

from __future__ import annotations

import struct
import zlib
from typing import NamedTuple

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel
CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class PngError(ValueError):
    """Malformed PNG (bad signature, CRC mismatch, truncation...)."""


class UnsupportedPngError(PngError):
    """Valid-but-unsupported PNG (unknown color type)."""


class DecodedImage(NamedTuple):
    width: int
    height: int
    color_type: int
    channels: int
    bit_depth: int
    pixels: bytes  # row-major, width*channels bytes per row


# Adam7 interlace pass grid (PNG spec §8.2): x_start, y_start,
# x_step, y_step for each of the seven passes.
ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §9.4): nearest of left/up/up-left to
    the linear estimate a+b-c, ties broken left, up, up-left."""
    p = a + b - c
    pa = abs(p - a)
    pb = abs(p - b)
    pc = abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> DecodedImage:
    """Decode a PNG byte string to raw pixel bytes.

    Full container parse: signature, chunk walk with CRC verification,
    IDAT concatenation, zlib inflate, per-scanline unfilter.

    Depth/type coverage (round 5 closed all gates but tRNS):
     - gray (type 0) at 1/2/4/8/16 bits — packed depths unpack to
       left-bit-replicated 8-bit samples (spec §12.5);
     - RGB/GA/RGBA (types 2/4/6) at 8/16 bits — 16-bit keeps the
       big-endian 2-byte samples (row stride width*channels*2), no
       precision-losing downsample;
     - palette (type 3) at 1/2/4/8-bit indices → expanded through
       PLTE to RGB (``channels`` 3, ``bit_depth`` 8), or RGBA when
       a tRNS table is present (round 6);
     - tRNS transparency keys for gray/RGB (types 0/2) → GA/RGBA,
       exact-match pixels get alpha 0 (sub-byte keys replicate
       through the same §12.5 scale as the samples);
     - interlace 0 or Adam7 (1): the seven passes unfilter
       independently and scatter into the output grid.
    """
    if len(data) < 8 or data[:8] != PNG_SIGNATURE:
        raise PngError("not a PNG: bad signature")
    pos = 8
    ihdr: tuple[int, int, int, int] | None = None
    idat = bytearray()
    palette: bytes | None = None
    trns: bytes | None = None
    seen_iend = False
    while pos < len(data):
        if pos + 8 > len(data):
            raise PngError("truncated chunk header")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise PngError(f"truncated {ctype!r} chunk")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise PngError(f"CRC mismatch in {ctype!r} chunk")
        pos += 12 + length
        if ctype == b"IHDR":
            if length != 13:
                raise PngError("IHDR must be 13 bytes")
            width, height, bit_depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if comp != 0 or filt != 0:
                raise PngError("unknown compression/filter method")
            if interlace not in (0, 1):
                raise PngError(f"interlace method {interlace} invalid")
            if color_type == 3:
                if bit_depth not in (1, 2, 4, 8):
                    raise PngError(
                        f"palette bit depth {bit_depth} invalid"
                    )
            elif color_type == 0:
                if bit_depth not in (1, 2, 4, 8, 16):
                    raise PngError(f"gray bit depth {bit_depth} invalid")
            elif color_type in CHANNELS:
                if bit_depth not in (8, 16):
                    raise PngError(
                        f"bit depth {bit_depth} invalid for color type "
                        f"{color_type}"
                    )
            else:
                raise UnsupportedPngError(
                    f"color type {color_type} not supported"
                )
            if width == 0 or height == 0:
                raise PngError("zero-dimension image")
            ihdr = (width, height, bit_depth, color_type, interlace)
        elif ctype == b"PLTE":
            if ihdr is None:
                raise PngError("PLTE before IHDR")
            if idat:
                # spec §5.6 chunk ordering: PLTE precedes first IDAT
                raise PngError("PLTE after IDAT")
            if palette is not None:
                raise PngError("duplicate PLTE chunk")
            if length == 0 or length % 3 != 0 or length > 256 * 3:
                raise PngError(f"bad PLTE length {length}")
            palette = bytes(body)
        elif ctype == b"tRNS":
            if ihdr is None:
                raise PngError("tRNS before IHDR")
            if idat:
                # spec §5.6 chunk ordering: tRNS precedes first IDAT
                raise PngError("tRNS after IDAT")
            if trns is not None:
                raise PngError("duplicate tRNS chunk")
            ct, depth = ihdr[3], ihdr[2]
            if ct in (4, 6):
                # spec §11.3.2: forbidden when a full alpha channel exists
                raise PngError(
                    f"tRNS forbidden for alpha color type {ct}"
                )
            if ct == 0 and length != 2:
                raise PngError(f"gray tRNS must be 2 bytes, got {length}")
            if ct == 2 and length != 6:
                raise PngError(f"RGB tRNS must be 6 bytes, got {length}")
            if ct == 3:
                if palette is None:
                    raise PngError("palette tRNS before PLTE")
                if length > len(palette) // 3:
                    raise PngError(
                        f"tRNS has {length} entries for "
                        f"{len(palette) // 3}-entry palette"
                    )
            trns = bytes(body)
        elif ctype == b"IDAT":
            if ihdr is None:
                raise PngError("IDAT before IHDR")
            idat.extend(body)
        elif ctype == b"IEND":
            seen_iend = True
            break
    if ihdr is None:
        raise PngError("missing IHDR")
    if not seen_iend:
        raise PngError("missing IEND")
    if not idat:
        raise PngError("missing IDAT")
    width, height, bit_depth, color_type, interlace = ihdr
    if color_type == 3 and palette is None:
        raise PngError("palette image missing PLTE chunk")
    samples = 1 if color_type == 3 else CHANNELS[color_type]
    # expanded form: bytes per pixel AFTER sub-byte unpack (1 byte
    # per sample at depths ≤ 8, 2 at depth 16)
    unit = samples * (2 if bit_depth == 16 else 1)
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise PngError(f"IDAT inflate failed: {e}") from e
    if interlace == 0:
        out, off = _unfilter_pass(
            raw, 0, width, height, samples, bit_depth, color_type
        )
    else:  # Adam7: seven independently-filtered sub-images, scattered
        out = bytearray(width * height * unit)
        off = 0
        for x0, y0, dx, dy in ADAM7:
            w_p = (width - x0 + dx - 1) // dx
            h_p = (height - y0 + dy - 1) // dy
            if w_p <= 0 or h_p <= 0:
                continue
            sub, off = _unfilter_pass(
                raw, off, w_p, h_p, samples, bit_depth, color_type
            )
            for j in range(h_p):
                for i in range(w_p):
                    src = (j * w_p + i) * unit
                    dst = ((y0 + j * dy) * width + (x0 + i * dx)) * unit
                    out[dst : dst + unit] = sub[src : src + unit]
    if off != len(raw):
        raise PngError(
            f"decompressed size {len(raw)} != expected {off}"
        )
    if color_type == 3:
        # expand palette indices through PLTE to RGB samples; with a
        # tRNS chunk the per-entry alpha rides along → RGBA (entries
        # past the tRNS table are opaque, spec §11.3.2)
        n_entries = len(palette) // 3
        if trns is not None:
            rgba = bytearray(width * height * 4)
            for i, idx in enumerate(out):
                if idx >= n_entries:
                    raise PngError(
                        f"palette index {idx} out of range "
                        f"({n_entries} entries)"
                    )
                rgba[4 * i : 4 * i + 3] = palette[3 * idx : 3 * idx + 3]
                rgba[4 * i + 3] = trns[idx] if idx < len(trns) else 255
            return DecodedImage(width, height, color_type, 4, 8, bytes(rgba))
        rgb = bytearray(width * height * 3)
        for i, idx in enumerate(out):
            if idx >= n_entries:
                raise PngError(
                    f"palette index {idx} out of range ({n_entries} entries)"
                )
            rgb[3 * i : 3 * i + 3] = palette[3 * idx : 3 * idx + 3]
        return DecodedImage(width, height, color_type, 3, 8, bytes(rgb))
    if trns is not None and color_type == 0:
        # gray transparency key → GA; the key is stored at the
        # ORIGINAL depth, so sub-byte keys replicate through the same
        # §12.5 scale the samples did (out-of-range key = spec-legal
        # "nothing transparent")
        (key,) = struct.unpack(">H", trns)
        if bit_depth == 16:
            ga = bytearray(width * height * 4)
            for i in range(width * height):
                v = (out[2 * i] << 8) | out[2 * i + 1]
                ga[4 * i : 4 * i + 2] = out[2 * i : 2 * i + 2]
                a = b"\x00\x00" if v == key else b"\xff\xff"
                ga[4 * i + 2 : 4 * i + 4] = a
            return DecodedImage(width, height, color_type, 2, 16, bytes(ga))
        scale = {1: 255, 2: 85, 4: 17, 8: 1}[bit_depth]
        key8 = key * scale if key < (1 << bit_depth) else -1
        ga = bytearray(width * height * 2)
        for i, v in enumerate(out):
            ga[2 * i] = v
            ga[2 * i + 1] = 0 if v == key8 else 255
        return DecodedImage(width, height, color_type, 2, 8, bytes(ga))
    if trns is not None and color_type == 2:
        # RGB transparency key → RGBA (exact-match pixels transparent)
        kr, kg, kb = struct.unpack(">HHH", trns)
        if bit_depth == 16:
            rgba = bytearray(width * height * 8)
            for i in range(width * height):
                px = out[6 * i : 6 * i + 6]
                r = (px[0] << 8) | px[1]
                g = (px[2] << 8) | px[3]
                b = (px[4] << 8) | px[5]
                rgba[8 * i : 8 * i + 6] = px
                a = b"\x00\x00" if (r, g, b) == (kr, kg, kb) else b"\xff\xff"
                rgba[8 * i + 6 : 8 * i + 8] = a
            return DecodedImage(width, height, color_type, 4, 16, bytes(rgba))
        rgba = bytearray(width * height * 4)
        for i in range(width * height):
            px = out[3 * i : 3 * i + 3]
            rgba[4 * i : 4 * i + 3] = px
            match = tuple(px) == (kr, kg, kb)
            rgba[4 * i + 3] = 0 if match else 255
        return DecodedImage(width, height, color_type, 4, 8, bytes(rgba))
    # sub-byte gray was expanded to 8-bit samples in _unfilter_pass
    return DecodedImage(
        width, height, color_type, samples, max(bit_depth, 8), bytes(out)
    )


def _unfilter_pass(
    raw: bytes,
    offset: int,
    width: int,
    height: int,
    samples: int,
    bit_depth: int,
    color_type: int,
) -> tuple[bytearray, int]:
    """Unfilter one (sub-)image's scanlines starting at ``offset`` in
    the inflated stream; returns (expanded pixel bytes, next offset).
    Expanded form: one byte per sample for depths ≤ 8 (gray left-bit-
    replicated per spec §12.5, palette indices raw), big-endian byte
    pairs at 16."""
    # filter unit (spec §9.2): bytes per pixel, min 1 for packed
    # sub-byte depths; scanline length rounds up to whole bytes
    bpp = max(1, samples * bit_depth // 8)
    stride = (width * samples * bit_depth + 7) // 8
    need = (stride + 1) * height
    if offset + need > len(raw):
        raise PngError(
            f"decompressed size {len(raw)} != expected {offset + need}"
        )
    out = bytearray(stride * height)
    prev_start = -stride  # reconstructed previous scanline offset
    for y in range(height):
        fpos = offset + y * (stride + 1)
        ftype = raw[fpos]
        line = raw[fpos + 1 : fpos + 1 + stride]
        o = y * stride
        if ftype == 0:  # None
            out[o : o + stride] = line
        elif ftype == 1:  # Sub
            for x in range(stride):
                a = out[o + x - bpp] if x >= bpp else 0
                out[o + x] = (line[x] + a) & 0xFF
        elif ftype == 2:  # Up
            if y == 0:
                out[o : o + stride] = line
            else:
                p = o + prev_start
                for x in range(stride):
                    out[o + x] = (line[x] + out[p + x]) & 0xFF
        elif ftype == 3:  # Average
            p = o + prev_start
            for x in range(stride):
                a = out[o + x - bpp] if x >= bpp else 0
                b = out[p + x] if y > 0 else 0
                out[o + x] = (line[x] + ((a + b) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            p = o + prev_start
            for x in range(stride):
                a = out[o + x - bpp] if x >= bpp else 0
                b = out[p + x] if y > 0 else 0
                c = out[p + x - bpp] if (y > 0 and x >= bpp) else 0
                out[o + x] = (line[x] + _paeth(a, b, c)) & 0xFF
        else:
            raise PngError(f"unknown filter type {ftype} on scanline {y}")
    if bit_depth < 8:
        # unpack MSB-first packed samples; gray left-bit-replicates
        # to 8-bit (spec §12.5: 1-bit 0/255, 2-bit ×85, 4-bit ×17),
        # palette indices stay raw for PLTE lookup
        scale_factor = {1: 255, 2: 85, 4: 17}[bit_depth]
        per_byte = 8 // bit_depth
        mask = (1 << bit_depth) - 1
        unpacked = bytearray(width * height)
        for y in range(height):
            row = out[y * stride : (y + 1) * stride]
            o = y * width
            for x in range(width):
                b = row[x // per_byte]
                shift = 8 - bit_depth * (x % per_byte + 1)
                v = (b >> shift) & mask
                unpacked[o + x] = v if color_type == 3 else v * scale_factor
        out = unpacked
    return out, offset + need


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(
    pixels: bytes,
    width: int,
    height: int,
    color_type: int = 0,
    filter_mode: str = "cycle",
    compress_level: int = 6,
    bit_depth: int = 8,
    palette: bytes | None = None,
    interlace: bool = False,
    trns: bytes | None = None,
) -> bytes:
    """Encode raw pixel bytes as a PNG.

    ``filter_mode``: ``"none"`` writes every scanline with filter 0;
    ``"cycle"`` applies filter ``y % 5`` to scanline y (so any image
    with height >= 5 exercises all five decoder unfilter branches —
    the property the roundtrip tests rely on).

    ``bit_depth`` 16 (types 0/2/4/6) takes big-endian 2-byte samples.
    ``color_type`` 3 takes palette indices plus ``palette``
    (concatenated RGB triples, ≤ 256 entries) and writes a PLTE
    chunk. Packed depths (1/2/4, gray or palette) take ONE sample
    per input byte — gray as the left-bit-replicated 8-bit values
    ``decode_png`` emits (so encode∘decode is the identity), palette
    as raw indices — and pack MSB-first internally. ``interlace``
    writes Adam7 (each pass gathered and filtered independently).
    """
    if color_type == 3:
        if bit_depth not in (1, 2, 4, 8):
            raise PngError(f"palette bit depth {bit_depth} invalid")
        if not palette or len(palette) % 3 != 0 or len(palette) > 256 * 3:
            raise PngError("palette must be 1..256 RGB triples")
        samples = 1
    elif color_type == 0:
        if bit_depth not in (1, 2, 4, 8, 16):
            raise PngError(f"gray bit depth {bit_depth} invalid")
        samples = 1
    elif color_type in CHANNELS:
        if bit_depth not in (8, 16):
            raise PngError(
                f"bit depth {bit_depth} invalid for color type {color_type}"
            )
        samples = CHANNELS[color_type]
    else:
        raise UnsupportedPngError(f"color type {color_type} not supported")
    if filter_mode not in ("none", "cycle"):
        raise ValueError(f"filter_mode must be 'none' or 'cycle', got {filter_mode!r}")
    unit = samples * (2 if bit_depth == 16 else 1)
    if len(pixels) != width * height * unit:
        raise PngError(
            f"pixel buffer is {len(pixels)} bytes, expected "
            f"{width * height * unit}"
        )
    if not interlace:
        raw = _filter_pass(
            pixels, width, height, samples, bit_depth, color_type, filter_mode
        )
    else:  # Adam7: gather each pass sub-image, filter independently
        raw = bytearray()
        for x0, y0, dx, dy in ADAM7:
            w_p = (width - x0 + dx - 1) // dx
            h_p = (height - y0 + dy - 1) // dy
            if w_p <= 0 or h_p <= 0:
                continue
            sub = bytearray(w_p * h_p * unit)
            for j in range(h_p):
                for i in range(w_p):
                    src = ((y0 + j * dy) * width + (x0 + i * dx)) * unit
                    sub[(j * w_p + i) * unit : (j * w_p + i + 1) * unit] = (
                        pixels[src : src + unit]
                    )
            raw += _filter_pass(
                sub, w_p, h_p, samples, bit_depth, color_type, filter_mode
            )
    ihdr = struct.pack(
        ">IIBBBBB",
        width,
        height,
        bit_depth,
        color_type,
        0,
        0,
        1 if interlace else 0,
    )
    chunks = PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
    if color_type == 3:
        chunks += _chunk(b"PLTE", bytes(palette))
    if trns is not None:
        if color_type == 0 and len(trns) != 2:
            raise PngError("gray tRNS must be 2 bytes")
        if color_type == 2 and len(trns) != 6:
            raise PngError("RGB tRNS must be 6 bytes")
        if color_type == 3 and len(trns) > len(palette) // 3:
            raise PngError("tRNS longer than palette")
        if color_type in (4, 6):
            raise PngError("tRNS forbidden for alpha color types")
        chunks += _chunk(b"tRNS", bytes(trns))
    return (
        chunks
        + _chunk(b"IDAT", zlib.compress(bytes(raw), compress_level))
        + _chunk(b"IEND", b"")
    )


def _filter_pass(
    pixels: bytes,
    width: int,
    height: int,
    samples: int,
    bit_depth: int,
    color_type: int,
    filter_mode: str,
) -> bytearray:
    """Filter one (sub-)image's scanlines: pack sub-byte depths
    MSB-first, then apply filter 0 (``"none"``) or ``y % 5``
    (``"cycle"``) per scanline. Input is the expanded form
    ``_unfilter_pass`` emits, so encode∘decode is the identity."""
    if bit_depth < 8:
        scale_factor = {1: 255, 2: 85, 4: 17}[bit_depth]
        per_byte = 8 // bit_depth
        stride = (width * bit_depth + 7) // 8
        work = bytearray(stride * height)
        for y in range(height):
            for x in range(width):
                v = pixels[y * width + x]
                if color_type == 0:
                    if v % scale_factor:
                        raise PngError(
                            f"gray value {v} not representable at "
                            f"{bit_depth}-bit depth"
                        )
                    v //= scale_factor
                elif v >= (1 << bit_depth):
                    raise PngError(
                        f"palette index {v} exceeds {bit_depth}-bit depth"
                    )
                shift = 8 - bit_depth * (x % per_byte + 1)
                work[y * stride + x // per_byte] |= v << shift
        bpp = 1
    else:
        bpp = samples * (bit_depth // 8)
        stride = width * bpp
        work = pixels
    raw = bytearray()
    for y in range(height):
        o = y * stride
        ftype = 0 if filter_mode == "none" else y % 5
        raw.append(ftype)
        if ftype == 0:
            raw.extend(work[o : o + stride])
            continue
        for x in range(stride):
            cur = work[o + x]
            a = work[o + x - bpp] if x >= bpp else 0
            b = work[o - stride + x] if y > 0 else 0
            if ftype == 1:
                raw.append((cur - a) & 0xFF)
            elif ftype == 2:
                raw.append((cur - b) & 0xFF)
            elif ftype == 3:
                raw.append((cur - ((a + b) >> 1)) & 0xFF)
            else:  # 4
                c = work[o - stride + x - bpp] if (y > 0 and x >= bpp) else 0
                raw.append((cur - _paeth(a, b, c)) & 0xFF)
    return raw
