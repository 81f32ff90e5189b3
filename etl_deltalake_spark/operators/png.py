"""Pure-stdlib PNG codec: the real decode kernel behind
``multimodal.decode_image`` (SURVEY §2.9 multimodal extensions).

PNG is zlib-deflate over per-scanline filtered pixel bytes — both
``zlib`` and ``struct`` are stdlib, so decoding needs no codec
libraries. This replaces the round-1..3 ``NotImplementedError`` stub:
the container has no Pillow/ffmpeg, but PNG (the fixture format) is
fully decodable from first principles.

Scope (honest gates, not padding):
 - bit depths 8 and 16 for color types 0 (gray), 2 (RGB),
   4 (gray+alpha), 6 (RGBA); palette (type 3, 8-bit indices,
   expanded through PLTE to RGB on decode); interlace 0. Remaining
   gates — 1/2/4-bit packed depths, Adam7 interlace, palette tRNS —
   raise ``UnsupportedPngError`` with the reason: a corrupt or
   unsupported payload must not kill a 100 TB job, so the Spark
   kernel maps these to an ``err`` column instead of failing the
   task (see multimodal.decode_image).
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
    """Valid-but-unsupported PNG (palette, 16-bit, interlaced...)."""


class DecodedImage(NamedTuple):
    width: int
    height: int
    color_type: int
    channels: int
    bit_depth: int
    pixels: bytes  # row-major, width*channels bytes per row


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

    Depth/type coverage (round 5 widened the two biggest gates):
     - 8-bit gray/RGB/GA/RGBA (types 0/2/4/6) → 1 byte per sample;
     - 16-bit of the same types → ``pixels`` keeps the big-endian
       2-byte samples (``bit_depth`` 16, row stride
       width*channels*2) — no precision-losing downsample;
     - palette (type 3, 8-bit indices) → indices expand through PLTE
       to RGB, so callers always see real samples (``channels`` 3,
       ``bit_depth`` 8).
    Still honestly gated: 1/2/4-bit packed depths, Adam7 interlace,
    and palette tRNS transparency raise ``UnsupportedPngError``.
    """
    if len(data) < 8 or data[:8] != PNG_SIGNATURE:
        raise PngError("not a PNG: bad signature")
    pos = 8
    ihdr: tuple[int, int, int, int] | None = None
    idat = bytearray()
    palette: bytes | None = None
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
            if interlace != 0:
                raise UnsupportedPngError("Adam7 interlace not supported")
            if color_type == 3:
                if bit_depth != 8:
                    raise UnsupportedPngError(
                        f"palette bit depth {bit_depth} not supported"
                    )
            elif color_type in CHANNELS:
                if bit_depth not in (8, 16):
                    raise UnsupportedPngError(
                        f"bit depth {bit_depth} not supported"
                    )
            else:
                raise UnsupportedPngError(
                    f"color type {color_type} not supported"
                )
            if width == 0 or height == 0:
                raise PngError("zero-dimension image")
            ihdr = (width, height, bit_depth, color_type)
        elif ctype == b"PLTE":
            if ihdr is None:
                raise PngError("PLTE before IHDR")
            if length == 0 or length % 3 != 0 or length > 256 * 3:
                raise PngError(f"bad PLTE length {length}")
            palette = bytes(body)
        elif ctype == b"tRNS":
            if ihdr is not None and ihdr[3] == 3:
                raise UnsupportedPngError(
                    "palette transparency (tRNS) not supported"
                )
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
    width, height, bit_depth, color_type = ihdr
    if color_type == 3 and palette is None:
        raise PngError("palette image missing PLTE chunk")
    samples = 1 if color_type == 3 else CHANNELS[color_type]
    bpp = samples * (bit_depth // 8)  # filter unit: bytes per pixel
    stride = width * bpp
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise PngError(f"IDAT inflate failed: {e}") from e
    if len(raw) != (stride + 1) * height:
        raise PngError(
            f"decompressed size {len(raw)} != expected {(stride + 1) * height}"
        )
    out = bytearray(stride * height)
    prev_start = -stride  # reconstructed previous scanline offset
    for y in range(height):
        fpos = y * (stride + 1)
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
    if color_type == 3:
        # expand 8-bit palette indices through PLTE to RGB samples
        n_entries = len(palette) // 3
        rgb = bytearray(width * height * 3)
        for i, idx in enumerate(out):
            if idx >= n_entries:
                raise PngError(
                    f"palette index {idx} out of range ({n_entries} entries)"
                )
            rgb[3 * i : 3 * i + 3] = palette[3 * idx : 3 * idx + 3]
        return DecodedImage(width, height, color_type, 3, 8, bytes(rgb))
    return DecodedImage(
        width, height, color_type, samples, bit_depth, bytes(out)
    )


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
) -> bytes:
    """Encode raw pixel bytes as a PNG.

    ``filter_mode``: ``"none"`` writes every scanline with filter 0;
    ``"cycle"`` applies filter ``y % 5`` to scanline y (so any image
    with height >= 5 exercises all five decoder unfilter branches —
    the property the roundtrip tests rely on).

    ``bit_depth`` 16 (types 0/2/4/6) takes big-endian 2-byte samples.
    ``color_type`` 3 takes 8-bit palette indices plus ``palette``
    (concatenated RGB triples, ≤ 256 entries) and writes a PLTE
    chunk.
    """
    if color_type == 3:
        if bit_depth != 8:
            raise UnsupportedPngError("palette encode requires bit depth 8")
        if not palette or len(palette) % 3 != 0 or len(palette) > 256 * 3:
            raise PngError("palette must be 1..256 RGB triples")
        samples = 1
    elif color_type in CHANNELS:
        if bit_depth not in (8, 16):
            raise UnsupportedPngError(f"bit depth {bit_depth} not supported")
        samples = CHANNELS[color_type]
    else:
        raise UnsupportedPngError(f"color type {color_type} not supported")
    bpp = samples * (bit_depth // 8)
    stride = width * bpp
    if len(pixels) != stride * height:
        raise PngError(
            f"pixel buffer is {len(pixels)} bytes, expected {stride * height}"
        )
    if filter_mode not in ("none", "cycle"):
        raise ValueError(f"filter_mode must be 'none' or 'cycle', got {filter_mode!r}")
    raw = bytearray()
    for y in range(height):
        o = y * stride
        ftype = 0 if filter_mode == "none" else y % 5
        raw.append(ftype)
        if ftype == 0:
            raw.extend(pixels[o : o + stride])
            continue
        for x in range(stride):
            cur = pixels[o + x]
            a = pixels[o + x - bpp] if x >= bpp else 0
            b = pixels[o - stride + x] if y > 0 else 0
            if ftype == 1:
                raw.append((cur - a) & 0xFF)
            elif ftype == 2:
                raw.append((cur - b) & 0xFF)
            elif ftype == 3:
                raw.append((cur - ((a + b) >> 1)) & 0xFF)
            else:  # 4
                c = pixels[o - stride + x - bpp] if (y > 0 and x >= bpp) else 0
                raw.append((cur - _paeth(a, b, c)) & 0xFF)
    ihdr = struct.pack(
        ">IIBBBBB", width, height, bit_depth, color_type, 0, 0, 0
    )
    chunks = PNG_SIGNATURE + _chunk(b"IHDR", ihdr)
    if color_type == 3:
        chunks += _chunk(b"PLTE", bytes(palette))
    return (
        chunks
        + _chunk(b"IDAT", zlib.compress(bytes(raw), compress_level))
        + _chunk(b"IEND", b"")
    )
