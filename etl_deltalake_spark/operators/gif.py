"""Pure-stdlib GIF codec (round 10) — the remaining common
real-crawl image container after PNG (png.py), JPEG baseline +
progressive (jpeg.py), and APNG video (apng.py).

Decoder: GIF87a/GIF89a per the public specification
(GIF89a spec, CompuServe 1990; W3C mirror): logical screen
descriptor, global/local color tables, variable-width LSB-first LZW
decompression (clear/EOI codes, 12-bit dictionary cap, deferred
clear codes tolerated), 4-pass row interlacing, Graphic Control
Extensions (per-frame delay, transparency index, disposal methods
0-3 including restore-to-background and restore-to-previous), and
multi-frame composition onto the logical screen — the same
canvas-composition contract apng.py gives APNG. Plain-text and
application extensions are skipped structurally (sub-block walk).

Encoder (test-fixture generator, the png/jpeg/wav precedent): real
LZW compression with spec code-width growth and a dictionary reset
at 4096 entries, optional interlacing, transparency, per-frame
delays/disposal, GIF89a extensions emitted only when needed.

The code-width handshake (the classic off-by-one): the DECODER
widens after defining a dictionary entry when the table size reaches
2^width; the ENCODER — which at the moment of emitting code n has
defined one more entry than the decoder has while reading it —
widens when its next free slot reaches 2^width + 1. The landmark
test pins a hand-derived stream, and round-trips that force multiple
width bumps plus a 4096-entry reset pin the pair.

Still-image contract for multimodal.decode_image: ``decode_gif``
returns the FIRST frame composed on the canvas; channels are 4
(RGBA) when any frame declares transparency, else 3 — deterministic
from the container, not the pixels.
"""

from __future__ import annotations

from dataclasses import dataclass


class GifError(ValueError):
    """Malformed/corrupt/unsupported GIF payload."""


@dataclass(frozen=True)
class GifImage:
    width: int
    height: int
    channels: int  # 3 RGB, 4 RGBA (any transparency declared)
    bit_depth: int  # always 8
    pixels: bytes  # first frame composed on the logical screen
    n_frames: int


# ---- LZW ------------------------------------------------------------------

_MAX_CODE = 4096


def _lzw_decode(min_code_size: int, data: bytes, expected: int) -> bytes:
    """Variable-width LSB-first LZW per the GIF spec; returns exactly
    ``expected`` index bytes. Tolerates deferred clear codes and an
    EOI-less stream that simply runs out after enough output (seen in
    the wild)."""
    if not 2 <= min_code_size <= 8:
        raise GifError(f"illegal LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = bytearray()
    prev: bytes | None = None
    bitpos = 0
    total = len(data) * 8
    while len(out) < expected:
        if bitpos + width > total:
            raise GifError("truncated LZW stream")
        byte_i = bitpos >> 3
        window = int.from_bytes(data[byte_i:byte_i + 3], "little")
        code = (window >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table):
                raise GifError("first LZW code after clear out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise GifError(f"LZW code {code} beyond table")
        out += entry
        if prev is not None and len(table) < _MAX_CODE:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < expected:
        raise GifError("LZW stream ended short of the image area")
    return bytes(out[:expected])


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_slot = eoi + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    w = b""
    for c in indices:
        wc = w + bytes([c])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        if next_slot < _MAX_CODE:
            table[wc] = next_slot
            next_slot += 1
            # encoder is one defined entry ahead of the decoder at
            # the matching stream position — see module docstring
            if next_slot == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_slot = eoi + 1
            width = min_code_size + 1
        w = bytes([c])
    if w:
        emit(table[w])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---- container walk -------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(rows: list[bytes], height: int) -> list[bytes]:
    out: list[bytes | None] = [None] * height
    i = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, height, step):
            out[y] = rows[i]
            i += 1
    return out  # type: ignore[return-value]


def _subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        if pos >= len(data):
            raise GifError("truncated sub-block chain")
        n = data[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        if pos + n > len(data):
            raise GifError("truncated sub-block")
        chunks.append(data[pos:pos + n])
        pos += n


def decode_gif_frames(
    data: bytes,
) -> tuple[int, int, bool, list[tuple[int, bytes]]]:
    """Full animation decode: returns (width, height, has_alpha,
    frames) where each frame is (delay_centiseconds, RGBA canvas
    bytes) — every frame composed per its predecessor's disposal
    method, exactly the apng.py contract."""
    if len(data) < 13 or data[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("not a GIF (bad signature)")
    width = int.from_bytes(data[6:8], "little")
    height = int.from_bytes(data[8:10], "little")
    if width == 0 or height == 0:
        raise GifError("zero logical screen dimensions")
    packed = data[10]
    bg_index = data[11]
    pos = 13
    gct: list[tuple[int, int, int]] | None = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        if pos + 3 * n > len(data):
            raise GifError("truncated global color table")
        gct = [
            (data[pos + 3 * i], data[pos + 3 * i + 1], data[pos + 3 * i + 2])
            for i in range(n)
        ]
        pos += 3 * n

    canvas = bytearray(width * height * 4)  # transparent black
    frames: list[tuple[int, bytes]] = []
    has_alpha = False
    # pending GCE state for the next image
    delay = 0
    transparent: int | None = None
    disposal = 0
    prev_canvas: bytes | None = None
    prev_disposal = 0
    prev_rect = (0, 0, 0, 0)

    while True:
        if pos >= len(data):
            raise GifError("missing trailer")
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(data):
                raise GifError("truncated extension")
            label = data[pos]
            pos += 1
            body, pos = _subblocks(data, pos)
            if label == 0xF9:  # Graphic Control Extension
                if len(body) < 4:
                    raise GifError("short GCE")
                flags = body[0]
                delay = int.from_bytes(body[1:3], "little")
                disposal = (flags >> 2) & 0x07
                transparent = body[3] if flags & 0x01 else None
                if transparent is not None:
                    has_alpha = True
            continue
        if block != 0x2C:
            raise GifError(f"unknown block introducer 0x{block:02X}")

        # image descriptor
        if pos + 9 > len(data):
            raise GifError("truncated image descriptor")
        left = int.from_bytes(data[pos:pos + 2], "little")
        top = int.from_bytes(data[pos + 2:pos + 4], "little")
        fw = int.from_bytes(data[pos + 4:pos + 6], "little")
        fh = int.from_bytes(data[pos + 6:pos + 8], "little")
        ipacked = data[pos + 8]
        pos += 9
        if fw == 0 or fh == 0 or left + fw > width or top + fh > height:
            raise GifError("frame rectangle outside logical screen")
        pal = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            if pos + 3 * n > len(data):
                raise GifError("truncated local color table")
            pal = [
                (
                    data[pos + 3 * i],
                    data[pos + 3 * i + 1],
                    data[pos + 3 * i + 2],
                )
                for i in range(n)
            ]
            pos += 3 * n
        if pal is None:
            raise GifError("frame has neither local nor global palette")
        interlaced = bool(ipacked & 0x40)
        if pos >= len(data):
            raise GifError("missing LZW minimum code size")
        mcs = data[pos]
        pos += 1
        lzw, pos = _subblocks(data, pos)
        idx = _lzw_decode(mcs, lzw, fw * fh)

        # dispose of the PREVIOUS frame's rectangle first
        if frames:
            pl, pt, pw, ph = prev_rect
            if prev_disposal == 2:  # restore to background
                # spec background; browsers render it transparent
                for y in range(pt, pt + ph):
                    row = (y * width + pl) * 4
                    canvas[row:row + pw * 4] = b"\x00" * (pw * 4)
                has_alpha = True
            elif prev_disposal == 3 and prev_canvas is not None:
                canvas[:] = prev_canvas

        if disposal == 3:
            prev_canvas = bytes(canvas)

        rows = [idx[y * fw:(y + 1) * fw] for y in range(fh)]
        if interlaced:
            rows = _deinterlace(rows, fh)
        for y, row in enumerate(rows):
            for x, ci in enumerate(row):
                if transparent is not None and ci == transparent:
                    continue  # existing canvas pixel shows through
                if ci >= len(pal):
                    raise GifError(f"palette index {ci} out of range")
                o = ((top + y) * width + (left + x)) * 4
                r, g, b = pal[ci]
                canvas[o:o + 4] = bytes((r, g, b, 255))
        frames.append((delay, bytes(canvas)))
        prev_disposal = disposal
        prev_rect = (left, top, fw, fh)
        delay = 0
        transparent = None
        disposal = 0
    if not frames:
        raise GifError("GIF holds no image data")
    _ = bg_index  # spec field; composition renders background transparent
    return width, height, has_alpha, frames


def rgba_strip_alpha(rgba: bytes) -> bytes:
    """Drop the alpha byte of an RGBA buffer (used when the container
    declares no transparency, so every alpha is 255)."""
    out = bytearray(rgba)
    del out[3::4]  # C-speed strided delete, no per-pixel Python loop
    return bytes(out)


def decode_gif(data: bytes) -> GifImage:
    """Still-image decode (the decode_image contract): the FIRST
    frame composed on the logical screen. RGBA when the container
    declares any transparency, RGB otherwise."""
    width, height, has_alpha, frames = decode_gif_frames(data)
    rgba = frames[0][1]
    if has_alpha:
        return GifImage(width, height, 4, 8, rgba, len(frames))
    return GifImage(
        width, height, 3, 8, rgba_strip_alpha(rgba), len(frames)
    )


# ---- encoder (fixture generator) -----------------------------------------

def encode_gif(
    frames,
    width: int,
    height: int,
    palette,
    interlace: bool = False,
    transparent_index: int | None = None,
    delays=None,
    disposals=None,
    rects=None,
) -> bytes:
    """GIF89a encoder: ``frames`` is a list of palette-index byte
    strings (one per frame, sized to its rect — default the full
    screen); ``palette`` a list of (r, g, b). Per-frame ``delays``
    (centiseconds), ``disposals``, and ``rects`` (left, top, w, h)
    optional. Emits a GCE only when transparency/delay/disposal need
    one (pure GIF87a-shaped output otherwise, exercising the
    no-extension decode path)."""
    if isinstance(frames, (bytes, bytearray)):
        frames = [bytes(frames)]
    n = len(palette)
    if not 2 <= n <= 256:
        raise ValueError("palette must hold 2..256 entries")
    size_field = max((n - 1).bit_length(), 1) - 1
    table_n = 2 << size_field
    mcs = max((table_n - 1).bit_length(), 2)

    out = bytearray(b"GIF89a")
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out += bytes([0x80 | size_field, 0, 0])
    for i in range(table_n):
        out += bytes(palette[i]) if i < n else b"\x00\x00\x00"

    for fi, idx in enumerate(frames):
        delay = (delays or [0] * len(frames))[fi]
        disposal = (disposals or [0] * len(frames))[fi]
        rect = (rects or [(0, 0, width, height)] * len(frames))[fi]
        left, top, fw, fh = rect
        if len(idx) != fw * fh:
            raise ValueError(f"frame {fi}: index buffer size mismatch")
        if transparent_index is not None or delay or disposal:
            flags = (disposal & 0x07) << 2
            ti = 0
            if transparent_index is not None:
                flags |= 0x01
                ti = transparent_index
            out += bytes([0x21, 0xF9, 4, flags])
            out += int(delay).to_bytes(2, "little")
            out += bytes([ti, 0])
        out += bytes([0x2C])
        out += left.to_bytes(2, "little") + top.to_bytes(2, "little")
        out += fw.to_bytes(2, "little") + fh.to_bytes(2, "little")
        out += bytes([0x40 if interlace else 0x00])
        if interlace:
            rows = [idx[y * fw:(y + 1) * fw] for y in range(fh)]
            ordered = []
            for start, step in _INTERLACE_PASSES:
                for y in range(start, fh, step):
                    ordered.append(rows[y])
            idx = b"".join(ordered)
        out += bytes([mcs])
        lzw = _lzw_encode(mcs, idx)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)
