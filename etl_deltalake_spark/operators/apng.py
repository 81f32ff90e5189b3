"""Pure-stdlib APNG (animated PNG) container codec: the real VIDEO
modality kernel behind ``multimodal.decode_video`` (SURVEY §2.9
multimodal extensions).

APNG is the one video-like format that is genuinely decodable with
the stdlib: it sequences ordinary PNG frames through three ancillary
chunks (acTL animation control, fcTL per-frame control, fdAT frame
data), so the pixel layer — filters, interlace passes, palette
expansion, CRC checks — is EXACTLY the png.py codec, reused whole:
frames decode by re-wrapping each frame's compressed data as a
standalone PNG. Real containers (MP4/WebM) need native demuxers and
stay behind the honest byte-slice ``frame_offsets`` stub; APNG makes
the frame-sequenced plumbing (per-frame rows, delays, temporal
dedup) real and cross-engine gradeable.

Scope (honest gates, not padding):
 - full-canvas frames with blend op SOURCE (each frame fully
   replaces the canvas — the shape a training-data frame sampler
   consumes); sub-region frames and blend op OVER require alpha
   compositing state and raise ``UnsupportedApngError``;
 - sequence numbers must be 0,1,2,... contiguous across fcTL/fdAT
   (the spec's ordering rule), acTL must precede IDAT, and acTL's
   declared frame count must equal the observed fcTL count — a
   malformed animation errors rather than yielding garbage frames;
 - the default image doubles as frame 0 iff an fcTL precedes IDAT
   (per spec); otherwise it is cover art and the animation is the
   fdAT frames alone.

No counterpart in the reference (JSON text only, main.py:1-638);
north-star extension per SURVEY §2.9.
"""

from __future__ import annotations

import struct
from typing import NamedTuple

from etl_deltalake_spark.operators.png import (
    PNG_SIGNATURE,
    DecodedImage,
    PngError,
    UnsupportedPngError,
    _chunk,
    decode_png,
    encode_png,
)


class ApngError(PngError):
    """Malformed APNG container (bad sequencing, frame-count
    mismatch, truncation...)."""


class UnsupportedApngError(UnsupportedPngError):
    """Valid-but-unsupported APNG (sub-region frames, OVER
    blending)."""


class DecodedAnimation(NamedTuple):
    width: int
    height: int
    num_frames: int
    num_plays: int  # 0 = loop forever
    frames: list[DecodedImage]
    delays_ms: list[int]

    @property
    def duration_ms(self) -> int:
        return sum(self.delays_ms)


def _delay_ms(num: int, den: int) -> int:
    # spec: delay_den 0 means 100 (i.e. delay_num centiseconds)
    return num * 1000 // (den if den else 100)


def decode_apng(data: bytes) -> DecodedAnimation:
    """Decode an APNG payload to per-frame pixel buffers; raises
    ``ApngError``/``UnsupportedApngError`` on malformation rather
    than guessing. A plain PNG (no acTL) decodes as a 1-frame
    animation with delay 0 — so one kernel serves stills and
    animations."""
    if len(data) < 8 or data[:8] != PNG_SIGNATURE:
        raise PngError("not a PNG: bad signature")
    pos = 8
    ihdr_body: bytes | None = None
    actl: tuple[int, int] | None = None
    aux: list[bytes] = []  # PLTE/tRNS chunks, re-wrapped per frame
    # frames under construction: (fctl_meta, bytearray_of_data)
    frames: list[tuple[tuple[int, ...], bytearray]] = []
    default_data = bytearray()
    default_is_frame = False
    seen_idat = False
    next_seq = 0

    while pos < len(data):
        if pos + 8 > len(data):
            raise ApngError("truncated chunk header")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise ApngError(f"chunk {ctype!r} truncated")
        if ctype == b"IHDR":
            ihdr_body = body
        elif ctype == b"acTL":
            if seen_idat:
                raise ApngError("acTL after IDAT")
            if actl is not None:
                raise ApngError("duplicate acTL chunk")
            if length != 8:
                raise ApngError(f"acTL must be 8 bytes, got {length}")
            actl = struct.unpack(">II", body)
        elif ctype == b"fcTL":
            if length != 26:
                raise ApngError(f"fcTL must be 26 bytes, got {length}")
            meta = struct.unpack(">IIIIIHHBB", body)
            if meta[0] != next_seq:
                raise ApngError(
                    f"fcTL sequence {meta[0]} != expected {next_seq}"
                )
            next_seq += 1
            if not seen_idat:
                if default_is_frame:
                    raise ApngError("two fcTL chunks before IDAT")
                default_is_frame = True
                frames.append((meta, default_data))
            else:
                frames.append((meta, bytearray()))
        elif ctype == b"fdAT":
            if length < 4:
                raise ApngError(f"fdAT too short ({length} bytes)")
            seq = struct.unpack(">I", body[:4])[0]
            if seq != next_seq:
                raise ApngError(
                    f"fdAT sequence {seq} != expected {next_seq}"
                )
            next_seq += 1
            if not frames or (frames[-1][1] is default_data):
                raise ApngError("fdAT without a preceding fcTL")
            frames[-1][1].extend(body[4:])
        elif ctype == b"IDAT":
            seen_idat = True
            default_data.extend(body)
        elif ctype in (b"PLTE", b"tRNS"):
            aux.append(_chunk(ctype, body))
        # other ancillary chunks skipped, as in decode_png
        pos += 12 + length
    if ihdr_body is None:
        raise PngError("missing IHDR")
    width, height = struct.unpack(">II", ihdr_body[:8])

    if actl is None:
        # plain PNG: one still frame, delay 0
        img = decode_png(data)
        return DecodedAnimation(
            img.width, img.height, 1, 0, [img], [0]
        )
    num_frames, num_plays = actl
    if len(frames) != num_frames:
        raise ApngError(
            f"acTL declares {num_frames} frames but container holds "
            f"{len(frames)} fcTL chunks"
        )
    if num_frames == 0:
        raise ApngError("acTL declares zero frames")

    out: list[DecodedImage] = []
    delays: list[int] = []
    for meta, payload in frames:
        _, fw, fh, x0, y0, dnum, dden, _dispose, blend = meta
        if (fw, fh, x0, y0) != (width, height, 0, 0):
            raise UnsupportedApngError(
                f"sub-region frame {fw}x{fh}+{x0}+{y0} on a "
                f"{width}x{height} canvas (full-canvas SOURCE only)"
            )
        if blend != 0:
            raise UnsupportedApngError(
                f"blend op {blend} (only SOURCE=0 supported)"
            )
        if not payload:
            raise ApngError("frame with no data chunks")
        # re-wrap as a standalone PNG: the whole pixel layer
        # (unfilter, palette, CRC) is the png.py codec, reused
        still = (
            PNG_SIGNATURE
            + _chunk(b"IHDR", ihdr_body)
            + b"".join(aux)
            + _chunk(b"IDAT", bytes(payload))
            + _chunk(b"IEND", b"")
        )
        out.append(decode_png(still))
        delays.append(_delay_ms(dnum, dden))
    return DecodedAnimation(
        width, height, num_frames, num_plays, out, delays
    )


def encode_apng(
    frames: list[bytes],
    width: int,
    height: int,
    color_type: int = 0,
    bit_depth: int = 8,
    palette: bytes | None = None,
    delays: list[tuple[int, int]] | None = None,
    num_plays: int = 0,
    filter_mode: str = "cycle",
) -> bytes:
    """Encode per-frame pixel buffers as an APNG (full-canvas SOURCE
    frames, the subset ``decode_apng`` consumes; frame 0 doubles as
    the default image). ``delays`` are (delay_num, delay_den) pairs,
    default 1/10 s per frame. Each frame's filtered/compressed data
    comes from ``encode_png`` itself, so the pixel layer is shared
    with the still codec by construction."""
    if not frames:
        raise ValueError("need at least one frame")
    if delays is None:
        delays = [(1, 10)] * len(frames)
    if len(delays) != len(frames):
        raise ValueError(
            f"{len(delays)} delays for {len(frames)} frames"
        )

    stills = [
        encode_png(
            px, width, height, color_type,
            filter_mode, bit_depth=bit_depth, palette=palette,
        )
        for px in frames
    ]

    def idat_payload(png: bytes) -> bytes:
        # concatenate IDAT bodies from a png.py-encoded still
        out = bytearray()
        pos = 8
        while pos < len(png):
            (length,) = struct.unpack(">I", png[pos : pos + 4])
            ctype = png[pos + 4 : pos + 8]
            if ctype == b"IDAT":
                out.extend(png[pos + 8 : pos + 8 + length])
            pos += 12 + length
        return bytes(out)

    def header_chunks(png: bytes) -> bytes:
        # IHDR (+ PLTE) exactly as the still encoder wrote them
        out = bytearray()
        pos = 8
        while pos < len(png):
            (length,) = struct.unpack(">I", png[pos : pos + 4])
            ctype = png[pos + 4 : pos + 8]
            if ctype in (b"IHDR", b"PLTE", b"tRNS"):
                out.extend(png[pos : pos + 12 + length])
            pos += 12 + length
        return bytes(out)

    seq = 0
    body = bytearray()
    body += _chunk(b"acTL", struct.pack(">II", len(frames), num_plays))
    for i, still in enumerate(stills):
        dnum, dden = delays[i]
        fctl = struct.pack(
            ">IIIIIHHBB", seq, width, height, 0, 0, dnum, dden, 0, 0
        )
        seq += 1
        body += _chunk(b"fcTL", fctl)
        data = idat_payload(still)
        if i == 0:
            body += _chunk(b"IDAT", data)
        else:
            body += _chunk(b"fdAT", struct.pack(">I", seq) + data)
            seq += 1
    return (
        PNG_SIGNATURE
        + header_chunks(stills[0])
        + bytes(body)
        + _chunk(b"IEND", b"")
    )
