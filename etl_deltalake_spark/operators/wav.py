"""Pure-stdlib WAV (RIFF/PCM) codec: the real audio-decode kernel
behind ``multimodal.decode_audio`` (SURVEY §2.9 multimodal
extensions).

WAV PCM is a RIFF container (4-byte chunk ids + little-endian sizes)
around raw integer samples — ``struct`` and ``array`` are stdlib, so
decoding needs no codec libraries. Together with ``png.py`` this
makes BOTH fixture-representable media modalities (image + audio)
genuinely decodable in-container; compressed formats (MP3/AAC/...)
still need native codecs and surface as per-row ``err`` values, never
job failures.

Scope (honest gates, not padding):
 - RIFF/WAVE integer PCM at 8/16/24/32 bits, any channel
   count/sample rate, via plain (audio_format=1) OR
   WAVE_FORMAT_EXTENSIBLE (0xFFFE with the PCM subformat GUID —
   the standard container for >2 channels or >16-bit) headers.
   Float PCM and a-law/mu-law companding raise
   ``UnsupportedWavError`` with the reason.
 - Header arithmetic is cross-checked (byte_rate and block_align must
   agree with channels x rate x depth; the data chunk must be whole
   frames) so a corrupt header errors instead of yielding garbage
   statistics.
 - Sample decode is ``array``-based (one C-level pass), not
   per-sample Python — unlike PNG's inherently sequential unfilter,
   PCM decode is O(n) bulk work.

The encoder exists so tests and oracle-paired queries can synthesize
deterministic audio clips.

No counterpart in the reference (JSON text only, main.py:1-638);
north-star extension per SURVEY §2.9.
"""

from __future__ import annotations

import struct
import sys
from array import array
from collections.abc import Sequence
from typing import NamedTuple


class WavError(ValueError):
    """Malformed WAV (bad magic, truncation, inconsistent header...)."""


class UnsupportedWavError(WavError):
    """Valid-but-unsupported WAV (float PCM, a-law/mu-law...)."""


class DecodedAudio(NamedTuple):
    channels: int
    sample_rate: int
    bit_depth: int
    n_frames: int
    # Interleaved samples, one int per (frame, channel): signed for
    # 16-bit, unsigned 0..255 for 8-bit (the WAV spec's conventions).
    samples: Sequence[int]

    @property
    def duration_ms(self) -> int:
        return self.n_frames * 1000 // self.sample_rate


# KSDATAFORMAT_SUBTYPE_PCM: the WAVE_FORMAT_EXTENSIBLE subformat
# GUID that means plain integer PCM (Microsoft multimedia spec).
_SUBTYPE_PCM = bytes.fromhex("0100000000001000800000aa00389b71")


def _u16(b: bytes, off: int) -> int:
    return struct.unpack_from("<H", b, off)[0]


def _u32(b: bytes, off: int) -> int:
    return struct.unpack_from("<I", b, off)[0]


def decode_wav(data: bytes) -> DecodedAudio:
    """Decode a PCM WAV payload; raises ``WavError`` on any
    malformation rather than guessing."""
    if len(data) < 12 or data[0:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavError("not a RIFF/WAVE payload")
    riff_size = _u32(data, 4)
    if riff_size != len(data) - 8:
        raise WavError(
            f"RIFF size {riff_size} != payload size {len(data) - 8}"
        )
    fmt: tuple[int, int, int, int, int, int] | None = None
    fmt_body = b""
    pcm: bytes | None = None
    off = 12
    while off + 8 <= len(data):
        cid = data[off : off + 4]
        csize = _u32(data, off + 4)
        body_off = off + 8
        if body_off + csize > len(data):
            raise WavError(f"chunk {cid!r} truncated")
        if cid == b"fmt ":
            if csize < 16:
                raise WavError(f"fmt chunk too short ({csize} bytes)")
            fmt = struct.unpack_from("<HHIIHH", data, body_off)
            fmt_body = data[body_off : body_off + csize]
        elif cid == b"data":
            pcm = data[body_off : body_off + csize]
        # unknown chunks (LIST, fact, ...) are skipped, per RIFF
        off = body_off + csize + (csize & 1)  # chunks pad to even
    if fmt is None:
        raise WavError("missing fmt chunk")
    if pcm is None:
        raise WavError("missing data chunk")
    audio_format, channels, rate, byte_rate, block_align, bits = fmt
    if audio_format == 0xFFFE:
        # WAVE_FORMAT_EXTENSIBLE (the standard container for >2
        # channels / >16-bit): PCM iff the 16-byte subformat GUID
        # says so — anything else (float, companded) stays gated
        if len(fmt_body) < 40:
            raise WavError(
                f"extensible fmt chunk too short ({len(fmt_body)} bytes)"
            )
        if fmt_body[24:40] != _SUBTYPE_PCM:
            raise UnsupportedWavError(
                "extensible subformat is not integer PCM"
            )
        audio_format = 1
    if audio_format != 1:
        raise UnsupportedWavError(
            f"audio format {audio_format} (only PCM=1 supported)"
        )
    if bits not in (8, 16, 24, 32):
        raise UnsupportedWavError(f"bit depth {bits} (only 8/16/24/32)")
    if channels < 1 or rate < 1:
        raise WavError(f"bad channels={channels} rate={rate}")
    expect_align = channels * bits // 8
    if block_align != expect_align or byte_rate != rate * expect_align:
        raise WavError(
            f"inconsistent header: block_align={block_align} "
            f"byte_rate={byte_rate} vs channels={channels} rate={rate} "
            f"bits={bits}"
        )
    if len(pcm) % block_align != 0:
        raise WavError(
            f"data chunk ({len(pcm)} bytes) is not whole frames of "
            f"{block_align}"
        )
    if bits == 16:
        arr = array("h")
        arr.frombytes(pcm)
        if sys.byteorder == "big":
            arr.byteswap()
        samples: Sequence[int] = arr
    elif bits == 32:
        arr32 = array("i")
        arr32.frombytes(pcm)
        if sys.byteorder == "big":
            arr32.byteswap()
        samples = arr32
    elif bits == 24:
        # no stdlib 3-byte array type — per-sample int.from_bytes
        # (fixture-scale fine; a native kernel swap changes only this)
        samples = [
            int.from_bytes(pcm[i : i + 3], "little", signed=True)
            for i in range(0, len(pcm), 3)
        ]
    else:
        samples = pcm  # 8-bit WAV is unsigned bytes
    return DecodedAudio(
        channels=channels,
        sample_rate=rate,
        bit_depth=bits,
        n_frames=len(pcm) // block_align,
        samples=samples,
    )


def encode_wav(
    samples: Sequence[int],
    channels: int,
    sample_rate: int,
    bit_depth: int = 16,
) -> bytes:
    """Encode interleaved integer samples as a PCM WAV payload
    (signed at 16/24/32 bits, unsigned at 8)."""
    if bit_depth not in (8, 16, 24, 32):
        raise ValueError(
            f"bit_depth must be 8/16/24/32, got {bit_depth}"
        )
    if channels < 1:
        raise ValueError(f"channels must be >= 1, got {channels}")
    if len(samples) % channels != 0:
        raise ValueError(
            f"{len(samples)} samples not divisible by {channels} channels"
        )
    if bit_depth == 16:
        arr = array("h", samples)
        if sys.byteorder == "big":
            arr.byteswap()
        pcm = arr.tobytes()
    elif bit_depth == 32:
        arr32 = array("i", samples)
        if sys.byteorder == "big":
            arr32.byteswap()
        pcm = arr32.tobytes()
    elif bit_depth == 24:
        pcm = b"".join(
            int(s).to_bytes(3, "little", signed=True) for s in samples
        )
    else:
        pcm = bytes(samples)
    block_align = channels * bit_depth // 8
    fmt = struct.pack(
        "<HHIIHH",
        1,
        channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        bit_depth,
    )
    body = (
        b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
        + (b"\x00" if len(pcm) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
