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
   WAVE_FORMAT_EXTENSIBLE (0xFFFE with the PCM or FLOAT subformat
   GUID — the standard container for >2 channels or >16-bit)
   headers.
 - IEEE-float PCM (audio_format=3) at 32/64 bits (round 6):
   samples decode to Python floats in nominal [-1, 1].
 - G.711 a-law/mu-law companding (audio_formats 6/7, round 6):
   8-bit companded bytes expand through the ITU G.711 segment
   tables to 16-bit linear samples (the decoded ``bit_depth`` is
   16 — the linear domain — while the container header says 8).
 - IMA/DVI ADPCM (audio_format 17, round 7): 4-bit nibbles expand
   through the canonical 89-entry step table + 8-entry index table
   to 16-bit linear samples; mono/stereo block layouts (per-channel
   4-byte block headers, stereo interleaved in 4-byte words), with
   the ``fact`` chunk's frame count honoured for a partial final
   block. Decoded ``bit_depth`` is 16 (the linear domain) while the
   container header says 4.
 - Microsoft ADPCM (audio_format 2, round 8): per-block two-tap
   linear predictor (7 canonical coefficient pairs, or the header's
   own table) + 16-entry delta-adaptation table; block headers carry
   the predictor choice, initial delta, and the first TWO samples
   per channel verbatim; stereo nibbles alternate channels within
   each byte (high=left). Same fact-chunk partial-final-block
   handling; decoded ``bit_depth`` is 16. Genuinely entropy-coded
   formats (MP3/AAC, ...) raise ``UnsupportedWavError`` with the
   reason.
 - Header arithmetic is cross-checked (byte_rate and block_align must
   agree with channels x rate x depth; the data chunk must be whole
   frames; format 17's wSamplesPerBlock extension field must agree
   with the block_align-derived samples-per-block) so a corrupt
   header errors instead of yielding garbage statistics. This
   strictness extends to the ``fact`` chunk for EVERY format
   (intentional, round 7+): a fact chunk shorter than its 4-byte
   frame count is malformed per RIFF regardless of whether the
   format needs fact, so plain-PCM files with a truncated fact also
   error rather than being silently skipped.
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
    """Valid-but-unsupported WAV (ADPCM and other compressed
    formats; integer/float PCM and G.711 companding decode)."""


class DecodedAudio(NamedTuple):
    channels: int
    sample_rate: int
    bit_depth: int
    n_frames: int
    # Interleaved samples, one per (frame, channel): ints for integer
    # PCM (signed at 16/24/32 bits, unsigned 0..255 at 8) and for
    # G.711 companded input (expanded to 16-bit linear); Python
    # floats in nominal [-1, 1] for IEEE-float PCM.
    samples: Sequence[int] | Sequence[float]

    @property
    def duration_ms(self) -> int:
        return self.n_frames * 1000 // self.sample_rate


# KSDATAFORMAT_SUBTYPE_PCM / _IEEE_FLOAT: the WAVE_FORMAT_EXTENSIBLE
# subformat GUIDs for integer and float PCM (Microsoft multimedia
# spec) — the GUID is the format code in the first two LE bytes.
_SUBTYPE_PCM = bytes.fromhex("0100000000001000800000aa00389b71")
_SUBTYPE_FLOAT = bytes.fromhex("0300000000001000800000aa00389b71")


def _ulaw_table() -> tuple[int, ...]:
    """mu-law byte → 16-bit linear (ITU G.711): invert the byte, then
    mantissa·8 + bias 0x84 shifted by the segment, bias removed,
    sign applied. Max magnitude 32124."""
    out = []
    for b in range(256):
        u = ~b & 0xFF
        t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
        out.append(0x84 - t if u & 0x80 else t - 0x84)
    return tuple(out)


def _alaw_table() -> tuple[int, ...]:
    """a-law byte → 16-bit linear (ITU G.711): XOR 0x55, segment 0
    adds 8, segment 1 adds 0x108, higher segments shift; the sign
    bit SET means positive in a-law. Max magnitude 32256."""
    out = []
    for b in range(256):
        a = b ^ 0x55
        t = (a & 0x0F) << 4
        seg = (a & 0x70) >> 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t = (t + 0x108) << (seg - 1)
        out.append(t if a & 0x80 else -t)
    return tuple(out)


ULAW_TABLE = _ulaw_table()
ALAW_TABLE = _alaw_table()

# IMA/DVI ADPCM quantizer tables (IMA Digital Audio Compression
# Standard; identical constants across every public implementation).
IMA_STEP_TABLE: tuple[int, ...] = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
    143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
    494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
    1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
    4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
    11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
    27086, 29794, 32767,
)
IMA_INDEX_TABLE: tuple[int, ...] = (-1, -1, -1, -1, 2, 4, 6, 8)

# Microsoft ADPCM quantizer tables (Microsoft multimedia spec /
# RIFF WAVE format 2; identical constants in every public
# implementation). The coefficient pairs are x256 fixed-point taps
# of the two-sample linear predictor; the adaptation table scales
# iDelta by table[code]/256 after each code, floored at 16.
MS_ADAPT_TABLE: tuple[int, ...] = (
    230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230,
)
MS_COEF_PAIRS: tuple[tuple[int, int], ...] = (
    (256, 0), (512, -256), (0, 0), (192, 64),
    (240, 0), (460, -208), (392, -232),
)


def _ima_step(pred: int, index: int, nibble: int) -> tuple[int, int]:
    """Advance the IMA decoder state machine by one 4-bit code:
    returns (new predictor clamped to int16, new step index clamped
    to [0, 88])."""
    step = IMA_STEP_TABLE[index]
    diff = step >> 3
    if nibble & 4:
        diff += step
    if nibble & 2:
        diff += step >> 1
    if nibble & 1:
        diff += step >> 2
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + IMA_INDEX_TABLE[nibble & 7]))
    return pred, index


def _ima_quantize(delta: int, step: int) -> int:
    """Encoder side: pick the 4-bit code whose reconstruction best
    approximates ``delta`` under the current ``step`` (canonical
    successive-approximation loop; sign in bit 3)."""
    nibble = 8 if delta < 0 else 0
    delta = abs(delta)
    if delta >= step:
        nibble |= 4
        delta -= step
    if delta >= step >> 1:
        nibble |= 2
        delta -= step >> 1
    if delta >= step >> 2:
        nibble |= 1
    return nibble


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
    fact_frames: int | None = None
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
        elif cid == b"fact":
            # per-channel frame count — authoritative for compressed
            # formats whose last block may be partially filled
            if csize < 4:
                raise WavError(f"fact chunk too short ({csize} bytes)")
            fact_frames = _u32(data, body_off)
        # unknown chunks (LIST, ...) are skipped, per RIFF
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
        sub = fmt_body[24:40]
        if sub == _SUBTYPE_PCM:
            audio_format = 1
        elif sub == _SUBTYPE_FLOAT:
            audio_format = 3
        else:
            raise UnsupportedWavError(
                "extensible subformat is neither integer nor float PCM"
            )
    if audio_format == 17:
        return _decode_ima_adpcm(fmt, fmt_body, pcm, fact_frames)
    if audio_format == 2:
        return _decode_ms_adpcm(fmt, fmt_body, pcm, fact_frames)
    if audio_format not in (1, 3, 6, 7):
        raise UnsupportedWavError(
            f"audio format {audio_format} (PCM=1, MS-ADPCM=2, float=3, "
            f"a-law=6, mu-law=7, IMA-ADPCM=17 supported)"
        )
    if audio_format == 1 and bits not in (8, 16, 24, 32):
        raise UnsupportedWavError(f"bit depth {bits} (only 8/16/24/32)")
    if audio_format == 3 and bits not in (32, 64):
        raise WavError(f"float PCM must be 32/64-bit, got {bits}")
    if audio_format in (6, 7) and bits != 8:
        raise WavError(
            f"G.711 companded samples are 8-bit, header says {bits}"
        )
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
    if audio_format == 3:
        arrf = array("f" if bits == 32 else "d")
        arrf.frombytes(pcm)
        if sys.byteorder == "big":
            arrf.byteswap()
        return DecodedAudio(
            channels=channels,
            sample_rate=rate,
            bit_depth=bits,
            n_frames=len(pcm) // block_align,
            samples=arrf,
        )
    if audio_format in (6, 7):
        table = ALAW_TABLE if audio_format == 6 else ULAW_TABLE
        return DecodedAudio(
            channels=channels,
            sample_rate=rate,
            bit_depth=16,  # the decoded linear domain (header said 8)
            n_frames=len(pcm) // block_align,
            samples=[table[b] for b in pcm],
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


def _decode_ima_adpcm(
    fmt: tuple[int, int, int, int, int, int],
    fmt_body: bytes,
    pcm: bytes,
    fact_frames: int | None,
) -> DecodedAudio:
    """IMA/DVI ADPCM (audio_format 17): per-block state machine over
    the canonical step/index tables. Block layout: one 4-byte header
    per channel (int16 first sample, uint8 step index, reserved),
    then 4-bit codes low-nibble-first — mono contiguous, stereo
    interleaved in 4-byte (8-nibble) words per channel."""
    _, channels, rate, byte_rate, block_align, bits = fmt
    if bits != 4:
        raise WavError(f"IMA ADPCM samples are 4-bit, header says {bits}")
    if channels not in (1, 2):
        raise UnsupportedWavError(
            f"IMA ADPCM decode supports mono/stereo, got {channels} channels"
        )
    if channels < 1 or rate < 1:
        raise WavError(f"bad channels={channels} rate={rate}")
    data_bytes = block_align - 4 * channels
    if data_bytes <= 0 or (channels == 2 and data_bytes % 8 != 0):
        raise WavError(
            f"IMA block_align={block_align} leaves no valid code body "
            f"for {channels} channels"
        )
    spb = data_bytes * 2 // channels + 1  # samples per block per channel
    if len(fmt_body) >= 20:
        # format-17 extension (cbSize>=2) carries wSamplesPerBlock —
        # cross-check it against the block_align-derived value so an
        # inconsistent header errors instead of decoding with a
        # silently different block layout
        declared_spb = _u16(fmt_body, 18)
        if declared_spb != spb:
            raise WavError(
                f"inconsistent header: wSamplesPerBlock={declared_spb} "
                f"but block_align={block_align} derives {spb}"
            )
    if len(pcm) % block_align != 0:
        raise WavError(
            f"data chunk ({len(pcm)} bytes) is not whole IMA blocks of "
            f"{block_align}"
        )
    n_blocks = len(pcm) // block_align
    # byte_rate for block-coded formats is block-granular:
    # rate frames/s packed spb-per-block → blocks/s * block_align,
    # which encoders round either way; accept both roundings.
    lo = rate * block_align // spb
    hi = -(-rate * block_align // spb)
    if not (lo <= byte_rate <= hi):
        raise WavError(
            f"inconsistent header: byte_rate={byte_rate} outside "
            f"[{lo}, {hi}] for rate={rate} block_align={block_align} "
            f"samples_per_block={spb}"
        )
    samples: list[int] = []
    for b in range(n_blocks):
        block = pcm[b * block_align : (b + 1) * block_align]
        preds: list[int] = []
        idxs: list[int] = []
        for ch in range(channels):
            p = struct.unpack_from("<h", block, 4 * ch)[0]
            ix = block[4 * ch + 2]
            if ix > 88:
                raise WavError(f"IMA step index {ix} > 88")
            preds.append(p)
            idxs.append(ix)
        samples.extend(preds)  # header carries frame 0 verbatim
        body = block[4 * channels :]
        if channels == 1:
            pred, idx = preds[0], idxs[0]
            for byte in body:
                for nib in (byte & 0x0F, byte >> 4):
                    pred, idx = _ima_step(pred, idx, nib)
                    samples.append(pred)
        else:
            # decode each channel's 4-byte word group, then
            # interleave the 8 frames it carries
            frames_l: list[int] = []
            frames_r: list[int] = []
            for g in range(0, len(body), 8):
                for ch, frames in ((0, frames_l), (1, frames_r)):
                    pred, idx = preds[ch], idxs[ch]
                    for byte in body[g + 4 * ch : g + 4 * ch + 4]:
                        for nib in (byte & 0x0F, byte >> 4):
                            pred, idx = _ima_step(pred, idx, nib)
                            frames.append(pred)
                    preds[ch], idxs[ch] = pred, idx
            for fl, fr in zip(frames_l, frames_r):
                samples.extend((fl, fr))
    n_frames = n_blocks * spb
    if fact_frames is not None:
        if not (n_frames - spb < fact_frames <= n_frames):
            raise WavError(
                f"fact chunk claims {fact_frames} frames but "
                f"{n_blocks} blocks hold {n_frames} (spb={spb})"
            )
        samples = samples[: fact_frames * channels]
        n_frames = fact_frames
    return DecodedAudio(
        channels=channels,
        sample_rate=rate,
        bit_depth=16,  # the decoded linear domain (header said 4)
        n_frames=n_frames,
        samples=samples,
    )


def _decode_ms_adpcm(
    fmt: tuple[int, int, int, int, int, int],
    fmt_body: bytes,
    pcm: bytes,
    fact_frames: int | None,
) -> DecodedAudio:
    """Microsoft ADPCM (audio_format 2): per-block two-tap linear
    prediction over the canonical (or header-declared) coefficient
    pairs with multiplicative delta adaptation. Block layout per
    channel: predictor index (1 byte each, first), then int16
    iDelta, iSamp1, iSamp2 (channel-interleaved); the first TWO
    output frames per channel are iSamp2 then iSamp1 verbatim, then
    4-bit signed codes high-nibble-first — stereo alternates
    channels every nibble (high=left)."""
    _, channels, rate, byte_rate, block_align, bits = fmt
    if bits != 4:
        raise WavError(f"MS ADPCM samples are 4-bit, header says {bits}")
    if channels not in (1, 2):
        raise UnsupportedWavError(
            f"MS ADPCM decode supports mono/stereo, got {channels} channels"
        )
    if channels < 1 or rate < 1:
        raise WavError(f"bad channels={channels} rate={rate}")
    data_bytes = block_align - 7 * channels
    if data_bytes <= 0:
        raise WavError(
            f"MS ADPCM block_align={block_align} leaves no code body "
            f"for {channels} channels"
        )
    spb = data_bytes * 2 // channels + 2  # samples per block per channel
    coefs = MS_COEF_PAIRS
    if len(fmt_body) >= 22:
        declared_spb = _u16(fmt_body, 18)
        if declared_spb != spb:
            raise WavError(
                f"inconsistent header: wSamplesPerBlock={declared_spb} "
                f"but block_align={block_align} derives {spb}"
            )
        num_coef = _u16(fmt_body, 20)
        if num_coef < 7:
            raise WavError(f"MS ADPCM wNumCoef={num_coef} < 7")
        if len(fmt_body) < 22 + 4 * num_coef:
            raise WavError("MS ADPCM coefficient table truncated")
        coefs = tuple(
            (
                struct.unpack_from("<h", fmt_body, 22 + 4 * i)[0],
                struct.unpack_from("<h", fmt_body, 24 + 4 * i)[0],
            )
            for i in range(num_coef)
        )
        if coefs[:7] != MS_COEF_PAIRS:
            # the spec fixes the first 7 pairs; a header that
            # redefines them is corrupt, not creative
            raise WavError(
                "MS ADPCM header redefines the 7 standard coefficient pairs"
            )
    if len(pcm) % block_align != 0:
        raise WavError(
            f"data chunk ({len(pcm)} bytes) is not whole MS-ADPCM blocks "
            f"of {block_align}"
        )
    n_blocks = len(pcm) // block_align
    lo = rate * block_align // spb
    hi = -(-rate * block_align // spb)
    if not (lo <= byte_rate <= hi):
        raise WavError(
            f"inconsistent header: byte_rate={byte_rate} outside "
            f"[{lo}, {hi}] for rate={rate} block_align={block_align} "
            f"samples_per_block={spb}"
        )
    samples: list[int] = []
    for b in range(n_blocks):
        block = pcm[b * block_align : (b + 1) * block_align]
        c1: list[int] = []
        c2: list[int] = []
        for ch in range(channels):
            p = block[ch]
            if p >= len(coefs):
                raise WavError(
                    f"MS ADPCM predictor index {p} >= "
                    f"{len(coefs)} coefficient pairs"
                )
            c1.append(coefs[p][0])
            c2.append(coefs[p][1])
        deltas = [
            struct.unpack_from("<h", block, channels + 2 * ch)[0]
            for ch in range(channels)
        ]
        s1 = [
            struct.unpack_from("<h", block, 3 * channels + 2 * ch)[0]
            for ch in range(channels)
        ]
        s2 = [
            struct.unpack_from("<h", block, 5 * channels + 2 * ch)[0]
            for ch in range(channels)
        ]
        if any(d <= 0 for d in deltas):
            raise WavError(f"MS ADPCM iDelta must be positive, got {deltas}")
        samples.extend(s2)  # frame 0 per channel: iSamp2 verbatim
        samples.extend(s1)  # frame 1 per channel: iSamp1 verbatim
        nib_i = 0
        for byte in block[7 * channels :]:
            for nib in (byte >> 4, byte & 0x0F):
                ch = nib_i % channels
                nib_i += 1
                pred = (s1[ch] * c1[ch] + s2[ch] * c2[ch]) >> 8
                signed = nib - 16 if nib >= 8 else nib
                v = max(-32768, min(32767, pred + signed * deltas[ch]))
                s2[ch], s1[ch] = s1[ch], v
                deltas[ch] = max(16, (MS_ADAPT_TABLE[nib] * deltas[ch]) >> 8)
                samples.append(v)
    n_frames = n_blocks * spb
    if fact_frames is not None:
        if not (n_frames - spb < fact_frames <= n_frames):
            raise WavError(
                f"fact chunk claims {fact_frames} frames but "
                f"{n_blocks} blocks hold {n_frames} (spb={spb})"
            )
        samples = samples[: fact_frames * channels]
        n_frames = fact_frames
    return DecodedAudio(
        channels=channels,
        sample_rate=rate,
        bit_depth=16,  # the decoded linear domain (header said 4)
        n_frames=n_frames,
        samples=samples,
    )


def _ms_trunc_div(e: int, delta: int) -> int:
    """C-style integer division (truncate toward zero) — the
    canonical MS ADPCM encoder quantizes PredErr/iDelta this way."""
    return -((-e) // delta) if e < 0 else e // delta


def encode_ms_adpcm(
    samples: Sequence[int],
    channels: int,
    sample_rate: int,
    samples_per_block: int = 500,
    predictor=None,
) -> bytes:
    """Encode int16 samples as a Microsoft ADPCM WAV payload
    (audio_format 2). Deterministic: the encoder tracks the
    decoder's exact state, so ``decode_wav(encode_ms_adpcm(x))``
    reproduces the encoder's reconstruction bit-for-bit.

    ``predictor`` selects the per-block coefficient pair: ``None``
    (default) tries all 7 canonical pairs and keeps the one with the
    lowest reconstruction SSE (ties → lowest index — fully
    deterministic); an ``int`` pins one pair; a callable
    ``(block_idx, ch) -> int`` chooses per block (used by
    oracle-paired fixtures to exercise every pair on a closed-form
    schedule). The initial per-block iDelta is
    ``max(16, |iSamp1 - iSamp2|)`` — an encoder-side choice the
    decoder reads from the header, chosen for closed-form
    mirrorability. Writes the ``fact`` chunk so a partial final
    block (padded by repeating the last sample) round-trips the true
    frame count."""
    if channels not in (1, 2):
        raise ValueError(f"MS ADPCM encode supports 1/2 channels, got {channels}")
    spb = samples_per_block
    # mono packs 2 nibbles/byte over spb-2 coded samples; stereo's
    # alternating nibbles fill whole bytes at any spb; > 2 so every
    # block carries a code body (spb=2 would be header-only blocks)
    if spb < 3 or (channels == 1 and (spb - 2) % 2 != 0):
        raise ValueError(
            f"samples_per_block must be > 2"
            + (" and even for mono" if channels == 1 else "")
            + f", got {spb}"
        )
    if len(samples) % channels != 0:
        raise ValueError(
            f"{len(samples)} samples not divisible by {channels} channels"
        )
    n_frames = len(samples) // channels
    if n_frames == 0:
        raise ValueError("need at least one frame")
    block_align = 7 * channels + (spb - 2) * channels // 2
    chans = [samples[c::channels] for c in range(channels)]

    def encode_channel_block(
        seg: list[int], p: int
    ) -> tuple[list[int], int, list[int]]:
        """Encode one channel's block with coefficient pair ``p``;
        returns (nibbles, sse, reconstruction)."""
        c1, c2 = MS_COEF_PAIRS[p]
        s2, s1 = seg[0], seg[1]
        delta = min(32767, max(16, abs(s1 - s2)))  # header iDelta is int16
        nibs: list[int] = []
        recon = [s2, s1]
        sse = 0
        for s in seg[2:]:
            pred = (s1 * c1 + s2 * c2) >> 8
            q = max(-8, min(7, _ms_trunc_div(s - pred, delta)))
            nib = q & 0x0F
            v = max(-32768, min(32767, pred + q * delta))
            sse += (v - s) * (v - s)
            s2, s1 = s1, v
            delta = max(16, (MS_ADAPT_TABLE[nib] * delta) >> 8)
            nibs.append(nib)
            recon.append(v)
        return nibs, sse, recon

    blocks: list[bytes] = []
    for bidx, start in enumerate(range(0, n_frames, spb)):
        chosen: list[tuple[int, list[int], int, int]] = []  # (p, nibs, s1, s2)
        for ch in range(channels):
            seg = list(chans[ch][start : start + spb])
            seg += [seg[-1]] * (spb - len(seg))  # pad partial block
            if predictor is None:
                best = min(
                    (encode_channel_block(seg, p)[1], p) for p in range(7)
                )[1]
            elif callable(predictor):
                best = int(predictor(bidx, ch))
            else:
                best = int(predictor)
            if not (0 <= best < 7):
                raise ValueError(f"predictor index {best} outside 0..6")
            nibs, _, _ = encode_channel_block(seg, best)
            chosen.append((best, nibs, seg[1], seg[0]))
        head = bytearray(bytes(c[0] for c in chosen))
        for field in (  # iDelta, iSamp1, iSamp2 — channel-interleaved
            [min(32767, max(16, abs(c[2] - c[3]))) for c in chosen],
            [c[2] for c in chosen],
            [c[3] for c in chosen],
        ):
            for v in field:
                head += struct.pack("<h", v)
        body = bytearray()
        if channels == 1:
            nibs = chosen[0][1]
            for i in range(0, len(nibs), 2):
                body.append((nibs[i] << 4) | nibs[i + 1])
        else:
            nl, nr = chosen[0][1], chosen[1][1]
            for a, b in zip(nl, nr):
                body.append((a << 4) | b)
        blocks.append(bytes(head) + bytes(body))
    pcm = b"".join(blocks)
    byte_rate = -(-sample_rate * block_align // spb)
    fmt = struct.pack(
        "<HHIIHHHHH",
        2,
        channels,
        sample_rate,
        byte_rate,
        block_align,
        4,
        4 + 4 * 7,  # cbSize: wSamplesPerBlock + wNumCoef + 7 pairs
        spb,
        7,
    ) + b"".join(struct.pack("<hh", a, b) for a, b in MS_COEF_PAIRS)
    body_chunks = (
        b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"fact"
        + struct.pack("<II", 4, n_frames)
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
        + (b"\x00" if len(pcm) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(body_chunks)) + b"WAVE" + body_chunks


def encode_ima_adpcm(
    samples: Sequence[int],
    channels: int,
    sample_rate: int,
    samples_per_block: int = 505,
) -> bytes:
    """Encode int16 samples as an IMA/DVI ADPCM WAV payload
    (audio_format 17). The encoder tracks the decoder's exact state,
    so ``decode_wav(encode_ima_adpcm(x))`` reproduces the encoder's
    reconstruction bit-for-bit (lossy vs x, deterministic vs itself).
    Writes the ``fact`` chunk so a partial final block round-trips
    the true frame count; the pad region repeats the last nibble 0
    state silently."""
    if channels not in (1, 2):
        raise ValueError(f"IMA ADPCM encode supports 1/2 channels, got {channels}")
    # mono packs nibble pairs per byte; stereo needs whole 8-nibble
    # (4-byte) words per channel per interleave group
    grain = 2 if channels == 1 else 8
    if (samples_per_block - 1) % grain != 0 or samples_per_block < 2:
        raise ValueError(
            f"samples_per_block must be 1 + k*{grain} for "
            f"{channels} channel(s), got {samples_per_block}"
        )
    if len(samples) % channels != 0:
        raise ValueError(
            f"{len(samples)} samples not divisible by {channels} channels"
        )
    n_frames = len(samples) // channels
    if n_frames == 0:
        raise ValueError("need at least one frame")
    spb = samples_per_block
    block_align = 4 * channels + (spb - 1) * channels // 2
    chans = [samples[c::channels] for c in range(channels)]
    idxs = [0] * channels
    blocks: list[bytes] = []
    for start in range(0, n_frames, spb):
        head = bytearray()
        nib_streams: list[list[int]] = []
        for ch in range(channels):
            seg = list(chans[ch][start : start + spb])
            seg += [seg[-1]] * (spb - len(seg))  # pad partial block
            pred = seg[0]
            head += struct.pack("<hBB", pred, idxs[ch], 0)
            nibs: list[int] = []
            idx = idxs[ch]
            for s in seg[1:]:
                step = IMA_STEP_TABLE[idx]
                nib = _ima_quantize(s - pred, step)
                pred, idx = _ima_step(pred, idx, nib)
                nibs.append(nib)
            idxs[ch] = idx
            nib_streams.append(nibs)
        body = bytearray()
        if channels == 1:
            nibs = nib_streams[0]
            for i in range(0, len(nibs), 2):
                body.append(nibs[i] | (nibs[i + 1] << 4))
        else:
            for g in range(0, len(nib_streams[0]), 8):
                for nibs in nib_streams:
                    grp = nibs[g : g + 8]
                    for i in range(0, 8, 2):
                        body.append(grp[i] | (grp[i + 1] << 4))
        blocks.append(bytes(head) + bytes(body))
    pcm = b"".join(blocks)
    byte_rate = -(-sample_rate * block_align // spb)
    fmt = struct.pack(
        "<HHIIHHHH",
        17,
        channels,
        sample_rate,
        byte_rate,
        block_align,
        4,
        2,  # cbSize
        spb,
    )
    body_chunks = (
        b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"fact"
        + struct.pack("<II", 4, n_frames)
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
        + (b"\x00" if len(pcm) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(body_chunks)) + b"WAVE" + body_chunks


def encode_wav(
    samples: Sequence[int] | Sequence[float],
    channels: int,
    sample_rate: int,
    bit_depth: int = 16,
    sample_format: str = "int",
) -> bytes:
    """Encode interleaved samples as a WAV payload.

    ``sample_format``: ``"int"`` (default) writes integer PCM
    (signed at 16/24/32 bits, unsigned at 8); ``"float"`` writes
    IEEE-float PCM (audio_format=3, ``bit_depth`` 32/64, samples
    are Python floats); ``"alaw"``/``"ulaw"`` write G.711 companded
    streams (audio_formats 6/7) — samples are the COMPANDED bytes
    0..255 (companding linear audio is an encoder-side DSP choice;
    this engine decodes, it does not compand).
    """
    if channels < 1:
        raise ValueError(f"channels must be >= 1, got {channels}")
    if len(samples) % channels != 0:
        raise ValueError(
            f"{len(samples)} samples not divisible by {channels} channels"
        )
    if sample_format == "float":
        if bit_depth not in (32, 64):
            raise ValueError(
                f"float bit_depth must be 32/64, got {bit_depth}"
            )
        arrf = array("f" if bit_depth == 32 else "d", samples)
        if sys.byteorder == "big":
            arrf.byteswap()
        return _wrap_riff(arrf.tobytes(), 3, channels, sample_rate, bit_depth)
    if sample_format in ("alaw", "ulaw"):
        if bit_depth != 8:
            raise ValueError(
                f"companded bit_depth must be 8, got {bit_depth}"
            )
        code = 6 if sample_format == "alaw" else 7
        return _wrap_riff(bytes(samples), code, channels, sample_rate, 8)
    if sample_format != "int":
        raise ValueError(
            f"sample_format must be int/float/alaw/ulaw, got "
            f"{sample_format!r}"
        )
    if bit_depth not in (8, 16, 24, 32):
        raise ValueError(
            f"bit_depth must be 8/16/24/32, got {bit_depth}"
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
    return _wrap_riff(pcm, 1, channels, sample_rate, bit_depth)


def _wrap_riff(
    pcm: bytes,
    audio_format: int,
    channels: int,
    sample_rate: int,
    bit_depth: int,
) -> bytes:
    block_align = channels * bit_depth // 8
    fmt = struct.pack(
        "<HHIIHH",
        audio_format,
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
