"""Spec tests for the pure-stdlib WAV codec (operators/wav.py):
round-trips at both bit depths, RIFF chunk-walk details (unknown
chunks, odd-size padding), and strict rejection of every header
malformation class — plus the Spark decode_audio kernel's err-column
failure posture."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_deltalake_spark.operators.wav import (
    DecodedAudio,
    UnsupportedWavError,
    WavError,
    decode_wav,
    encode_wav,
)


def test_roundtrip_16bit_stereo():
    samples = [0, 100, -100, 32767, -32768, 7, -7, 1234]
    payload = encode_wav(samples, channels=2, sample_rate=44100)
    au = decode_wav(payload)
    assert au == DecodedAudio(2, 44100, 16, 4, au.samples)
    assert list(au.samples) == samples
    assert au.duration_ms == 4 * 1000 // 44100


def test_roundtrip_8bit_mono_odd_length_pads():
    samples = [0, 255, 128]  # odd data size -> RIFF pad byte
    payload = encode_wav(samples, channels=1, sample_rate=8000, bit_depth=8)
    assert len(payload) % 2 == 0  # padded container
    au = decode_wav(payload)
    assert (au.channels, au.bit_depth, au.n_frames) == (1, 8, 3)
    assert list(au.samples) == samples


def test_unknown_chunks_are_skipped():
    base = encode_wav([1, 2, 3, 4], channels=1, sample_rate=8000)
    # splice a LIST chunk (odd size -> padded) between WAVE and fmt
    extra = b"LIST" + struct.pack("<I", 3) + b"abc\x00"
    spliced = base[:12] + extra + base[12:]
    spliced = (
        spliced[:4]
        + struct.pack("<I", len(spliced) - 8)
        + spliced[8:]
    )
    au = decode_wav(spliced)
    assert list(au.samples) == [1, 2, 3, 4]


@pytest.mark.parametrize(
    "mutate, match",
    [
        (lambda b: b"JUNK" + b[4:], "not a RIFF"),
        (lambda b: b[:8] + b"AVI " + b[12:], "not a RIFF"),
        (lambda b: b[:4] + struct.pack("<I", 5) + b[8:], "RIFF size"),
        (lambda b: b[:-2], "truncated|RIFF size"),
    ],
)
def test_container_malformations_rejected(mutate, match):
    good = encode_wav([1, -1, 2, -2], channels=1, sample_rate=8000)
    with pytest.raises(WavError, match=match):
        decode_wav(mutate(good))


def test_non_pcm_and_bad_depth_unsupported():
    good = encode_wav([1, -1], channels=1, sample_rate=8000)
    fmt_off = good.index(b"fmt ") + 8
    # genuinely entropy-coded formats (MP3 = 85) stay an honest gate
    # (MS ADPCM format 2 decodes since round 8 — see the r8 tests)
    mp3 = good[:fmt_off] + struct.pack("<H", 85) + good[fmt_off + 2 :]
    with pytest.raises(UnsupportedWavError, match="format 85"):
        decode_wav(mp3)
    # a format-2 header on 16-bit PCM data is malformed, not gated
    adpcm = good[:fmt_off] + struct.pack("<H", 2) + good[fmt_off + 2 :]
    with pytest.raises(WavError, match="4-bit"):
        decode_wav(adpcm)
    # float (format 3) decodes since round 6, but only at 32/64-bit —
    # a 16-bit float header is malformed, not gated
    ieee16 = good[:fmt_off] + struct.pack("<H", 3) + good[fmt_off + 2 :]
    with pytest.raises(WavError, match="float PCM must be 32/64"):
        decode_wav(ieee16)


def test_inconsistent_block_align_rejected():
    good = encode_wav([1, -1, 2, -2], channels=2, sample_rate=8000)
    fmt_off = good.index(b"fmt ") + 8
    bad = (
        good[: fmt_off + 12]
        + struct.pack("<H", 3)  # block_align 3 != 2ch*16bit/8
        + good[fmt_off + 14 :]
    )
    with pytest.raises(WavError, match="inconsistent header"):
        decode_wav(bad)


def test_partial_frame_rejected():
    good = encode_wav([1, -1, 2, -2], channels=2, sample_rate=8000)
    data_off = good.index(b"data")
    # shrink the data chunk by 2 bytes (half a 4-byte frame)
    n = struct.unpack_from("<I", good, data_off + 4)[0]
    bad = (
        good[: data_off + 4]
        + struct.pack("<I", n - 2)
        + good[data_off + 8 : -2]
    )
    bad = bad[:4] + struct.pack("<I", len(bad) - 8) + bad[8:]
    with pytest.raises(WavError, match="whole frames"):
        decode_wav(bad)


def test_missing_chunks_rejected():
    hdr = b"RIFF" + struct.pack("<I", 4) + b"WAVE"
    with pytest.raises(WavError, match="missing fmt"):
        decode_wav(hdr)


def test_decode_audio_kernel_errs_do_not_fail(spark):
    """The Spark kernel must decode good rows and capture bad rows in
    the err column — never raise."""
    from etl_deltalake_spark.operators.multimodal import decode_audio

    good = encode_wav([10, -10, 20, -20], channels=2, sample_rate=16000)
    rows = [(1, good), (2, b"not audio at all"), (3, good[:10])]
    df = spark.createDataFrame(rows, ["doc_id", "payload"])
    out = {r["doc_id"]: r for r in decode_audio(df, "doc_id", "payload").collect()}
    assert out[1]["err"] is None
    assert (out[1]["channels"], out[1]["n_frames"]) == (2, 2)
    assert out[1]["samp_sum"] == 0 and out[1]["peak_abs"] == 20
    assert out[2]["err"] is not None and out[2]["channels"] is None
    assert out[3]["err"] is not None


@settings(deadline=None, max_examples=200, print_blob=True)
@given(
    frames=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=0, max_size=64
    ),
    channels=st.integers(min_value=1, max_value=4),
    rate=st.sampled_from([8000, 16000, 44100]),
)
def test_roundtrip_property_16bit(frames, channels, rate):
    """encode→decode is the identity on any 16-bit sample sequence,
    channel count, and rate (pure-Python property, no Spark)."""
    samples = frames * channels  # divisible-by-channels by construction
    au = decode_wav(encode_wav(samples, channels, rate))
    assert list(au.samples) == samples
    assert (au.channels, au.sample_rate, au.bit_depth) == (channels, rate, 16)
    assert au.n_frames == len(samples) // channels


@settings(deadline=None, max_examples=200, print_blob=True)
@given(
    samples=st.lists(
        st.integers(min_value=0, max_value=255), min_size=0, max_size=65
    ),
)
def test_roundtrip_property_8bit_mono(samples):
    """8-bit round-trip including odd-length pad-byte handling."""
    au = decode_wav(encode_wav(samples, 1, 8000, bit_depth=8))
    assert list(au.samples) == samples
    assert au.bit_depth == 8


# ----------------------------------------- round 5: 24/32-bit + extensible


def test_roundtrip_24_and_32_bit():
    """Depths beyond 16-bit roundtrip with values outside the 16-bit
    range (proving real width, not truncation)."""
    s24 = [0, 1, -1, 8_000_000, -8_000_000, 123_456, -654_321, 42]
    d = decode_wav(encode_wav(s24, channels=2, sample_rate=48000,
                              bit_depth=24))
    assert (d.channels, d.sample_rate, d.bit_depth, d.n_frames) == (
        2, 48000, 24, 4,
    )
    assert list(d.samples) == s24

    s32 = [0, 2_000_000_000, -2_000_000_000, 77, -1, 65536]
    d32 = decode_wav(encode_wav(s32, channels=3, sample_rate=44100,
                                bit_depth=32))
    assert d32.bit_depth == 32 and d32.n_frames == 2
    assert list(d32.samples) == s32


def _extensible(payload: bytes, subformat: bytes) -> bytes:
    """Rewrap a plain-PCM payload's fmt chunk as WAVE_FORMAT_EXTENSIBLE
    by hand (cbSize=22, validBits, channelMask, 16-byte GUID)."""
    fmt_off = payload.index(b"fmt ")
    csize = struct.unpack_from("<I", payload, fmt_off + 4)[0]
    body = payload[fmt_off + 8 : fmt_off + 8 + csize]
    bits = struct.unpack_from("<H", body, 14)[0]
    ext = (
        struct.pack("<H", 0xFFFE)
        + body[2:16]
        + struct.pack("<HHI", 22, bits, 0)
        + subformat
    )
    rebuilt = (
        payload[:fmt_off]
        + b"fmt "
        + struct.pack("<I", len(ext))
        + ext
        + payload[fmt_off + 8 + csize :]
    )
    # fix the RIFF size for the grown fmt chunk
    return (
        rebuilt[:4]
        + struct.pack("<I", len(rebuilt) - 8)
        + rebuilt[8:]
    )


def test_extensible_pcm_decodes_like_plain():
    from etl_deltalake_spark.operators.wav import _SUBTYPE_PCM

    samples = [5, -5, 300, -300, 7, 9]
    plain = encode_wav(samples, channels=2, sample_rate=16000)
    ext = _extensible(plain, _SUBTYPE_PCM)
    a, b = decode_wav(plain), decode_wav(ext)
    assert list(a.samples) == list(b.samples) == samples
    assert (a.channels, a.sample_rate, a.n_frames) == (
        b.channels, b.sample_rate, b.n_frames,
    )


def test_extensible_unknown_subformat_gated():
    plain = encode_wav([1, -1], channels=1, sample_rate=8000)
    bogus_guid = bytes.fromhex("aa00000000001000800000aa00389b71")
    with pytest.raises(UnsupportedWavError, match="subformat"):
        decode_wav(_extensible(plain, bogus_guid))


def test_extensible_float_subformat_decodes():
    from etl_deltalake_spark.operators.wav import _SUBTYPE_FLOAT

    samples = [0.5, -0.25, 0.125, -1.0]
    plain = encode_wav(
        samples, channels=2, sample_rate=8000,
        bit_depth=32, sample_format="float",
    )
    ext = _extensible(plain, _SUBTYPE_FLOAT)
    a, b = decode_wav(plain), decode_wav(ext)
    assert list(a.samples) == list(b.samples) == samples
    assert a.bit_depth == b.bit_depth == 32


# --------------------------------------------- round 6: float + G.711


def test_float32_roundtrip_exact():
    """Dyadic-rational floats survive encode→decode bit-exactly in
    float32 (no rounding in the container — samples ARE the bytes)."""
    samples = [k / 32768.0 - 0.5 for k in range(0, 64, 7)]
    out = decode_wav(
        encode_wav(samples, 1, 44100, bit_depth=32, sample_format="float")
    )
    assert (out.channels, out.sample_rate, out.bit_depth) == (1, 44100, 32)
    assert list(out.samples) == samples
    assert out.n_frames == len(samples)


def test_float64_roundtrip_exact():
    import math

    samples = [math.pi - 3, -math.e / 10, 0.0, 1.0, -1.0, 2.0]
    out = decode_wav(
        encode_wav(samples, 2, 8000, bit_depth=64, sample_format="float")
    )
    assert out.bit_depth == 64 and out.n_frames == 3
    assert list(out.samples) == samples  # float64 holds them exactly


def test_ulaw_known_vectors():
    """ITU G.711 mu-law landmark bytes: 0xFF is +0, 0x7F is -0,
    0x00/0x80 are the extremes ∓32124."""
    from etl_deltalake_spark.operators.wav import ULAW_TABLE

    assert ULAW_TABLE[0xFF] == 0
    assert ULAW_TABLE[0x7F] == 0
    assert ULAW_TABLE[0x00] == -32124
    assert ULAW_TABLE[0x80] == 32124
    # monotone within the positive half (0x80..0xFF decreasing code →
    # increasing magnitude as the code decreases)
    pos = [ULAW_TABLE[b] for b in range(0xFF, 0x7F, -1)]
    assert pos == sorted(pos) and pos[0] == 0


def test_alaw_known_vectors():
    """ITU G.711 a-law landmarks: 0x55 → -8 (closest-to-zero
    negative), 0xD5 → +8, 0x2A/0xAA the extremes ∓32256."""
    from etl_deltalake_spark.operators.wav import ALAW_TABLE

    assert ALAW_TABLE[0x55] == -8
    assert ALAW_TABLE[0xD5] == 8
    assert ALAW_TABLE[0x2A] == -32256
    assert ALAW_TABLE[0xAA] == 32256
    # the table is odd-symmetric: flipping the sign bit negates
    assert all(
        ALAW_TABLE[b] == -ALAW_TABLE[b ^ 0x80] for b in range(256)
    )


def test_companded_stream_decodes_through_table():
    from etl_deltalake_spark.operators.wav import ALAW_TABLE, ULAW_TABLE

    comp = bytes(range(0, 256, 5))
    for fmtname, table in (("alaw", ALAW_TABLE), ("ulaw", ULAW_TABLE)):
        out = decode_wav(
            encode_wav(
                list(comp), 1, 8000, bit_depth=8, sample_format=fmtname
            )
        )
        assert out.bit_depth == 16  # decoded linear domain
        assert out.n_frames == len(comp)
        assert list(out.samples) == [table[b] for b in comp]


def test_ulaw_symmetry():
    from etl_deltalake_spark.operators.wav import ULAW_TABLE

    # sign-bit flip negates everywhere except the two zero codes
    assert all(
        ULAW_TABLE[b] == -ULAW_TABLE[b ^ 0x80] for b in range(256)
    )


# ------------------------------------------------- round 8: IMA ADPCM


from etl_deltalake_spark.operators.wav import encode_ima_adpcm  # noqa: E402

# Independent spec-table copies (IMA Digital Audio Compression
# Standard, public constants) so the reference decoder below shares
# no tables with the production module.
_REF_STEPS = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
    143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
    494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
    1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
    4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
    11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
    27086, 29794, 32767,
)
_REF_INDEX = (-1, -1, -1, -1, 2, 4, 6, 8)


def _ref_decode_ima(payload: bytes) -> tuple[int, int, list[int]]:
    """Independent minimal format-17 decoder (own RIFF walk, own
    tables, own nibble/interleave logic) — the cross-check for the
    production round-trip."""
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    off, fmt, data, fact = 12, None, None, None
    while off + 8 <= len(payload):
        cid = payload[off : off + 4]
        n = int.from_bytes(payload[off + 4 : off + 8], "little")
        body = payload[off + 8 : off + 8 + n]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        elif cid == b"fact":
            fact = int.from_bytes(body[:4], "little")
        off += 8 + n + (n & 1)
    tag, ch, rate, _br, ba, bits = struct.unpack_from("<HHIIHH", fmt)
    assert tag == 17 and bits == 4
    per_ch: list[list[int]] = [[] for _ in range(ch)]
    for b0 in range(0, len(data), ba):
        blk = data[b0 : b0 + ba]
        body = blk[4 * ch :]
        nibs: list[list[int]] = [[] for _ in range(ch)]
        if ch == 1:
            for byte in body:
                nibs[0] += [byte & 15, byte >> 4]
        else:
            for g in range(0, len(body), 8):
                for c in range(ch):
                    for byte in body[g + 4 * c : g + 4 * c + 4]:
                        nibs[c] += [byte & 15, byte >> 4]
        for c in range(ch):
            pred = int.from_bytes(blk[4 * c : 4 * c + 2], "little", signed=True)
            idx = blk[4 * c + 2]
            per_ch[c].append(pred)
            for nib in nibs[c]:
                step = _REF_STEPS[idx]
                diff = step >> 3
                if nib & 4:
                    diff += step
                if nib & 2:
                    diff += step >> 1
                if nib & 1:
                    diff += step >> 2
                pred = pred - diff if nib & 8 else pred + diff
                pred = max(-32768, min(32767, pred))
                idx = max(0, min(88, idx + _REF_INDEX[nib & 7]))
                per_ch[c].append(pred)
    n_frames = len(per_ch[0]) if fact is None else fact
    inter = [per_ch[c][f] for f in range(n_frames) for c in range(ch)]
    return ch, rate, inter


def _ima_clip(n: int, seed: int = 1) -> list[int]:
    return [((seed * 37 + k * 101) % 65536) - 32768 for k in range(n)]


@pytest.mark.parametrize(
    "channels, n_frames, spb",
    [
        (1, 45, 9),     # whole blocks (45 = 5*9)
        (1, 40, 9),     # partial final block (fact truncation)
        (2, 36, 9),     # stereo, whole blocks
        (2, 41, 9),     # stereo, partial final block
        (1, 505, 505),  # default-sized single block
        (2, 3, 9),      # shorter than one block
        (1, 1, 9),      # single frame (header only carries it)
    ],
)
def test_ima_roundtrip_matches_independent_decoder(channels, n_frames, spb):
    """decode_wav(encode_ima_adpcm(x)) == an independent spec-table
    decoder on the same payload — pins block layout, stereo 4-byte
    word interleave, header frame 0, state carry across blocks, and
    fact-chunk truncation of the padded tail."""
    samples = _ima_clip(n_frames * channels, seed=7 + channels)
    payload = encode_ima_adpcm(samples, channels, 8000, samples_per_block=spb)
    au = decode_wav(payload)
    ch, rate, ref = _ref_decode_ima(payload)
    assert (au.channels, au.sample_rate, au.bit_depth) == (channels, 8000, 16)
    assert au.n_frames == n_frames
    assert len(au.samples) == n_frames * channels
    assert (ch, rate) == (channels, 8000)
    assert list(au.samples) == ref


def test_ima_reconstruction_tracks_input():
    """ADPCM is lossy but the reconstruction of a slowly-varying
    signal stays close (step table adapts down); a gross layout or
    sign bug would blow this out by orders of magnitude."""
    import math

    samples = [round(3000 * math.sin(k / 10)) for k in range(200)]
    au = decode_wav(encode_ima_adpcm(samples, 1, 8000, samples_per_block=9))
    err = max(abs(a - b) for a, b in zip(au.samples, samples))
    assert err <= 1200  # well under the 3000 amplitude


def _raw_ima_payload(
    preds_idx: list[tuple[int, int]],
    body: bytes,
    channels: int = 1,
    rate: int = 8000,
    fact: int | None = None,
    byte_rate: int | None = None,
    spb_field: int | None = None,
    bits: int = 4,
) -> bytes:
    """Hand-build a single-block format-17 payload byte-by-byte (no
    encoder involvement) for landmark and malformed-header tests."""
    head = b"".join(
        struct.pack("<hBB", p, ix, 0) for p, ix in preds_idx
    )
    block_align = len(head) + len(body)
    spb = len(body) * 2 // channels + 1
    if byte_rate is None:
        byte_rate = -(-rate * block_align // spb)
    fmt = struct.pack(
        "<HHIIHHHH", 17, channels, rate, byte_rate, block_align, bits,
        2, spb if spb_field is None else spb_field,
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if fact is not None:
        chunks += b"fact" + struct.pack("<II", 4, fact)
    pcm = head + body
    chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
    if len(pcm) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_ima_landmark_vector_from_index_zero():
    """Hand-derived step-table walk from (pred=0, idx=0): nibbles
    [1,3,8,15,0,2,9,4] packed low-first. Expected values computed by
    hand from the spec tables, not by running either codec."""
    payload = _raw_ima_payload([(0, 0)], bytes([0x31, 0xF8, 0x20, 0x49]))
    au = decode_wav(payload)
    assert list(au.samples) == [0, 1, 5, 5, -6, -4, 4, 0, 13]
    assert (au.channels, au.bit_depth, au.n_frames) == (1, 16, 9)


def test_ima_landmark_vector_clamps():
    """Hand-derived walk from (pred=32760, idx=88) with nibbles
    [7,15,0,8,4,12,2,10]: exercises the int16 clamp on both signs'
    approach and the step-index ceiling at 88."""
    payload = _raw_ima_payload([(32760, 88)], bytes([0xF7, 0x80, 0xC4, 0xA2]))
    au = decode_wav(payload)
    assert list(au.samples) == [
        32760, 32767, -28669, -24574, -28298, 2173, -32768, -12290, -30911,
    ]


def test_ima_step_index_above_88_rejected():
    payload = _raw_ima_payload([(0, 89)], bytes(4))
    with pytest.raises(WavError, match="step index 89 > 88"):
        decode_wav(payload)


def test_ima_bits_not_4_rejected():
    payload = _raw_ima_payload([(0, 0)], bytes(4), bits=8)
    with pytest.raises(WavError, match="4-bit"):
        decode_wav(payload)


def test_ima_samples_per_block_field_mismatch_rejected():
    payload = _raw_ima_payload([(0, 0)], bytes(4), spb_field=17)
    with pytest.raises(WavError, match="wSamplesPerBlock=17"):
        decode_wav(payload)


def test_ima_byte_rate_outside_rounding_band_rejected():
    payload = _raw_ima_payload([(0, 0)], bytes(4), byte_rate=999999)
    with pytest.raises(WavError, match="byte_rate=999999 outside"):
        decode_wav(payload)


def test_ima_fact_outside_final_block_window_rejected():
    # 2 blocks of spb=9 hold 18 frames; fact must be in (9, 18]
    good = encode_ima_adpcm(_ima_clip(18), 1, 8000, samples_per_block=9)
    fact_off = good.index(b"fact") + 8
    for bad_fact, ok in ((9, False), (19, False), (10, True), (18, True)):
        mutated = (
            good[:fact_off]
            + struct.pack("<I", bad_fact)
            + good[fact_off + 4 :]
        )
        if ok:
            assert decode_wav(mutated).n_frames == bad_fact
        else:
            with pytest.raises(WavError, match="fact chunk claims"):
                decode_wav(mutated)


def test_ima_non_whole_blocks_rejected():
    good = encode_ima_adpcm(_ima_clip(18), 1, 8000, samples_per_block=9)
    data_off = good.index(b"data")
    n = struct.unpack_from("<I", good, data_off + 4)[0]
    bad = (
        good[: data_off + 4]
        + struct.pack("<I", n - 1)
        + good[data_off + 8 : data_off + 8 + n - 1]
    )
    bad = bad[:4] + struct.pack("<I", len(bad) - 8) + bad[8:]
    with pytest.raises(WavError, match="whole IMA blocks"):
        decode_wav(bad)


def test_ima_three_channels_gated():
    good = encode_ima_adpcm(_ima_clip(18), 1, 8000, samples_per_block=9)
    fmt_off = good.index(b"fmt ") + 8
    bad = good[: fmt_off + 2] + struct.pack("<H", 3) + good[fmt_off + 4 :]
    with pytest.raises(UnsupportedWavError, match="mono/stereo"):
        decode_wav(bad)


def test_ima_block_align_without_code_body_rejected():
    # block_align == header size leaves data_bytes == 0
    good = encode_ima_adpcm(_ima_clip(18), 1, 8000, samples_per_block=9)
    fmt_off = good.index(b"fmt ") + 8
    bad = good[: fmt_off + 12] + struct.pack("<H", 4) + good[fmt_off + 14 :]
    with pytest.raises(WavError, match="no valid code body"):
        decode_wav(bad)


def test_ima_encoder_argument_validation():
    with pytest.raises(ValueError, match="1/2 channels"):
        encode_ima_adpcm([0, 0, 0], 3, 8000)
    with pytest.raises(ValueError, match="samples_per_block"):
        encode_ima_adpcm([0, 0], 1, 8000, samples_per_block=8)  # even
    with pytest.raises(ValueError, match="samples_per_block"):
        encode_ima_adpcm([0, 0], 2, 8000, samples_per_block=11)  # 10 % 8
    with pytest.raises(ValueError, match="not divisible"):
        encode_ima_adpcm([0, 0, 0], 2, 8000, samples_per_block=9)
    with pytest.raises(ValueError, match="at least one frame"):
        encode_ima_adpcm([], 1, 8000, samples_per_block=9)


@settings(deadline=None, max_examples=60, print_blob=True)
@given(
    frames=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=40
    ),
    channels=st.integers(min_value=1, max_value=2),
)
def test_ima_roundtrip_property(frames, channels):
    """Property form: for ANY int16 input the production decode of
    the encoder's payload equals the independent decoder's, and the
    frame count survives the fact truncation exactly."""
    samples = frames * channels
    payload = encode_ima_adpcm(samples, channels, 16000, samples_per_block=9)
    au = decode_wav(payload)
    assert au.n_frames == len(frames)
    assert list(au.samples) == _ref_decode_ima(payload)[2]


def test_decode_audio_kernel_handles_ima(spark):
    """The Spark kernel decodes format-17 rows like any other —
    linear 16-bit stats, no err."""
    from etl_deltalake_spark.operators.multimodal import decode_audio

    payload = encode_ima_adpcm(_ima_clip(20), 1, 8000, samples_per_block=9)
    ch, rate, ref = _ref_decode_ima(payload)
    df = spark.createDataFrame([(1, payload)], ["doc_id", "payload"])
    row = decode_audio(df, "doc_id", "payload").collect()[0]
    assert row["err"] is None
    assert (row["channels"], row["bit_depth"], row["n_frames"]) == (1, 16, 20)
    assert row["samp_sum"] == float(sum(ref))
    assert row["peak_abs"] == float(max(abs(s) for s in ref))


# -------------------------------------------- round 8: Microsoft ADPCM


from etl_deltalake_spark.operators.wav import encode_ms_adpcm  # noqa: E402

# Independent spec-table copies (Microsoft multimedia spec, public
# constants) — the reference decoder shares nothing with wav.py.
_REF_MS_ADAPT = (
    230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230,
)
_REF_MS_COEFS = (
    (256, 0), (512, -256), (0, 0), (192, 64),
    (240, 0), (460, -208), (392, -232),
)


def _ref_decode_ms(payload: bytes) -> tuple[int, int, list[int]]:
    """Independent minimal format-2 decoder (own RIFF walk, own
    tables, own nibble logic)."""
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    off, fmt, data, fact = 12, None, None, None
    while off + 8 <= len(payload):
        cid = payload[off : off + 4]
        n = int.from_bytes(payload[off + 4 : off + 8], "little")
        body = payload[off + 8 : off + 8 + n]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        elif cid == b"fact":
            fact = int.from_bytes(body[:4], "little")
        off += 8 + n + (n & 1)
    tag, ch, rate, _br, ba, bits = struct.unpack_from("<HHIIHH", fmt)
    assert tag == 2 and bits == 4
    out: list[int] = []
    for b0 in range(0, len(data), ba):
        blk = data[b0 : b0 + ba]
        preds = [blk[c] for c in range(ch)]
        dl = [struct.unpack_from("<h", blk, ch + 2 * c)[0] for c in range(ch)]
        s1 = [
            struct.unpack_from("<h", blk, 3 * ch + 2 * c)[0] for c in range(ch)
        ]
        s2 = [
            struct.unpack_from("<h", blk, 5 * ch + 2 * c)[0] for c in range(ch)
        ]
        out.extend(s2)
        out.extend(s1)
        i = 0
        for byte in blk[7 * ch :]:
            for nib in (byte >> 4, byte & 15):
                c = i % ch
                i += 1
                c1, c2 = _REF_MS_COEFS[preds[c]]
                pr = (s1[c] * c1 + s2[c] * c2) >> 8
                sg = nib - 16 if nib >= 8 else nib
                v = max(-32768, min(32767, pr + sg * dl[c]))
                s2[c], s1[c] = s1[c], v
                dl[c] = max(16, (_REF_MS_ADAPT[nib] * dl[c]) >> 8)
                out.append(v)
    if fact is not None:
        out = out[: fact * ch]
    return ch, rate, out


@pytest.mark.parametrize(
    "channels, n_frames, spb, predictor",
    [
        (1, 48, 12, None),          # whole blocks, best-SSE choice
        (1, 43, 12, None),          # partial final block
        (2, 41, 12, 3),             # stereo, pinned pair, partial
        (2, 36, 9, None),           # stereo, odd spb
        (1, 500, 500, None),        # default-sized single block
        (2, 2, 5, 0),               # shorter than one block
        (1, 1, 4, None),            # single frame (header carries it)
        (2, 100, 12, lambda b, ch: (b + ch) % 7),  # every coef pair
    ],
)
def test_ms_roundtrip_matches_independent_decoder(
    channels, n_frames, spb, predictor
):
    """decode_wav(encode_ms_adpcm(x)) == an independent spec-table
    decoder on the same payload — pins the two-tap predictor, header
    sample order (iSamp2 then iSamp1), stereo nibble alternation
    (high=left), delta adaptation/floor, and fact truncation."""
    samples = _ima_clip(n_frames * channels, seed=11 + channels)
    payload = encode_ms_adpcm(
        samples, channels, 8000, samples_per_block=spb, predictor=predictor
    )
    au = decode_wav(payload)
    ch, rate, ref = _ref_decode_ms(payload)
    assert (au.channels, au.sample_rate, au.bit_depth) == (channels, 8000, 16)
    assert au.n_frames == n_frames
    assert (ch, rate) == (channels, 8000)
    assert list(au.samples) == ref


def test_ms_reconstruction_tracks_input():
    """Lossy, but the best-SSE predictor choice tracks a smooth
    signal closely — a layout/sign/adaptation bug blows this out."""
    import math

    samples = [round(8000 * math.sin(k / 20)) for k in range(400)]
    au = decode_wav(encode_ms_adpcm(samples, 1, 8000, samples_per_block=100))
    err = max(abs(a - b) for a, b in zip(au.samples, samples))
    assert err <= 800  # ~2.4% of the 8000 amplitude in practice


def _raw_ms_payload(
    header: bytes,
    body: bytes,
    channels: int = 1,
    rate: int = 8000,
    byte_rate: int | None = None,
    bits: int = 4,
) -> bytes:
    """Hand-build a single-block format-2 payload (extension-free
    16-byte fmt, so the canonical coefficient table applies)."""
    block_align = len(header) + len(body)
    spb = len(body) * 2 // channels + 2
    if byte_rate is None:
        byte_rate = -(-rate * block_align // spb)
    fmt = struct.pack("<HHIIHH", 2, channels, rate, byte_rate, block_align, bits)
    pcm = header + body
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
        + (b"\x00" if len(pcm) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_ms_landmark_vector_hand_derived():
    """Hand-derived walk: predictor pair 1 = (512, -256), iDelta=64,
    iSamp1=100, iSamp2=50, nibbles [1, 2, 15, 8] high-first. Expected
    values computed by hand from the spec, not by running either
    codec: pred=(s1*512 + s2*(-256))>>8, v=pred+q*delta, delta
    adapts by table[nib]/256 floored at 16."""
    header = struct.pack("<Bhhh", 1, 64, 100, 50)
    payload = _raw_ms_payload(header, bytes([0x12, 0xF8]))
    au = decode_wav(payload)
    assert list(au.samples) == [50, 100, 214, 442, 619, 436]
    assert (au.channels, au.bit_depth, au.n_frames) == (1, 16, 6)


def test_ms_predictor_index_out_of_range_rejected():
    header = struct.pack("<Bhhh", 7, 64, 0, 0)  # only 0..6 exist
    with pytest.raises(WavError, match="predictor index 7"):
        decode_wav(_raw_ms_payload(header, bytes(2)))


def test_ms_nonpositive_delta_rejected():
    header = struct.pack("<Bhhh", 0, 0, 0, 0)
    with pytest.raises(WavError, match="iDelta must be positive"):
        decode_wav(_raw_ms_payload(header, bytes(2)))


def test_ms_bits_not_4_rejected():
    header = struct.pack("<Bhhh", 0, 16, 0, 0)
    with pytest.raises(WavError, match="4-bit"):
        decode_wav(_raw_ms_payload(header, bytes(2), bits=8))


def test_ms_byte_rate_outside_band_rejected():
    header = struct.pack("<Bhhh", 0, 16, 0, 0)
    with pytest.raises(WavError, match="byte_rate=1 outside"):
        decode_wav(_raw_ms_payload(header, bytes(2), byte_rate=1))


def test_ms_header_extension_cross_checks():
    """The encoder writes the full format-2 extension; corrupting
    wSamplesPerBlock, wNumCoef, or the standard pairs must error."""
    good = encode_ms_adpcm(
        _ima_clip(24), 1, 8000, samples_per_block=12, predictor=0
    )
    fmt_off = good.index(b"fmt ") + 8

    spb_bad = good[: fmt_off + 18] + struct.pack("<H", 99) + good[fmt_off + 20 :]
    with pytest.raises(WavError, match="wSamplesPerBlock=99"):
        decode_wav(spb_bad)

    ncoef_bad = good[: fmt_off + 20] + struct.pack("<H", 3) + good[fmt_off + 22 :]
    with pytest.raises(WavError, match="wNumCoef=3"):
        decode_wav(ncoef_bad)

    coef_bad = good[: fmt_off + 22] + struct.pack("<h", 999) + good[fmt_off + 24 :]
    with pytest.raises(WavError, match="redefines"):
        decode_wav(coef_bad)


def test_ms_non_whole_blocks_rejected():
    good = encode_ms_adpcm(_ima_clip(24), 1, 8000, samples_per_block=12)
    data_off = good.index(b"data")
    n = struct.unpack_from("<I", good, data_off + 4)[0]
    bad = (
        good[: data_off + 4]
        + struct.pack("<I", n - 1)
        + good[data_off + 8 : data_off + 8 + n - 1]
    )
    bad = bad[:4] + struct.pack("<I", len(bad) - 8) + bad[8:]
    with pytest.raises(WavError, match="whole MS-ADPCM blocks"):
        decode_wav(bad)


def test_ms_fact_outside_final_block_window_rejected():
    # 2 blocks of spb=12 hold 24 frames; fact must be in (12, 24]
    good = encode_ms_adpcm(_ima_clip(24), 1, 8000, samples_per_block=12)
    fact_off = good.index(b"fact") + 8
    for bad_fact, ok in ((12, False), (25, False), (13, True), (24, True)):
        mutated = (
            good[:fact_off]
            + struct.pack("<I", bad_fact)
            + good[fact_off + 4 :]
        )
        if ok:
            assert decode_wav(mutated).n_frames == bad_fact
        else:
            with pytest.raises(WavError, match="fact chunk claims"):
                decode_wav(mutated)


def test_ms_three_channels_gated():
    good = encode_ms_adpcm(_ima_clip(24), 1, 8000, samples_per_block=12)
    fmt_off = good.index(b"fmt ") + 8
    bad = good[: fmt_off + 2] + struct.pack("<H", 3) + good[fmt_off + 4 :]
    with pytest.raises(UnsupportedWavError, match="mono/stereo"):
        decode_wav(bad)


def test_ms_encoder_argument_validation():
    with pytest.raises(ValueError, match="1/2 channels"):
        encode_ms_adpcm([0, 0, 0], 3, 8000)
    with pytest.raises(ValueError, match="samples_per_block"):
        encode_ms_adpcm([0, 0], 1, 8000, samples_per_block=5)  # odd mono
    with pytest.raises(ValueError, match="samples_per_block"):
        encode_ms_adpcm([0, 0], 2, 8000, samples_per_block=2)  # header-only
    with pytest.raises(ValueError, match="not divisible"):
        encode_ms_adpcm([0, 0, 0], 2, 8000)
    with pytest.raises(ValueError, match="at least one frame"):
        encode_ms_adpcm([], 1, 8000)
    with pytest.raises(ValueError, match="predictor index 9"):
        encode_ms_adpcm([0, 0, 0, 0], 1, 8000, samples_per_block=4, predictor=9)


@settings(deadline=None, max_examples=60, print_blob=True)
@given(
    frames=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=40
    ),
    channels=st.integers(min_value=1, max_value=2),
)
def test_ms_roundtrip_property(frames, channels):
    """Property form: for ANY int16 input (best-SSE predictor
    selection live) the production decode equals the independent
    decoder and the frame count survives fact truncation."""
    samples = frames * channels
    payload = encode_ms_adpcm(samples, channels, 16000, samples_per_block=12)
    au = decode_wav(payload)
    assert au.n_frames == len(frames)
    assert list(au.samples) == _ref_decode_ms(payload)[2]


def test_decode_audio_kernel_handles_ms(spark):
    from etl_deltalake_spark.operators.multimodal import decode_audio

    payload = encode_ms_adpcm(_ima_clip(20), 1, 8000, samples_per_block=12)
    _, _, ref = _ref_decode_ms(payload)
    df = spark.createDataFrame([(1, payload)], ["doc_id", "payload"])
    row = decode_audio(df, "doc_id", "payload").collect()[0]
    assert row["err"] is None
    assert (row["channels"], row["bit_depth"], row["n_frames"]) == (1, 16, 20)
    assert row["samp_sum_i64"] == sum(ref)
    assert row["peak_abs"] == float(max(abs(s) for s in ref))
