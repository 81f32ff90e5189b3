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
    ieee = good[:fmt_off] + struct.pack("<H", 3) + good[fmt_off + 2 :]
    with pytest.raises(UnsupportedWavError, match="format 3"):
        decode_wav(ieee)


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
