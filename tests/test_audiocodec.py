"""Pure-stdlib WAV codec (extensions/audiocodec.py, r7).

Oracle strategy: integer PCM is LOSSLESS through the writer/reader
pair, so roundtrips assert exact equality (not tolerances); the
float path is bit-exact by construction. Feature values are verified
against independent numpy computation on the known samples, and the
stdlib ``wave`` module serves as a second, independent WRITER whose
output our decoder must read identically.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

# GT_FUZZ_SCALE=N multiplies every fuzz contract's example
# count for deep sweeps (VERDICT r7 item 1); default 1
_FUZZ_SCALE = int(__import__("os").environ.get("GT_FUZZ_SCALE", "1"))

from goodtables_pandas_py_spark.extensions.audiocodec import (
    AudioDecodeError,
    DecodedAudio,
    audio_features,
    decode_wav,
    encode_wav,
    resample_nearest,
    to_mono,
)


def _sine(n=4800, rate=8000, ch=1, freq=440.0, amp=0.5):
    t = np.arange(n) / rate
    x = amp * np.sin(2 * np.pi * freq * t)
    s = np.stack([x.astype(np.float32)] * ch, axis=1)
    return DecodedAudio(rate, ch, s)


# ------------------------------------------------------------ roundtrips


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
@pytest.mark.parametrize("ch", [1, 2])
def test_integer_pcm_roundtrip_lossless(bits, ch):
    """Quantize once with the writer, decode, re-encode: the SECOND
    roundtrip must be bit-identical (integer lattice points are fixed
    points of the quantizer)."""
    a = _sine(ch=ch)
    once = decode_wav(encode_wav(a, bits=bits))
    assert once.rate == a.rate and once.channels == ch
    assert len(once.samples) == len(a.samples)
    blob2 = encode_wav(once, bits=bits)
    twice = decode_wav(blob2)
    assert np.array_equal(once.samples, twice.samples)
    # quantization error of the FIRST trip bounded by one step
    step = 1.0 / (1 << (bits - 1))
    assert np.abs(once.samples - a.samples).max() <= step


def test_float32_roundtrip_bit_exact():
    a = _sine(ch=2, amp=0.9)
    dec = decode_wav(encode_wav(a, bits=0))
    assert np.array_equal(dec.samples, a.samples)
    assert dec.duration_ms == a.duration_ms == 600


def test_float64_data_decodes():
    # hand-build a tag-3 64-bit stream (the writer only emits f32)
    x = np.array([0.5, -0.25, 0.125], dtype=np.float64)
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 64000, 8, 64)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", x.nbytes) + x.tobytes())
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    dec = decode_wav(blob)
    assert np.allclose(dec.samples[:, 0], x)


def test_stdlib_wave_module_is_read_identically():
    """Independent writer oracle: python's own `wave` module writes
    16-bit PCM; our decoder must recover the exact integer lattice."""
    rng = np.random.default_rng(0)
    pcm = rng.integers(-32768, 32768, size=1000, dtype=np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        wf.writeframes(pcm.tobytes())
    dec = decode_wav(buf.getvalue())
    assert dec.rate == 16000 and dec.channels == 2
    got = np.rint(dec.samples * 32768.0).astype(np.int16).reshape(-1)
    assert np.array_equal(got, pcm)


def test_extra_chunks_and_odd_padding_skipped():
    a = _sine(n=101)  # odd data size at 8-bit -> pad byte
    blob = bytearray(encode_wav(a, bits=8))
    # splice a LIST chunk between fmt and data
    li = blob.find(b"data")
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    blob2 = bytes(blob[:li]) + extra + bytes(blob[li:])
    blob2 = (b"RIFF" + struct.pack("<I", len(blob2) - 8 + len(extra))
             + blob2[8:])
    dec = decode_wav(blob2)
    assert len(dec.samples) == 101


# ------------------------------------------------------------ rejection


def test_rejections():
    with pytest.raises(AudioDecodeError, match="RIFF"):
        decode_wav(b"not audio at all, definitely not a wave file...")
    with pytest.raises(AudioDecodeError, match="null"):
        decode_wav(None)
    a = _sine(n=64)
    blob = bytearray(encode_wav(a, bits=16))
    # flip the format tag to ADPCM (2): compressed -> loud rejection
    fi = blob.find(b"fmt ") + 8
    blob[fi : fi + 2] = struct.pack("<H", 2)
    with pytest.raises(AudioDecodeError, match="format tag 2"):
        decode_wav(bytes(blob))
    # truncated data chunk
    with pytest.raises(AudioDecodeError, match="truncated"):
        decode_wav(bytes(encode_wav(a, bits=16))[:-40])


# ------------------------------------------------------------ features


def test_audio_features_known_values():
    """RMS and ZCR verified against direct numpy on a two-segment
    signal: silence then a full-scale square wave."""
    rate = 8000
    silence = np.zeros(4000, dtype=np.float32)
    square = np.tile(
        np.array([0.5, -0.5], dtype=np.float32), 2000
    )
    a = DecodedAudio(rate, 1, np.concatenate([silence, square])[:, None])
    blob = encode_wav(a, bits=16)
    f = audio_features(blob, dim=4)  # 2 windows: [rms0, rms1, zcr0, zcr1]
    assert f[0] == pytest.approx(0.0, abs=1e-4)       # silent RMS
    assert f[1] == pytest.approx(0.5, abs=1e-3)       # square RMS
    assert f[2] == pytest.approx(0.0, abs=1e-3)       # silent ZCR
    assert f[3] == pytest.approx(1.0, abs=2e-3)       # alternating signs
    with pytest.raises(ValueError, match="even"):
        audio_features(blob, dim=5)


def test_features_through_spark_kernel(spark):
    """The audio extractor rides the SAME Arrow-batched fail-soft
    kernel as images (extract_features with an injected extractor)."""
    from goodtables_pandas_py_spark.extensions.multimodal import (
        extract_features,
    )

    good = encode_wav(_sine(), bits=16)
    df = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(b"garbage"))],
        "media_id long, blob binary",
    )
    out = {
        r["media_id"]: r
        for r in extract_features(df, extractor=audio_features).collect()
    }
    assert out[1]["decode_ok"] and len(out[1]["feature"]) == 16
    assert not out[2]["decode_ok"] and out[2]["feature"] is None


def test_sniff_meta_agrees_with_decode(spark):
    """The r5 header sniffer's duration must match the real decode's
    (same blob, two independent computations)."""
    from goodtables_pandas_py_spark.extensions.multimodal import (
        sniff_media_meta,
    )

    a = _sine(n=12345, rate=8000)
    blob = encode_wav(a, bits=16)
    df = spark.createDataFrame([(1, bytearray(blob))],
                               "media_id long, blob binary")
    meta = sniff_media_meta(df).first()["media_meta"]
    assert meta["mime"] == "audio/wav"
    assert meta["duration_ms"] == decode_wav(blob).duration_ms == 1543


# ------------------------------------------------------------ resample


def test_resample_nearest_halves_and_doubles():
    a = _sine(n=800, rate=8000)
    down = resample_nearest(a, 4000)
    assert down.rate == 4000 and len(down.samples) == 400
    assert np.array_equal(down.samples[:, 0], a.samples[::2, 0])
    up = resample_nearest(a, 16000)
    assert len(up.samples) == 1600
    assert np.array_equal(up.samples[::2], a.samples)
    with pytest.raises(AudioDecodeError):
        resample_nearest(a, 0)


def test_to_mono_is_channel_mean():
    s = np.array([[1.0, 0.0], [0.5, -0.5]], dtype=np.float32)
    a = DecodedAudio(8000, 2, s)
    assert np.allclose(to_mono(a), [0.5, 0.0])


# ------------------------------------------------------------ property


@settings(max_examples=25 * _FUZZ_SCALE, deadline=None)
@given(
    n=st.integers(1, 500),
    ch=st.integers(1, 3),
    bits=st.sampled_from([8, 16, 24, 32, 0]),
    seed=st.integers(0, 2**31 - 1),
)
def test_property_double_roundtrip_is_identity(n, ch, bits, seed):
    rng = np.random.default_rng(seed)
    x = (rng.random((n, ch), dtype=np.float32) * 2 - 1).astype(np.float32)
    a = DecodedAudio(8000, ch, x)
    once = decode_wav(encode_wav(a, bits=bits))
    twice = decode_wav(encode_wav(once, bits=bits))
    assert once.rate == twice.rate and once.channels == twice.channels
    assert np.array_equal(once.samples, twice.samples)


# ----------------------------------------------------- decoder fuzz (r7)


@settings(max_examples=120 * _FUZZ_SCALE, deadline=None)
@given(
    prefix=st.sampled_from([b"", b"RIFF", b"RIFF\x00\x00\x00\x00WAVE"]),
    body=st.binary(min_size=0, max_size=200),
)
def test_fuzz_wav_contract_random_bytes(prefix, body):
    try:
        a = decode_wav(prefix + body)
        assert a.samples.shape[1] == a.channels
    except AudioDecodeError:
        pass


@settings(max_examples=60 * _FUZZ_SCALE, deadline=None)
@given(
    flips=st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(0, 255)),
        min_size=1, max_size=6,
    ),
    bits=st.sampled_from([8, 16, 0]),
)
def test_fuzz_wav_contract_mutated_valid_blobs(flips, bits):
    blob = bytearray(encode_wav(_sine(n=200), bits=bits))
    for off, val in flips:
        blob[off % len(blob)] = val
    try:
        a = decode_wav(bytes(blob))
        assert a.samples.dtype == np.float32
    except AudioDecodeError:
        pass
