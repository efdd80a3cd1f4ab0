"""Pure-stdlib WAV (RIFF/PCM) codec for the multimodal audio path
(r7 — the audio twin of :mod:`.imagecodec`/:mod:`.jpegcodec`: the
plan-side ops (`audio_window_plan`, WAV header sniffing) existed
since r5/r6; this module makes the DECODE step real).

Supported: RIFF/WAVE with PCM integer samples (8-bit unsigned,
16/24/32-bit signed little-endian, format tag 1) and 32/64-bit float
(format tag 3), any channel count, chunk walking that skips LIST/
fact/etc. Compressed formats (ADPCM, mu-law, MP3-in-WAV) are
rejected loudly. A matching writer (:func:`encode_wav`) exists for
codec-less environments and as the test-vector source — integer PCM
roundtrips are LOSSLESS, so the oracle is exact equality, not a
tolerance.

Everything converts to one shape, :class:`DecodedAudio` (float32 in
[-1, 1], frames x channels), so feature extractors are
format-agnostic. Scale posture: identical to the image codecs —
this runs one blob at a time inside Arrow-batched ``mapInPandas``;
sample conversion is vectorized numpy (a frombuffer + scale, no
Python per-sample loop; 24-bit unpacks via a strided uint8 view).
"""

from __future__ import annotations

import struct
from typing import NamedTuple

import numpy as np


class AudioDecodeError(ValueError):
    """Malformed or unsupported audio payload."""


class DecodedAudio(NamedTuple):
    """Interleaved float32 samples in [-1, 1], one row per frame."""

    rate: int
    channels: int
    samples: np.ndarray  # (n_frames, channels) float32

    @property
    def duration_ms(self) -> int:
        return int(len(self.samples) * 1000 // max(self.rate, 1))


def _chunks(b: bytes):
    """Walk RIFF sub-chunks: yields (fourcc, payload). Chunks are
    word-aligned (odd sizes carry a pad byte)."""
    i = 12
    n = len(b)
    while i + 8 <= n:
        cid = b[i : i + 4]
        (size,) = struct.unpack("<I", b[i + 4 : i + 8])
        data = b[i + 8 : i + 8 + size]
        if len(data) < size:
            raise AudioDecodeError(f"truncated {cid!r} chunk")
        yield cid, data
        i += 8 + size + (size & 1)


def decode_wav(b: bytes) -> DecodedAudio:
    """Decode a RIFF/WAVE blob to :class:`DecodedAudio`."""
    if b is None:
        raise AudioDecodeError("null blob")
    b = bytes(b)
    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise AudioDecodeError("not a RIFF/WAVE stream")
    fmt = None
    data = None
    for cid, payload in _chunks(b):
        if cid == b"fmt ":
            fmt = payload
        elif cid == b"data":
            data = payload
        if fmt is not None and data is not None:
            break
    if fmt is None or len(fmt) < 16:
        raise AudioDecodeError("missing fmt chunk")
    if data is None:
        raise AudioDecodeError("missing data chunk")
    tag, ch, rate, _brate, _balign, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if ch < 1 or rate < 1:
        raise AudioDecodeError(f"bad fmt (channels={ch}, rate={rate})")
    if tag == 1:  # integer PCM
        if bits == 8:
            raw = np.frombuffer(data, dtype=np.uint8)
            x = (raw.astype(np.float32) - 128.0) / 128.0
        elif bits == 16:
            raw = np.frombuffer(
                data[: len(data) - (len(data) % 2)], dtype="<i2"
            )
            x = raw.astype(np.float32) / 32768.0
        elif bits == 24:
            usable = len(data) - (len(data) % 3)
            u = np.frombuffer(data[:usable], dtype=np.uint8).reshape(-1, 3)
            # little-endian 24-bit two's complement -> int32
            v = (
                u[:, 0].astype(np.int32)
                | (u[:, 1].astype(np.int32) << 8)
                | (u[:, 2].astype(np.int32) << 16)
            )
            v = np.where(v >= (1 << 23), v - (1 << 24), v)
            x = v.astype(np.float32) / float(1 << 23)
        elif bits == 32:
            raw = np.frombuffer(
                data[: len(data) - (len(data) % 4)], dtype="<i4"
            )
            x = raw.astype(np.float32) / 2147483648.0
        else:
            raise AudioDecodeError(f"unsupported PCM bit depth {bits}")
    elif tag == 3:  # IEEE float
        if bits == 32:
            x = np.frombuffer(
                data[: len(data) - (len(data) % 4)], dtype="<f4"
            ).astype(np.float32)
        elif bits == 64:
            x = np.frombuffer(
                data[: len(data) - (len(data) % 8)], dtype="<f8"
            ).astype(np.float32)
        else:
            raise AudioDecodeError(f"unsupported float bit depth {bits}")
    else:
        raise AudioDecodeError(
            f"unsupported WAV format tag {tag} (compressed WAV needs a "
            "codec library)"
        )
    n_frames = len(x) // ch
    samples = np.ascontiguousarray(
        x[: n_frames * ch].reshape(n_frames, ch)
    )
    return DecodedAudio(int(rate), int(ch), samples)


def encode_wav(audio: DecodedAudio, bits: int = 16) -> bytes:
    """Write canonical RIFF/WAVE. Integer depths (8/16/24/32) quantize
    the float samples symmetrically (the exact inverse of decode's
    scaling, so integer-valued inputs roundtrip losslessly); bits=0
    writes 32-bit float (format tag 3), bit-exact for any input."""
    x = np.asarray(audio.samples, dtype=np.float32)
    if x.ndim == 1:
        x = x[:, None]
    ch = x.shape[1]
    if bits == 0:  # float32
        tag, width = 3, 4
        payload = np.clip(x, -1.0, 1.0).astype("<f4").tobytes()
    elif bits == 8:
        tag, width = 1, 1
        q = np.clip(np.rint(x * 128.0 + 128.0), 0, 255).astype(np.uint8)
        payload = q.tobytes()
    elif bits == 16:
        tag, width = 1, 2
        q = np.clip(np.rint(x * 32768.0), -32768, 32767).astype("<i2")
        payload = q.tobytes()
    elif bits == 24:
        tag, width = 1, 3
        q = np.clip(
            np.rint(x * float(1 << 23)), -(1 << 23), (1 << 23) - 1
        ).astype(np.int32)
        u = np.zeros((q.size, 3), dtype=np.uint8)
        flat = q.reshape(-1) & 0xFFFFFF
        u[:, 0] = flat & 0xFF
        u[:, 1] = (flat >> 8) & 0xFF
        u[:, 2] = (flat >> 16) & 0xFF
        payload = u.tobytes()
    elif bits == 32:
        tag, width = 1, 4
        q = np.clip(
            np.rint(x.astype(np.float64) * 2147483648.0),
            -2147483648,
            2147483647,
        ).astype("<i4")
        payload = q.tobytes()
    else:
        raise AudioDecodeError(f"unsupported bit depth {bits}")
    brate = audio.rate * ch * width
    fmt = struct.pack(
        "<HHIIHH", tag, ch, audio.rate, brate, ch * width, width * 8
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def to_mono(audio: DecodedAudio) -> np.ndarray:
    """(n_frames,) float32 channel mean."""
    return audio.samples.mean(axis=1).astype(np.float32)


def audio_features(blob: bytes, dim: int = 16) -> list[float]:
    """REAL decode→feature step for audio (the WAV twin of
    :func:`.multimodal.image_feature_extractor`): decode → mono →
    split into ``dim // 2`` equal windows → per-window RMS energy and
    zero-crossing rate, concatenated (energy first). Deterministic;
    raises on undecodable blobs so extract_features' per-row
    fail-soft contract records decode_ok=False."""
    if dim < 2 or dim % 2:
        raise ValueError("dim must be an even integer >= 2")
    audio = decode_wav(blob)
    mono = to_mono(audio)
    nwin = dim // 2
    n = len(mono)
    if n == 0:
        return [0.0] * dim
    bounds = (np.arange(nwin + 1) * n) // nwin
    rms = []
    zcr = []
    for i in range(nwin):
        seg = mono[bounds[i] : max(bounds[i + 1], bounds[i] + 1)]
        rms.append(float(np.sqrt(np.mean(seg.astype(np.float64) ** 2))))
        if len(seg) > 1:
            zcr.append(
                float(np.mean(np.signbit(seg[1:]) != np.signbit(seg[:-1])))
            )
        else:
            zcr.append(0.0)
    return rms + zcr


def resample_nearest(audio: DecodedAudio, rate: int) -> DecodedAudio:
    """Nearest-neighbour resample via numpy index maps (the audio
    twin of :func:`.imagecodec.resize_nearest` — dependency-free,
    exact, deterministic; a production pipeline would inject a
    polyphase resampler the same way PIL replaces the image path)."""
    if rate <= 0:
        raise AudioDecodeError("target rate must be positive")
    n = len(audio.samples)
    m = int(round(n * rate / max(audio.rate, 1)))
    if m <= 0:
        return DecodedAudio(
            rate, audio.channels,
            np.zeros((0, audio.channels), dtype=np.float32),
        )
    idx = (np.arange(m) * n // m).clip(0, max(n - 1, 0))
    return DecodedAudio(rate, audio.channels, audio.samples[idx])


__all__ = [
    "AudioDecodeError",
    "DecodedAudio",
    "audio_features",
    "decode_wav",
    "encode_wav",
    "resample_nearest",
    "to_mono",
]
