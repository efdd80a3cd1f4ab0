"""MJPEG-AVI video codec (extensions/videocodec.py, r7).

Oracle strategy: the container framing is LOSSLESS — frames come back
byte-identical from parse (exact equality), and decoded frame pixels
equal decoding the source JPEGs directly (the already-verified
jpegcodec is the inner oracle). FOURCC gating, sampled-decode
semantics, and the Spark kernel's fail-soft contract are pinned
explicitly; fuzz extends the typed-error contract.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

# GT_FUZZ_SCALE=N multiplies every fuzz contract's example
# count for deep sweeps (VERDICT r7 item 1); default 1
_FUZZ_SCALE = int(__import__("os").environ.get("GT_FUZZ_SCALE", "1"))

from goodtables_pandas_py_spark.extensions.imagecodec import DecodedImage
from goodtables_pandas_py_spark.extensions.jpegcodec import (
    decode_jpeg,
    encode_jpeg,
)
from goodtables_pandas_py_spark.extensions.videocodec import (
    VideoDecodeError,
    decode_all_frames,
    decode_frame,
    encode_mjpeg_avi,
    parse_mjpeg_avi,
)


def _jpeg_frames(n=5, w=24, h=16, q=92):
    out = []
    for seed in range(n):
        yy, xx = np.mgrid[0:h, 0:w]
        px = np.stack(
            [
                np.clip(128 + 90 * np.sin(xx / 6.0 + seed + c), 0, 255)
                for c in range(3)
            ],
            axis=-1,
        ).astype(np.uint8)
        out.append(encode_jpeg(DecodedImage(w, h, 3, px.tobytes()), quality=q))
    return out


def test_container_framing_is_lossless():
    frames = _jpeg_frames(7)
    avi = encode_mjpeg_avi(frames, 24, 16, fps=5.0)
    p = parse_mjpeg_avi(avi)
    assert (p.width, p.height, p.fps, p.n_frames) == (24, 16, 5.0, 7)
    assert p.duration_ms == 1400
    assert p.frames == frames  # byte-identical through the container


def test_decode_frame_equals_direct_jpeg_decode():
    frames = _jpeg_frames(4)
    avi = encode_mjpeg_avi(frames, 24, 16)
    for i, fr in enumerate(frames):
        assert decode_frame(avi, i) == decode_jpeg(fr)
    assert len(decode_all_frames(avi)) == 4
    with pytest.raises(VideoDecodeError, match="out of range"):
        decode_frame(avi, 4)


def test_unsupported_fourcc_and_garbage_reject():
    frames = _jpeg_frames(2)
    avi = bytearray(encode_mjpeg_avi(frames, 24, 16))
    i = bytes(avi).find(b"vidsMJPG")
    avi[i + 4 : i + 8] = b"H264"
    with pytest.raises(VideoDecodeError, match="FOURCC"):
        parse_mjpeg_avi(bytes(avi))
    with pytest.raises(VideoDecodeError, match="RIFF"):
        parse_mjpeg_avi(b"not a video")
    with pytest.raises(VideoDecodeError, match="null"):
        parse_mjpeg_avi(None)


def test_sniffer_reports_avi_dims_and_duration(spark):
    from goodtables_pandas_py_spark.extensions.multimodal import (
        sniff_media_meta,
    )

    avi = encode_mjpeg_avi(_jpeg_frames(10), 24, 16, fps=5.0)
    df = spark.createDataFrame(
        [(1, bytearray(avi))], "media_id long, blob binary"
    )
    meta = sniff_media_meta(df).first()["media_meta"]
    assert meta["media_type"] == "video"
    assert meta["mime"] == "video/x-msvideo"
    assert (meta["width"], meta["height"]) == (24, 16)
    assert meta["duration_ms"] == 2000


def test_sample_frame_features_spark_kernel(spark):
    """End-to-end video path in Spark: 10 frames at 5 fps, sampled
    every 1000 ms -> frames 0 and 5; a garbage blob fails soft."""
    from goodtables_pandas_py_spark.extensions.multimodal import (
        sample_frame_features,
    )

    frames = _jpeg_frames(10)
    avi = encode_mjpeg_avi(frames, 24, 16, fps=5.0)
    df = spark.createDataFrame(
        [(1, bytearray(avi)), (2, bytearray(b"garbage")),
         (3, None)],
        "media_id long, blob binary",
    )
    rows = sample_frame_features(df, every_ms=1000).collect()
    by_media = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    ok = sorted(
        (r["frame_idx"], r["frame_ts_ms"]) for r in by_media[1]
    )
    assert ok == [(0, 0), (5, 1000)]
    assert all(r["decode_ok"] and len(r["feature"]) == 16
               for r in by_media[1])
    for mid in (2, 3):
        assert len(by_media[mid]) == 1
        assert not by_media[mid][0]["decode_ok"]


def test_rec_list_wrapped_frames_parse():
    """Some muxers wrap each frame in a 'rec ' LIST — walk through."""
    import struct

    frames = _jpeg_frames(2)
    avi = encode_mjpeg_avi(frames, 24, 16)

    def chunk(cid, payload):
        pad = b"\x00" if len(payload) & 1 else b""
        return cid + struct.pack("<I", len(payload)) + payload + pad

    movi_payload = b"".join(
        chunk(b"LIST", b"rec " + chunk(b"00dc", fr)) for fr in frames
    )
    i = avi.find(b"LIST", 12)
    # find the movi list specifically
    while avi[i + 8 : i + 12] != b"movi":
        i = avi.find(b"LIST", i + 1)
    (old_size,) = struct.unpack("<I", avi[i + 4 : i + 8])
    new_movi = chunk(b"LIST", b"movi" + movi_payload)
    rebuilt = avi[:i] + new_movi + avi[i + 8 + old_size + (old_size & 1):]
    rebuilt = (b"RIFF" + struct.pack("<I", len(rebuilt) - 8)
               + rebuilt[8:])
    p = parse_mjpeg_avi(rebuilt)
    assert p.frames == frames


@settings(max_examples=80 * _FUZZ_SCALE, deadline=None)
@given(
    prefix=st.sampled_from([b"", b"RIFF", b"RIFF\x00\x00\x00\x00AVI "]),
    body=st.binary(min_size=0, max_size=200),
)
def test_fuzz_avi_contract(prefix, body):
    try:
        p = parse_mjpeg_avi(prefix + body)
        assert p.n_frames >= 1
    except VideoDecodeError:
        pass


@settings(max_examples=50 * _FUZZ_SCALE, deadline=None)
@given(
    flips=st.lists(
        st.tuples(st.integers(0, 50_000), st.integers(0, 255)),
        min_size=1, max_size=6,
    ),
)
def test_fuzz_avi_mutated_valid(flips):
    blob = bytearray(encode_mjpeg_avi(_jpeg_frames(3), 24, 16))
    for off, val in flips:
        blob[off % len(blob)] = val
    try:
        parse_mjpeg_avi(bytes(blob))
    except VideoDecodeError:
        pass
