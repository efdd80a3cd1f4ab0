"""Pure-stdlib MJPEG-AVI video codec (r7 — makes the VIDEO leaf of
the multimodal path real: until now video support was header sniffing
(MP4/WebM duration) plus :func:`.multimodal.frame_sample_plan`'s
timestamp planning; this module actually DECODES frames).

Motion-JPEG in an AVI container is the one mainstream video format a
pure-Python stack can honestly decode: the container is RIFF (the
same chunk walking as WAV), and every frame is a standalone JPEG —
which :mod:`.jpegcodec` already decodes, baseline or progressive.
H.264/VP9/AV1 genuinely need a codec library and are rejected loudly
by FOURCC.

Supported: 'AVI ' RIFF with an 'hdrl' list (avih main header:
microseconds-per-frame, total frames, dims; strl/strh/strf stream
headers — the first video stream ('vids') with FOURCC MJPG/mjpg/
jpeg/dmb1 is used), 'movi' list with '..dc'/'..db' frame chunks
(optionally inside 'rec ' lists). The 'idx1' index is ignored —
frames are walked in stream order, which is the ground truth.

A matching writer (:func:`encode_mjpeg_avi`) assembles an AVI from
JPEG blobs; frames round-trip BYTE-IDENTICAL through the container
(the container is lossless framing), so the oracle is exact: extract
frames == the JPEG blobs that went in.

Scale posture: identical to the sibling codecs — one blob per call
inside Arrow-batched ``mapInPandas``; the 100 TB shape stays
"explode to (media_id, frame_idx) tasks via frame_sample_plan, then
decode only the sampled frames" — :func:`decode_frame` takes a frame
INDEX so a sampled plan never touches the other frames' bytes
(container walking is byte-offset arithmetic, not decoding).
"""

from __future__ import annotations

import struct
from typing import NamedTuple

from .imagecodec import DecodedImage, ImageDecodeError

_VIDEO_FOURCC = {b"MJPG", b"mjpg", b"jpeg", b"dmb1", b"JPEG"}


class VideoDecodeError(ValueError):
    """Malformed or unsupported video payload."""


class MjpegAvi(NamedTuple):
    """Parsed container: frame byte-ranges, not decoded pixels."""

    width: int
    height: int
    fps: float
    frames: list[bytes]  # raw JPEG payloads, stream order

    @property
    def n_frames(self) -> int:
        return len(self.frames)

    @property
    def duration_ms(self) -> int:
        return int(len(self.frames) * 1000 / self.fps) if self.fps else 0


def _lists(b: bytes, start: int, end: int):
    """Walk RIFF chunks in [start, end): yields (fourcc, body_start,
    body_end, list_type|None)."""
    i = start
    while i + 8 <= end:
        cid = b[i : i + 4]
        (size,) = struct.unpack("<I", b[i + 4 : i + 8])
        body = i + 8
        if body + size > end:
            raise VideoDecodeError(f"truncated {cid!r} chunk")
        ltype = b[body : body + 4] if cid in (b"LIST", b"RIFF") else None
        yield cid, body, body + size, ltype
        i = body + size + (size & 1)


def parse_mjpeg_avi(b: bytes) -> MjpegAvi:
    """Parse the container and slice out every video frame's JPEG
    bytes (no pixel decoding — pair with :func:`decode_frame`)."""
    if b is None:
        raise VideoDecodeError("null blob")
    b = bytes(b)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise VideoDecodeError("not a RIFF/AVI stream")
    width = height = 0
    us_per_frame = 0
    fourcc = None
    frames: list[bytes] = []

    def walk_movi(s: int, e: int) -> None:
        for cid, cs, ce, ltype in _lists(b, s, e):
            if cid == b"LIST" and ltype == b"rec ":
                walk_movi(cs + 4, ce)
            elif len(cid) == 4 and cid[2:4] in (b"dc", b"db"):
                frames.append(b[cs:ce])

    for cid, cs, ce, ltype in _lists(b, 12, len(b)):
        if cid != b"LIST":
            continue
        if ltype == b"hdrl":
            for c2, s2, e2, lt2 in _lists(b, cs + 4, ce):
                if c2 == b"avih" and e2 - s2 >= 40:
                    us_per_frame, = struct.unpack("<I", b[s2 : s2 + 4])
                    width, height = struct.unpack(
                        "<II", b[s2 + 32 : s2 + 40]
                    )
                elif c2 == b"LIST" and lt2 == b"strl":
                    for c3, s3, e3, _ in _lists(b, s2 + 4, e2):
                        if c3 == b"strh" and e3 - s3 >= 8:
                            if b[s3 : s3 + 4] == b"vids" and fourcc is None:
                                fourcc = b[s3 + 4 : s3 + 8]
        elif ltype == b"movi":
            walk_movi(cs + 4, ce)
    if fourcc is None:
        raise VideoDecodeError("AVI has no video stream header")
    if fourcc not in _VIDEO_FOURCC:
        raise VideoDecodeError(
            f"unsupported video FOURCC {fourcc!r} — only Motion-JPEG "
            "decodes without a codec library"
        )
    if not frames:
        raise VideoDecodeError("AVI has no video frames")
    fps = 1e6 / us_per_frame if us_per_frame else 0.0
    return MjpegAvi(int(width), int(height), fps, frames)


def decode_frame(b: bytes, index: int) -> DecodedImage:
    """Decode ONE frame by index — the work-item shape
    frame_sample_plan produces (container walk is offset arithmetic;
    only the requested frame's JPEG bytes are entropy-decoded)."""
    from .jpegcodec import decode_jpeg

    avi = parse_mjpeg_avi(b)
    if not (0 <= index < avi.n_frames):
        raise VideoDecodeError(
            f"frame index {index} out of range 0..{avi.n_frames - 1}"
        )
    try:
        return decode_jpeg(avi.frames[index])
    except ImageDecodeError as exc:
        raise VideoDecodeError(f"frame {index}: {exc}") from exc


def decode_all_frames(b: bytes) -> list[DecodedImage]:
    from .jpegcodec import decode_jpeg

    avi = parse_mjpeg_avi(b)
    out = []
    for i, fr in enumerate(avi.frames):
        try:
            out.append(decode_jpeg(fr))
        except ImageDecodeError as exc:
            raise VideoDecodeError(f"frame {i}: {exc}") from exc
    return out


def encode_mjpeg_avi(
    jpeg_frames: list[bytes], width: int, height: int, fps: float = 10.0
) -> bytes:
    """Assemble JPEG blobs into a minimal MJPG AVI (hdrl with
    avih+strl, movi with 00dc chunks). Framing is lossless: the
    frames come back byte-identical from :func:`parse_mjpeg_avi`."""
    if not jpeg_frames:
        raise VideoDecodeError("no frames")
    us_per_frame = int(1e6 / fps) if fps > 0 else 0

    def chunk(cid: bytes, payload: bytes) -> bytes:
        pad = b"\x00" if len(payload) & 1 else b""
        return cid + struct.pack("<I", len(payload)) + payload + pad

    def lst(ltype: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", ltype + payload)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        us_per_frame, 0, 0, 0x10, len(jpeg_frames), 0, 1, 0,
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG" + struct.pack(
            "<IHHIIIIIIII", 0, 0, 0, 0, 1, int(fps) or 1,
            0, len(jpeg_frames), 0, 0, 0,
        ) + struct.pack("<hhhh", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0x47504A4D,
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(
        b"movi", b"".join(chunk(b"00dc", fr) for fr in jpeg_frames)
    )
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


__all__ = [
    "MjpegAvi",
    "VideoDecodeError",
    "decode_all_frames",
    "decode_frame",
    "encode_mjpeg_avi",
    "parse_mjpeg_avi",
]
