"""Multimodal columns (X-multimodal): image/audio/video as opaque
``binary`` columns with typed metadata, processed via Arrow-batched
``mapInPandas`` (SURVEY.md north star). As of r6/r7 the decode step
is REAL: PNG/GIF/BMP (pure-stdlib codec in :mod:`.imagecodec`),
baseline + progressive JPEG (:mod:`.jpegcodec`), and WAV audio
(:mod:`.audiocodec` — PCM int/float, lossless integer roundtrips),
with PIL as the optional image fast path; decode→feature
(:func:`image_feature_extractor`, :func:`.audiocodec.audio_features`)
and decode→resize→re-encode (:func:`real_resizer`) run end-to-end in
codec-less containers; the deterministic fakes remain only as
injectable stand-ins for plumbing tests on non-media bytes.

Design for 100 TB:
- blobs ride in parquet binary columns (or `binaryFile` source for
  loose files); metadata is a sibling struct so filters/pruning never
  touch the bytes;
- per-batch processing via mapInPandas keeps peak memory to
  (batch rows × blob size); `spark.sql.files.maxPartitionBytes`
  governs scan granularity;
- decode outputs are fixed-size feature vectors, never re-encoded
  blobs, so downstream shuffles stay narrow.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata contract for a multimodal column
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FEATURE_DIM = 16

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("decode_ok", T.BooleanType()),
    ]
)


def attach_media_metadata(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Derive the cheap half of the metadata (sizes) JVM-side; decode-
    dependent fields stay null until a decoder fills them."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(None).cast("string").alias("media_type"),
            F.lit(None).cast("string").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.length(F.col(blob_col)).cast("long").alias("n_bytes"),
        ),
    )


def decode_image(blob: bytes):
    """REAL image decode (r6 — the former stub). Returns an
    :class:`~.imagecodec.DecodedImage` (top-down row-major
    interleaved 8-bit). PIL is the optional fast path when
    importable; without it, PNG (incl. palette), GIF (LZW), BMP and
    baseline AND progressive JPEG (r7, :mod:`.jpegcodec`) decode
    pure-stdlib; arithmetic/CMYK JPEG raises
    :class:`~.imagecodec.ImageDecodeError`."""
    from .imagecodec import decode_image_bytes

    return decode_image_bytes(blob)


def image_feature_extractor(blob: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """REAL decode→feature step (r6): decode (PIL or pure codec) →
    Rec.601 luminance → mean-pool onto a sqrt(dim)×sqrt(dim) grid →
    ``dim`` floats in [0, 1]. Deterministic; raises on undecodable
    blobs so :func:`extract_features`'s per-row fail-soft contract
    records decode_ok=False instead of failing the task."""
    import numpy as np

    from .imagecodec import decode_image_bytes, to_gray

    side = int(dim**0.5)
    if side * side != dim:
        raise ValueError("dim must be a perfect square for the grid pool")
    g = to_gray(decode_image_bytes(blob))
    h, w = g.shape
    ys = (np.arange(h) * side // max(h, 1)).clip(0, side - 1)
    xs = (np.arange(w) * side // max(w, 1)).clip(0, side - 1)
    pooled = np.zeros((side, side), dtype=np.float64)
    counts = np.zeros((side, side), dtype=np.int64)
    np.add.at(pooled, (ys[:, None], xs[None, :]), g)
    np.add.at(counts, (ys[:, None], xs[None, :]), 1)
    pooled = np.divide(pooled, counts, out=pooled, where=counts > 0)
    return [float(v) for v in pooled.reshape(dim)]


def real_resizer(blob: bytes, width: int, height: int) -> bytes:
    """REAL decode→resize→re-encode (r6): decode via
    :mod:`.imagecodec`, nearest-neighbour resize (numpy index maps),
    re-encode as PNG with the pure-stdlib writer. Inject into
    :func:`resize_images` in place of :func:`fake_resizer`."""
    from .imagecodec import decode_image_bytes, encode_png, resize_nearest

    return encode_png(resize_nearest(decode_image_bytes(blob), width, height))


def fake_feature_extractor(blob: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a decode→embed step: folds the bytes
    into ``dim`` float buckets. Lets the full pipeline (including
    similarity search over the features) run end-to-end without media
    libraries."""
    acc = [0] * dim
    for i, byte in enumerate(blob):
        acc[i % dim] = (acc[i % dim] * 31 + byte) & 0x7FFFFFFF
    return [float(x % 1000) / 1000.0 for x in acc]


def extract_features(
    df: DataFrame,
    id_col: str = "media_id",
    blob_col: str = "blob",
    extractor: Callable[[bytes], list[float]] | None = None,
) -> DataFrame:
    """mapInPandas feature extraction: Arrow-batched, one Python
    round-trip per batch, output schema fixed (never inferred).
    ``extractor`` defaults to the deterministic fake (real decoders
    are injected the same way)."""
    fn = extractor or fake_feature_extractor

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            oks = []
            for blob in pdf[blob_col]:
                try:
                    feats.append(fn(bytes(blob)) if blob is not None else None)
                    oks.append(blob is not None)
                except Exception:
                    # per-row fail-soft is the CONTRACT: one corrupt
                    # blob among billions must set decode_ok=False,
                    # not fail the task 4x and abort the job (real
                    # decoders raise OSError/ValueError, not just the
                    # stub's NotImplementedError)
                    feats.append(None)
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "feature": feats,
                    "decode_ok": oks,
                }
            )

    return df.mapInPandas(batches, _FEATURE_SCHEMA)


def frame_sample_plan(
    df: DataFrame, every_ms: int = 1000, id_col: str = "media_id"
) -> DataFrame:
    """Video frame-sampling *plan*: expands each media row into frame
    timestamps JVM-side (sequence + explode) so the expensive decode
    only sees (media_id, frame_ts) work items — the shuffle unit is a
    frame task, not a video blob. Timestamps stay STRICTLY inside the
    clip ([0, duration)): an inclusive bound emitted ts == duration,
    one past the end, for clips whose length is a multiple of
    ``every_ms`` (the audio twin already capped starts at dur-1)."""
    if every_ms <= 0:
        raise ValueError("every_ms must be positive")
    dur = F.coalesce(F.col("media_meta.duration_ms"), F.lit(0))
    return df.select(
        F.col(id_col),
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(dur - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


def sample_frame_features(
    df: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
    blob_col: str = "blob",
    dim: int = FEATURE_DIM,
) -> DataFrame:
    """REAL end-to-end video path (r7): for each MJPEG-AVI blob,
    sample one frame per ``every_ms`` of timeline, decode ONLY the
    sampled frames (container walking is offset arithmetic — the
    unsampled frames' JPEG bytes are never entropy-decoded), and emit
    (media_id, frame_idx, frame_ts_ms, feature, decode_ok) rows.
    Arrow-batched mapInPandas with the same per-row fail-soft
    contract as :func:`extract_features`: a corrupt container or
    frame yields one decode_ok=False row, never a task failure.
    Non-MJPEG video (H.264 etc.) fails soft the same way — a codec
    library is genuinely required there."""
    if every_ms <= 0:
        raise ValueError("every_ms must be positive")
    out_t = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_ts_ms", T.LongType()),
            T.StructField("feature", T.ArrayType(T.FloatType())),
            T.StructField("decode_ok", T.BooleanType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .imagecodec import to_gray
        from .jpegcodec import decode_jpeg
        from .videocodec import parse_mjpeg_avi

        side = int(dim**0.5)

        def pooled(img) -> list[float]:
            g = to_gray(img)
            h, w = g.shape
            ys = (np.arange(h) * side // max(h, 1)).clip(0, side - 1)
            xs = (np.arange(w) * side // max(w, 1)).clip(0, side - 1)
            acc = np.zeros((side, side))
            cnt = np.zeros((side, side), dtype=np.int64)
            np.add.at(acc, (ys[:, None], xs[None, :]), g)
            np.add.at(cnt, (ys[:, None], xs[None, :]), 1)
            acc = np.divide(acc, cnt, out=acc, where=cnt > 0)
            return [float(v) for v in acc.reshape(side * side)]

        for pdf in it:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[blob_col]):
                try:
                    avi = parse_mjpeg_avi(bytes(blob))
                    step = max(
                        1, int(round(avi.fps * every_ms / 1000.0))
                    ) if avi.fps else 1
                    for idx in range(0, avi.n_frames, step):
                        ts = int(idx * 1000 / avi.fps) if avi.fps else 0
                        try:
                            feat = pooled(decode_jpeg(avi.frames[idx]))
                            rows.append((mid, idx, ts, feat, True))
                        except Exception:
                            rows.append((mid, idx, ts, None, False))
                except Exception:
                    rows.append((mid, None, None, None, False))
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "frame_idx", "frame_ts_ms", "feature",
                    "decode_ok",
                ],
            )

    return df.select(id_col, blob_col).mapInPandas(batches, out_t)


def audio_window_plan(
    df: DataFrame,
    window_ms: int = 2000,
    hop_ms: int = 1000,
    id_col: str = "media_id",
) -> DataFrame:
    """Audio windowing *plan* (the audio twin of
    :func:`frame_sample_plan`): expands each audio row into
    overlapping (win_start_ms, win_end_ms) work items JVM-side —
    windows of ``window_ms`` starting every ``hop_ms`` — so a decode/
    feature UDF downstream sees fixed-size window tasks, never whole
    audio blobs. The final partial window is clipped to the clip's
    duration; zero/unknown duration yields one empty-range row so the
    media id is never silently dropped from the task list."""
    if hop_ms <= 0:
        raise ValueError("hop_ms must be positive")
    dur = F.coalesce(F.col("media_meta.duration_ms"), F.lit(0))
    last_start = F.greatest(
        dur - F.lit(1), F.lit(0)
    )  # windows start strictly inside the clip
    start = F.explode(
        F.sequence(F.lit(0), last_start, F.lit(hop_ms))
    ).alias("win_start_ms")
    return df.select(F.col(id_col), dur.alias("__dur"), start).select(
        id_col,
        "win_start_ms",
        F.least(
            F.col("win_start_ms") + F.lit(window_ms), F.col("__dur")
        ).alias("win_end_ms"),
    )


_RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("blob", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resize_ok", T.BooleanType()),
    ]
)


def fake_resizer(blob: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for decode→resize→re-encode: truncates /
    cycles the byte stream to width*height bytes. Keeps the pipeline
    (batching, output schema, metadata rewrite) runnable without
    imaging libraries; a real implementation swaps in PIL/opencv."""
    target = max(1, width * height)
    if not blob:
        return bytes(target)
    reps = (target // len(blob)) + 1
    return (blob * reps)[:target]


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "media_id",
    blob_col: str = "blob",
    resizer: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """mapInPandas image resize: Arrow-batched blobs in, re-encoded
    blobs + rewritten dimensions out. Same 100 TB posture as
    extract_features — peak memory is (batch rows × blob size), the
    output schema is fixed, and the new width/height ride alongside
    the bytes so downstream metadata stays consistent. ``resizer``
    defaults to the deterministic fake (decode libs are not in this
    container); inject a real PIL/opencv-backed callable in
    production."""
    fn = resizer or fake_resizer

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            blobs = []
            oks = []
            for blob in pdf[blob_col]:
                try:
                    if blob is None:
                        blobs.append(None)
                        oks.append(False)
                    else:
                        blobs.append(fn(bytes(blob), width, height))
                        oks.append(True)
                except Exception:  # per-row fail-soft, as above
                    blobs.append(None)
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "blob": blobs,
                    "width": [width if ok else None for ok in oks],
                    "height": [height if ok else None for ok in oks],
                    "resize_ok": oks,
                }
            )

    return df.mapInPandas(batches, _RESIZED_SCHEMA)


def _parse_image_header(b) -> tuple:
    """(mime, width, height) parsed from REAL container headers —
    pure byte arithmetic, no imaging library (this is metadata
    sniffing, not decoding, so it is NOT stubbed):

    - PNG: 8-byte signature, IHDR width/height at fixed offsets
      16-24 (big-endian);
    - GIF87a/89a: logical screen size at 6-10 (little-endian);
    - BMP: BITMAPINFOHEADER size at 18-26 (little-endian, height may
      be negative for top-down rows — abs);
    - JPEG: segment scan for the first SOFn marker (C0-CF minus
      C4/C8/CC), height/width big-endian inside it. RSTn/TEM/SOI
      markers are parameterless and skipped.

    Unrecognized or truncated input -> (None, None, None); a JPEG
    signature whose SOF never appears -> ("image/jpeg", None, None)."""
    if b is None:
        return (None, None, None)
    b = bytes(b)
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24:
        return (
            "image/png",
            int.from_bytes(b[16:20], "big"),
            int.from_bytes(b[20:24], "big"),
        )
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        return (
            "image/gif",
            int.from_bytes(b[6:8], "little"),
            int.from_bytes(b[8:10], "little"),
        )
    if b[:2] == b"BM" and len(b) >= 26:
        return (
            "image/bmp",
            abs(int.from_bytes(b[18:22], "little", signed=True)),
            abs(int.from_bytes(b[22:26], "little", signed=True)),
        )
    if b[:2] == b"\xff\xd8":
        i, n = 2, len(b)
        while i + 4 <= n:
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker == 0xFF:  # fill byte
                i += 1
                continue
            if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
                i += 2  # parameterless marker
                continue
            seglen = int.from_bytes(b[i + 2 : i + 4], "big")
            if (
                0xC0 <= marker <= 0xCF
                and marker not in (0xC4, 0xC8, 0xCC)
            ):
                if i + 9 <= n:
                    return (
                        "image/jpeg",
                        int.from_bytes(b[i + 7 : i + 9], "big"),
                        int.from_bytes(b[i + 5 : i + 7], "big"),
                    )
                break
            if seglen < 2:
                break
            i += 2 + seglen
        return ("image/jpeg", None, None)
    if b[:4] in (b"II*\x00", b"MM\x00*") and len(b) >= 8:
        # TIFF (r7): walk the first IFD for ImageWidth/ImageLength
        import struct as _struct

        e = "<" if b[:2] == b"II" else ">"
        try:
            (off,) = _struct.unpack(e + "I", b[4:8])
            (n_ent,) = _struct.unpack(e + "H", b[off : off + 2])
            dims = {}
            for k in range(n_ent):
                ent = b[off + 2 + 12 * k : off + 14 + 12 * k]
                tag, typ, cnt = _struct.unpack(e + "HHI", ent[:8])
                if tag in (256, 257) and cnt == 1:
                    if typ == 3:
                        dims[tag] = _struct.unpack(e + "H", ent[8:10])[0]
                    elif typ == 4:
                        dims[tag] = _struct.unpack(e + "I", ent[8:12])[0]
            return ("image/tiff", dims.get(256), dims.get(257))
        except Exception:
            return ("image/tiff", None, None)
    return (None, None, None)


def _parse_wav_header(b) -> tuple:
    """(sample_rate, channels, duration_ms) from a RIFF/WAVE header —
    chunk walk to the fmt and data chunks (fmt is usually but not
    always first). Malformed/truncated -> (None, None, None)."""
    if b is None or len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return (None, None, None)
    b = bytes(b)
    i, n = 12, len(b)
    rate = channels = byte_rate = data_size = None
    while i + 8 <= n:
        cid = b[i : i + 4]
        size = int.from_bytes(b[i + 4 : i + 8], "little")
        if cid == b"fmt " and i + 8 + 16 <= n:
            channels = int.from_bytes(b[i + 10 : i + 12], "little")
            rate = int.from_bytes(b[i + 12 : i + 16], "little")
            byte_rate = int.from_bytes(b[i + 16 : i + 20], "little")
        elif cid == b"data":
            data_size = size
        if rate is not None and data_size is not None:
            break
        i += 8 + size + (size & 1)  # chunks are word-aligned
    dur = (
        int(data_size * 1000 // byte_rate)
        if byte_rate and data_size is not None
        else None
    )
    return (rate, channels, dur)


def _parse_mp4_header(b) -> tuple:
    """(mime, duration_ms) from an ISO BMFF (MP4/MOV) box walk: find
    the top-level ``moov`` box, then its ``mvhd`` child — timescale +
    duration at version-dependent offsets. Bounded: only box headers
    are touched, never media payloads. Malformed/absent →
    (None, None); an ftyp with no readable mvhd still reports the
    mime (the blob IS an mp4, its duration just isn't parseable)."""
    if b is None or len(b) < 12 or b[4:8] != b"ftyp":
        return (None, None)
    b = bytes(b)
    n = len(b)

    def boxes(start: int, end: int):
        i = start
        while i + 8 <= end:
            size = int.from_bytes(b[i : i + 4], "big")
            btype = b[i + 4 : i + 8]
            hdr = 8
            if size == 1:
                if i + 16 > end:
                    return
                size = int.from_bytes(b[i + 8 : i + 16], "big")
                hdr = 16
            elif size == 0:  # box runs to EOF
                size = end - i
            if size < hdr:
                return
            yield btype, i + hdr, min(i + size, end)
            i += size

    for btype, s, e in boxes(0, n):
        if btype != b"moov":
            continue
        for ctype, cs, ce in boxes(s, e):
            if ctype != b"mvhd" or ce - cs < 20:
                continue
            version = b[cs]
            if version == 0 and ce - cs >= 20:
                scale = int.from_bytes(b[cs + 12 : cs + 16], "big")
                dur = int.from_bytes(b[cs + 16 : cs + 20], "big")
            elif version == 1 and ce - cs >= 32:
                scale = int.from_bytes(b[cs + 20 : cs + 24], "big")
                dur = int.from_bytes(b[cs + 24 : cs + 32], "big")
            else:
                break
            if scale > 0:
                return ("video/mp4", int(dur * 1000 // scale))
            break
    return ("video/mp4", None)


def sniff_media_meta(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """``df`` + a ``media_meta`` struct (MEDIA_META_SCHEMA) whose
    mime/width/height/duration_ms come from REAL header parsing —
    :func:`_parse_image_header` for PNG/GIF/BMP/JPEG,
    :func:`_parse_wav_header` for RIFF/WAVE, and (r6)
    :func:`_parse_mp4_header` for ISO BMFF video (+ WebM/Matroska by
    EBML magic, mime only) — over the binary column via an
    Arrow-batched pandas UDF (headers are fixed-offset reads /
    bounded box walks, so per-row cost is independent of blob
    size). Unrecognized blobs keep a null-typed struct with just
    n_bytes — the same contract as :func:`attach_media_metadata`,
    which remains the zero-Python fallback."""
    from pyspark.sql.pandas.functions import pandas_udf

    meta_t = (
        "media_type: string, mime: string, width: int, height: int,"
        " duration_ms: long"
    )

    @pandas_udf(meta_t)
    def _sniff(blobs: pd.Series) -> pd.DataFrame:
        rows = []
        for b in blobs:
            mime, w, h = _parse_image_header(b)
            if mime is not None:
                rows.append(("image", mime, w, h, None))
                continue
            rate, _ch, dur = _parse_wav_header(b)
            if rate is not None:
                rows.append(("audio", "audio/wav", None, None, dur))
                continue
            vmime, vdur = _parse_mp4_header(b)
            if vmime is not None:
                rows.append(("video", vmime, None, None, vdur))
            elif b is not None and bytes(b[:4]) == b"\x1a\x45\xdf\xa3":
                rows.append(("video", "video/webm", None, None, None))
            elif (
                b is not None
                and len(b) >= 12
                and bytes(b[:4]) == b"RIFF"
                and bytes(b[8:12]) == b"AVI "
            ):
                # AVI (r7): real container parse — dims + duration
                from .videocodec import VideoDecodeError, parse_mjpeg_avi

                try:
                    avi = parse_mjpeg_avi(bytes(b))
                    rows.append((
                        "video", "video/x-msvideo",
                        avi.width or None, avi.height or None,
                        avi.duration_ms or None,
                    ))
                except VideoDecodeError:
                    rows.append(("video", "video/x-msvideo",
                                 None, None, None))
            else:
                rows.append((None, None, None, None, None))
        return pd.DataFrame(
            rows,
            columns=["media_type", "mime", "width", "height", "duration_ms"],
        )

    s = _sniff(F.col(blob_col))
    return df.withColumn(
        "media_meta",
        F.struct(
            s["media_type"].alias("media_type"),
            s["mime"].alias("mime"),
            s["width"].alias("width"),
            s["height"].alias("height"),
            s["duration_ms"].alias("duration_ms"),
            F.length(F.col(blob_col)).cast("long").alias("n_bytes"),
        ),
    )


#: former name (image-only era) — same function, images + WAV now
sniff_image_meta = sniff_media_meta


def demo_media_df(spark: SparkSession, n: int = 64) -> DataFrame:
    """Synthetic binary table for plumbing tests (deterministic)."""
    rows = [(i, bytes([(i * 7 + j) % 251 for j in range(128 + i)])) for i in range(n)]
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("blob", T.BinaryType()),
        ]
    )
    return spark.createDataFrame(rows, schema)
