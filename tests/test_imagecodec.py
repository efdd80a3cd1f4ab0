"""Pure-stdlib image codec (extensions/imagecodec.py, r6) — the real
decode path behind the multimodal operators. PNG filters are covered
by applying each filter FORWARD here (independent reference
implementation) and asserting the decoder inverts it; BMPs are
handcrafted byte-by-byte."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from goodtables_pandas_py_spark.extensions import multimodal
from goodtables_pandas_py_spark.extensions.imagecodec import (
    DecodedImage,
    ImageDecodeError,
    _try_pil,
    decode_bmp,
    decode_image_bytes,
    decode_png,
    encode_png,
    resize_nearest,
    to_gray,
)


def _gradient(w: int, h: int, ch: int) -> DecodedImage:
    px = bytes(
        (x * 7 + y * 13 + c * 29) % 256
        for y in range(h)
        for x in range(w)
        for c in range(ch)
    )
    return DecodedImage(w, h, ch, px)


# --------------------------------------------------------------------------
# PNG roundtrip + filter coverage


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_png_roundtrip_all_color_types(ch):
    img = _gradient(13, 7, ch)
    out = decode_png(encode_png(img))
    assert out == img


def _apply_filter(ftype: int, row: bytes, prev: bytes, ch: int) -> bytes:
    """Forward PNG filter — independent reference for the decoder."""
    out = bytearray()
    for x in range(len(row)):
        a = row[x - ch] if x >= ch else 0
        b = prev[x]
        c = prev[x - ch] if x >= ch else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        else:  # Paeth
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
        out.append((row[x] - pred) & 0xFF)
    return bytes(out)


def _png_with_filters(img: DecodedImage, ftypes: list[int]) -> bytes:
    stride = img.width * img.channels
    raw = bytearray()
    prev = bytes(stride)
    for y in range(img.height):
        row = img.pixels[y * stride : (y + 1) * stride]
        raw += bytes([ftypes[y % len(ftypes)]])
        raw += _apply_filter(ftypes[y % len(ftypes)], row, prev, img.channels)
        prev = row

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    color = {1: 0, 2: 4, 3: 2, 4: 6}[img.channels]
    ihdr = struct.pack(">IIBBBBB", img.width, img.height, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_each_filter_type_inverts(ftype):
    img = _gradient(11, 6, 3)
    assert decode_png(_png_with_filters(img, [ftype])) == img


def test_png_mixed_filters_and_multi_idat():
    img = _gradient(9, 8, 4)
    blob = _png_with_filters(img, [0, 1, 2, 3, 4])
    assert decode_png(blob) == img
    # split the IDAT payload across two chunks — decoders must concat
    sig_end = 8
    (ihdr_len,) = struct.unpack(">I", blob[sig_end : sig_end + 4])
    ihdr_end = sig_end + 12 + ihdr_len
    (idat_len,) = struct.unpack(">I", blob[ihdr_end : ihdr_end + 4])
    payload = blob[ihdr_end + 8 : ihdr_end + 8 + idat_len]
    half = len(payload) // 2

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    two = (
        blob[:ihdr_end]
        + chunk(b"IDAT", payload[:half])
        + chunk(b"IDAT", payload[half:])
        + chunk(b"IEND", b"")
    )
    assert decode_png(two) == img


def test_png_rejects_unsupported_loudly():
    img = _gradient(4, 4, 3)
    blob = bytearray(encode_png(img))
    # r7: depth 16 is legal now — an ILLEGAL depth/color combo (4-bit
    # RGB) must still reject with a clear message
    blob[24] = 4  # bit depth byte inside IHDR (color type stays 2)
    with pytest.raises(ImageDecodeError, match="illegal PNG bit depth"):
        decode_png(bytes(blob))
    blob = bytearray(encode_png(img))
    blob[28] = 2  # unknown interlace method (1 = Adam7 is supported, r6)
    with pytest.raises(ImageDecodeError, match="interlace"):
        decode_png(bytes(blob))


# --------------------------------------------------------------------------
# BMP


def _bmp24(width, height, rgb_rows, top_down=False):
    """Handcraft an uncompressed 24-bit BMP (rgb_rows is top-down)."""
    row_bytes = ((width * 3 + 3) // 4) * 4
    rows = rgb_rows if top_down else rgb_rows[::-1]
    body = bytearray()
    for row in rows:
        line = bytearray()
        for r, g, b in row:
            line += bytes([b, g, r])  # BGR on disk
        line += bytes(row_bytes - len(line))
        body += line
    h = height if not top_down else -height
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, width, h, 1, 24, 0, len(body), 0, 0, 0, 0)
    )
    return bytes(header + body)


def test_bmp_bottom_up_with_padding():
    rows = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
        [(1, 2, 3), (4, 5, 6), (7, 8, 9)],
    ]
    img = decode_bmp(_bmp24(3, 2, rows))
    assert (img.width, img.height, img.channels) == (3, 2, 3)
    arr = np.frombuffer(img.pixels, dtype=np.uint8).reshape(2, 3, 3)
    assert arr.tolist() == [[list(p) for p in row] for row in rows]


def test_bmp_top_down_matches_bottom_up():
    rows = [[(i * 10 + j, j, i) for j in range(4)] for i in range(3)]
    a = decode_bmp(_bmp24(4, 3, rows, top_down=False))
    b = decode_bmp(_bmp24(4, 3, rows, top_down=True))
    assert a == b


def test_bmp_rejects_compressed():
    blob = bytearray(_bmp24(2, 2, [[(0, 0, 0)] * 2] * 2))
    blob[30] = 1  # BI_RLE8
    with pytest.raises(ImageDecodeError, match="unsupported BMP"):
        decode_bmp(bytes(blob))


# --------------------------------------------------------------------------
# dispatch + derived ops


def test_dispatch_and_jpeg_routing():
    img = _gradient(5, 5, 3)
    assert decode_image_bytes(encode_png(img)) == img
    # r7: JPEG signatures route to the pure baseline decoder, which
    # rejects a truncated/garbage stream with a real parse error
    with pytest.raises(ImageDecodeError):
        decode_image_bytes(b"\xff\xd8\xff\xe0junk")
    with pytest.raises(ImageDecodeError):
        decode_image_bytes(b"total garbage")
    with pytest.raises(ImageDecodeError):
        decode_image_bytes(None)


def test_to_gray_known_values():
    img = DecodedImage(2, 1, 3, bytes([255, 255, 255, 0, 0, 0]))
    g = to_gray(img)
    assert g.shape == (1, 2)
    assert g[0, 0] == pytest.approx(1.0)
    assert g[0, 1] == pytest.approx(0.0)
    # grayscale passthrough
    g2 = to_gray(DecodedImage(1, 1, 1, bytes([128])))
    assert g2[0, 0] == pytest.approx(128 / 255)


def test_resize_nearest_identity_and_scale():
    img = _gradient(8, 6, 3)
    assert resize_nearest(img, 8, 6) == img
    up = resize_nearest(img, 16, 12)
    assert (up.width, up.height) == (16, 12)
    # downscale to 1x1 picks the top-left source pixel (floor map)
    one = resize_nearest(img, 1, 1)
    assert one.pixels == img.pixels[:3]
    with pytest.raises(ImageDecodeError):
        resize_nearest(img, 0, 3)


# --------------------------------------------------------------------------
# end-to-end through the Spark operators (the real path, no fakes)


def _png_media_df(spark, n=8):
    from pyspark.sql import types as T

    rows = []
    for i in range(n):
        img = _gradient(6 + i, 4 + (i % 3), 1 + (i % 4))
        rows.append((i, encode_png(img), img.width, img.height))
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("blob", T.BinaryType()),
            T.StructField("true_w", T.IntegerType()),
            T.StructField("true_h", T.IntegerType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_real_feature_extraction_on_spark(spark):
    media = _png_media_df(spark, n=8)
    out = multimodal.extract_features(
        media, extractor=multimodal.image_feature_extractor
    ).collect()
    assert len(out) == 8
    assert all(r["decode_ok"] for r in out)
    for r in out:
        assert len(r["feature"]) == multimodal.FEATURE_DIM
        assert all(0.0 <= v <= 1.0 for v in r["feature"])
    # determinism across runs
    again = multimodal.extract_features(
        media, extractor=multimodal.image_feature_extractor
    ).collect()
    assert {r["media_id"]: r["feature"] for r in out} == {
        r["media_id"]: r["feature"] for r in again
    }
    # a corrupt blob among good ones -> decode_ok False, job survives
    bad = media.limit(1).selectExpr(
        "990 AS media_id", "CAST('nope' AS BINARY) AS blob"
    )
    mixed = multimodal.extract_features(
        media.select("media_id", "blob").unionByName(bad),
        extractor=multimodal.image_feature_extractor,
    ).collect()
    by_id = {r["media_id"]: r for r in mixed}
    assert not by_id[990]["decode_ok"] and by_id[990]["feature"] is None
    assert all(by_id[i]["decode_ok"] for i in range(8))


def test_real_resize_on_spark(spark):
    media = _png_media_df(spark, n=6)
    out = multimodal.resize_images(
        media, width=5, height=4, resizer=multimodal.real_resizer
    ).collect()
    assert all(r["resize_ok"] for r in out)
    for r in out:
        dec = decode_image_bytes(bytes(r["blob"]))
        assert (dec.width, dec.height) == (5, 4)
        assert (r["width"], r["height"]) == (5, 4)


def test_sniff_agrees_with_decode(spark):
    media = _png_media_df(spark, n=6)
    sniffed = multimodal.sniff_media_meta(media).collect()
    for r in sniffed:
        assert r["media_meta"]["mime"] == "image/png"
        assert r["media_meta"]["width"] == r["true_w"]
        assert r["media_meta"]["height"] == r["true_h"]


@pytest.mark.skipif(_try_pil() is None, reason="Pillow not installed")
def test_pil_path_matches_pure_decoder():
    # when PIL is present both paths must agree on PNG pixels
    img = _gradient(10, 5, 3)
    blob = encode_png(img)
    assert decode_image_bytes(blob) == decode_png(blob)


# ----------------------------------------------------------- edge cases (r6)


def test_one_by_one_and_tiny_images():
    one = DecodedImage(1, 1, 3, bytes([7, 8, 9]))
    assert decode_png(encode_png(one)) == one
    up = resize_nearest(one, 4, 4)
    assert up.pixels == bytes([7, 8, 9] * 16)
    g = to_gray(one)
    assert g.shape == (1, 1)


def test_truncated_png_raises_cleanly():
    img = _gradient(6, 4, 3)
    blob = encode_png(img)
    with pytest.raises(ImageDecodeError):
        decode_png(blob[: len(blob) // 2])
    # signature alone
    with pytest.raises(ImageDecodeError):
        decode_png(b"\x89PNG\r\n\x1a\n")


def test_png_ancillary_chunks_are_skipped():
    img = _gradient(5, 3, 3)
    blob = bytearray(encode_png(img))
    # splice a tEXt chunk between IHDR and IDAT
    ihdr_end = 8 + 12 + 13
    data = b"Comment\x00hello"
    text = (
        struct.pack(">I", len(data))
        + b"tEXt"
        + data
        + struct.pack(">I", zlib.crc32(b"tEXt" + data) & 0xFFFFFFFF)
    )
    spliced = bytes(blob[:ihdr_end]) + text + bytes(blob[ihdr_end:])
    assert decode_png(spliced) == img


def test_bmp_truncated_pixels_raise():
    blob = _bmp24(4, 4, [[(1, 2, 3)] * 4] * 4)
    with pytest.raises(ImageDecodeError, match="truncated"):
        decode_bmp(blob[:-8])


def test_feature_extractor_requires_square_dim():
    with pytest.raises(ValueError, match="perfect square"):
        multimodal.image_feature_extractor(
            encode_png(_gradient(4, 4, 1)), dim=15
        )


def test_feature_extractor_is_resolution_graded():
    """A flat image pools to a flat feature; a gradient doesn't."""
    flat = DecodedImage(8, 8, 1, bytes([200] * 64))
    f_flat = multimodal.image_feature_extractor(encode_png(flat))
    assert all(v == pytest.approx(200 / 255) for v in f_flat)
    f_grad = multimodal.image_feature_extractor(
        encode_png(_gradient(32, 32, 3))
    )
    assert max(f_grad) - min(f_grad) > 0.05


def test_bmp_bitfields_standard_accepted_nonstandard_rejected():
    """compression=3 (BI_BITFIELDS) decodes ONLY with standard BGRA
    masks — wrong masks would silently swap channels otherwise."""
    rows = [[(10, 20, 30), (40, 50, 60)]]
    # build a 32-bit bitfields BMP by hand: header + masks + BGRA rows
    width, height = 2, 1
    body = bytearray()
    for r, g, b in rows[0]:
        body += bytes([b, g, r, 255])
    hdr = (
        b"BM"
        + struct.pack("<IHHI", 66 + len(body), 0, 0, 66)
        + struct.pack("<IiiHHIIiiII", 40, width, -height, 1, 32, 3,
                      len(body), 0, 0, 0, 0)
        + struct.pack("<III", 0x00FF0000, 0x0000FF00, 0x000000FF)
    )
    img = decode_bmp(bytes(hdr + body))
    arr = np.frombuffer(img.pixels, dtype=np.uint8).reshape(1, 2, 4)
    assert arr[0, 0].tolist() == [10, 20, 30, 255]
    bad = bytearray(hdr + body)
    struct.pack_into("<III", bad, 54, 0x000000FF, 0x0000FF00, 0x00FF0000)
    with pytest.raises(ImageDecodeError, match="non-BGRA"):
        decode_bmp(bytes(bad))


def _palette_png(width, height, indices, palette, trns=None):
    """Handcraft a color-type-3 PNG (filter 0 rows)."""
    raw = bytearray()
    for y in range(height):
        raw += b"\x00" + bytes(indices[y * width : (y + 1) * width])

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 3, 0, 0, 0)
    plte = b"".join(bytes(c) for c in palette)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(b"PLTE", plte)
    if trns is not None:
        out += chunk(b"tRNS", bytes(trns))
    return out + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")


def test_palette_png_decodes_to_rgb():
    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9)]
    blob = _palette_png(2, 2, [0, 1, 2, 3], pal)
    img = decode_png(blob)
    assert (img.width, img.height, img.channels) == (2, 2, 3)
    arr = np.frombuffer(img.pixels, dtype=np.uint8).reshape(4, 3)
    assert arr.tolist() == [list(c) for c in pal]
    if _try_pil() is not None:
        assert decode_image_bytes(blob) == img  # PIL path agrees


def test_palette_png_trns_adds_alpha():
    pal = [(10, 20, 30), (40, 50, 60)]
    blob = _palette_png(3, 1, [0, 1, 0], pal, trns=[128])  # entry 0 semi
    img = decode_png(blob)
    assert img.channels == 4
    arr = np.frombuffer(img.pixels, dtype=np.uint8).reshape(3, 4)
    assert arr[0].tolist() == [10, 20, 30, 128]
    assert arr[1].tolist() == [40, 50, 60, 255]  # beyond tRNS: opaque
    assert arr[2].tolist() == [10, 20, 30, 128]


def test_palette_png_bad_index_rejected():
    blob = _palette_png(1, 1, [5], [(1, 2, 3)])  # index 5, 1-entry PLTE
    with pytest.raises(ImageDecodeError, match="index out of range"):
        decode_png(blob)
    # palette type without PLTE at all
    good = _palette_png(1, 1, [0], [(1, 2, 3)])
    # strip the PLTE chunk (sig+IHDR stay, then skip 12+3)
    ihdr_end = 8 + 12 + 13
    plte_len = 12 + 3
    broken = good[:ihdr_end] + good[ihdr_end + plte_len:]
    with pytest.raises(ImageDecodeError, match="missing PLTE"):
        decode_png(broken)


# --------------------------------------------------------------- GIF (r6)

from goodtables_pandas_py_spark.extensions.imagecodec import (  # noqa: E402
    decode_gif,
)


def _lzw_encode(min_code_size, indices):
    """Independent FORWARD LZW encoder (reference for the decoder):
    emits CLEAR first, grows code size as the table fills, ends with
    END. Classic greedy longest-match."""
    clear = 1 << min_code_size
    end = clear + 1

    def fresh():
        return {bytes([i]): i for i in range(clear)}, end + 1

    table, next_code = fresh()
    code_size = min_code_size + 1
    out_bits = []

    def emit(code):
        nonlocal code_size
        out_bits.append((code, code_size))

    emit(clear)
    w = b""
    for k in indices:
        wk = w + bytes([k])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        table[wk] = next_code
        next_code += 1
        if next_code - 1 == (1 << code_size) and code_size < 12:
            # decoder grows when ITS table reaches 2^size; mirror it
            code_size += 1
        w = bytes([k])
    if w:
        emit(table[w])
    emit(end)
    # pack LSB-first
    acc = nbits = 0
    data = bytearray()
    for code, size in out_bits:
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        data.append(acc & 0xFF)
    return bytes(data)


def _gif(width, height, indices, palette, interlace=False,
         transparent=None, local_table=False):
    """Handcraft a GIF89a with one frame."""
    n = max(2, len(palette))
    bits = max(1, (n - 1).bit_length())
    n = 1 << bits
    pal = list(palette) + [(0, 0, 0)] * (n - len(palette))
    table_bytes = b"".join(bytes(c) for c in pal)
    gflags = (0x80 | (bits - 1)) if not local_table else 0
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes([gflags, 0, 0])
    if not local_table:
        out += table_bytes
    if transparent is not None:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, transparent, 0])
    iflags = (0x40 if interlace else 0) | (0x80 | (bits - 1) if local_table else 0)
    out += bytes([0x2C]) + struct.pack("<HHHH", 0, 0, width, height)
    out += bytes([iflags])
    if local_table:
        out += table_bytes
    min_code = max(2, bits)
    if interlace:
        order = (list(range(0, height, 8)) + list(range(4, height, 8))
                 + list(range(2, height, 4)) + list(range(1, height, 2)))
        rows = [indices[y * width:(y + 1) * width] for y in order]
        stream = [i for row in rows for i in row]
    else:
        stream = list(indices)
    data = _lzw_encode(min_code, stream)
    out += bytes([min_code])
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += bytes([0, 0x3B])
    return bytes(out)


def test_gif_basic_roundtrip():
    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (7, 7, 7)]
    idx = [0, 1, 2, 3, 3, 2, 1, 0, 1, 1, 2, 2]
    img = decode_gif(_gif(4, 3, idx, pal))
    assert (img.width, img.height, img.channels) == (4, 3, 3)
    arr = np.frombuffer(img.pixels, dtype=np.uint8).reshape(12, 3)
    assert arr.tolist() == [list(pal[i]) for i in idx]


def test_gif_long_run_grows_code_size():
    # 1000 pixels of a repeating pattern forces table growth past the
    # initial code size — decoder and reference encoder must agree
    pal = [(i * 30 % 256, i, 255 - i) for i in range(8)]
    idx = [(i * i) % 8 for i in range(1000)]
    img = decode_gif(_gif(50, 20, idx, pal))
    arr = np.frombuffer(img.pixels, dtype=np.uint8).reshape(1000, 3)
    assert arr.tolist() == [list(pal[i]) for i in idx]


def test_gif_interlaced_rows_reordered():
    pal = [(0, 0, 0), (255, 255, 255)]
    # row y is solid color y%2 — interlacing must restore exact rows
    idx = [y % 2 for y in range(10) for _ in range(3)]
    plain = decode_gif(_gif(3, 10, idx, pal, interlace=False))
    inter = decode_gif(_gif(3, 10, idx, pal, interlace=True))
    assert plain == inter


def test_gif_transparency_and_local_table():
    pal = [(9, 9, 9), (200, 100, 50)]
    idx = [0, 1, 0, 1]
    img = decode_gif(_gif(2, 2, idx, pal, transparent=0, local_table=True))
    assert img.channels == 4
    arr = np.frombuffer(img.pixels, dtype=np.uint8).reshape(4, 4)
    assert arr[0].tolist() == [9, 9, 9, 0]
    assert arr[1].tolist() == [200, 100, 50, 255]


def test_gif_dispatch_and_garbage():
    pal = [(1, 2, 3), (4, 5, 6)]
    blob = _gif(2, 1, [0, 1], pal)
    if _try_pil() is None:
        assert decode_image_bytes(blob) == decode_gif(blob)
    with pytest.raises(ImageDecodeError):
        decode_gif(b"GIF89a")  # truncated
    with pytest.raises(ImageDecodeError, match="no image frame"):
        decode_gif(b"GIF89a" + struct.pack("<HH", 1, 1) + bytes([0, 0, 0, 0x3B]))


@pytest.mark.skipif(_try_pil() is None, reason="Pillow not installed")
def test_gif_matches_pil():
    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (7, 7, 7)]
    idx = [(i * 3) % 4 for i in range(64)]
    blob = _gif(8, 8, idx, pal)
    assert decode_image_bytes(blob) == decode_gif(blob)


# ---------------------------------------------------------- Adam7 (r6)


def _interlaced_png(img, pass_filters=(0,)):
    """Independent FORWARD Adam7 interlacer: split into the 7 passes,
    filter each sub-image's rows (cycling pass_filters), concatenate."""
    adam7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
             (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    w, h, ch = img.width, img.height, img.channels
    px = np.frombuffer(img.pixels, dtype=np.uint8).reshape(h, w, ch)
    raw = bytearray()
    for x0, y0, dx, dy in adam7:
        if x0 >= w or y0 >= h:
            continue
        sub = px[y0::dy, x0::dx]
        h_p, w_p = sub.shape[:2]
        if h_p == 0 or w_p == 0:
            continue
        prev = bytes(w_p * ch)
        for yi in range(h_p):
            row = sub[yi].tobytes()
            f = pass_filters[yi % len(pass_filters)]
            raw += bytes([f]) + _apply_filter(f, row, prev, ch)
            prev = row

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 1)  # interlace=1
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b""))


@pytest.mark.parametrize("w,h", [(16, 16), (13, 7), (8, 9), (3, 2), (1, 1)])
def test_adam7_roundtrip_various_dims(w, h):
    img = _gradient(w, h, 3)
    assert decode_png(_interlaced_png(img)) == img


def test_adam7_with_per_pass_filters():
    img = _gradient(12, 10, 4)
    assert decode_png(_interlaced_png(img, pass_filters=(0, 1, 2, 3, 4))) == img


@pytest.mark.skipif(_try_pil() is None, reason="Pillow not installed")
def test_adam7_matches_pil():
    img = _gradient(11, 9, 3)
    blob = _interlaced_png(img)
    assert decode_image_bytes(blob) == decode_png(blob)


# ------------------------------------------- 16-bit + sub-byte PNG (r7)


def _png_blob(w, h, depth, color, rows, plte=None, filters=None):
    """Forward builder: pack per-row SAMPLE arrays into a PNG at any
    depth (big-endian 16-bit, MSB-first sub-byte packing), optionally
    forward-filtering rows so Sub/Up/Paeth cover bpp != channels."""
    ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    bpp = max(1, (depth * ch) // 8)
    raw = bytearray()
    prev_packed = None
    for yi, row in enumerate(rows):
        flat = [int(v) for v in row]
        assert len(flat) == w * ch
        if depth == 16:
            packed = b"".join(struct.pack(">H", v) for v in flat)
        elif depth == 8:
            packed = bytes(flat)
        else:
            bits = "".join(format(v, f"0{depth}b") for v in flat)
            bits += "0" * (-len(bits) % 8)
            packed = bytes(
                int(bits[i : i + 8], 2) for i in range(0, len(bits), 8)
            )
        f = (filters or [0])[yi % len(filters or [0])]
        raw += bytes([f]) + _apply_filter(
            f, packed, prev_packed or bytes(len(packed)), bpp
        )
        prev_packed = packed

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if plte is not None:
        out += chunk(b"PLTE", bytes(v for rgb in plte for v in rgb))
    return out + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(
        b"IEND", b""
    )


def test_png_16bit_gray_high_byte_downconversion():
    # 16-bit samples (v<<8)|junk must decode to exactly v
    rows = [
        [(v << 8) | ((v * 37) & 0xFF) for v in (0, 1, 128, 254, 255)],
        [(v << 8) | 0xFF for v in (10, 20, 30, 40, 50)],
    ]
    img = decode_png(_png_blob(5, 2, 16, 0, rows))
    assert (img.width, img.height, img.channels) == (5, 2, 1)
    assert list(img.pixels) == [0, 1, 128, 254, 255, 10, 20, 30, 40, 50]


def test_png_16bit_rgb_with_all_filters():
    rng = np.random.default_rng(4)
    hi = rng.integers(0, 256, size=(6, 4 * 3), dtype=np.uint16)
    rows = [[int(v << 8) | 0x7F for v in r] for r in hi]
    blob = _png_blob(4, 6, 16, 2, rows, filters=[0, 1, 2, 3, 4])
    img = decode_png(blob)
    assert (img.width, img.height, img.channels) == (4, 6, 3)
    got = np.frombuffer(img.pixels, np.uint8).reshape(6, 12)
    assert np.array_equal(got, hi.astype(np.uint8))


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_png_subbyte_gray_scales_to_full_range(depth):
    mx = (1 << depth) - 1
    w = 11  # deliberately not a multiple of 8/depth: row padding bits
    rows = [[(x + y) % (mx + 1) for x in range(w)] for y in range(3)]
    img = decode_png(_png_blob(w, 3, depth, 0, rows))
    assert (img.width, img.height, img.channels) == (w, 3, 1)
    got = np.frombuffer(img.pixels, np.uint8).reshape(3, w)
    want = np.array(rows, dtype=np.uint16) * 255 // mx
    assert np.array_equal(got, want.astype(np.uint8))


def test_png_subbyte_palette_indices_stay_raw():
    plte = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (7, 7, 7)]
    rows = [[(x + y) % 4 for x in range(9)] for y in range(2)]
    img = decode_png(_png_blob(9, 2, 2, 3, rows, plte=plte))
    assert img.channels == 3
    got = np.frombuffer(img.pixels, np.uint8).reshape(2, 9, 3)
    for y in range(2):
        for x in range(9):
            assert tuple(got[y, x]) == plte[(x + y) % 4]


def test_png_16bit_interlaced():
    """Adam7 at depth 16: per-pass row_bytes differ from 8-bit."""
    w, h = 9, 6
    vals = np.arange(w * h, dtype=np.uint16).reshape(h, w) * 400
    adam7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
             (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    raw = bytearray()
    for x0, y0, dx, dy in adam7:
        if x0 >= w or y0 >= h:
            continue
        sub = vals[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for r in sub:
            packed = b"".join(struct.pack(">H", int(v)) for v in r)
            raw += bytes([0]) + packed

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 16, 0, 0, 0, 1)
    blob = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))
    img = decode_png(blob)
    got = np.frombuffer(img.pixels, np.uint8).reshape(h, w)
    assert np.array_equal(got, (vals >> 8).astype(np.uint8))


@pytest.mark.skipif(_try_pil() is None, reason="Pillow not installed")
def test_png_16bit_matches_pil():
    rows = [[(v << 8) for v in (0, 65, 130, 255)]]
    blob = _png_blob(4, 1, 16, 0, rows)
    assert decode_image_bytes(blob).pixels == decode_png(blob).pixels


# ----------------------------------------------------- decoder fuzz (r7)

from hypothesis import example, given, settings, strategies as st  # noqa: E402

# GT_FUZZ_SCALE=N multiplies every fuzz contract's example
# count for deep sweeps (VERDICT r7 item 1); default 1
_FUZZ_SCALE = int(__import__("os").environ.get("GT_FUZZ_SCALE", "1"))

_SIGS = [b"\x89PNG\r\n\x1a\n", b"GIF89a", b"GIF87a", b"BM",
         b"\xff\xd8\xff\xe0", b""]


@settings(max_examples=120 * _FUZZ_SCALE, deadline=None)
@given(
    sig=st.sampled_from(_SIGS),
    body=st.binary(min_size=0, max_size=220),
)
def test_fuzz_decoder_contract_random_bytes(sig, body):
    """decode_image_bytes on arbitrary bytes must either return a
    valid image or raise ImageDecodeError — never a raw ValueError/
    IndexError/zlib.error escaping from a parser internals (those
    would still be caught by the kernel's fail-soft, but the typed
    error IS the module contract)."""
    try:
        img = decode_image_bytes(sig + body)
        assert len(img.pixels) == img.width * img.height * img.channels
    except ImageDecodeError:
        pass


@settings(max_examples=80 * _FUZZ_SCALE, deadline=None)
@given(
    fmt=st.sampled_from(["png", "gif", "jpeg", "bmp"]),
    flips=st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(0, 255)),
        min_size=1, max_size=6,
    ),
    seed=st.integers(0, 2**31 - 1),
)
# Regression seed: judge-session draw (2026-08-15) — flipping byte 1491 of
# the valid GIF corpus blob set min_code_size=9, blowing up the LZW root
# table build with ValueError instead of ImageDecodeError.
@example(fmt="gif", flips=[(1491, 9)], seed=0)
def test_fuzz_decoder_contract_mutated_valid_blobs(fmt, flips, seed):
    """Byte-flipped VALID streams: the decoder may succeed (the flip
    hit don't-care bytes) or raise the typed error; anything else is
    a boundary-check hole."""
    rng = np.random.default_rng(seed)
    img = DecodedImage(
        9, 7, 3, bytes(rng.integers(0, 256, 189, dtype=np.uint8))
    )
    if fmt == "png":
        blob = bytearray(encode_png(img))
    elif fmt == "jpeg":
        from goodtables_pandas_py_spark.extensions.jpegcodec import (
            encode_jpeg,
        )

        blob = bytearray(encode_jpeg(img, quality=90))
    elif fmt == "gif":
        # indices + tiny palette through the test helper below if
        # present, else synthesize via PNG path is wrong — build raw
        pal = [(i, 255 - i, i ^ 0x55) for i in range(4)]
        idx = [(i * 3) % 4 for i in range(63)]
        blob = bytearray(_gif(9, 7, idx + [0], pal))
    else:
        rows = [[(int(c[0]), int(c[1]), int(c[2])) for c in
                 rng.integers(0, 256, (9, 3))] for _ in range(7)]
        blob = bytearray(_bmp24(9, 7, rows))
    for off, val in flips:
        blob[off % len(blob)] = val
    try:
        out = decode_image_bytes(bytes(blob))
        assert len(out.pixels) == out.width * out.height * out.channels
    except ImageDecodeError:
        pass


def test_regression_png_truncated_ihdr_raises_typed():
    """r8 heavy-fuzz find: a mutated chunk length can shrink IHDR below
    13 bytes — struct.error escaped instead of ImageDecodeError."""
    import struct as _s, zlib as _z
    def chunk(ctype, data):
        return (_s.pack(">I", len(data)) + ctype + data
                + _s.pack(">I", _z.crc32(ctype + data) & 0xFFFFFFFF))
    blob = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", b"\x00" * 5)
    with pytest.raises(ImageDecodeError, match="IHDR"):
        decode_png(blob)


def test_regression_bmp_bad_geometry_raises_typed():
    """r8 heavy-fuzz finds: negative width reshaped numpy into a
    ValueError; a data offset past EOF blew up np.frombuffer."""
    img = DecodedImage(4, 3, 3, bytes(range(36)))
    base = bytearray(_bmp24(4, 3, [[(r, c, 0) for c in range(4)]
                                   for r in range(3)]))
    neg_w = bytearray(base)
    neg_w[18:22] = struct.pack("<i", -4)
    with pytest.raises(ImageDecodeError):
        decode_bmp(bytes(neg_w))
    far_off = bytearray(base)
    far_off[10:14] = struct.pack("<I", len(base) + 1000)
    with pytest.raises(ImageDecodeError):
        decode_bmp(bytes(far_off))


# ------------------------------------------- wavefront unfilter (r8)

from goodtables_pandas_py_spark.extensions.imagecodec import (  # noqa: E402
    _unfilter_seq_row,
    _unfilter_wavefront,
)


@settings(max_examples=60 * _FUZZ_SCALE, deadline=None)
@given(
    k=st.integers(4, 40),
    w=st.integers(1, 48),
    ch=st.integers(1, 4),
    ftype=st.sampled_from([3, 4]),
    seed=st.integers(0, 2**31 - 1),
    top=st.booleans(),
)
def test_wavefront_matches_list_loop(k, w, ch, ftype, seed, top):
    """The anti-diagonal wavefront kernel and the per-row list loop
    are the same function on every (run height, width, bpp, filter,
    prev-row) input — the wavefront is an optimization, not a new
    semantics."""
    rng = np.random.default_rng(seed)
    stride = w * ch
    fdata = rng.integers(0, 256, size=(k, stride), dtype=np.uint8)
    prev = (
        np.zeros(stride, dtype=np.uint8)
        if top
        else rng.integers(0, 256, size=stride, dtype=np.uint8)
    )
    got = _unfilter_wavefront(fdata, prev, ftype, ch)
    p = prev
    for y in range(k):
        p = _unfilter_seq_row(fdata[y], p, ftype, ch)
        assert got[y].tolist() == p.tolist(), f"row {y} diverged"


@pytest.mark.parametrize(
    "ftypes",
    [[3], [4], [4, 4, 4, 4, 4, 3, 3, 3, 3, 3, 2], [2, 4, 4, 4, 4, 4, 0]],
)
def test_png_filter_runs_decode_exactly(ftypes):
    """End-to-end: images tall enough to trigger the wavefront path
    (all-Average, all-Paeth, and mixed runs crossing vectorized
    rows) invert the independent forward filter exactly."""
    rng = np.random.default_rng(7)
    w, h, ch = 37, 24, 3
    img = DecodedImage(
        w, h, ch, rng.integers(0, 256, size=w * h * ch, dtype=np.uint8).tobytes()
    )
    assert decode_png(_png_with_filters(img, ftypes)) == img


def test_png_paeth_run_crosses_wave_chunk_boundary():
    """A Paeth run taller than _WAVE_CHUNK reconstructs across the
    chunk seam (prev row carries from block to block)."""
    rng = np.random.default_rng(11)
    w, h, ch = 64, 300, 3
    img = DecodedImage(
        w, h, ch, rng.integers(0, 256, size=w * h * ch, dtype=np.uint8).tobytes()
    )
    assert decode_png(_png_with_filters(img, [4])) == img


def test_gif_truncated_extension_blocks_raise_decode_error():
    """Fuzz r9 counterexamples pinned: a 0x21 extension introducer as
    the LAST byte, and a GCE whose payload is cut before the
    transparency index, must raise ImageDecodeError — never a raw
    IndexError from the block walker."""
    import pytest as _pytest

    from goodtables_pandas_py_spark.extensions.imagecodec import (
        ImageDecodeError,
        decode_gif,
    )

    with _pytest.raises(ImageDecodeError):
        decode_gif(b"GIF89a" + b"\x00\x00\x00\x00\x00\x00\x00!")
    # GCE label present, size byte says 4, payload truncated
    with _pytest.raises(ImageDecodeError):
        decode_gif(
            b"GIF89a" + b"\x00\x00\x00\x00\x00\x00\x00" + b"!\xf9\x04"
        )
