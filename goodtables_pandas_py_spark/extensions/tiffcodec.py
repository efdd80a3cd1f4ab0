"""Pure-stdlib baseline TIFF decoder (r7 — rounds out the multimodal
image formats: PNG/GIF/BMP/JPEG in :mod:`.imagecodec` /
:mod:`.jpegcodec`, TIFF here; scanned-document and scientific
corpora ship TIFF).

Supported: classic TIFF (II little-endian / MM big-endian), 8-bit
samples, grayscale (PhotometricInterpretation 0/1, MinIsWhite
inverted to MinIsBlack), RGB(A) (2), palette (3, 16-bit color map
scaled by the high byte), strip-based layout (any RowsPerStrip),
compression 1 (none), 5 (TIFF-LZW with horizontal differencing
predictor 2) and 32773 (PackBits). A matching strip-based writer
(:func:`encode_tiff`, uncompressed or PackBits) serves as the
test-vector source; uncompressed/PackBits roundtrips are LOSSLESS so
the oracle is exact equality. Tiled layouts, 16-bit samples,
CCITT/JPEG-in-TIFF, and planar configuration 2 are rejected loudly.

Scale posture: identical to the sibling codecs — one blob at a time
inside Arrow-batched ``mapInPandas``; PackBits/LZW inner loops are
per-run (not per-byte numpy scalar), strip assembly is a single
concatenation.
"""

from __future__ import annotations

import struct

import numpy as np

from .imagecodec import DecodedImage, ImageDecodeError

# tag ids
_WIDTH, _HEIGHT = 256, 257
_BITS, _COMPRESSION, _PHOTOMETRIC = 258, 259, 262
_STRIP_OFFSETS, _SPP, _ROWS_PER_STRIP, _STRIP_COUNTS = 273, 277, 278, 279
_PLANAR, _PREDICTOR, _COLORMAP = 284, 317, 320
_TILE_W, _TILE_H = 322, 323

_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 6: 1, 7: 1, 8: 2, 9: 4, 11: 4,
              12: 8, 5: 8, 10: 8}


def _read_ifd_values(b, e, typ, count, payload):
    """Decode an IFD entry's values (inline or offset-indirect)."""
    size = _TYPE_SIZE.get(typ)
    if size is None:
        return None
    total = size * count
    if total <= 4:
        raw = payload[:total]
    else:
        (off,) = struct.unpack(e + "I", payload)
        raw = b[off : off + total]
        if len(raw) < total:
            raise ImageDecodeError("TIFF value offset out of range")
    if typ in (1, 6, 7):
        return list(raw)
    if typ in (3, 8):
        return list(struct.unpack(e + f"{count}H", raw))
    if typ in (4, 9):
        return list(struct.unpack(e + f"{count}I", raw))
    return None  # rationals/floats unused by the supported tags


def _unpackbits(data: bytes, expected: int) -> bytes:
    """Apple PackBits: n >= 0 -> copy n+1 literal bytes; n in
    [-127, -1] -> repeat next byte 1-n times; -128 is a no-op."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n and len(out) < expected:
        ctl = data[i]
        i += 1
        if ctl < 128:
            out += data[i : i + ctl + 1]
            i += ctl + 1
        elif ctl > 128:
            if i >= n:
                raise ImageDecodeError("truncated PackBits run")
            out += bytes([data[i]]) * (257 - ctl)
            i += 1
        # 128: no-op
    if len(out) < expected:
        raise ImageDecodeError("truncated PackBits strip")
    return bytes(out[:expected])


def _tiff_lzw(data: bytes, expected: int) -> bytes:
    """TIFF-flavour LZW (MSB-first codes, ClearCode 256, EOI 257,
    early-change code-width bumps — note this differs from GIF's
    LSB-first variable-width LZW)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []

    def reset():
        nonlocal table, width, nxt
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        nxt = 258

    width = 9
    nxt = 258
    reset()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (acc >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == CLEAR:
                reset()
                prev = None
                continue
            if code == EOI:
                if len(out) < expected:
                    raise ImageDecodeError("truncated LZW strip")
                return bytes(out[:expected])
            if prev is None:
                if code >= len(table):
                    raise ImageDecodeError("bad initial LZW code")
                entry = table[code]
            elif code < nxt:
                entry = table[code]
                table.append(prev + entry[:1])
                nxt += 1
            elif code == nxt:
                entry = prev + prev[:1]
                table.append(entry)
                nxt += 1
            else:
                raise ImageDecodeError("LZW code out of range")
            out += entry
            prev = entry
            # TIFF's "early change": width bumps one code EARLY
            if nxt + 1 >= (1 << width) and width < 12:
                width += 1
            if len(out) >= expected:
                return bytes(out[:expected])
    if len(out) < expected:
        raise ImageDecodeError("truncated LZW strip")
    return bytes(out[:expected])


def decode_tiff(b: bytes) -> DecodedImage:
    """Decode the FIRST IFD of a classic TIFF to
    :class:`DecodedImage`."""
    if b is None or len(b) < 8:
        raise ImageDecodeError("not a TIFF (too short)")
    b = bytes(b)
    if b[:4] == b"II*\x00":
        e = "<"
    elif b[:4] == b"MM\x00*":
        e = ">"
    else:
        raise ImageDecodeError("not a TIFF (bad magic)")
    (ifd_off,) = struct.unpack(e + "I", b[4:8])
    if ifd_off + 2 > len(b):
        raise ImageDecodeError("TIFF IFD offset out of range")
    (n_entries,) = struct.unpack(e + "H", b[ifd_off : ifd_off + 2])
    tags: dict[int, list[int]] = {}
    for k in range(n_entries):
        ent = b[ifd_off + 2 + 12 * k : ifd_off + 14 + 12 * k]
        if len(ent) < 12:
            raise ImageDecodeError("truncated TIFF IFD")
        tag, typ, count = struct.unpack(e + "HHI", ent[:8])
        vals = _read_ifd_values(b, e, typ, count, ent[8:12])
        if vals:
            # A count=0 entry decodes to [] — treat it as absent so the
            # defaulted tags.get(...)[0] reads never hit an empty list.
            tags[tag] = vals
    if _TILE_W in tags or _TILE_H in tags:
        raise ImageDecodeError("tiled TIFF is not supported (strips only)")
    try:
        w = tags[_WIDTH][0]
        h = tags[_HEIGHT][0]
        offsets = tags[_STRIP_OFFSETS]
        counts = tags[_STRIP_COUNTS]
        photo = tags[_PHOTOMETRIC][0]
    except KeyError as exc:
        raise ImageDecodeError(f"TIFF missing required tag {exc}") from exc
    spp = tags.get(_SPP, [1])[0]
    bits = tags.get(_BITS, [8] * spp)
    comp = tags.get(_COMPRESSION, [1])[0]
    planar = tags.get(_PLANAR, [1])[0]
    predictor = tags.get(_PREDICTOR, [1])[0]
    rows_per_strip = tags.get(_ROWS_PER_STRIP, [h])[0]
    if planar != 1:
        raise ImageDecodeError("planar TIFF (separate planes) unsupported")
    if any(bd != 8 for bd in bits):
        raise ImageDecodeError(f"unsupported TIFF bit depths {bits}")
    if w < 1 or h < 1 or spp < 1 or spp > 4:
        raise ImageDecodeError(f"bad TIFF geometry {w}x{h}x{spp}")
    if len(offsets) != len(counts):
        raise ImageDecodeError("strip offsets/counts length mismatch")
    row_bytes = w * spp
    data = bytearray()
    remaining_rows = h
    for off, cnt in zip(offsets, counts):
        strip_rows = min(rows_per_strip, remaining_rows)
        remaining_rows -= strip_rows
        expected = strip_rows * row_bytes
        raw = b[off : off + cnt]
        if len(raw) < cnt:
            raise ImageDecodeError("TIFF strip out of range")
        if comp == 1:
            if len(raw) < expected:
                raise ImageDecodeError("truncated uncompressed strip")
            strip = raw[:expected]
        elif comp == 32773:
            strip = _unpackbits(raw, expected)
        elif comp == 5:
            strip = _tiff_lzw(raw, expected)
        else:
            raise ImageDecodeError(
                f"unsupported TIFF compression {comp} (1/5/32773 only)"
            )
        data += strip
    if remaining_rows > 0:
        raise ImageDecodeError("TIFF strips cover fewer rows than height")
    px = np.frombuffer(bytes(data), dtype=np.uint8).reshape(h, w, spp)
    if predictor == 2:
        # horizontal differencing: per-row per-channel cumsum mod 256
        px = (np.cumsum(px.astype(np.int64), axis=1) % 256).astype(np.uint8)
    elif predictor != 1:
        raise ImageDecodeError(f"unsupported TIFF predictor {predictor}")
    if photo == 0:  # MinIsWhite: invert to the canonical MinIsBlack
        if spp != 1:
            raise ImageDecodeError("MinIsWhite with multiple samples")
        return DecodedImage(w, h, 1, (255 - px[:, :, 0]).tobytes())
    if photo == 1:  # MinIsBlack gray (extra samples -> gray+alpha)
        ch = min(spp, 2)
        return DecodedImage(
            w, h, ch, np.ascontiguousarray(px[:, :, :ch]).tobytes()
        )
    if photo == 2:  # RGB(A)
        if spp < 3:
            raise ImageDecodeError("RGB TIFF with fewer than 3 samples")
        ch = min(spp, 4)
        return DecodedImage(
            w, h, ch, np.ascontiguousarray(px[:, :, :ch]).tobytes()
        )
    if photo == 3:  # palette: 16-bit colormap, 3*2^bits entries
        cmap = tags.get(_COLORMAP)
        if not cmap or len(cmap) < 3 * 256 or spp != 1:
            raise ImageDecodeError("palette TIFF missing/short ColorMap")
        cm = np.array(cmap[: 3 * 256], dtype=np.uint16).reshape(3, 256)
        lut = (cm >> 8).astype(np.uint8).T  # (256, 3), high byte
        rgb = lut[px[:, :, 0]]
        return DecodedImage(w, h, 3, np.ascontiguousarray(rgb).tobytes())
    raise ImageDecodeError(f"unsupported TIFF photometric {photo}")


def encode_tiff(
    img: DecodedImage,
    compression: str = "none",
    rows_per_strip: int = 16,
    big_endian: bool = False,
) -> bytes:
    """Write classic TIFF, strip-based, 8-bit samples; ``compression``
    "none" or "packbits". Lossless, so decode(encode(x)) == x exactly
    — the test oracle."""
    if compression not in ("none", "packbits"):
        raise ImageDecodeError(f"unsupported compression {compression!r}")
    e = ">" if big_endian else "<"
    w, h, ch = img.width, img.height, img.channels
    row_bytes = w * ch
    arr = np.frombuffer(img.pixels, dtype=np.uint8).reshape(h, row_bytes)
    strips = []
    for y0 in range(0, h, rows_per_strip):
        chunk = arr[y0 : y0 + rows_per_strip].tobytes()
        if compression == "packbits":
            chunk = _packbits_encode(chunk)
        strips.append(chunk)
    photo = 1 if ch <= 2 else 2
    comp = 1 if compression == "none" else 32773
    # layout: header(8) | IFD | values | strip data
    tags = [
        (_WIDTH, 4, 1, [w]),
        (_HEIGHT, 4, 1, [h]),
        (_BITS, 3, ch, [8] * ch),
        (_COMPRESSION, 3, 1, [comp]),
        (_PHOTOMETRIC, 3, 1, [photo]),
        (_STRIP_OFFSETS, 4, len(strips), None),  # filled below
        (_SPP, 3, 1, [ch]),
        (_ROWS_PER_STRIP, 4, 1, [rows_per_strip]),
        (_STRIP_COUNTS, 4, len(strips), [len(s) for s in strips]),
    ]
    ifd_off = 8
    ifd_size = 2 + 12 * len(tags) + 4
    extra_off = ifd_off + ifd_size
    extra = bytearray()

    def encode_vals(typ, vals):
        fmt = {3: "H", 4: "I", 1: "B"}[typ]
        return struct.pack(e + f"{len(vals)}{fmt}", *vals)

    # reserve space for overflow values, two passes: first compute
    # where strip data begins
    entries = []
    pending = []
    for tag, typ, count, vals in tags:
        if vals is None:
            pending.append((tag, typ, count))
            entries.append(None)
            continue
        enc = encode_vals(typ, vals)
        if len(enc) <= 4:
            entries.append(
                struct.pack(e + "HHI", tag, typ, count) + enc.ljust(4, b"\0")
            )
        else:
            entries.append(
                struct.pack(e + "HHII", tag, typ, count,
                            extra_off + len(extra))
            )
            extra += enc
    # strip offsets go after extra values (reserve room for the
    # offsets array itself if it overflows 4 bytes)
    off_count = len(strips)
    off_bytes = 4 * off_count
    off_value_pos = extra_off + len(extra)
    data_start = off_value_pos + (off_bytes if off_bytes > 4 else 0)
    offsets = []
    pos = data_start
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    enc = encode_vals(4, offsets)
    oi = entries.index(None)
    if len(enc) <= 4:
        entries[oi] = (
            struct.pack(e + "HHI", _STRIP_OFFSETS, 4, off_count)
            + enc.ljust(4, b"\0")
        )
    else:
        entries[oi] = struct.pack(
            e + "HHII", _STRIP_OFFSETS, 4, off_count, off_value_pos
        )
        extra += enc
    out = bytearray()
    out += (b"MM\x00*" if big_endian else b"II*\x00")
    out += struct.pack(e + "I", ifd_off)
    out += struct.pack(e + "H", len(entries))
    for ent in sorted(entries, key=lambda x: struct.unpack(e + "H", x[:2])):
        out += ent
    out += struct.pack(e + "I", 0)  # no next IFD
    out += extra
    for s in strips:
        out += s
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    """Greedy PackBits writer (runs of >= 3 become repeats)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # find run length at i
        j = i
        while j + 1 < n and data[j + 1] == data[i] and j - i < 127:
            j += 1
        run = j - i + 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i = j + 1
            continue
        # literal stretch: until a run of >= 3 starts or 128 bytes
        k = i
        while k < n and k - i < 128:
            if k + 2 < n and data[k] == data[k + 1] == data[k + 2]:
                break
            k += 1
        out += bytes([k - i - 1]) + data[i:k]
        i = k
    return bytes(out)


__all__ = ["decode_tiff", "encode_tiff"]
