"""Pure-stdlib baseline JPEG codec (r7 — VERDICT r6 item 1: the last
"requires a library the container doesn't have" leaf).

Decoder: **baseline sequential** JPEG/JFIF (SOF0, plus SOF1 extended
sequential — identical decode path) AND **progressive** (SOF2, r7:
spectral selection + successive approximation, DC/AC first and
refinement scans, arbitrary EOBn runs) — together the formats
virtually every camera/web JPEG uses: DQT (8/16-bit precision), DHT
canonical Huffman tables, DRI/RSTn restart intervals, byte-stuffing,
any Hx x Vy chroma subsampling (4:4:4 / 4:2:2 / 4:4:0 / 4:2:0 /
...), grayscale or YCbCr->RGB (JFIF full-range BT.601). Arithmetic
coding, hierarchical, 12-bit, and CMYK streams are rejected loudly —
decoding those wrong would be worse than not decoding them.

Encoders: baseline SOF0 writer and progressive SOF2 writer (Annex K
quant tables scaled by the libjpeg quality formula, Annex K Huffman
tables, optional 4:2:0 and restart intervals; the progressive writer
caps EOBRUN at one block so the Annex K symbol set suffices — the
decoder accepts arbitrary EOBn). They exist for two jobs: (a)
producing real JPEG bytes in codec-less environments, (b) serving as
the test-vector source — and because BOTH writers emit the same
quantized coefficients, a correct decoder must produce BIT-IDENTICAL
pixels for the two encodings of any image, which is the progressive
oracle (entropy layers are completely different code paths, so the
equality convicts either side's bugs).

Scale posture: identical to imagecodec.py — this code runs one blob
at a time inside Arrow-batched ``mapInPandas`` kernels. The entropy
decode is an irreducibly sequential bit loop (interpreter-speed —
PIL, when importable, replaces all of this via decode_image_bytes);
everything after it (dequantize, dezigzag, IDCT, upsample, color
convert) is batched numpy over ALL blocks of a component at once, so
the pixel-math half runs at BLAS speed even on the fallback path.
"""

from __future__ import annotations

import struct

import numpy as np

from .imagecodec import DecodedImage, ImageDecodeError

# zigzag scan: position in the stream -> natural (row-major) index
ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)

# ITU T.81 Annex K reference quantization tables (natural order)
QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
QUANT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Annex K Huffman specs: (BITS[1..16], HUFFVAL)
HUFF_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_DC_CHROM = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
HUFF_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
HUFF_AC_CHROM = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _dct_matrix() -> np.ndarray:
    """8x8 DCT-II basis C with C[u,x] = a(u)/2 * cos((2x+1)u*pi/16):
    forward DCT of block B is C @ B @ C.T, inverse is C.T @ B @ C."""
    C = np.zeros((8, 8), dtype=np.float64)
    for u in range(8):
        a = np.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            C[u, x] = a * np.cos((2 * x + 1) * u * np.pi / 16)
    return C


_DCT = _dct_matrix()


# --------------------------------------------------------------------------
# Huffman tables (canonical, ITU T.81 Annex C)


def _canonical_codes(bits: list[int], huffval: list[int]):
    """(code, length) per symbol in HUFFVAL order."""
    if len(bits) != 16 or sum(bits) != len(huffval):
        raise ImageDecodeError("malformed Huffman table spec")
    codes = []
    code = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            if code >= (1 << ln):
                raise ImageDecodeError("Huffman code overflow (bad DHT)")
            codes.append((code, ln))
            code += 1
        code <<= 1
    return codes


class _HuffDecoder:
    """The spec's DECODE procedure: per-length mincode/maxcode/valptr."""

    __slots__ = ("mincode", "maxcode", "valptr", "huffval")

    def __init__(self, bits: list[int], huffval: list[int]):
        _canonical_codes(bits, huffval)  # validity check
        self.huffval = huffval
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code = 0
        k = 0
        for ln in range(1, 17):
            if bits[ln - 1]:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += bits[ln - 1]
                k += bits[ln - 1]
                self.maxcode[ln] = code - 1
            code <<= 1


class _BitReader:
    """MSB-first reader over a destuffed entropy segment."""

    __slots__ = ("buf", "pos", "nbits")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0
        self.nbits = 8 * len(buf)

    def read_bit(self) -> int:
        p = self.pos
        if p >= self.nbits:
            raise ImageDecodeError("truncated entropy-coded data")
        self.pos = p + 1
        return (self.buf[p >> 3] >> (7 - (p & 7))) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: _HuffDecoder) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read_bit()
            if code <= table.maxcode[ln]:
                return table.huffval[
                    table.valptr[ln] + code - table.mincode[ln]
                ]
        raise ImageDecodeError("invalid Huffman code in entropy data")


def _extend(v: int, t: int) -> int:
    """EXTEND (T.81 F.2.2.1): map a t-bit magnitude to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# --------------------------------------------------------------------------
# decoder


class _Component:
    __slots__ = (
        "cid", "h", "v", "qid", "dc", "ac", "coefs", "bx", "by",
        "nbx", "nby", "pred",
    )

    def __init__(self, cid, h, v, qid):
        self.cid, self.h, self.v, self.qid = cid, h, v, qid
        self.dc = self.ac = None
        self.coefs = None  # (by, bx, 64) int32, zigzag order per block
        self.bx = self.by = 0  # MCU-padded block grid (interleaved)
        self.nbx = self.nby = 0  # true block grid (non-interleaved)
        self.pred = 0


def _split_entropy(b: bytes, i: int):
    """Destuff + split the scan's entropy data at RSTn markers.
    Returns (segments, index of the terminating marker's 0xFF)."""
    segs: list[bytes] = []
    cur = bytearray()
    n = len(b)
    while i < n - 1:
        c = b[i]
        if c != 0xFF:
            cur.append(c)
            i += 1
            continue
        m = b[i + 1]
        if m == 0x00:  # stuffed literal 0xFF
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # EOI or next real marker ends the scan
            segs.append(bytes(cur))
            return segs, i
    segs.append(bytes(cur))
    return segs, n


def decode_jpeg(b: bytes) -> DecodedImage:
    """Decode a baseline-sequential (SOF0/SOF1) or progressive (SOF2,
    r7: spectral selection + successive approximation, DC and AC
    first/refinement scans, per-scan restart intervals, arbitrary
    EOBn runs) JPEG to :class:`DecodedImage` (grayscale stays 1
    channel; YCbCr converts to RGB). Arithmetic-coded, hierarchical,
    12-bit and CMYK streams still reject loudly."""
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        raise ImageDecodeError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}  # (class, id)
    comps: list[_Component] = []
    w = h = 0
    restart = 0
    i = 2
    n = len(b)
    saw_frame = False
    saw_scan = False
    progressive = False
    while i < n:
        if b[i] != 0xFF:
            raise ImageDecodeError(f"expected marker at byte {i}")
        # spec-legal 0xFF fill bytes may pad before any marker
        # (T.81 B.1.1.2) — skip them (r7 review fix)
        while i + 1 < n and b[i + 1] == 0xFF:
            i += 1
        m = b[i + 1] if i + 1 < n else 0
        i += 2
        if m == 0xD8:  # stray SOI
            continue
        if m == 0xD9:  # EOI
            break
        if m == 0x01 or 0xD0 <= m <= 0xD7:  # TEM / stray RST
            continue
        if i + 2 > n:
            raise ImageDecodeError("truncated marker segment")
        (ln,) = struct.unpack(">H", b[i : i + 2])
        if ln < 2:
            raise ImageDecodeError("bad marker segment length")
        seg = b[i + 2 : i + ln]
        if len(seg) != ln - 2:
            raise ImageDecodeError("truncated marker segment")
        if m == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                j += 1
                if pq == 0:
                    tbl = np.frombuffer(
                        seg[j : j + 64], dtype=np.uint8
                    ).astype(np.int32)
                    j += 64
                elif pq == 1:
                    raw16 = seg[j : j + 128]
                    tbl = np.frombuffer(
                        raw16[: len(raw16) - (len(raw16) % 2)],
                        dtype=">u2",
                    ).astype(np.int32)
                    j += 128
                else:
                    raise ImageDecodeError(f"bad DQT precision {pq}")
                if len(tbl) != 64:
                    raise ImageDecodeError("truncated DQT")
                qt[tq] = tbl  # zigzag order as transmitted
        elif m == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1 : j + 17])
                cnt = sum(bits)
                vals = list(seg[j + 17 : j + 17 + cnt])
                if len(bits) != 16 or len(vals) != cnt:
                    raise ImageDecodeError("truncated DHT")
                huff[(tc, th)] = _HuffDecoder(bits, vals)
                j += 17 + cnt
        elif m == 0xDD:  # DRI
            if len(seg) < 2:
                raise ImageDecodeError("truncated DRI segment")
            (restart,) = struct.unpack(">H", seg[:2])
        elif m in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 prog.
            if saw_frame:
                raise ImageDecodeError("multiple SOF markers")
            saw_frame = True
            progressive = m == 0xC2
            if len(seg) < 6:
                raise ImageDecodeError("truncated SOF segment")
            prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ImageDecodeError(f"unsupported precision {prec}")
            if w == 0 or h == 0:
                raise ImageDecodeError("zero image dimension")
            if nc not in (1, 3):
                raise ImageDecodeError(
                    f"unsupported component count {nc} (CMYK?)"
                )
            if len(seg) < 6 + 3 * nc:
                raise ImageDecodeError("truncated SOF component list")
            for k in range(nc):
                cid, hv, tq = seg[6 + 3 * k : 9 + 3 * k]
                hs, vs = hv >> 4, hv & 0x0F
                if not (1 <= hs <= 4 and 1 <= vs <= 4):
                    raise ImageDecodeError(f"bad sampling factors {hs}x{vs}")
                comps.append(_Component(cid, hs, vs, tq))
            hmax_c = max(c.h for c in comps)
            vmax_c = max(c.v for c in comps)
            for c in comps:
                # the replicate-upsampler needs integer ratios; a
                # spec-legal but non-divisor mix (e.g. H of 3,2,1)
                # would otherwise crash in assembly (r7 review fix)
                if hmax_c % c.h or vmax_c % c.v:
                    raise ImageDecodeError(
                        f"non-integer subsampling ratio "
                        f"({c.h}x{c.v} vs max {hmax_c}x{vmax_c}) "
                        "is not supported"
                    )
            # allocate per-component coefficient grids (MCU-padded
            # for interleaved scans; non-interleaved scans address
            # the true ceil(cw/8) x ceil(ch/8) sub-grid)
            hmax = max(c.h for c in comps)
            vmax = max(c.v for c in comps)
            mcus_x = -(-w // (8 * hmax))
            mcus_y = -(-h // (8 * vmax))
            for c in comps:
                c.bx, c.by = mcus_x * c.h, mcus_y * c.v
                cw = -(-w * c.h // hmax)
                ch_ = -(-h * c.v // vmax)
                c.nbx, c.nby = -(-cw // 8), -(-ch_ // 8)
                c.coefs = np.zeros((c.by, c.bx, 64), dtype=np.int32)
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                   0xCE, 0xCF):
            raise ImageDecodeError(
                f"unsupported JPEG coding process (SOF marker 0x{m:02X})"
            )
        elif m == 0xDA:  # SOS
            if not saw_frame:
                raise ImageDecodeError("SOS before SOF")
            if len(seg) < 1:
                raise ImageDecodeError("truncated SOS segment")
            ns = seg[0]
            if len(seg) < 4 + 2 * ns:
                raise ImageDecodeError("truncated SOS segment")
            if not progressive and ns != len(comps):
                raise ImageDecodeError(
                    "partial scans in a sequential frame are not baseline"
                )
            scan: list[_Component] = []
            for k in range(ns):
                cs, tt = seg[1 + 2 * k], seg[2 + 2 * k]
                comp = next((c for c in comps if c.cid == cs), None)
                if comp is None:
                    raise ImageDecodeError(f"SOS references unknown id {cs}")
                comp.dc = huff.get((0, tt >> 4))
                comp.ac = huff.get((1, tt & 0x0F))
                scan.append(comp)
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            segs, i = _split_entropy(b, i + ln)
            if not progressive:
                for c in scan:
                    if c.dc is None or c.ac is None:
                        raise ImageDecodeError("SOS references missing DHT")
                _decode_scan(scan, segs, w, h, restart)
                # baseline: one scan; everything after is EOI/trailer
                return _assemble(comps, qt, w, h)
            _decode_progressive_scan(
                comps, scan, segs, restart, ss, se, ah, al
            )
            saw_scan = True
            continue  # i already points at the terminating marker
        # APPn / COM / anything else: skip
        i += ln
    if saw_frame and progressive and saw_scan:
        return _assemble(comps, qt, w, h)
    raise ImageDecodeError("no SOS marker (no image data)")


def _decode_scan(
    scan: list[_Component], segs: list[bytes], w: int, h: int, restart: int
) -> None:
    """Entropy-decode every MCU of a SEQUENTIAL frame into the
    per-component coefficient grids; restart boundaries reset DC
    predictors."""
    hmax = max(c.h for c in scan)
    vmax = max(c.v for c in scan)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    total = mcus_x * mcus_y
    per_seg = restart if restart else total
    done = 0
    seg_idx = 0
    reader = None
    for mi in range(total):
        if done % per_seg == 0:
            if seg_idx >= len(segs):
                raise ImageDecodeError("missing restart segment")
            reader = _BitReader(segs[seg_idx])
            seg_idx += 1
            for c in scan:
                c.pred = 0
        my, mx = divmod(mi, mcus_x)
        for c in scan:
            for vv in range(c.v):
                for hh in range(c.h):
                    coef = c.coefs[my * c.v + vv, mx * c.h + hh]
                    t = reader.decode(c.dc)
                    if t > 11:
                        raise ImageDecodeError(
                            f"bad DC magnitude category {t}"
                        )
                    diff = _extend(reader.read_bits(t), t)
                    c.pred += diff
                    coef[0] = c.pred
                    k = 1
                    while k < 64:
                        rs = reader.decode(c.ac)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:  # ZRL: sixteen zeros
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ImageDecodeError("AC run past block end")
                        coef[k] = _extend(reader.read_bits(s), s)
                        k += 1
        done += 1


def _decode_progressive_scan(
    comps: list[_Component],
    scan: list[_Component],
    segs: list[bytes],
    restart: int,
    ss: int,
    se: int,
    ah: int,
    al: int,
) -> None:
    """One progressive scan (T.81 Annex G): DC scans (Ss=0, possibly
    interleaved) deliver the DC coefficient's high bits (Ah=0, point
    transform Al) or one refinement bit per block (Ah>0); AC scans
    (single component only, per spec) deliver a spectral band
    [Ss..Se] with EOBn run-length coding, then refinement bits."""
    if ss == 0:
        if se != 0:
            raise ImageDecodeError("progressive DC scan must have Se=0")
        dc_first = ah == 0
        for c in scan:
            if dc_first and c.dc is None:
                raise ImageDecodeError("DC scan references missing DHT")
        # interleaved MCU walk over the scan's components (a 1-comp
        # DC scan is the degenerate interleave)
        if len(scan) > 1:
            mcus_x = max(c.bx // c.h for c in scan)
            mcus_y = max(c.by // c.v for c in scan)
            units = [(c, c.h, c.v) for c in scan]
        else:
            c = scan[0]
            # non-interleaved: true block grid, one block per "MCU"
            mcus_x, mcus_y = c.nbx, c.nby
            units = [(c, 1, 1)]
        total = mcus_x * mcus_y
        per_seg = restart if restart else total
        seg_idx = 0
        reader = None
        for mi in range(total):
            if mi % per_seg == 0:
                if seg_idx >= len(segs):
                    raise ImageDecodeError("missing restart segment")
                reader = _BitReader(segs[seg_idx])
                seg_idx += 1
                for c, _, _ in units:
                    c.pred = 0
            my, mx = divmod(mi, mcus_x)
            for c, hs, vs in units:
                for vv in range(vs):
                    for hh in range(hs):
                        by = my * vs + vv if len(scan) > 1 else my
                        bx = mx * hs + hh if len(scan) > 1 else mx
                        coef = c.coefs[by, bx]
                        if dc_first:
                            t = reader.decode(c.dc)
                            if t > 11:
                                raise ImageDecodeError(
                                    f"bad DC category {t}"
                                )
                            diff = _extend(reader.read_bits(t), t)
                            c.pred += diff
                            coef[0] = c.pred << al
                        else:
                            if reader.read_bit():
                                coef[0] = int(coef[0]) | (1 << al)
        return
    # AC scan: exactly one component, non-interleaved
    if len(scan) != 1:
        raise ImageDecodeError("progressive AC scan must be 1 component")
    c = scan[0]
    if c.ac is None:
        raise ImageDecodeError("AC scan references missing DHT")
    if not (1 <= ss <= se <= 63):
        raise ImageDecodeError(f"bad spectral band {ss}..{se}")
    total = c.nbx * c.nby
    per_seg = restart if restart else total
    seg_idx = 0
    reader = None
    eobrun = 0
    p1 = 1 << al
    m1 = -p1
    for mi in range(total):
        if mi % per_seg == 0:
            if seg_idx >= len(segs):
                raise ImageDecodeError("missing restart segment")
            reader = _BitReader(segs[seg_idx])
            seg_idx += 1
            eobrun = 0
        by, bx = divmod(mi, c.nbx)
        coef = c.coefs[by, bx]
        if ah == 0:  # AC first scan
            if eobrun > 0:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                rs = reader.decode(c.ac)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r == 15:
                        k += 16
                        continue
                    eobrun = (1 << r) - 1 + reader.read_bits(r)
                    break
                k += r
                if k > se:
                    raise ImageDecodeError("AC run past band end")
                coef[k] = _extend(reader.read_bits(s), s) << al
                k += 1
        else:  # AC refinement scan (T.81 G.1.2.3 / libjpeg shape)
            k = ss
            if eobrun == 0:
                while k <= se:
                    rs = reader.decode(c.ac)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r < 15:
                            eobrun = (1 << r) + reader.read_bits(r)
                            break
                        s_val = 0  # ZRL: skip 16 zero-history coeffs
                    else:
                        if s != 1:
                            raise ImageDecodeError(
                                "AC refinement magnitude must be 1"
                            )
                        s_val = p1 if reader.read_bit() else m1
                    # advance past r zero-history positions, emitting
                    # correction bits for nonzero-history ones en route
                    while k <= se:
                        cv = int(coef[k])
                        if cv != 0:
                            if reader.read_bit() and (cv & p1) == 0:
                                coef[k] = cv + (p1 if cv >= 0 else m1)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if s_val and k <= se:
                        coef[k] = s_val
                    k += 1
            if eobrun > 0:
                # EOB band: correction bits only, for the rest of the
                # band, on every nonzero-history coefficient
                while k <= se:
                    cv = int(coef[k])
                    if cv != 0:
                        if reader.read_bit() and (cv & p1) == 0:
                            coef[k] = cv + (p1 if cv >= 0 else m1)
                    k += 1
                eobrun -= 1


def _assemble(
    comps: list[_Component], qt: dict[int, np.ndarray], w: int, h: int
) -> DecodedImage:
    """Dequantize + IDCT every block of every component as ONE batched
    numpy op, paste into MCU-padded planes, crop, upsample, convert."""
    hmax = max(c.h for c in comps)
    vmax = max(c.v for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = []
    inv_zig = np.argsort(np.array(ZIGZAG))  # natural -> zigzag position
    for c in comps:
        if c.qid not in qt:
            raise ImageDecodeError(f"missing quant table {c.qid}")
        q = qt[c.qid].astype(np.float64)  # zigzag order
        bx, by = mcus_x * c.h, mcus_y * c.v
        if c.coefs is None or c.coefs.shape != (by, bx, 64):
            raise ImageDecodeError("coefficient grid mismatch in scan")
        Z = c.coefs.reshape(-1, 64).astype(np.float64) * q  # zigzag
        N = Z[:, inv_zig].reshape(-1, 8, 8)  # natural order
        # batched IDCT: C.T @ B @ C for every block
        px = np.einsum("ux,nuv,vy->nxy", _DCT, N, _DCT) + 128.0
        px = np.clip(np.rint(px), 0, 255).astype(np.uint8)
        # blocks sit in raster grid order: one reshape/transpose pastes
        # the whole padded plane
        plane = (
            px.reshape(by, bx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(by * 8, bx * 8)
        )
        # crop to the component's true size, then replicate to full res
        cw = -(-w * c.h // hmax)
        ch = -(-h * c.v // vmax)
        plane = plane[:ch, :cw]
        plane = np.repeat(
            np.repeat(plane, hmax // c.h, axis=1), vmax // c.v, axis=0
        )[:h, :w]
        planes.append(plane.astype(np.float64))
    if len(planes) == 1:
        return DecodedImage(
            w, h, 1, np.ascontiguousarray(planes[0].astype(np.uint8)).tobytes()
        )
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    rgb = np.stack(
        [np.clip(np.rint(ch_), 0, 255) for ch_ in (r, g, bl)], axis=-1
    ).astype(np.uint8)
    return DecodedImage(w, h, 3, np.ascontiguousarray(rgb).tobytes())


# --------------------------------------------------------------------------
# encoder


class _BitWriter:
    __slots__ = ("out", "acc", "nacc")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, code: int, length: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nacc += length
        while self.nacc >= 8:
            byte = (self.acc >> (self.nacc - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nacc -= 8
        self.acc &= (1 << self.nacc) - 1

    def flush(self) -> None:
        if self.nacc:
            self.write(0x7F, 8 - self.nacc)  # pad with 1s per spec


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _encode_block(
    wtr: _BitWriter, coef_zig: np.ndarray, pred: int, dc_codes, ac_codes
) -> int:
    """Huffman-encode one zigzag-ordered quantized block; returns the
    new DC predictor."""
    dc = int(coef_zig[0])
    diff = dc - pred
    mag = abs(diff)
    t = mag.bit_length()
    code, ln = dc_codes[t]
    wtr.write(code, ln)
    if t:
        wtr.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last_nz = 0
    nz = np.nonzero(coef_zig[1:])[0]
    last_nz = int(nz[-1]) + 1 if len(nz) else 0
    for k in range(1, last_nz + 1):
        v = int(coef_zig[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            wtr.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        code, ln = ac_codes[(run << 4) | s]
        wtr.write(code, ln)
        wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        wtr.write(code, ln)
    return dc


def _code_map(spec) -> dict[int, tuple[int, int]]:
    bits, vals = spec
    return {
        v: cl for v, cl in zip(vals, _canonical_codes(bits, vals))
    }


def _component_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) float plane (already level-shifted) -> (n, 64) zigzag
    quantizable DCT coefficients via one batched einsum. H, W must be
    multiples of 8."""
    H, W = plane.shape
    blocks = (
        plane.reshape(H // 8, 8, W // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )
    co = np.einsum("ux,nxy,vy->nuv", _DCT, blocks, _DCT)
    return co.reshape(-1, 64)[:, np.array(ZIGZAG)]


def _pad_to(plane: np.ndarray, H: int, W: int) -> np.ndarray:
    return np.pad(
        plane,
        ((0, H - plane.shape[0]), (0, W - plane.shape[1])),
        mode="edge",
    )


def _encode_prep(img: DecodedImage, quality: int, subsampling: str):
    """Shared encoder front half: color transform, optional chroma
    subsampling, per-component quantized zigzag block grids. Returns
    (w, h, gray, samp, qids, q_lum, q_chrom, comp_blocks) where
    comp_blocks[k] = ((by, bx, 64) int32 grid, hs, vs)."""
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ImageDecodeError(f"unsupported subsampling {subsampling!r}")
    arr = np.frombuffer(img.pixels, dtype=np.uint8).reshape(
        img.height, img.width, img.channels
    ).astype(np.float64)
    w, h = img.width, img.height
    gray = img.channels <= 2
    q_lum = _scaled_quant(QUANT_LUM, quality)
    q_chrom = _scaled_quant(QUANT_CHROM, quality)
    zig = np.array(ZIGZAG)
    if gray:
        planes = [arr[:, :, 0]]
        samp = [(1, 1)]
        qids = [0]
        qtables = [q_lum]
    else:
        r, g, bch = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * bch
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * bch
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * bch
        if subsampling == "4:2:0":
            # pad to even dims, then 2x2 box average
            cb2 = _pad_to(cb, (h + 1) & ~1, (w + 1) & ~1)
            cr2 = _pad_to(cr, (h + 1) & ~1, (w + 1) & ~1)
            cb = cb2.reshape(cb2.shape[0] // 2, 2, -1, 2).mean(axis=(1, 3))
            cr = cr2.reshape(cr2.shape[0] // 2, 2, -1, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qids = [0, 1, 1]
        qtables = [q_lum, q_chrom, q_chrom]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    comp_blocks = []
    for plane, (hs, vs), qtab in zip(planes, samp, qtables):
        bx, by = mcus_x * hs, mcus_y * vs
        padded = _pad_to(plane, by * 8, bx * 8) - 128.0
        co = _component_blocks(padded)
        qz = np.rint(co / qtab[zig].astype(np.float64)).astype(np.int32)
        comp_blocks.append((qz.reshape(by, bx, 64), hs, vs))
    return w, h, gray, samp, qids, q_lum, q_chrom, comp_blocks


def _encode_headers(
    w, h, gray, samp, qids, q_lum, q_chrom, sof_marker, restart_interval
) -> bytearray:
    """SOI + JFIF + DQT + SOF + DHT (+ DRI) — everything up to the
    first SOS, shared by the baseline and progressive writers."""
    zig = np.array(ZIGZAG)
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(
        ">H", 16
    ) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    # DQT (zigzag order on the wire)
    for tq, tab in ([(0, q_lum)] if gray else [(0, q_lum), (1, q_chrom)]):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq)
        out += bytes(int(tab[zi]) for zi in zig)
    nc = 1 if gray else 3
    out += bytes([0xFF, sof_marker]) + struct.pack(
        ">HBHHB", 8 + 3 * nc, 8, h, w, nc
    )
    for k in range(nc):
        hs, vs = samp[k]
        out += bytes([k + 1, (hs << 4) | vs, qids[k]])
    specs = [(0x00, HUFF_DC_LUM), (0x10, HUFF_AC_LUM)]
    if not gray:
        specs += [(0x01, HUFF_DC_CHROM), (0x11, HUFF_AC_CHROM)]
    for tcth, (bits, vals) in specs:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), tcth)
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    return out


def encode_jpeg(
    img: DecodedImage,
    quality: int = 90,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """Encode to baseline JFIF. Gray (1/2ch: alpha dropped) writes a
    single-component stream; RGB(A) writes YCbCr with ``subsampling``
    "4:4:4" or "4:2:0". Annex K quant tables scaled by the standard
    quality formula; Annex K Huffman tables (unoptimized)."""
    w, h, gray, samp, qids, q_lum, q_chrom, comp_blocks = _encode_prep(
        img, quality, subsampling
    )
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    nc = 1 if gray else 3
    out = _encode_headers(
        w, h, gray, samp, qids, q_lum, q_chrom, 0xC0, restart_interval
    )
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for k in range(nc):
        out += bytes([k + 1, 0x00 if (gray or k == 0) else 0x11])
    out += b"\x00\x3f\x00"
    dc_lum, ac_lum = _code_map(HUFF_DC_LUM), _code_map(HUFF_AC_LUM)
    dc_chr, ac_chr = _code_map(HUFF_DC_CHROM), _code_map(HUFF_AC_CHROM)
    codes = [
        (dc_lum, ac_lum) if (gray or k == 0) else (dc_chr, ac_chr)
        for k in range(nc)
    ]
    wtr = _BitWriter()
    preds = [0] * nc
    done = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and done and done % restart_interval == 0:
                wtr.flush()
                out += wtr.out
                out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                wtr = _BitWriter()
                preds = [0] * nc
            for k, (qz, hs, vs) in enumerate(comp_blocks):
                for vv in range(vs):
                    for hh in range(hs):
                        preds[k] = _encode_block(
                            wtr,
                            qz[my * vs + vv, mx * hs + hh],
                            preds[k],
                            codes[k][0],
                            codes[k][1],
                        )
            done += 1
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# progressive encoder (r7)

#: default spectral-selection + successive-approximation scripts (the
#: shape of libjpeg's simple progressive parameterization): DC first
#: with one SA bit held back, luma AC in two bands, chroma AC whole-
#: band, then the refinement passes.
_PROG_SCRIPT_GRAY = (
    ((0,), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((0,), 6, 63, 0, 2),
    ((0,), 0, 0, 1, 0),
    ((0,), 1, 63, 2, 1),
    ((0,), 1, 63, 1, 0),
)
_PROG_SCRIPT_COLOR = (
    ((0, 1, 2), 0, 0, 0, 1),
    ((0,), 1, 5, 0, 2),
    ((2,), 1, 63, 0, 1),
    ((1,), 1, 63, 0, 1),
    ((0,), 6, 63, 0, 2),
    ((0, 1, 2), 0, 0, 1, 0),
    ((0,), 1, 63, 2, 1),
    ((0,), 1, 63, 1, 0),
    ((2,), 1, 63, 1, 0),
    ((1,), 1, 63, 1, 0),
)


def _emit_ac_first_block(wtr, band, al, ac_codes) -> None:
    """AC first scan, one block: baseline run/size coding of the
    point-transformed band values (EOBRUN deliberately capped at 1 —
    a per-block EOB symbol — so the Annex K tables' symbol set
    suffices; the DECODER accepts arbitrary EOBn)."""
    vals = [
        (v >> al) if v >= 0 else -((-v) >> al) for v in band
    ]  # AC point transform truncates toward zero (T.81 G.1.2.1)
    nz = [i for i, v in enumerate(vals) if v]
    if not nz:
        code, ln = ac_codes[0x00]
        wtr.write(code, ln)
        return
    run = 0
    for i in range(nz[-1] + 1):
        v = vals[i]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            wtr.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        code, ln = ac_codes[(run << 4) | s]
        wtr.write(code, ln)
        wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if nz[-1] + 1 < len(vals):
        code, ln = ac_codes[0x00]
        wtr.write(code, ln)


def _emit_ac_refine_block(wtr, band, al, ac_codes) -> None:
    """AC refinement scan, one block — an exact mirror of the
    decoder's walk (symbol, then sign bit, then the correction bits
    of already-nonzero coefficients passed en route), EOBRUN capped
    at 1 like the first scans."""
    t = [abs(v) >> al for v in band]
    n = len(band)
    news = [i for i, a in enumerate(t) if a == 1]
    pos = 0
    for nxt in news:
        zr = sum(1 for j in range(pos, nxt) if t[j] == 0)
        while zr > 15:
            code, ln = ac_codes[0xF0]
            wtr.write(code, ln)
            zeros = 0
            while zeros < 16:
                if t[pos] == 0:
                    zeros += 1
                else:
                    wtr.write(t[pos] & 1, 1)
                pos += 1
            zr -= 16
        code, ln = ac_codes[(zr << 4) | 1]
        wtr.write(code, ln)
        wtr.write(1 if band[nxt] >= 0 else 0, 1)
        while pos < nxt:
            if t[pos] > 1:
                wtr.write(t[pos] & 1, 1)
            pos += 1
        pos = nxt + 1
    if pos < n:
        code, ln = ac_codes[0x00]  # EOB (run of exactly 1)
        wtr.write(code, ln)
        while pos < n:
            if t[pos] > 1:
                wtr.write(t[pos] & 1, 1)
            pos += 1


def encode_jpeg_progressive(
    img: DecodedImage,
    quality: int = 90,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
    scans=None,
) -> bytes:
    """Encode to PROGRESSIVE JFIF (SOF2). Same quantized coefficients
    as :func:`encode_jpeg` at the same settings — a correct decoder
    therefore produces BIT-IDENTICAL pixels for both encodings (the
    oracle the tests lean on). ``scans`` overrides the default
    spectral-selection + successive-approximation script as an
    iterable of (component_indices, Ss, Se, Ah, Al)."""
    w, h, gray, samp, qids, q_lum, q_chrom, comp_blocks = _encode_prep(
        img, quality, subsampling
    )
    nc = 1 if gray else 3
    if scans is None:
        scans = _PROG_SCRIPT_GRAY if gray else _PROG_SCRIPT_COLOR
    out = _encode_headers(
        w, h, gray, samp, qids, q_lum, q_chrom, 0xC2, restart_interval
    )
    dc_lum, ac_lum = _code_map(HUFF_DC_LUM), _code_map(HUFF_AC_LUM)
    dc_chr, ac_chr = _code_map(HUFF_DC_CHROM), _code_map(HUFF_AC_CHROM)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    def true_grid(k):
        hs, vs = samp[k]
        cw = -(-w * hs // hmax)
        ch_ = -(-h * vs // vmax)
        return -(-cw // 8), -(-ch_ // 8)

    def rst_marker(out, wtr, rst):
        wtr.flush()
        out += wtr.out
        out += bytes([0xFF, 0xD0 + (rst & 7)])

    for comp_idx, ss, se, ah, al in scans:
        comp_idx = tuple(comp_idx)
        if ss == 0 and se == 0:  # DC scan (all listed comps)
            out += b"\xff\xda" + struct.pack(
                ">HB", 6 + 2 * len(comp_idx), len(comp_idx)
            )
            for k in comp_idx:
                dc_id = 0x00 if (gray or k == 0) else 0x10
                out += bytes([k + 1, dc_id])
            out += bytes([ss, se, (ah << 4) | al])
            wtr = _BitWriter()
            preds = {k: 0 for k in comp_idx}
            rst = 0
            done = 0
            if len(comp_idx) > 1:
                walk = [
                    (my, mx) for my in range(mcus_y) for mx in range(mcus_x)
                ]
            else:
                nbx, nby = true_grid(comp_idx[0])
                walk = [(by, bx) for by in range(nby) for bx in range(nbx)]
            for my, mx in walk:
                if restart_interval and done and \
                        done % restart_interval == 0:
                    rst_marker(out, wtr, rst)
                    rst += 1
                    wtr = _BitWriter()
                    preds = {k: 0 for k in comp_idx}
                for k in comp_idx:
                    qz, hs, vs = comp_blocks[k]
                    units = (
                        [(my * vs + vv, mx * hs + hh)
                         for vv in range(vs) for hh in range(hs)]
                        if len(comp_idx) > 1 else [(my, mx)]
                    )
                    dmap = dc_lum if (gray or k == 0) else dc_chr
                    for by, bx in units:
                        dc = int(qz[by, bx, 0]) >> al
                        if ah == 0:
                            diff = dc - preds[k]
                            preds[k] = dc
                            tt = abs(diff).bit_length()
                            code, ln = dmap[tt]
                            wtr.write(code, ln)
                            if tt:
                                wtr.write(
                                    diff if diff >= 0
                                    else diff + (1 << tt) - 1, tt,
                                )
                        else:
                            wtr.write(dc & 1, 1)
                done += 1
            wtr.flush()
            out += wtr.out
            continue
        # AC scan: single component
        if len(comp_idx) != 1:
            raise ImageDecodeError("AC scan must list one component")
        k = comp_idx[0]
        qz, hs, vs = comp_blocks[k]
        amap = ac_lum if (gray or k == 0) else ac_chr
        ac_id = 0x00 if (gray or k == 0) else 0x01
        out += b"\xff\xda" + struct.pack(">HB", 8, 1)
        out += bytes([k + 1, ac_id])
        out += bytes([ss, se, (ah << 4) | al])
        wtr = _BitWriter()
        nbx, nby = true_grid(k)
        rst = 0
        done = 0
        for by in range(nby):
            for bx in range(nbx):
                if restart_interval and done and \
                        done % restart_interval == 0:
                    rst_marker(out, wtr, rst)
                    rst += 1
                    wtr = _BitWriter()
                band = [int(x) for x in qz[by, bx, ss : se + 1]]
                if ah == 0:
                    _emit_ac_first_block(wtr, band, al, amap)
                else:
                    _emit_ac_refine_block(wtr, band, al, amap)
                done += 1
        wtr.flush()
        out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)
