"""Pure-stdlib baseline JPEG codec (extensions/jpegcodec.py, r7).

Oracle strategy (no Pillow in this container):
- The spec's constants are asserted literally (zigzag table, DCT
  orthonormality, Huffman canonical-code validity) so a matched
  encoder/decoder bug pair cannot hide behind roundtrip symmetry.
- A minimal DC-only stream is built BY HAND (bit-level, from the
  T.81 decode procedure) and decoded — an encoder-independent vector.
- Roundtrips bound the lossy error tightly at high quality, across
  subsampling modes, restart intervals, odd dims, gray/RGB.
- When Pillow IS importable, pure-vs-PIL equality is asserted.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from goodtables_pandas_py_spark.extensions.imagecodec import (
    DecodedImage,
    ImageDecodeError,
    _try_pil,
    decode_image_bytes,
)
from goodtables_pandas_py_spark.extensions.jpegcodec import (
    HUFF_AC_CHROM,
    HUFF_AC_LUM,
    HUFF_DC_CHROM,
    HUFF_DC_LUM,
    ZIGZAG,
    _canonical_codes,
    _DCT,
    decode_jpeg,
    encode_jpeg,
)


def _smooth(w, h, ch, seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    base = 128 + 100 * np.sin(xx / 9.0 + seed) * np.cos(yy / 7.0)
    px = np.stack(
        [np.clip(base + 17 * c, 0, 255) for c in range(ch)], axis=-1
    ).astype(np.uint8)
    return DecodedImage(w, h, ch, px.tobytes())


def _pixels(img):
    return np.frombuffer(img.pixels, np.uint8).reshape(
        img.height, img.width, img.channels
    ).astype(int)


# ------------------------------------------------------- spec constants


def test_zigzag_is_the_spec_table():
    # T.81 Figure A.6, written out independently here
    spec = [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ]
    assert list(ZIGZAG) == spec
    # a permutation (every index once)
    assert sorted(ZIGZAG) == list(range(64))


def test_dct_matrix_is_orthonormal():
    assert np.allclose(_DCT @ _DCT.T, np.eye(8), atol=1e-12)
    # DC basis row: constant 1/sqrt(8)
    assert np.allclose(_DCT[0], np.sqrt(0.125))


@pytest.mark.parametrize(
    "spec", [HUFF_DC_LUM, HUFF_DC_CHROM, HUFF_AC_LUM, HUFF_AC_CHROM]
)
def test_annex_k_huffman_tables_are_valid_prefix_codes(spec):
    bits, vals = spec
    codes = _canonical_codes(bits, vals)
    assert len(codes) == len(vals) == len(set(vals))
    # canonical codes of a valid table are prefix-free by construction
    # IF no code overflows its length — check the kraft sum too
    assert sum(2.0 ** -ln for _, ln in codes) <= 1.0 + 1e-12


# ------------------------------------------- encoder-independent vector


def _dc_only_gray_jpeg(dc_value: int) -> bytes:
    """Hand-assemble an 8x8 grayscale baseline JPEG whose single
    block has ONE DC coefficient (quant step 1) and no AC — the
    decoded image must be the constant IDCT of that coefficient:
    round(dc/8 + 128) in every pixel. Bits written straight from the
    T.81 decode procedure (DC category + magnitude bits + EOB)."""
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes([1] * 64)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 8, 8, 1)
    out += bytes([1, 0x11, 0])
    for tcth, (bits, vals) in [(0x00, HUFF_DC_LUM), (0x10, HUFF_AC_LUM)]:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), tcth)
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00])
    out += b"\x00\x3f\x00"
    # entropy bits: DC category t (code from the canonical table),
    # then t magnitude bits, then AC EOB (symbol 0x00)
    dc_codes = {
        v: cl for v, cl in zip(HUFF_DC_LUM[1], _canonical_codes(*HUFF_DC_LUM))
    }
    ac_codes = {
        v: cl for v, cl in zip(HUFF_AC_LUM[1], _canonical_codes(*HUFF_AC_LUM))
    }
    t = abs(dc_value).bit_length()
    bitstr = ""
    code, ln = dc_codes[t]
    bitstr += format(code, f"0{ln}b")
    if t:
        mag = dc_value if dc_value >= 0 else dc_value + (1 << t) - 1
        bitstr += format(mag, f"0{t}b")
    code, ln = ac_codes[0x00]
    bitstr += format(code, f"0{ln}b")
    bitstr += "1" * (-len(bitstr) % 8)  # pad with 1s
    ent = bytearray(int(bitstr[i : i + 8], 2) for i in range(0, len(bitstr), 8))
    stuffed = bytearray()
    for byte in ent:
        stuffed.append(byte)
        if byte == 0xFF:
            stuffed.append(0x00)
    out += stuffed + b"\xff\xd9"
    return bytes(out)


@pytest.mark.parametrize("dc,expect", [(0, 128), (80, 138), (-80, 118),
                                       (400, 178), (-1016, 1)])
def test_hand_built_dc_only_stream(dc, expect):
    img = decode_jpeg(_dc_only_gray_jpeg(dc))
    assert (img.width, img.height, img.channels) == (8, 8, 1)
    px = np.frombuffer(img.pixels, np.uint8)
    # constant plane: IDCT of DC-only is dc * C[0,0]^2 * 64 / 64...
    # concretely dc/8 per pixel, +128 level shift
    assert (px == expect).all(), (dc, set(px.tolist()))


# ---------------------------------------------------------- roundtrips


@pytest.mark.parametrize(
    "w,h,ch,sub,rst,q",
    [
        (37, 23, 3, "4:2:0", 0, 95),
        (64, 48, 3, "4:2:0", 2, 90),
        (16, 16, 3, "4:4:4", 1, 85),
        (9, 5, 1, "4:4:4", 0, 92),
        (8, 8, 3, "4:2:0", 0, 100),
        (1, 1, 3, "4:4:4", 0, 90),
        (33, 1, 1, "4:4:4", 3, 95),
        (2, 130, 3, "4:2:0", 5, 93),
    ],
)
def test_roundtrip_error_bounded(w, h, ch, sub, rst, q):
    img = _smooth(w, h, ch)
    blob = encode_jpeg(img, quality=q, subsampling=sub, restart_interval=rst)
    dec = decode_jpeg(blob)
    assert (dec.width, dec.height, dec.channels) == (w, h, ch)
    err = np.abs(_pixels(dec) - _pixels(img))
    assert err.max() <= 12 and err.mean() <= 2.0, (err.max(), err.mean())


def test_solid_color_roundtrips_within_one():
    img = DecodedImage(16, 16, 3, bytes([120, 200, 64] * 256))
    dec = decode_jpeg(encode_jpeg(img, quality=95))
    err = np.abs(_pixels(dec) - _pixels(img))
    assert err.max() <= 1


def test_gray_gradient_lossless_at_q97():
    px = bytes(bytearray((x * 7 + y * 3) % 256 for y in range(17)
                         for x in range(24)))
    img = DecodedImage(24, 17, 1, px)
    dec = decode_jpeg(encode_jpeg(img, quality=97))
    assert dec == img  # smooth ramp at q97: bit-exact


def test_rgba_alpha_dropped_and_noise_survives_q100():
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(12, 11, 4), dtype=np.uint8)
    img = DecodedImage(11, 12, 4, px.tobytes())
    dec = decode_jpeg(encode_jpeg(img, quality=100))
    assert dec.channels == 3
    err = np.abs(_pixels(dec) - px[:, :, :3].astype(int))
    # q100 luma/chroma tables are mostly 1s; noise still loses a bit
    # through the color transform roundtrip
    assert err.mean() <= 6.0, err.mean()


def test_dispatcher_routes_jpeg():
    img = _smooth(10, 10, 3)
    blob = encode_jpeg(img, quality=95)
    dec = decode_image_bytes(blob)
    assert (dec.width, dec.height) == (10, 10)


def test_restart_interval_streams_match_unrestarted():
    img = _smooth(48, 32, 3, seed=2)
    a = decode_jpeg(encode_jpeg(img, quality=90, restart_interval=0))
    b = decode_jpeg(encode_jpeg(img, quality=90, restart_interval=1))
    assert a == b  # restarts change framing, never pixels


# ------------------------------------------------------------ rejection


def test_unsupported_processes_rejected():
    base = bytearray(encode_jpeg(_smooth(8, 8, 1), quality=90))
    i = bytes(base).find(b"\xff\xc0")
    assert i > 0
    # r7: SOF2 decodes now — but flipping the marker on a BASELINE
    # stream makes an invalid progressive scan (full-band DC SOS),
    # which must still fail loudly rather than decode wrong
    prog = bytes(base[:i]) + b"\xff\xc2" + bytes(base[i + 2 :])
    with pytest.raises(ImageDecodeError, match="Se=0"):
        decode_jpeg(prog)
    arith = bytes(base[:i]) + b"\xff\xc9" + bytes(base[i + 2 :])
    with pytest.raises(ImageDecodeError, match="unsupported"):
        decode_jpeg(arith)


def test_truncation_and_garbage_rejected():
    blob = encode_jpeg(_smooth(16, 16, 3), quality=90)
    with pytest.raises(ImageDecodeError):
        decode_jpeg(blob[: len(blob) // 2])
    with pytest.raises(ImageDecodeError):
        decode_jpeg(b"\xff\xd8\xff\xe0junk")
    with pytest.raises(ImageDecodeError, match="SOI"):
        decode_jpeg(b"not a jpeg")
    # SOS with no prior SOF
    with pytest.raises(ImageDecodeError):
        decode_jpeg(b"\xff\xd8\xff\xda\x00\x08\x01\x01\x00\x00\x3f\x00")


def test_bad_subsampling_arg():
    with pytest.raises(ImageDecodeError, match="subsampling"):
        encode_jpeg(_smooth(8, 8, 3), subsampling="4:1:1")


# ------------------------------------------------------------ PIL parity


@pytest.mark.skipif(_try_pil() is None, reason="Pillow not installed")
def test_pure_decode_matches_pil():
    import io

    Image = _try_pil()
    img = _smooth(40, 28, 3, seed=5)
    for sub, rst in [("4:4:4", 0), ("4:2:0", 2)]:
        blob = encode_jpeg(img, quality=92, subsampling=sub,
                           restart_interval=rst)
        ours = _pixels(decode_jpeg(blob))
        with Image.open(io.BytesIO(blob)) as im:
            theirs = np.asarray(im.convert("RGB")).astype(int)
        # libjpeg uses smoothed chroma upsampling + a fixed-point
        # IDCT; allow small per-pixel divergence, require agreement
        assert np.abs(ours - theirs).max() <= 16
        assert np.abs(ours - theirs).mean() <= 2.0


# ------------------------------------------------------------ properties

from hypothesis import given, settings, strategies as st  # noqa: E402

# GT_FUZZ_SCALE=N multiplies every fuzz contract's example
# count for deep sweeps (VERDICT r7 item 1); default 1
_FUZZ_SCALE = int(__import__("os").environ.get("GT_FUZZ_SCALE", "1"))


@settings(max_examples=25 * _FUZZ_SCALE, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    ch=st.sampled_from([1, 3]),
    sub=st.sampled_from(["4:4:4", "4:2:0"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_property_roundtrip_any_dims(w, h, ch, sub, seed):
    """Totality + bounded loss over arbitrary dims/subsampling: every
    encode parses back to the same shape, and on SMOOTH content the
    q95 roundtrip stays within a tight per-pixel bound. (Random noise
    is the adversarial case for a lossy codec — covered separately at
    q100 with a mean bound.)"""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256)
    yy, xx = np.mgrid[0:h, 0:w]
    grad = (base + 2 * xx + 3 * yy) % 256
    px = np.stack([grad.astype(np.uint8)] * ch, axis=-1)
    img = DecodedImage(w, h, ch, px.tobytes())
    dec = decode_jpeg(encode_jpeg(img, quality=95, subsampling=sub))
    assert (dec.width, dec.height, dec.channels) == (w, h, ch)
    err = np.abs(_pixels(dec) - px.astype(int))
    assert err.max() <= 16, (w, h, ch, sub, err.max())


@settings(max_examples=15 * _FUZZ_SCALE, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), rst=st.integers(0, 5))
def test_property_restart_framing_never_changes_pixels(seed, rst):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(17, 21, 3), dtype=np.uint8)
    img = DecodedImage(21, 17, 3, px.tobytes())
    a = decode_jpeg(encode_jpeg(img, quality=90, restart_interval=0))
    b = decode_jpeg(encode_jpeg(img, quality=90, restart_interval=rst))
    assert a == b


# ------------------------------------------------------ progressive (r7)

from goodtables_pandas_py_spark.extensions.jpegcodec import (  # noqa: E402
    encode_jpeg_progressive,
)


@pytest.mark.parametrize(
    "w,h,ch,sub,rst,q",
    [
        (32, 24, 3, "4:4:4", 0, 90),
        (37, 23, 3, "4:2:0", 0, 95),
        (64, 48, 3, "4:2:0", 2, 75),
        (9, 5, 1, "4:4:4", 0, 92),
        (1, 1, 3, "4:4:4", 0, 90),
        (33, 1, 1, "4:4:4", 3, 95),
        (16, 16, 3, "4:2:0", 1, 100),
    ],
)
def test_progressive_decodes_bit_identical_to_baseline(w, h, ch, sub,
                                                       rst, q):
    """THE progressive oracle: both writers emit the same quantized
    coefficients through completely different entropy layers, so the
    decoded pixels must match bit-for-bit."""
    img = _smooth(w, h, ch)
    base = decode_jpeg(
        encode_jpeg(img, quality=q, subsampling=sub, restart_interval=rst)
    )
    prog = decode_jpeg(
        encode_jpeg_progressive(
            img, quality=q, subsampling=sub, restart_interval=rst
        )
    )
    assert base == prog


def test_progressive_noise_bit_identical_and_dispatcher_routes():
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(21, 19, 3), dtype=np.uint8)
    img = DecodedImage(19, 21, 3, px.tobytes())
    blob = encode_jpeg_progressive(img, quality=85, subsampling="4:2:0")
    assert decode_image_bytes(blob) == decode_jpeg(
        encode_jpeg(img, quality=85, subsampling="4:2:0")
    )


def test_progressive_custom_scan_scripts():
    """Spectral-selection-only script (no successive approximation),
    and a maximally-sliced script (each band its own scan, deep SA
    cascades) — both must reproduce the baseline pixels exactly."""
    img = _smooth(24, 16, 3, seed=4)
    base = decode_jpeg(encode_jpeg(img, quality=90))
    ss_only = [
        ((0, 1, 2), 0, 0, 0, 0),
        ((0,), 1, 63, 0, 0),
        ((1,), 1, 63, 0, 0),
        ((2,), 1, 63, 0, 0),
    ]
    assert decode_jpeg(
        encode_jpeg_progressive(img, quality=90, scans=ss_only)
    ) == base
    sliced = [
        ((0, 1, 2), 0, 0, 0, 3),
        ((0, 1, 2), 0, 0, 3, 2),
        ((0, 1, 2), 0, 0, 2, 1),
        ((0, 1, 2), 0, 0, 1, 0),
        ((0,), 1, 2, 0, 2), ((0,), 3, 63, 0, 2),
        ((0,), 1, 63, 2, 1), ((0,), 1, 63, 1, 0),
        ((1,), 1, 63, 0, 1), ((1,), 1, 63, 1, 0),
        ((2,), 1, 63, 0, 1), ((2,), 1, 63, 1, 0),
    ]
    assert decode_jpeg(
        encode_jpeg_progressive(img, quality=90, scans=sliced)
    ) == base


def test_progressive_gray_deep_refinement():
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(24, 24, 1), dtype=np.uint8)
    img = DecodedImage(24, 24, 1, px.tobytes())
    base = decode_jpeg(encode_jpeg(img, quality=95))
    assert decode_jpeg(encode_jpeg_progressive(img, quality=95)) == base


def _eobn_gray_progressive() -> bytes:
    """Hand-built 24x8 gray progressive stream whose AC-first scan
    uses EOB2 (symbol 0x10 + 1 run bit) to cover three all-zero-AC
    blocks — the multi-block EOBn decode path the capped encoder
    never emits. DC scan gives blocks 0/1/2 DC values 80/160/240
    (quant step 1, Al=0), AC scan declares EOBRUN=3 via EOB2+bit(1).
    Expected: three flat 8x8 tiles of 138/148/158."""
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">HB", 67, 0) + bytes([1] * 64)
    # SOF2, 8x24, one component
    out += b"\xff\xc2" + struct.pack(">HBHHB", 11, 8, 8, 24, 1)
    out += bytes([1, 0x11, 0])
    # DC table: Annex K; AC table: custom, containing EOBn symbols
    ac_bits = [0, 2, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    ac_vals = [0x00, 0x10, 0x20]
    out += b"\xff\xc4" + struct.pack(">HB", 19 + 12, 0x00)
    out += bytes(HUFF_DC_LUM[0]) + bytes(HUFF_DC_LUM[1])
    out += b"\xff\xc4" + struct.pack(">HB", 19 + len(ac_vals), 0x10)
    out += bytes(ac_bits) + bytes(ac_vals)
    # scan 1: DC first, Al=0
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00])
    out += bytes([0, 0, 0x00])
    dc_codes = {
        v: cl for v, cl in zip(HUFF_DC_LUM[1], _canonical_codes(*HUFF_DC_LUM))
    }
    bits = ""
    pred = 0
    for dc in (80, 160, 240):
        diff = dc - pred
        pred = dc
        t = abs(diff).bit_length()
        code, ln = dc_codes[t]
        bits += format(code, f"0{ln}b")
        if t:
            mag = diff if diff >= 0 else diff + (1 << t) - 1
            bits += format(mag, f"0{t}b")
    bits += "1" * (-len(bits) % 8)
    out += bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    # scan 2: AC first 1..63, Al=0 — ONE symbol covers all 3 blocks:
    # EOB2 (r=2) = eobrun = (1<<2)-1 + receive(2); receive bits "00"
    # -> eobrun = 3
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00])
    out += bytes([1, 63, 0x00])
    ac_codes = {v: cl for v, cl in zip(ac_vals, _canonical_codes(ac_bits, ac_vals))}
    code, ln = ac_codes[0x20]
    bits = format(code, f"0{ln}b") + "00"
    bits += "1" * (-len(bits) % 8)
    out += bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    out += b"\xff\xd9"
    return bytes(out)


def test_hand_built_multi_block_eobn_run():
    img = decode_jpeg(_eobn_gray_progressive())
    assert (img.width, img.height, img.channels) == (24, 8, 1)
    px = np.frombuffer(img.pixels, np.uint8).reshape(8, 24)
    for blk, want in ((0, 138), (1, 148), (2, 158)):
        tile = px[:, blk * 8 : (blk + 1) * 8]
        assert (tile == want).all(), (blk, set(tile.ravel().tolist()))


@pytest.mark.skipif(_try_pil() is None, reason="Pillow not installed")
def test_progressive_matches_pil():
    import io

    Image = _try_pil()
    img = _smooth(40, 28, 3, seed=5)
    blob = encode_jpeg_progressive(img, quality=92, subsampling="4:2:0")
    ours = _pixels(decode_jpeg(blob))
    with Image.open(io.BytesIO(blob)) as im:
        theirs = np.asarray(im.convert("RGB")).astype(int)
    assert np.abs(ours - theirs).max() <= 16
    assert np.abs(ours - theirs).mean() <= 2.0


@settings(max_examples=20 * _FUZZ_SCALE, deadline=None)
@given(
    w=st.integers(1, 32), h=st.integers(1, 32),
    ch=st.sampled_from([1, 3]),
    sub=st.sampled_from(["4:4:4", "4:2:0"]),
    rst=st.integers(0, 3),
    seed=st.integers(0, 2**31 - 1),
)
def test_property_progressive_equals_baseline(w, h, ch, sub, rst, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    img = DecodedImage(w, h, ch, px.tobytes())
    base = decode_jpeg(
        encode_jpeg(img, quality=88, subsampling=sub, restart_interval=rst)
    )
    prog = decode_jpeg(
        encode_jpeg_progressive(
            img, quality=88, subsampling=sub, restart_interval=rst
        )
    )
    assert base == prog


# ------------------------------------------------- r7 review fixes


def test_fill_bytes_before_markers_are_skipped():
    """T.81 B.1.1.2: encoders may pad with 0xFF fill bytes before any
    marker — the stream must still decode, identically."""
    img = _smooth(10, 8, 3)
    blob = encode_jpeg(img, quality=92)
    i = blob.find(b"\xff\xc0")
    padded = blob[:i] + b"\xff\xff\xff" + blob[i:]
    assert decode_jpeg(padded) == decode_jpeg(blob)


def test_truncated_marker_segments_raise_typed_error():
    for stream in (
        b"\xff\xd8\xff\xc0\x00\x04\x00\x00",          # short SOF
        b"\xff\xd8\xff\xdd\x00\x03\x00",              # short DRI
        b"\xff\xd8\xff\xc0\x00\x0b\x08\x00\x08\x00\x08\x01"
        b"\xff\xda\x00\x03\x02",                      # SOS ns overflow
        b"\xff\xd8\xff\xdb\x00\x05\x10\x00\x00",      # odd 16-bit DQT
    ):
        with pytest.raises(ImageDecodeError):
            decode_jpeg(stream)


def test_non_integer_subsampling_ratio_rejected():
    """H factors (3, 2, 1) are spec-legal but need fractional
    upsampling the replicate-upsampler doesn't do — must reject with
    the typed error at SOF, not crash in assembly."""
    blob = bytearray(encode_jpeg(_smooth(24, 16, 3), quality=90,
                                 subsampling="4:2:0"))
    i = bytes(blob).find(b"\xff\xc0")
    # SOF layout: marker(2) len(2) prec(1) h(2) w(2) nc(1)
    # comp0(id,hv,tq) comp1(id,hv,tq) — comp1's hv byte is i+14
    assert blob[i + 13] == 0x02  # comp1 id, sanity
    blob[i + 14] = 0x31  # comp1: 3x1 vs comp0's 2x2
    with pytest.raises(ImageDecodeError, match="subsampling ratio"):
        decode_jpeg(bytes(blob))
