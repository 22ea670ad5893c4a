"""Baseline JPEG codec (llm/jpeg.py) — from-scratch ITU-T T.81
baseline process. No codec library exists in this container, so the
decoder is validated three ways: (1) against hand-assembled JPEG
bytes whose decoded output is known from the spec's math alone
(decoder-only, independent of the encoder), (2) encoder→decoder round
trips bounded by the quantization error model, (3) marker-structure
assertions on the encoder's output."""

import struct

import numpy as np
import pytest

from arctic_spark.llm import jpeg as J


# ---------------------------------------------------------------------------
# decoder-only: hand-assembled fixtures
# ---------------------------------------------------------------------------

def _hand_jpeg_flat_gray():
    """Minimal 8x8 grayscale JPEG built byte-by-byte: unit DC table
    (category 0 → diff 0), AC table with only EOB. All coefficients
    zero → every pixel must decode to exactly 128 (the level shift),
    independent of any encoder code."""
    out = bytearray(b"\xff\xd8")
    # DQT: table 0, all 16s (valid 1..255), zigzag order = natural here
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([16] * 64)
    # SOF0: 8-bit, 8x8, 1 component id=1 sampling 1x1 q-table 0
    out += b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" \
        + struct.pack(">HH", 8, 8) + b"\x01" + bytes([1, 0x11, 0])
    # DHT DC0: one code of length 1 → symbol 0 (category 0)
    out += b"\xff\xc4" + struct.pack(">H", 20) + b"\x00" \
        + bytes([1] + [0] * 15) + bytes([0])
    # DHT AC0: one code of length 1 → symbol 0x00 (EOB)
    out += b"\xff\xc4" + struct.pack(">H", 20) + b"\x10" \
        + bytes([1] + [0] * 15) + bytes([0x00])
    # SOS: 1 component, DC table 0 / AC table 0, spectral 0..63
    out += b"\xff\xda" + struct.pack(">H", 8) + b"\x01" \
        + bytes([1, 0x00]) + bytes([0, 63, 0])
    # entropy data: '0' (DC cat 0) + '0' (EOB), padded with ones
    out += bytes([0b00111111])
    out += b"\xff\xd9"
    return bytes(out)


def test_decoder_flat_gray_from_spec_math():
    img = J.parse_jpeg(_hand_jpeg_flat_gray())
    assert img.shape == (8, 8)
    assert (img == 128).all()


def test_decoder_single_dc_coefficient():
    """DC category 7, value bits 1000000 → RECEIVE=64, EXTEND=+64;
    dequantized by 16 → coefficient 1024; IDCT of a pure-DC block is
    the constant 1024/8 = 128, +128 level shift = 255 everywhere."""
    b = bytearray(_hand_jpeg_flat_gray())
    # replace the DC table: one code of length 1 → category 7
    i = bytes(b).find(b"\xff\xc4")
    b[i + 5 + 16] = 7                     # the single DC symbol
    # entropy data: '0' (huff) + 1000000 (7 value bits) = 8 bits, then
    # AC EOB '0' + 7 padding ones
    j = bytes(b).rfind(bytes([0b00111111]))
    b[j:j + 1] = bytes([0b01000000, 0b01111111])
    img = J.parse_jpeg(bytes(b))
    assert (img == 255).all()


def test_decoder_rejects_unsupported_and_garbage():
    with pytest.raises(J.JpegError):
        J.parse_jpeg(b"\x89PNG\r\n")
    b = bytearray(_hand_jpeg_flat_gray())
    i = bytes(b).find(b"\xff\xc0")
    b[i + 1] = 0xC3                        # SOF3: lossless sequential
    with pytest.raises(NotImplementedError):
        J.parse_jpeg(bytes(b))
    # a baseline full-band scan relabeled SOF2 is MALFORMED progressive
    # (a progressive DC scan must have Se = 0) — clean error, not junk
    b = bytearray(_hand_jpeg_flat_gray())
    b[i + 1] = 0xC2
    with pytest.raises(J.JpegError):
        J.parse_jpeg(bytes(b))


# ---------------------------------------------------------------------------
# progressive (SOF2) decode — r9
# ---------------------------------------------------------------------------

def test_progressive_parity_gray_and_color():
    """The progressive scan script (DC Al=1 + DC refinement + AC
    spectral selection Al=1 + AC refinement) reconstructs the EXACT
    quantized coefficients, so progressive decode must match the
    baseline encode of the same image bit-for-bit."""
    rng = np.random.default_rng(7)
    for shape in ((16, 16), (23, 17), (8, 8), (31, 9)):
        for color in (False, True):
            img = rng.integers(
                0, 256, shape + ((3,) if color else ()), dtype=np.uint8)
            base = J.parse_jpeg(J.encode_jpeg(img, quality=80))
            pb = J.encode_jpeg_progressive(img, quality=80)
            assert pb.count(b"\xff\xda") == (8 if color else 4)
            assert np.array_equal(J.parse_jpeg(pb), base)


def test_progressive_parity_420_subsampled():
    """4:2:0 progressive: the non-interleaved AC scans cover the
    component-sized block grid (T.81 A.2.2) while interleaved DC scans
    cover the MCU-padded grid — sizes where these differ are the trap
    (w % 16 <= 8)."""
    rng = np.random.default_rng(11)
    for shape in ((24, 24), (40, 33), (17, 24)):
        img = rng.integers(0, 256, shape + (3,), dtype=np.uint8)
        base = J.parse_jpeg(J.encode_jpeg(img, quality=75,
                                          subsample=True))
        prog = J.parse_jpeg(J.encode_jpeg_progressive(
            img, quality=75, subsample=True))
        assert np.array_equal(prog, base)


def test_progressive_eob_runs_smooth_image():
    """A smooth gradient quantizes to long all-zero AC tails — the
    EOBn run-length path (encode and decode) dominates."""
    yy, xx = np.mgrid[0:48, 0:40]
    img = ((xx + yy) * 2 % 256).astype(np.uint8)
    base = J.parse_jpeg(J.encode_jpeg(img, quality=60))
    prog = J.parse_jpeg(J.encode_jpeg_progressive(img, quality=60))
    assert np.array_equal(prog, base)


# ---------------------------------------------------------------------------
# encoder → decoder round trips
# ---------------------------------------------------------------------------

def test_roundtrip_constant_gray_exact():
    img = np.full((24, 17), 128, dtype=np.uint8)
    out = J.parse_jpeg(J.encode_jpeg(img, quality=90))
    assert out.shape == (24, 17)
    assert (out == 128).all()


def test_roundtrip_rgb_444_smooth():
    yy, xx = np.mgrid[0:40, 0:56]
    rgb = np.stack([xx * 4, yy * 5, 255 - xx * 3], -1) \
        .clip(0, 255).astype(np.uint8)
    dec = J.parse_jpeg(J.encode_jpeg(rgb, quality=95))
    err = np.abs(dec.astype(int) - rgb.astype(int))
    assert dec.shape == rgb.shape
    assert err.mean() < 2.0 and err.max() <= 12


def test_roundtrip_rgb_420_subsampled():
    yy, xx = np.mgrid[0:30, 0:42]          # non-multiples of 16
    rgb = np.stack([xx * 4, yy * 5, (xx + yy) * 2], -1) \
        .clip(0, 255).astype(np.uint8)
    dec = J.parse_jpeg(J.encode_jpeg(rgb, quality=95, subsample=True))
    err = np.abs(dec.astype(int) - rgb.astype(int))
    assert dec.shape == rgb.shape
    assert err.mean() < 4.0 and err.max() <= 40   # chroma at half res


def test_roundtrip_noise_bounded_by_quality():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    hi = J.parse_jpeg(J.encode_jpeg(img, quality=98))
    lo = J.parse_jpeg(J.encode_jpeg(img, quality=30))
    e_hi = np.abs(hi.astype(int) - img.astype(int)).mean()
    e_lo = np.abs(lo.astype(int) - img.astype(int)).mean()
    assert e_hi < e_lo                     # quality knob is monotone
    assert e_hi < 6.0


def test_marker_structure():
    img = np.full((8, 8), 200, dtype=np.uint8)
    b = J.encode_jpeg(img, quality=85)
    assert b[:2] == b"\xff\xd8" and b[-2:] == b"\xff\xd9"
    assert b"JFIF\x00" in b
    # exactly one DQT / SOF0 / SOS for grayscale, two DHTs (DC+AC)
    assert b.count(b"\xff\xdb") == 1
    assert b.count(b"\xff\xc0") == 1
    assert b.count(b"\xff\xda") == 1
    assert b.count(b"\xff\xc4") == 2


def test_multimodal_dispatch_decodes_jpeg():
    from arctic_spark.llm.multimodal import _decode_image_bytes
    img = np.full((16, 16), 99, dtype=np.uint8)
    out = _decode_image_bytes(J.encode_jpeg(img, quality=92))
    assert out.shape == (16, 16)
    assert np.abs(out.astype(int) - 99).max() <= 1


# ---------------------------------------------------------------------------
# multi-scan baseline (r10): one non-interleaved SOS per component
# ---------------------------------------------------------------------------

def _rand_rgb(rng, h, w):
    return (rng.random((h, w, 3)) * 255).astype(np.uint8)


def test_multi_scan_baseline_decodes_identically():
    """A legal 3-scan non-interleaved baseline file (each component in
    its own SOS) must decode byte-identically to the SAME image encoded
    as one interleaved scan — the coefficients are equal, only the scan
    layout differs (T.81 multi-scan baseline; VERDICT r9 #3)."""
    rng = np.random.default_rng(17)
    for h, w in [(16, 16), (13, 22)]:            # aligned + ragged dims
        img = _rand_rgb(rng, h, w)
        single = J.encode_jpeg(img, quality=80)
        multi = J.encode_jpeg(img, quality=80, multi_scan=True)
        # structure: exactly three SOS markers, each covering 1 component
        sos_at = [i for i in range(len(multi) - 1)
                  if multi[i] == 0xFF and multi[i + 1] == 0xDA]
        assert len(sos_at) == 3
        for pos in sos_at:
            ns = multi[pos + 4]
            assert ns == 1
        a = J.parse_jpeg(single)
        b = J.parse_jpeg(multi)
        assert a.shape == b.shape == (h, w, 3)
        assert np.array_equal(a, b)


def test_multi_scan_gray_subsample_rejected():
    rng = np.random.default_rng(3)
    gray = (rng.random((16, 16)) * 255).astype(np.uint8)
    with pytest.raises(ValueError):
        J.encode_jpeg(gray, multi_scan=True)
    with pytest.raises(ValueError):
        J.encode_jpeg(_rand_rgb(rng, 16, 16), subsample=True,
                      multi_scan=True)
