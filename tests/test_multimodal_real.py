"""Real multimodal decode tests: WAV/PPM/BMP payloads synthesized
byte-for-byte in the test, decoded distributed via mapInPandas, checked
against closed-form signal/pixel math."""

import math
import struct

import numpy as np
import pytest

from arctic_spark.llm import dedup, multimodal


def _wav_bytes(samples: np.ndarray, rate=8000, bits=16, fmt=1,
               channels=1) -> bytes:
    if fmt == 1 and bits == 16:
        raw = (samples * 32767).astype("<i2").tobytes()
    elif fmt == 3:
        raw = samples.astype("<f4").tobytes()
        bits = 32
    else:
        raise ValueError
    byte_rate = rate * channels * bits // 8
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, fmt, channels, rate,
                                   byte_rate, channels * bits // 8, bits)
           + b"data" + struct.pack("<I", len(raw)))
    return hdr + raw


def _ppm_bytes(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return (f"P6\n# test comment\n{w} {h}\n255\n").encode() \
        + img.astype("u1").tobytes()


def _bmp_bytes(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    row_stride = (w * 3 + 3) & ~3
    pix = bytearray()
    for r in range(h - 1, -1, -1):            # bottom-up
        row = img[r][:, ::-1].astype("u1").tobytes()   # RGB->BGR
        pix += row + b"\x00" * (row_stride - len(row))
    data_off = 54
    hdr = (b"BM" + struct.pack("<IHHI", data_off + len(pix), 0, 0, data_off)
           + struct.pack("<Iii", 40, w, h)
           + struct.pack("<HH", 1, 24)
           + struct.pack("<IIiiII", 0, len(pix), 2835, 2835, 0, 0))
    return bytes(hdr) + bytes(pix)


def test_wav_audio_features(spark):
    rate = 8000
    t = np.arange(rate)  # 1 second
    sine = 0.5 * np.sin(2 * math.pi * 440 * t / rate)
    silent = np.zeros(rate // 2)
    rows = [(1, bytearray(_wav_bytes(sine, rate))),
            (2, bytearray(_wav_bytes(silent, rate))),
            (3, None)]
    df = spark.createDataFrame(rows, "id long, payload binary")
    out = {r.id: r for r in
           multimodal.decode_audio_features(df).collect()}
    assert out[1].sample_rate == rate
    assert out[1].n_samples == rate
    assert out[1].duration_ms == 1000
    assert abs(out[1].rms - 0.5 / math.sqrt(2)) < 1e-3
    assert abs(out[1].peak - 0.5) < 1e-3
    # 440 Hz sine: centroid at the tone, zcr = 2*f/rate
    assert abs(out[1].spectral_centroid_hz - 440.0) < 5.0
    assert abs(out[1].zero_crossing_rate - 2 * 440 / rate) < 0.01
    assert out[2].rms == 0.0
    assert out[3].rms is None


def test_wav_float_and_stereo_mixdown(spark):
    rate = 4000
    mono = np.full(rate, 0.25, dtype=np.float32)
    b = _wav_bytes(mono, rate, fmt=3)
    # hand-build stereo PCM16: L=0.5, R=0.0 -> mix 0.25
    l = (np.full(rate, 0.5) * 32767).astype("<i2")
    r = np.zeros(rate, dtype="<i2")
    inter = np.empty(rate * 2, dtype="<i2")
    inter[0::2] = l
    inter[1::2] = r
    raw = inter.tobytes()
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, rate,
                                   rate * 4, 4, 16)
           + b"data" + struct.pack("<I", len(raw)))
    df = spark.createDataFrame(
        [(1, bytearray(b)), (2, bytearray(hdr + raw))],
        "id long, payload binary")
    out = {x.id: x for x in multimodal.decode_audio_features(df).collect()}
    assert abs(out[1].rms - 0.25) < 1e-6
    assert out[2].n_channels == 2
    assert abs(out[2].rms - 0.25) < 1e-3


def test_image_decode_ppm_bmp_equivalent(spark):
    # 16x8 horizontal gradient, same image in PPM and BMP
    w, h = 16, 8
    img = np.zeros((h, w, 3), np.uint8)
    img[..., 0] = np.linspace(0, 255, w).astype(np.uint8)[None, :]
    img[..., 1] = 128
    img[..., 2] = 64
    df = spark.createDataFrame(
        [(1, bytearray(_ppm_bytes(img))), (2, bytearray(_bmp_bytes(img)))],
        "id long, payload binary")
    out = {r.id: r for r in
           multimodal.image_meta_and_phash(df).collect()}
    assert (out[1].width, out[1].height) == (w, h)
    assert (out[2].width, out[2].height) == (w, h)
    # identical pixels -> identical perceptual hash
    assert out[1].phash64 == out[2].phash64
    # monotone horizontal gradient: every dHash bit set
    assert out[1].phash64 == -1  # 64 bits set, signed long

    feats = {r.id: r.features for r in
             multimodal.decode_image_features(df).collect()}
    assert feats[1] == feats[2]
    assert feats[1][0] == w and feats[1][1] == h
    assert len(feats[1]) == 67


def test_image_phash_near_dup_pairs(spark):
    rng = np.random.default_rng(7)
    base = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
    noisy = base.copy()
    noisy[0, 0] = 255 - noisy[0, 0]          # tiny perturbation
    other = rng.integers(0, 255, (32, 32, 3)).astype(np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(_ppm_bytes(base))), (2, bytearray(_ppm_bytes(noisy))),
         (3, bytearray(_ppm_bytes(other)))],
        "id long, payload binary")
    hashed = multimodal.image_meta_and_phash(df)
    a, b = hashed.alias("a"), hashed.alias("b")
    from pyspark.sql import functions as F
    pairs = (a.join(b, F.col("a.id") < F.col("b.id"))
             .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                     dedup.hamming64(F.col("a.phash64"),
                                     F.col("b.phash64")).alias("ham")))
    got = {(r.id_a, r.id_b): r.ham for r in pairs.collect()}
    assert got[(1, 2)] <= 2          # near-dup
    assert got[(1, 3)] > 10          # unrelated


def test_codec_formats_still_gated(spark):
    # baseline JPEG decodes natively since r8 (llm/jpeg.py); unknown
    # entropy formats (here an MP3 frame header) stay gated
    from arctic_spark.llm.jpeg import encode_jpeg
    img = np.full((16, 16), 70, dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_jpeg(img, quality=92)))],
        "id long, payload binary")
    out = multimodal.decode_image_features(df).collect()
    f = out[0].features
    assert f[0] == 16.0 and f[1] == 16.0          # decoded dims
    assert abs(f[2] - 70 / 255) < 0.01            # mean of flat gray
    bad = spark.createDataFrame([(1, bytearray(b"\xff\xfb\x90\x00mp3"))],
                                "id long, payload binary")
    with pytest.raises(Exception):
        multimodal.decode_image_features(bad).collect()
    # fake path still works for any payload
    out = multimodal.decode_image_features(bad, dim=8, fake=True).collect()
    assert len(out[0].features) == 8


# -- PNG (real decode: stdlib zlib DEFLATE + numpy unfilter) -----------------

def _png_bytes(img: np.ndarray, filters=None, ctype=None, depth=8,
               palette=None) -> bytes:
    """Minimal PNG encoder for test fixtures: explicit per-row filter
    types exercise every unfilter path."""
    import zlib

    def chunk(cid, body):
        return (struct.pack(">I", len(body)) + cid + body
                + struct.pack(">I", zlib.crc32(cid + body) & 0xFFFFFFFF))

    if img.ndim == 2:
        h, w = img.shape
        ch = 1
        ct = 0 if ctype is None else ctype
    else:
        h, w, ch = img.shape
        ct = {3: 2, 4: 6, 2: 4}[ch] if ctype is None else ctype
    bits_px = depth * ch
    stride = (w * bits_px + 7) // 8
    bpp = max(1, bits_px // 8)
    if filters is None:
        filters = [0] * h

    if depth == 8:
        rows = img.reshape(h, stride).astype(np.int64)
    elif depth == 16:
        wide = img.astype(np.uint16) * 257
        rows = np.zeros((h, stride), np.int64)
        flat = wide.reshape(h, -1)
        rows[:, 0::2] = flat >> 8
        rows[:, 1::2] = flat & 0xFF
    else:                                    # sub-byte gray / palette
        per = 8 // depth
        pad = (-w) % per
        vals = np.pad(img.reshape(h, w), ((0, 0), (0, pad)))
        packed = np.zeros((h, stride), np.int64)
        for j in range(per):
            packed |= vals[:, j::per].astype(np.int64) << ((per - 1 - j)
                                                           * depth)
        rows = packed

    out = []
    prev = np.zeros(stride, np.int64)
    for r in range(h):
        f = filters[r]
        line = rows[r]
        if f == 0:
            enc = line
        elif f == 1:
            left = np.concatenate([np.zeros(bpp, np.int64), line[:-bpp]])
            enc = (line - left) % 256
        elif f == 2:
            enc = (line - prev) % 256
        elif f == 3:
            left = np.concatenate([np.zeros(bpp, np.int64), line[:-bpp]])
            enc = (line - (left + prev) // 2) % 256
        elif f == 4:
            enc = np.zeros(stride, np.int64)
            for i in range(stride):
                a = int(line[i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc
                                                          else c)
                enc[i] = (int(line[i]) - pred) % 256
        out.append(bytes([f]) + bytes(enc.astype(np.uint8)))
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ct, 0, 0, 0)
    chunks = [chunk(b"IHDR", ihdr)]
    if palette is not None:
        chunks.append(chunk(b"PLTE", bytes(np.asarray(palette,
                                                      np.uint8).reshape(-1))))
    chunks.append(chunk(b"IDAT", zlib.compress(b"".join(out))))
    chunks.append(chunk(b"IEND", b""))
    return b"\x89PNG\r\n\x1a\n" + b"".join(chunks)


def test_png_roundtrip_all_filters():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 255, (10, 7, 3)).astype(np.uint8)
    for filters in ([0] * 10, [1] * 10, [2] * 10, [3] * 10, [4] * 10,
                    [0, 1, 2, 3, 4, 4, 3, 2, 1, 0]):
        got = multimodal.parse_png(_png_bytes(img, filters=filters))
        assert np.array_equal(got, img), filters


def test_png_color_types():
    rng = np.random.default_rng(12)
    gray = rng.integers(0, 255, (6, 9)).astype(np.uint8)
    assert np.array_equal(multimodal.parse_png(_png_bytes(gray)), gray)
    # RGBA: alpha dropped
    rgba = rng.integers(0, 255, (5, 4, 4)).astype(np.uint8)
    assert np.array_equal(multimodal.parse_png(_png_bytes(rgba)),
                          rgba[:, :, :3])
    # palette
    pal = rng.integers(0, 255, (16, 3)).astype(np.uint8)
    idx = rng.integers(0, 16, (7, 5)).astype(np.uint8)
    got = multimodal.parse_png(_png_bytes(idx, ctype=3, palette=pal))
    assert np.array_equal(got, pal[idx])
    # 4-bit gray scales by 17
    g4 = rng.integers(0, 16, (4, 10)).astype(np.uint8)
    got4 = multimodal.parse_png(_png_bytes(g4, depth=4))
    assert np.array_equal(got4, (g4 * 17).astype(np.uint8))
    # 16-bit narrows to high byte (x*257 -> high byte == x)
    g16 = rng.integers(0, 255, (3, 8)).astype(np.uint8)
    got16 = multimodal.parse_png(_png_bytes(g16, depth=16))
    assert np.array_equal(got16, g16)


def test_png_phash_matches_ppm(spark):
    w, h = 16, 8
    img = np.zeros((h, w, 3), np.uint8)
    img[..., 0] = np.linspace(0, 255, w).astype(np.uint8)[None, :]
    img[..., 1] = 128
    df = spark.createDataFrame(
        [(1, bytearray(_ppm_bytes(img))),
         (2, bytearray(_png_bytes(img, filters=[4] * h)))],
        "id long, payload binary")
    out = {r.id: r for r in multimodal.image_meta_and_phash(df).collect()}
    assert (out[2].width, out[2].height) == (w, h)
    assert out[1].phash64 == out[2].phash64


# -- GIF (real decode: pure-Python LZW) --------------------------------------

def _pack_lsb(codes_widths):
    acc = nbits = 0
    out = bytearray()
    for c, wd in codes_widths:
        acc |= c << nbits
        nbits += wd
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_bytes(idx: np.ndarray, palette: np.ndarray,
               interlace=False) -> bytes:
    """Minimal GIF89a encoder: clear-code before every pixel (a valid,
    trivially-correct LZW stream — dictionary growth is covered by the
    hand-packed stream test)."""
    h, w = idx.shape
    k = 1
    while (2 << k) < len(palette):
        k += 1
    pal = np.zeros((2 << k, 3), np.uint8)
    pal[:len(palette)] = palette
    mcs = max(2, k + 1)
    clear, end = 1 << mcs, (1 << mcs) + 1
    cw = mcs + 1
    rows = idx
    if interlace:
        order = np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                                np.arange(2, h, 4), np.arange(1, h, 2)])
        rows = idx[order]
    codes = [(clear, cw)]
    for v in rows.reshape(-1):
        codes.append((int(v), cw))
        codes.append((clear, cw))
    codes.append((end, cw))
    data = _pack_lsb(codes)
    blocks = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        blocks += bytes([len(chunk)]) + chunk
    return (b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | k, 0, 0)
            + pal.tobytes()
            + b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h,
                                    0x40 if interlace else 0)
            + bytes([mcs]) + bytes(blocks) + b"\x00" + b"\x3B")


def test_gif_lzw_dictionary_growth():
    # mcs=2: codes [clear=4, 1, 2, 6, 7, end=5]; table grows 6:'12',
    # 7:'21', 8:'122' and the width bumps to 4 bits after entry 7
    stream = _pack_lsb([(4, 3), (1, 3), (2, 3), (6, 3), (7, 4), (5, 4)])
    out = multimodal._gif_lzw_decode(stream, 2)
    assert list(out) == [1, 2, 1, 2, 2, 1]


def test_gif_roundtrip_and_interlace():
    rng = np.random.default_rng(21)
    pal = rng.integers(0, 255, (8, 3)).astype(np.uint8)
    idx = rng.integers(0, 8, (11, 6)).astype(np.uint8)
    got = multimodal.parse_gif(_gif_bytes(idx, pal))
    assert np.array_equal(got, pal[idx])
    got_i = multimodal.parse_gif(_gif_bytes(idx, pal, interlace=True))
    assert np.array_equal(got_i, pal[idx])


def test_gif_in_distributed_phash(spark):
    w, h = 16, 8
    img = np.zeros((h, w, 3), np.uint8)
    img[..., 0] = np.linspace(0, 255, w).astype(np.uint8)[None, :]
    img[..., 1] = 128
    # GIF is palette-based: build the exact palette of this gradient
    uniq, inv = np.unique(img.reshape(-1, 3), axis=0, return_inverse=True)
    idx = inv.reshape(h, w).astype(np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(_ppm_bytes(img))),
         (2, bytearray(_gif_bytes(idx, uniq)))],
        "id long, payload binary")
    out = {r.id: r for r in multimodal.image_meta_and_phash(df).collect()}
    assert (out[2].width, out[2].height) == (w, h)
    assert out[1].phash64 == out[2].phash64
