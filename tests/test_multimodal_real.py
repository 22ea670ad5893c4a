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
    df = spark.createDataFrame([(1, bytearray(b"\x89PNG\r\n\x1a\nxxxx"))],
                               "id long, payload binary")
    with pytest.raises(Exception):
        multimodal.decode_image_features(df).collect()
    # fake path still works for any payload
    out = multimodal.decode_image_features(df, dim=8, fake=True).collect()
    assert len(out[0].features) == 8
