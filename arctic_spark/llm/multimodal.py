"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

Since round 6 the decode path is REAL for every self-describing format
that needs no codec library — parsed directly from bytes with numpy:

- audio: WAV/RIFF (PCM 8/16/32-bit and IEEE float32) → samples,
  sample-rate, channel mix-down, RMS / zero-crossing / spectral-centroid
  features;
- image: PPM (P6), PGM (P5), uncompressed BMP (24/32-bit), and — since
  round 7 — real PNG (stdlib ``zlib`` inflates IDAT; numpy reverses
  the scanline filters; bit depths 1/2/4/8/16, gray/RGB/palette/alpha
  color types) and real GIF (pure-Python LZW, global/local palettes,
  4-pass interlace) → pixel array, per-channel stats, 8×8 luminance
  thumbnail features, and a 64-bit dHash perceptual hash (pairs with
  ``dedup.hamming64`` for near-duplicate image detection at scale).

Baseline JPEG decodes natively too (round 8 — ``llm/jpeg.py``
implements the ITU-T T.81 baseline process from scratch: Huffman +
DCT + chroma upsampling, plus a minimal encoder for fixtures).
Formats whose entropy codecs remain out of scope (MP3/H.264,
progressive JPEG, PNG Adam7 interlace) stay gated: ``fake=True``
substitutes deterministic md5-seeded vectors, otherwise the job
raises ``NotImplementedError`` at execution (the distributed
plumbing — schema, Arrow batching, UDF signatures — is identical
either way, so wiring a codec is a per-format one-function change in
``_decode_image_bytes``).
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_TYPE = T.StructType([
    T.StructField("media_type", T.StringType()),   # image|audio|video
    T.StructField("format", T.StringType()),       # png|jpg|wav|mp4|...
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
])


def attach_media(df: DataFrame, payload_col: str, media_type: str,
                 fmt: str) -> DataFrame:
    """Wrap a binary column with the typed metadata struct."""
    return df.withColumn("media_meta", F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit(fmt).alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
        F.length(F.col(payload_col)).cast("long").alias("n_bytes")))


# ---------------------------------------------------------------------------
# byte-level parsers (pure numpy — no codec libraries)
# ---------------------------------------------------------------------------

def parse_wav(buf: bytes):
    """Parse a RIFF/WAVE file: returns (sample_rate, n_channels,
    float32 samples mixed down to mono in [-1, 1]). Supports PCM
    (format 1) at 8/16/32 bit and IEEE float32 (format 3)."""
    if len(buf) < 44 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(buf):
        cid = buf[pos:pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body = buf[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_fmt, n_ch, rate, _, _, bits = fmt
    if audio_fmt == 1 and bits == 16:
        x = np.frombuffer(data, "<i2").astype(np.float32) / 32768.0
    elif audio_fmt == 1 and bits == 8:
        x = (np.frombuffer(data, "u1").astype(np.float32) - 128.0) / 128.0
    elif audio_fmt == 1 and bits == 32:
        x = np.frombuffer(data, "<i4").astype(np.float32) / 2147483648.0
    elif audio_fmt == 3 and bits == 32:
        x = np.frombuffer(data, "<f4").astype(np.float32)
    else:
        raise ValueError(f"unsupported WAV format {audio_fmt}/{bits}bit")
    if n_ch > 1:
        x = x[: len(x) // n_ch * n_ch].reshape(-1, n_ch).mean(axis=1)
    return int(rate), int(n_ch), x


def _parse_pnm(buf: bytes):
    """PPM (P6) / PGM (P5) binary: returns HxWx3 / HxW uint8 array."""
    if buf[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    toks = []
    pos = 2
    while len(toks) < 3:
        while pos < len(buf) and buf[pos:pos + 1].isspace():
            pos += 1
        if buf[pos:pos + 1] == b"#":            # comment to end of line
            while pos < len(buf) and buf[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos:pos + 1].isspace():
            pos += 1
        toks.append(int(buf[start:pos]))
    pos += 1                                     # single whitespace after maxval
    w, h, maxval = toks
    if maxval > 255:
        raise ValueError("16-bit PNM not supported")
    ch = 3 if buf[:2] == b"P6" else 1
    arr = np.frombuffer(buf, "u1", count=w * h * ch, offset=pos)
    return arr.reshape(h, w, 3) if ch == 3 else arr.reshape(h, w)


def _parse_bmp(buf: bytes):
    """Uncompressed 24/32-bit BMP (BITMAPINFOHEADER): HxWx3 uint8 RGB."""
    if buf[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (data_off,) = struct.unpack_from("<I", buf, 10)
    (hdr_size, w, h) = struct.unpack_from("<Iii", buf, 14)
    (planes, bpp) = struct.unpack_from("<HH", buf, 26)
    (compression,) = struct.unpack_from("<I", buf, 30)
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP: {bpp}bpp compression={compression}")
    flip = h > 0
    h = abs(h)
    nb = bpp // 8
    row_stride = (w * nb + 3) & ~3
    rows = []
    for r in range(h):
        off = data_off + r * row_stride
        row = np.frombuffer(buf, "u1", count=w * nb, offset=off)
        rows.append(row.reshape(w, nb)[:, :3][:, ::-1])   # BGR(A) -> RGB
    img = np.stack(rows)
    return img[::-1] if flip else img


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline PNG filters (None/Sub/Up/Average/Paeth)
    → (h, stride) uint8 of raw bytes. Sub is a per-lane modular prefix
    sum (vectorized cumsum); Up is a vector add; Average/Paeth carry a
    true per-pixel recurrence, so those rows run a Python loop — PNG
    pays an inherently sequential decode, unlike PPM/BMP."""
    rows = np.frombuffer(raw, np.uint8, count=h * (stride + 1))
    rows = rows.reshape(h, stride + 1)
    out = np.zeros((h, stride), np.uint16)
    zero = np.zeros(stride, np.uint16)
    for r in range(h):
        f = int(rows[r, 0])
        line = rows[r, 1:].astype(np.uint16)
        prior = out[r - 1] if r else zero
        if f == 0:
            rec = line
        elif f == 1:                                   # Sub
            k = -(-stride // bpp)
            lanes = np.zeros(k * bpp, np.int64)
            lanes[:stride] = line
            rec = (np.cumsum(lanes.reshape(k, bpp), axis=0) % 256) \
                .reshape(-1)[:stride].astype(np.uint16)
        elif f == 2:                                   # Up
            rec = (line + prior) & 0xFF
        elif f == 3:                                   # Average
            rec = line.copy()
            for i in range(stride):
                left = int(rec[i - bpp]) if i >= bpp else 0
                rec[i] = (int(line[i]) + ((left + int(prior[i])) >> 1)) & 0xFF
        elif f == 4:                                   # Paeth
            rec = line.copy()
            for i in range(stride):
                a = int(rec[i - bpp]) if i >= bpp else 0
                bb = int(prior[i])
                c = int(out[r - 1, i - bpp]) if (r and i >= bpp) else 0
                p = a + bb - c
                pa, pb, pc = abs(p - a), abs(p - bb), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (bb if pb <= pc
                                                          else c)
                rec[i] = (int(line[i]) + pred) & 0xFF
        else:
            raise ValueError(f"PNG: unknown filter type {f}")
        out[r] = rec
    return out.astype(np.uint8)


def _png_expand_bits(row_bytes: np.ndarray, depth: int, w: int) -> np.ndarray:
    """Unpack sub-byte samples (depth 1/2/4, gray or palette indices)."""
    if depth == 1:
        return np.unpackbits(row_bytes, axis=1)[:, :w]
    per = 8 // depth
    shifts = np.arange(per - 1, -1, -1, dtype=np.uint8) * depth
    mask = (1 << depth) - 1
    vals = (row_bytes[:, :, None] >> shifts[None, None, :]) & mask
    return vals.reshape(row_bytes.shape[0], -1)[:, :w]


def parse_png(buf: bytes) -> np.ndarray:
    """Real PNG decode, pure numpy + stdlib zlib (DEFLATE needs no
    external codec — the container has zlib by definition of CPython).
    Supports bit depths 1/2/4/8/16, color types 0 (gray), 2 (RGB),
    3 (palette), 4 (gray+alpha), 6 (RGBA); alpha is dropped, 16-bit
    narrows to the high byte, interlace (Adam7) is rejected. Returns
    HxW (gray) or HxWx3 (RGB) uint8."""
    import zlib
    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    w = h = depth = ctype = interlace = None
    plte = None
    idat = []
    while pos + 8 <= len(buf):
        (size,) = struct.unpack_from(">I", buf, pos)
        cid = buf[pos + 4:pos + 8]
        body = buf[pos + 8:pos + 8 + size]
        if cid == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = \
                struct.unpack_from(">IIBBBBB", body, 0)
        elif cid == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif cid == b"IDAT":
            idat.append(body)
        elif cid == b"IEND":
            break
        pos += 12 + size                     # len + type + body + crc
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    if interlace:
        raise NotImplementedError("PNG Adam7 interlace not supported")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"PNG: unknown color type {ctype}")
    if ctype != 0 and ctype != 3 and depth < 8:
        raise ValueError(f"PNG: depth {depth} invalid for color type {ctype}")
    raw = zlib.decompress(b"".join(idat))
    bits_px = depth * channels
    stride = (w * bits_px + 7) // 8
    bpp = max(1, bits_px // 8)
    data = _png_unfilter(raw, h, stride, bpp)
    if depth < 8:
        samples = _png_expand_bits(data, depth, w)       # (h, w) indices/gray
        if ctype == 3:
            if plte is None:
                raise ValueError("PNG: palette image without PLTE")
            return plte[samples]
        scale = {1: 255, 2: 85, 4: 17}[depth]
        return (samples * scale).astype(np.uint8)
    if depth == 16:
        data = data.reshape(h, w * channels, 2)[:, :, 0]  # high byte
        arr = data.reshape(h, w, channels)
    else:
        arr = data.reshape(h, w, channels)
    if ctype == 3:
        if plte is None:
            raise ValueError("PNG: palette image without PLTE")
        return plte[arr[:, :, 0]]
    if ctype == 0:
        return arr[:, :, 0]
    if ctype == 4:
        return arr[:, :, 0]                               # drop alpha
    return arr[:, :, :3]                                  # RGB / drop alpha


def _gif_lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW decode (pure Python — LZW is table lookups, no
    entropy math). Codes are packed LSB-first; the code width grows
    when the table reaches 2^width, capped at 12 bits."""
    clear = 1 << min_code_size
    end = clear + 1
    acc = int.from_bytes(data, "little")
    total_bits = len(data) * 8
    bitpos = 0
    out = bytearray()

    def fresh():
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    table = fresh()
    code_size = min_code_size + 1
    prev = None
    while bitpos + code_size <= total_bits:
        code = (acc >> bitpos) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            table = fresh()
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
                table.append(table[prev] + entry[:1])
            elif code == len(table):
                entry = table[prev] + table[prev][:1]
                table.append(entry)
            else:
                raise ValueError("GIF: corrupt LZW stream")
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        out += entry
        prev = code
    return bytes(out)


def parse_gif(buf: bytes) -> np.ndarray:
    """Real GIF decode (first frame), pure Python/numpy: logical screen
    descriptor, global/local color table, LZW-compressed indices,
    optional interlace. Returns HxWx3 uint8 RGB (frame-local size)."""
    if buf[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", buf, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(buf, np.uint8, count=n * 3,
                            offset=pos).reshape(-1, 3)
        pos += n * 3
    while pos < len(buf):
        b0 = buf[pos]
        if b0 == 0x21:                       # extension: skip sub-blocks
            pos += 2
            while pos < len(buf) and buf[pos] != 0:
                pos += 1 + buf[pos]
            pos += 1
        elif b0 == 0x2C:                     # image descriptor
            _l, _t, w, h, iflags = struct.unpack_from("<HHHHB", buf, pos + 1)
            pos += 10
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                pal = np.frombuffer(buf, np.uint8, count=n * 3,
                                    offset=pos).reshape(-1, 3)
                pos += n * 3
            if pal is None:
                raise ValueError("GIF: no color table")
            mcs = buf[pos]
            pos += 1
            chunks = []
            while pos < len(buf) and buf[pos] != 0:
                ln = buf[pos]
                chunks.append(buf[pos + 1:pos + 1 + ln])
                pos += 1 + ln
            idx = np.frombuffer(_gif_lzw_decode(b"".join(chunks), mcs),
                                np.uint8, count=w * h).reshape(h, w)
            if iflags & 0x40:                # 4-pass interlace reorder
                order = np.concatenate([np.arange(0, h, 8),
                                        np.arange(4, h, 8),
                                        np.arange(2, h, 4),
                                        np.arange(1, h, 2)])
                deinter = np.empty_like(idx)
                deinter[order] = idx
                idx = deinter
            return pal[idx]
        elif b0 == 0x3B:                     # trailer
            break
        else:
            raise ValueError(f"GIF: unknown block 0x{b0:02x}")
    raise ValueError("GIF: no image data")


def _decode_image_bytes(b: bytes, fmt_hint: str | None = None):
    """Decode self-describing image bytes to an HxW[x3] uint8 array, or
    raise for codec-dependent formats."""
    if b[:2] in (b"P6", b"P5"):
        return _parse_pnm(b)
    if b[:2] == b"BM":
        return _parse_bmp(b)
    if b[:8] == _PNG_SIG:
        return parse_png(b)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return parse_gif(b)
    if b[:2] == b"\xff\xd8":
        from .jpeg import parse_jpeg
        return parse_jpeg(b)
    raise NotImplementedError(
        f"image format {fmt_hint or b[:4]!r} requires a codec library "
        "not present in this environment; pass fake=True to exercise "
        "the pipeline with deterministic stubs")


def _gray(img: np.ndarray) -> np.ndarray:
    if img.ndim == 2:
        return img.astype(np.float32)
    return (0.299 * img[..., 0] + 0.587 * img[..., 1]
            + 0.114 * img[..., 2]).astype(np.float32)


def _downsample(gray: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-style downsample via integer bucket means (deterministic,
    no interpolation library)."""
    h, w = gray.shape
    ri = (np.arange(h) * out_h // max(h, 1)).clip(0, out_h - 1)
    ci = (np.arange(w) * out_w // max(w, 1)).clip(0, out_w - 1)
    out = np.zeros((out_h, out_w), np.float64)
    cnt = np.zeros((out_h, out_w), np.int64)
    np.add.at(out, (ri[:, None], ci[None, :]), gray)
    np.add.at(cnt, (ri[:, None], ci[None, :]), 1)
    return (out / np.maximum(cnt, 1)).astype(np.float32)


def _image_features(img: np.ndarray) -> np.ndarray:
    """67-dim real feature vector: [w, h, mean_luma] + flattened 8x8
    luminance thumbnail (the aHash grid, unthresholded)."""
    g = _gray(img)
    thumb = _downsample(g, 8, 8).reshape(-1) / 255.0
    h, w = g.shape
    return np.concatenate([[w, h, float(g.mean()) / 255.0], thumb]) \
        .astype(np.float32)


def _dhash64(img: np.ndarray) -> int:
    """64-bit difference-hash: 9x8 luminance grid, bit = left<right —
    the standard perceptual near-dup signature (hamming distance ≤ ~10
    ⇒ visually similar)."""
    g = _downsample(_gray(img), 8, 9)
    bits = (g[:, 1:] > g[:, :-1]).reshape(-1)
    out = 0
    for i, b in enumerate(bits):
        if b:
            out |= 1 << i
    return out - (1 << 64) if out >= (1 << 63) else out


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic pseudo-features from payload bytes (md5-seeded)."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


# ---------------------------------------------------------------------------
# distributed decode operators
# ---------------------------------------------------------------------------

def decode_image_features(df: DataFrame, payload_col: str = "payload",
                          dim: int = 64, fake: bool = False,
                          batch_size: int = 256) -> DataFrame:
    """Append an ``array<float>`` feature column decoded from image
    bytes. REAL decode for PPM/PGM/BMP (67-dim: dims + mean luma + 8×8
    thumbnail); ``fake=True`` yields md5-seeded ``dim``-vectors for any
    payload (plumbing tests / codec-dependent formats). Arrow-batched
    mapInPandas — each executor decodes its partition, nothing ever
    reaches the driver."""
    out_schema = T.StructType(df.schema.fields + [
        T.StructField("features", T.ArrayType(T.FloatType()))])
    cols = [f.name for f in df.schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf[payload_col]:
                if b is None:
                    feats.append(None)
                elif fake:
                    feats.append(_fake_features(bytes(b), dim).tolist())
                else:
                    feats.append(
                        _image_features(_decode_image_bytes(bytes(b)))
                        .tolist())
            out = pdf[cols].copy()
            out["features"] = feats
            yield out

    return df.mapInPandas(run, schema=out_schema)


def image_meta_and_phash(df: DataFrame, payload_col: str = "payload") \
        -> DataFrame:
    """Append (width, height, phash64) decoded from self-describing
    image bytes — the scale path for image near-dup dedup: join/band on
    the 64-bit dHash exactly like ``dedup.simhash_near_dup_pairs`` bands
    its text signatures (``dedup.hamming64`` verifies candidates)."""
    out_schema = T.StructType(df.schema.fields + [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("phash64", T.LongType())])
    cols = [f.name for f in df.schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, ph = [], [], []
            for b in pdf[payload_col]:
                if b is None:
                    ws.append(None); hs.append(None); ph.append(None)
                else:
                    img = _decode_image_bytes(bytes(b))
                    hh, w = img.shape[0], img.shape[1]
                    ws.append(w); hs.append(hh)
                    ph.append(_dhash64(img))
            out = pdf[cols].copy()
            out["width"] = pd.array(ws, dtype="Int32")
            out["height"] = pd.array(hs, dtype="Int32")
            out["phash64"] = pd.array(ph, dtype="Int64")
            yield out

    return df.mapInPandas(run, schema=out_schema)


def decode_audio_features(df: DataFrame, payload_col: str = "payload") \
        -> DataFrame:
    """Append real audio descriptors decoded from WAV bytes:
    (sample_rate, n_channels, n_samples, duration_ms, rms, peak,
    zero_crossing_rate, spectral_centroid_hz). All numpy over the
    mono mix-down; the FFT for the centroid runs per row inside the
    executor batch."""
    out_schema = T.StructType(df.schema.fields + [
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
        T.StructField("zero_crossing_rate", T.DoubleType()),
        T.StructField("spectral_centroid_hz", T.DoubleType())])
    cols = [f.name for f in df.schema.fields]
    new = ["sample_rate", "n_channels", "n_samples", "duration_ms",
           "rms", "peak", "zero_crossing_rate", "spectral_centroid_hz"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            vals = {k: [] for k in new}
            for b in pdf[payload_col]:
                if b is None:
                    for k in new:
                        vals[k].append(None)
                    continue
                rate, n_ch, x = parse_wav(bytes(b))
                n = len(x)
                vals["sample_rate"].append(rate)
                vals["n_channels"].append(n_ch)
                vals["n_samples"].append(n)
                vals["duration_ms"].append(int(n * 1000 / rate) if rate else 0)
                if n:
                    vals["rms"].append(float(np.sqrt(np.mean(x ** 2))))
                    vals["peak"].append(float(np.abs(x).max()))
                    vals["zero_crossing_rate"].append(
                        float(np.mean(np.abs(np.diff(np.signbit(x))))))
                    spec = np.abs(np.fft.rfft(x))
                    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
                    tot = spec.sum()
                    vals["spectral_centroid_hz"].append(
                        float((freqs * spec).sum() / tot) if tot > 0 else 0.0)
                else:
                    for k in ("rms", "peak", "zero_crossing_rate",
                              "spectral_centroid_hz"):
                        vals[k].append(0.0)
            out = pdf[cols].copy()
            out["sample_rate"] = pd.array(vals["sample_rate"], dtype="Int32")
            out["n_channels"] = pd.array(vals["n_channels"], dtype="Int32")
            out["n_samples"] = pd.array(vals["n_samples"], dtype="Int64")
            out["duration_ms"] = pd.array(vals["duration_ms"], dtype="Int64")
            for k in ("rms", "peak", "zero_crossing_rate",
                      "spectral_centroid_hz"):
                out[k] = vals[k]
            yield out

    return df.mapInPandas(run, schema=out_schema)


def frame_sample_plan(df: DataFrame, payload_col: str = "payload",
                      every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expands each video row into frame
    rows (frame_idx, ts_ms) based on metadata duration — the row
    explosion is native (sequence + explode); only the pixel decode of
    each sampled frame would call into a codec (gated)."""
    n_frames = F.greatest(
        (F.col("media_meta.duration_ms") / F.lit(every_ms)).cast("int"),
        F.lit(1))
    return (df.withColumn(
        "frame_idx",
        F.explode(F.sequence(F.lit(0), n_frames - 1)))
        .withColumn("frame_ts_ms", F.col("frame_idx") * F.lit(every_ms)))
