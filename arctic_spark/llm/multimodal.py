"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The media codec libraries (Pillow/libav/etc.) are NOT in this container,
so the decode kernels are STUBBED — ``decode_image_features`` raises
``NotImplementedError`` unless ``fake=True``, which substitutes a
deterministic md5-seeded feature vector. Everything around the stub —
schema, batching, partition sizing, UDF signatures — is real and tested:
swapping in a real decoder is a one-function change.
"""

from __future__ import annotations

import hashlib
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


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic pseudo-features from payload bytes (md5-seeded)."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def decode_image_features(df: DataFrame, payload_col: str = "payload",
                          dim: int = 64, fake: bool = False,
                          batch_size: int = 256) -> DataFrame:
    """Append an `array<float>` feature column decoded from image bytes.

    Real decode requires an image library absent from this container:
    with ``fake=False`` the job raises NotImplementedError at execution.
    ``fake=True`` produces deterministic md5-seeded vectors so the full
    distributed plumbing (Arrow batches, schema, downstream ANN joins)
    is exercised end-to-end.
    """
    out_schema = T.StructType(df.schema.fields + [
        T.StructField("features", T.ArrayType(T.FloatType()))])
    cols = [f.name for f in df.schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            import PIL.Image  # noqa: F401
            have_pil = True
        except Exception:
            have_pil = False
        for pdf in batches:
            feats = []
            for b in pdf[payload_col]:
                if b is None:
                    feats.append(None)
                elif fake:
                    feats.append(_fake_features(bytes(b), dim).tolist())
                elif not have_pil:
                    raise NotImplementedError(
                        "image decode requires an imaging library not "
                        "present in this environment; pass fake=True to "
                        "exercise the pipeline with deterministic stubs")
                else:  # pragma: no cover - no PIL in container
                    raise NotImplementedError("real decode path not wired")
            out = pdf[cols].copy()
            out["features"] = feats
            yield out

    return df.mapInPandas(run, schema=out_schema)


def frame_sample_plan(df: DataFrame, payload_col: str = "payload",
                      every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expands each video row into frame
    rows (frame_idx, ts_ms) based on metadata duration — the row
    explosion is native (sequence + explode); only the pixel decode of
    each sampled frame would call into a codec (stubbed)."""
    n_frames = F.greatest(
        (F.col("media_meta.duration_ms") / F.lit(every_ms)).cast("int"),
        F.lit(1))
    return (df.withColumn(
        "frame_idx",
        F.explode(F.sequence(F.lit(0), n_frames - 1)))
        .withColumn("frame_ts_ms", F.col("frame_idx") * F.lit(every_ms)))
