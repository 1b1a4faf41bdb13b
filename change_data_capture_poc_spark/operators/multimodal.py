"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Treats image/audio/video as ``binary`` columns accompanied by a typed
metadata struct. The Spark-side plumbing — schema, Arrow batch shape,
partition-preserving ``mapInPandas`` signature — is real and tested;
the actual media decode is stubbed (the decode libraries are not in
this container) behind ``decode_media_batch(..., real_decode=True)``
which raises ``NotImplementedError``, with a deterministic fake decode
as the default so pipelines are end-to-end testable.

At scale: payloads stay in columnar parquet (binary), metadata columns
prune independently of payload bytes, and decode parallelism is
per-Arrow-batch with bounded memory (``maxRecordsPerBatch``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("checksum", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)


def attach_media_meta(df: DataFrame, payload_col: str, media_type: str) -> DataFrame:
    """Cheap JVM-side metadata (no decode): byte length + checksum."""
    p = F.col(payload_col)
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.octet_length(p).cast("long").alias("n_bytes"),
            F.md5(p).alias("checksum"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("n_frames"),
        ),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a real decoder: dims derived from the
    payload bytes so tests are reproducible."""
    n = len(payload)
    return (n % 1024, (n * 7) % 768, n % 30 + 1)


def decode_media_batch(
    df: DataFrame,
    payload_col: str,
    media_type: str = "image",
    real_decode: bool = False,
) -> DataFrame:
    """Per-batch decode via ``mapInPandas`` (Arrow-vectorized).

    Output schema: every input column plus ``width``, ``height``,
    ``n_frames`` (int). With ``real_decode=True`` this is where
    PIL/ffmpeg/torchaudio would run — not available in this container,
    so it raises ``NotImplementedError``.
    """
    if real_decode:
        raise NotImplementedError(
            "real media decoding requires PIL/ffmpeg, not present in "
            "this environment; use real_decode=False for the "
            "deterministic fake decoder"
        )

    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("n_frames", T.IntegerType()),
        ]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf[payload_col].map(_fake_decode)
            pdf = pdf.assign(
                width=dims.map(lambda d: d[0]).astype("int32"),
                height=dims.map(lambda d: d[1]).astype("int32"),
                n_frames=dims.map(lambda d: d[2]).astype("int32"),
            )
            yield pdf

    return df.mapInPandas(decode, out_schema)


def resize_media_batch(
    df: DataFrame,
    payload_col: str,
    target_w: int,
    target_h: int,
    real_decode: bool = False,
) -> DataFrame:
    """Resize stage: payload -> payload' + (width, height) set to the
    target dims. Real implementation is PIL/ffmpeg inside the same
    mapInPandas shape; the deterministic fake truncates/pads bytes to
    a size proportional to the target area so downstream size-based
    logic is exercisable.
    """
    if real_decode:
        raise NotImplementedError(
            "real resize requires PIL/ffmpeg; use real_decode=False"
        )

    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != payload_col]
        + [
            T.StructField(payload_col, T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )
    target_len = max(1, (target_w * target_h) // 64)

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf[payload_col].map(
                lambda b: bytes(b)[:target_len].ljust(target_len, b"\0")
            )
            out = pdf.drop(columns=[payload_col]).assign(
                **{payload_col: payload},
                width=target_w,
                height=target_h,
            )
            out["width"] = out["width"].astype("int32")
            out["height"] = out["height"].astype("int32")
            yield out

    return df.mapInPandas(resize, out_schema)


def sample_frames_batch(
    df: DataFrame,
    payload_col: str,
    every_nth: int,
    real_decode: bool = False,
) -> DataFrame:
    """Frame sampling: one output row per kept frame with a
    ``frame_idx`` column (row-expanding mapInPandas — the UDF analogue
    of explode). Fake decoder derives the frame count from payload
    length (same formula as decode_media_batch's n_frames).
    """
    if real_decode:
        raise NotImplementedError(
            "real frame extraction requires ffmpeg; use real_decode=False"
        )

    out_schema = T.StructType(
        df.schema.fields + [T.StructField("frame_idx", T.IntegerType())]
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            reps = pdf[payload_col].map(
                lambda b: len(range(0, len(b) % 30 + 1, every_nth))
            )
            out = pdf.loc[pdf.index.repeat(reps)].copy()
            out["frame_idx"] = [
                i
                for n in reps
                for i in range(0, n * every_nth, every_nth)
            ]
            out["frame_idx"] = out["frame_idx"].astype("int32")
            yield out

    return df.mapInPandas(sample, out_schema)


def extract_features_batch(
    df: DataFrame,
    payload_col: str,
    dim: int = 16,
    real_decode: bool = False,
) -> DataFrame:
    """Feature extraction: payload -> fixed-dim float vector (the
    embedding-model stage). Fake extractor: normalized byte histogram
    folded to ``dim`` buckets — deterministic, plumbing-identical to a
    real vision/audio encoder emitting array<float>.
    """
    if real_decode:
        raise NotImplementedError(
            "real feature extraction requires a model runtime; "
            "use real_decode=False"
        )

    import numpy as np

    out_schema = T.StructType(
        df.schema.fields
        + [T.StructField("features", T.ArrayType(T.FloatType()))]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf[payload_col]:
                arr = np.frombuffer(bytes(b), dtype=np.uint8)
                hist = np.bincount(arr % dim, minlength=dim).astype("float32")
                total = hist.sum() or 1.0
                feats.append((hist / total).tolist())
            yield pdf.assign(features=feats)

    return df.mapInPandas(extract, out_schema)


def frame_signature_batch(
    df: DataFrame,
    payload_col: str,
    frame_col: str = "frame_idx",
    real_decode: bool = False,
) -> DataFrame:
    """Per-frame scalar signature (the shot-detection feature stage:
    a real pipeline emits a per-frame embedding or color histogram
    here; downstream segmentation only consumes frame-to-frame
    distance). Fake signature = the payload byte at position
    ``frame_idx mod n_bytes`` — deterministic, SQL-reproducible, and
    plumbing-identical to an Arrow batch of real per-frame features.
    """
    if real_decode:
        raise NotImplementedError(
            "real per-frame features require ffmpeg + a vision model; "
            "use real_decode=False"
        )

    out_schema = T.StructType(
        df.schema.fields + [T.StructField("sig", T.IntegerType())]
    )

    def signat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sig = [
                int(bytes(b)[int(f) % len(b)]) if len(b) else 0
                for b, f in zip(pdf[payload_col], pdf[frame_col])
            ]
            out = pdf.copy()
            out["sig"] = pd.array(sig, dtype="int32")
            yield out

    return df.mapInPandas(signat, out_schema)
