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
