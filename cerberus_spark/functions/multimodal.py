"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partitioning, UDF
signatures, Arrow batch shapes.  The actual codec step is STUBBED
(image/audio libraries are not in this container): ``decode_image``
raises ``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder (hash-seeded) produces stable feature
vectors so the pipeline is exercisable end-to-end.

Pattern: ``mapInPandas`` over an iterator of Arrow batches — the
canonical shape for heavy per-row media work (bounded memory via
``spark.sql.execution.arrow.maxRecordsPerBatch``; each batch decodes
in one Python worker call, no per-row overhead).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

#: metadata struct carried next to every media binary column
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image/audio/video
        T.StructField("format", T.StringType()),        # png/jpeg/wav/mp4...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

FEATURE_DIM = 16


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in for a real decoder+extractor: features are
    seeded by a stable digest of the payload."""
    seed = int.from_bytes(hashlib.blake2b(payload or b"", digest_size=8).digest(), "little")
    rng = np.random.default_rng(seed)
    return [float(x) for x in rng.standard_normal(dim)]


def decode_image(payload: bytes, fake: bool = False):
    """STUB: real decode needs an imaging library not present in this
    environment.  The Spark plumbing around it is real."""
    if fake:
        return _fake_features(payload)
    raise NotImplementedError(
        "image decoding requires an imaging library (e.g. Pillow); "
        "run with fake=True for deterministic plumbing tests"
    )


def attach_media_meta(df: DataFrame, binary_col: str, media_type: str,
                      fmt: str) -> DataFrame:
    """Add the typed metadata struct for an opaque binary column."""
    meta = F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit(fmt).alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
        F.length(F.col(binary_col)).cast("long").alias("n_bytes"),
    )
    return df.withColumn(f"{binary_col}_meta", meta)


def extract_features(df: DataFrame, id_col: str, binary_col: str,
                     fake: bool = True) -> DataFrame:
    """binary → feature vector via mapInPandas (batch-at-a-time).

    Output: (id, features array<double>).  Swap ``_fake_features`` for a
    real decoder without touching the Spark plumbing."""
    out_schema = f"{id_col} long, features array<double>"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                decode_image(p if p is not None else b"", fake=fake)
                for p in pdf[binary_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, binary_col).mapInPandas(batches, out_schema)


def frame_sample_plan(df: DataFrame, id_col: str, binary_col: str,
                      every_ms: int = 1000, fake: bool = True) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    index (duration faked from payload length when fake=True)."""
    out_schema = f"{id_col} long, frame_idx int, features array<double>"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, fidx, feats = [], [], []
            for _, row in pdf.iterrows():
                payload = row[binary_col] or b""
                if not fake:
                    raise NotImplementedError("video decoding not available here")
                n_frames = max(1, min(8, len(payload) // 64))
                for i in range(n_frames):
                    ids.append(row[id_col])
                    fidx.append(i)
                    feats.append(_fake_features(payload + i.to_bytes(4, "little")))
            yield pd.DataFrame({id_col: ids, "frame_idx": fidx, "features": feats})

    return df.select(id_col, binary_col).mapInPandas(batches, out_schema)
