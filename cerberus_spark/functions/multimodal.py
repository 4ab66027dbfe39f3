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


# ---------------------------------------------------------------------------
# REAL metadata decode — container headers parse with pure Python (no codec
# library needed): PNG IHDR, JPEG SOF markers, WAV RIFF/fmt chunks, GIF
# logical screen.  Pixel/sample decode stays stubbed; dimensions, sample
# rate and duration are genuinely extracted.
# ---------------------------------------------------------------------------


def parse_media_header(payload: bytes) -> dict:
    """Sniff the container format and parse its header fields.

    Returns {format, media_type, width, height, duration_ms} with None
    for fields the format doesn't carry or a truncated payload hides.
    Unknown/corrupt payloads → format 'unknown'."""
    out = {"format": "unknown", "media_type": "unknown",
           "width": None, "height": None, "duration_ms": None}
    p = payload or b""
    try:
        if p[:8] == b"\x89PNG\r\n\x1a\n" and len(p) >= 24 and p[12:16] == b"IHDR":
            out.update(format="png", media_type="image",
                       width=int.from_bytes(p[16:20], "big"),
                       height=int.from_bytes(p[20:24], "big"))
        elif p[:3] == b"\xff\xd8\xff":
            out.update(format="jpeg", media_type="image")
            i = 2
            while i + 9 < len(p):
                if p[i] != 0xFF:
                    break
                marker = p[i + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2
                    continue
                seg_len = int.from_bytes(p[i + 2:i + 4], "big")
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    out.update(height=int.from_bytes(p[i + 5:i + 7], "big"),
                               width=int.from_bytes(p[i + 7:i + 9], "big"))
                    break
                i += 2 + seg_len
        elif p[:4] == b"RIFF" and p[8:12] == b"WAVE":
            out.update(format="wav", media_type="audio")
            i = 12
            byte_rate = data_size = None
            while i + 8 <= len(p):
                chunk, size = p[i:i + 4], int.from_bytes(p[i + 4:i + 8], "little")
                if chunk == b"fmt " and i + 20 <= len(p):
                    byte_rate = int.from_bytes(p[i + 16:i + 20], "little")
                elif chunk == b"data":
                    data_size = size
                i += 8 + size + (size & 1)
            if byte_rate and data_size is not None:
                out["duration_ms"] = int(data_size * 1000 / byte_rate)
        elif p[:6] in (b"GIF87a", b"GIF89a") and len(p) >= 10:
            out.update(format="gif", media_type="image",
                       width=int.from_bytes(p[6:8], "little"),
                       height=int.from_bytes(p[8:10], "little"))
    except Exception:
        pass
    return out


def extract_media_meta(df: DataFrame, id_col: str, binary_col: str) -> DataFrame:
    """binary → REAL parsed metadata struct via mapInPandas (Arrow
    batches; header parsing is pure Python, no codec library).
    Output: (id, meta MEDIA_META_SCHEMA)."""
    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("meta", MEDIA_META_SCHEMA),
    ])

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = []
            for p in pdf[binary_col]:
                b = bytes(p) if p is not None else b""
                h = parse_media_header(b)
                metas.append({
                    "media_type": h["media_type"], "format": h["format"],
                    "width": h["width"], "height": h["height"],
                    "duration_ms": h["duration_ms"], "n_bytes": len(b),
                })
            yield pd.DataFrame({id_col: pdf[id_col], "meta": metas})

    return df.select(id_col, binary_col).mapInPandas(batches, out_schema)


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
