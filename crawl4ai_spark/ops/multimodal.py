"""Multimodal column plumbing: image/audio/video as opaque binary +
typed metadata, processed by Arrow-batched mapInPandas stages.

The decode step itself (PIL/ffmpeg/librosa) is STUBBED in this
container — `decode_real` raises NotImplementedError by design — but
everything Spark-side is real and tested: the blob schema, the
mapInPandas batch shape, partition sizing, and a deterministic fake
decoder so pipelines exercise end-to-end. This mirrors how the
reference treats media: opaque src/bytes plus metadata
(/root/reference/crawl4ai/models.py:331-340 MediaItem), with heavy
decoding delegated to external tools (processors/pdf/processor.py).

Scale notes: blobs dominate partition size — keep
spark.sql.files.maxPartitionBytes at 128 MB and never collect blob
columns; feature outputs are small fixed-size arrays so downstream
joins/aggregations shuffle features, not bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_BLOB_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("media_ref", T.StringType()),
    T.StructField("kind", T.StringType()),          # image|audio|video
    T.StructField("blob", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ])),
])

FEATURE_DIM = 16


def decode_real(blob: bytes, kind: str):
    """Real decode (PIL/ffmpeg) — unavailable in this container."""
    raise NotImplementedError(
        "image/audio decode libraries are not installed in this "
        "environment; use fake_features (deterministic) or plug a real "
        "decoder into extract_features(decoder=...)"
    )


def fake_features(blob: bytes, kind: str) -> list[float]:
    """Deterministic stand-in decoder: a FEATURE_DIM-float signature of
    the bytes (stride sums). Same blob -> same features, everywhere."""
    if blob is None:
        return [0.0] * FEATURE_DIM
    arr = np.frombuffer(blob, dtype=np.uint8)
    if arr.size == 0:
        return [0.0] * FEATURE_DIM
    pad = (-arr.size) % FEATURE_DIM
    arr = np.pad(arr, (0, pad)).reshape(-1, FEATURE_DIM)
    return (arr.sum(axis=0) % 997).astype(np.float64).tolist()


FEATURES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("media_ref", T.StringType()),
    T.StructField("kind", T.StringType()),
    T.StructField("features", T.ArrayType(T.DoubleType())),
    T.StructField("n_bytes", T.LongType()),
])


def extract_features(blobs: DataFrame, decoder=fake_features) -> DataFrame:
    """mapInPandas feature extraction over media blobs.

    One Arrow pass per partition; output drops the blob column so only
    features shuffle downstream.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_ref": pdf["media_ref"],
                "kind": pdf["kind"],
                "features": [decoder(b, k) for b, k in zip(pdf["blob"], pdf["kind"])],
                "n_bytes": [len(b) if b is not None else 0 for b in pdf["blob"]],
            })

    return blobs.select("doc_id", "media_ref", "kind", "blob").mapInPandas(
        run, FEATURES_SCHEMA
    )


def frame_sample_plan(blobs: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (doc, media_ref, frame_ts).

    The actual frame grab is decoder work (stubbed); the plan —
    sequence + explode over duration metadata — is the real Spark-side
    shape and is fully tested.
    """
    return blobs.where(F.col("kind") == "video").select(
        "doc_id", "media_ref",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def resize_plan(blobs: DataFrame, max_side: int = 256) -> DataFrame:
    """Image resize *plan*: computes target dims from metadata (aspect
    preserved); the pixel work is decoder territory (stubbed)."""
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.when(
        F.greatest(w, h) > max_side,
        F.lit(max_side) / F.greatest(w, h).cast("double"),
    ).otherwise(F.lit(1.0))
    return blobs.where(F.col("kind") == "image").select(
        "doc_id", "media_ref",
        F.round(w * scale).cast("int").alias("target_w"),
        F.round(h * scale).cast("int").alias("target_h"),
    )
