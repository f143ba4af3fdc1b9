"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct; the
Spark-side plumbing (schema, batching, partition sizing, UDF signatures)
is real and tested, while the codec step is stubbed: the container has
no image/audio libraries, so `decode_image` raises NotImplementedError
unless a deterministic fake decoder is requested (used by tests).

Batch-shape contract: mapInPandas over Arrow record batches; binary
payloads arrive as Python bytes inside pandas object columns.  At 100 TB
the operative knobs are spark.sql.files.maxPartitionBytes (so one task's
batch of payloads fits in worker memory) and
spark.sql.execution.arrow.maxRecordsPerBatch (bounding per-batch bytes).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),      # image | audio | video
    T.StructField("payload", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ])),
])


def synth_media(spark: SparkSession, n: int,
                partitions: int | None = None) -> DataFrame:
    """Deterministic fake media table: payload = md5-stream bytes."""
    rng = spark.range(0, n, 1,
                      partitions or spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "kind": [], "payload": [], "meta": []}
            for i in pdf["id"].tolist():
                i = int(i)
                kind = ("image", "audio", "video")[i % 3]
                payload = b"".join(
                    hashlib.md5(f"media{i}:{j}".encode()).digest()
                    for j in range(4))  # 64 deterministic bytes
                rows["media_id"].append(i)
                rows["kind"].append(kind)
                rows["payload"].append(payload)
                rows["meta"].append({
                    "mime": {"image": "image/png", "audio": "audio/wav",
                             "video": "video/mp4"}[kind],
                    "width": 64 + (i % 8) * 32 if kind != "audio" else None,
                    "height": 64 + (i % 5) * 32 if kind != "audio" else None,
                    "duration_ms": (i % 30) * 1000 if kind != "image" else None,
                })
            yield pd.DataFrame(rows)

    return rng.mapInPandas(gen, schema=MEDIA_SCHEMA)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Codec boundary.  Real decode requires an image library not present
    in this container -- STUB (NotImplementedError).  `fake=True` yields a
    deterministic 8x8 grayscale array derived from the payload hash, used
    to exercise the full Spark plumbing in tests."""
    if not fake:
        raise NotImplementedError(
            "image decode requires an imaging library (e.g. Pillow); "
            "not available in this environment -- pass fake=True for the "
            "deterministic test decoder")
    h = hashlib.md5(payload).digest() * 4
    return np.frombuffer(h, dtype=np.uint8).reshape(8, 8).astype(np.float32)


_FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
    T.StructField("feat_norm", T.DoubleType()),
])


def extract_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Decode -> 8-dim feature vector (row means of the decoded array).
    The plumbing (Arrow batches, schema, per-worker batching) is the real
    production shape; only the decoder is swappable."""
    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, kinds, vecs, norms = [], [], [], []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                          pdf["payload"]):
                arr = decode_image(bytes(payload), fake=fake_decode)
                vec = arr.mean(axis=1)
                ids.append(int(mid))
                kinds.append(kind)
                vecs.append([float(x) for x in vec])
                norms.append(float(np.sqrt((vec * vec).sum())))
            yield pd.DataFrame({"media_id": ids, "kind": kinds,
                                "feature": vecs, "feat_norm": norms})

    return media.select("media_id", "kind", "payload").mapInPandas(
        feats, schema=_FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per (media_id, frame_ts) --
    computed natively from metadata (no decode), the scheduling half of a
    frame-extraction pipeline."""
    return (media.where(F.col("kind") == "video")
            .select("media_id",
                    F.explode(F.sequence(
                        F.lit(0),
                        F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                        F.lit(every_ms))).alias("frame_ts")))
