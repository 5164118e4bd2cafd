"""Multimodal (image/audio/video) column operators.

Treats media as opaque `binary` columns + typed metadata, the standard
lakehouse layout for multimodal training data.  The Spark-side plumbing —
schemas, batch iteration, partition sizing — is real and tested; the
actual codec calls are STUBBED (Pillow/ffmpeg are not in this container):
`decode_image` raises NotImplementedError unless `fake=True`, in which
case a deterministic fake decoder (seeded from the content hash) stands
in so the pipeline shape is exercised end to end.

Scale notes: media rows are huge → keep `spark.sql.files.maxPartitionBytes`
small enough that a partition of blobs fits in executor memory, and
ALWAYS select metadata columns without the blob when the blob isn't
needed (column pruning keeps the parquet reader from materializing it).
mapInPandas streams Arrow record batches, so peak memory is one batch of
blobs, not one partition.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, content_sha256 string, "
    "feature array<float>"
)


def _fake_decode(content: bytes, dim: int = 16) -> np.ndarray:
    """Deterministic stand-in for a real decoder: feature vector seeded
    from the content hash. Replace with PIL/torchvision/ffmpeg in a
    container that has them."""
    h = hashlib.sha256(content).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
    return rng.random(dim, dtype=np.float32)


def extract_features(
    df: DataFrame, dim: int = 16, fake: bool = False
) -> DataFrame:
    """Decode + feature-extract each media blob via mapInPandas (Arrow
    batch streaming — one batch of blobs in memory at a time).

    With fake=False this raises NotImplementedError at execution time:
    the decode step needs an image/audio codec library not present in
    this container. The plumbing (schema, batching, pruning) is the
    deliverable here.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "media decode requires codec libraries (PIL/ffmpeg) "
                    "not present in this container; pass fake=True for the "
                    "deterministic stand-in decoder"
                )
            feats = [
                _fake_decode(bytes(c) if c is not None else b"", dim).tolist()
                for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf["content"]],
                    "content_sha256": [
                        hashlib.sha256(bytes(c) if c is not None else b"").hexdigest()
                        for c in pdf["content"]
                    ],
                    "feature": feats,
                }
            )

    return df.mapInPandas(_batches, schema=FEATURE_SCHEMA)


def media_metadata_stats(df: DataFrame) -> DataFrame:
    """Metadata-only rollup — note: does NOT touch `content`, so the
    parquet scan prunes the blob column entirely (verify via
    .explain ReadSchema)."""
    return df.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("width").alias("avg_width"),
        F.avg("height").alias("avg_height"),
        F.sum("duration_ms").alias("total_duration_ms"),
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: explode each video row into (media_id,
    frame_ts_ms) rows — the shuffle-free fan-out that a real frame
    extractor (mapInPandas over content) would consume."""
    n_frames = (F.col("duration_ms") / every_ms).cast("int")
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
                    lambda i: i * every_ms,
                )
            ).alias("frame_ts_ms"),
        )
    )


def make_fake_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fixture generator for tests."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        content = bytes(rng.getrandbits(8) for _ in range(rng.randint(64, 256)))
        rows.append(
            (
                i,
                kind,
                content,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                rng.randint(64, 1920) if kind == "image" else None,
                rng.randint(64, 1080) if kind == "image" else None,
                rng.randint(1000, 60000) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
