"""Multimodal (image / audio / video) column plumbing.

Policy: media is an opaque ``binary`` column plus a typed metadata struct;
all heavy per-item work (decode, resize, frame-sample, feature-extract)
runs as Arrow-batched ``mapInPandas`` stages so each task streams record
batches without materializing a partition in memory.

The sandbox image has no codec libraries, so the actual decoders are
STUBBED: ``decoder="real"`` raises NotImplementedError at the decode step
(the Spark-side plumbing — schema, partitioning, UDF signature, batch
shape — is real and tested), and ``decoder="fake"`` produces a
deterministic hash-derived feature vector so downstream stages (dedup,
ANN over the features) can be exercised end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),  # opaque payload
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.IntegerType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payload = seeded bytes) for
    exercising the plumbing."""
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        # ASCII hexdigest bytes (not the raw digest): the payload stays an
        # opaque binary column to Spark, but the DuckDB oracle can rebuild
        # it with sha256()/repeat()/substring() and verify the feature
        # extraction end-to-end (sha256(BLOB) is unavailable there)
        h = hashlib.sha256(f"{seed}:{i}".encode()).hexdigest().encode()
        payload = (h * ((i % 7) + 1))[: 32 + (i % 64)]
        kind = kinds[i % 3]
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                (64 + i % 512, 64 + (i * 3) % 512, 1000 + i, f"application/x-{kind}"),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_features(buf: bytes) -> np.ndarray:
    """Deterministic 'decode': sha256 of the payload → FEATURE_DIM floats
    in [0, 1).  Stands in for a real image/audio embedding."""
    h = hashlib.sha256(buf).digest()
    arr = np.frombuffer((h * ((FEATURE_DIM * 4) // len(h) + 1))[: FEATURE_DIM * 4], dtype=np.uint32)
    return (arr % 10_000).astype(np.float32) / 10_000.0


def extract_features(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """media rows → feature rows via mapInPandas (Arrow record batches).

    decoder="real" marks where PIL/librosa/ffmpeg would run — not available
    in this image, so it raises NotImplementedError; decoder="fake" is the
    deterministic stand-in."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real media decode requires PIL/librosa/ffmpeg — not in image; "
                    "use decoder='fake' for the deterministic stand-in"
                )
            feats = [
                None if b is None else _fake_features(bytes(b)).tolist()
                for b in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [0 if b is None else len(b) for b in pdf["content"]],
                    "features": feats,
                }
            )

    # media payloads are large: repartition so each Arrow batch holds a
    # bounded number of blobs (spark.sql.execution.arrow.maxRecordsPerBatch
    # also applies), then run the decode as a streaming per-batch map.
    return df.mapInPandas(run, _FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video → (media_id, frame_ts_ms) expansion plan, computed from typed
    metadata only (no decode): the scalable 'which frames to decode' stage
    that precedes the decode mapInPandas."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )
