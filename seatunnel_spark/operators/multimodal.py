"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — schema, partition-preserving mapInPandas,
Arrow batch shape, deterministic fake featurizer — while the actual codec
calls are stubbed (no image/audio libs in this container): the decode seam
raises NotImplementedError unless ``fake=True``, which substitutes a
deterministic md5-seeded feature vector so the pipeline is testable
end-to-end.

Pattern: `mapInPandas` (not per-row UDFs) so each Arrow batch is processed
as one numpy block; at scale the batch size knob is
spark.sql.execution.arrow.maxRecordsPerBatch.
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
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), True),  # opaque bytes
    ]
)

FEATURE_DIM = 16


def synthesize_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table (payload = md5-chain bytes)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = hashlib.md5(f"media|{i}".encode()).digest() * (4 + i % 7)
        rows.append(
            (i, kind, f"application/x-fake-{kind}", 64 + i % 512, 64 + (i * 7) % 512,
             1000 * (i % 90), bytearray(payload))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for a real decoder: md5-fold the payload into
    FEATURE_DIM floats in [0, 1). Hashes the HEX form of the payload (not
    raw bytes) so the whole chain is expressible in ANSI SQL over VARCHAR —
    DuckDB's md5 takes no BLOBs — making this operator fully
    oracle-checkable."""
    hx = payload.hex()
    out = np.empty(FEATURE_DIM, dtype=np.float32)
    for d in range(FEATURE_DIM):
        h = hashlib.md5(f"{hx}|{d}".encode()).digest()
        out[d] = int.from_bytes(h[:4], "big") / float(1 << 32)
    return out


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """Decode + featurize via mapInPandas (Arrow batches, vectorized).

    With ``fake=False`` this is where PIL/ffmpeg/torchaudio would run;
    stubbed per the container constraints.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("kind", T.StringType(), False),
            T.StructField("n_bytes", T.LongType(), False),
            T.StructField("features", T.ArrayType(T.FloatType()), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg — not in this container"
                )
            feats = [
                _fake_decode(bytes(p)).tolist() if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "features": feats,
                }
            )

    return df.mapInPandas(batches, out_schema)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per sampled frame offset —
    pure Spark (sequence + explode), the decode itself is the stub above."""
    return (
        df.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("frame_ms"),
        )
    )
