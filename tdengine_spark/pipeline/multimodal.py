"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The decode kernels themselves are STUBBED (this container ships no
image/audio libraries — see ``_decode_image_bytes``); everything around
them — schemas, batch iteration, partition sizing, UDF signatures — is
real and tested. Swapping the stub for PIL/librosa is a one-function
change.

Scale notes: mapInPandas streams Arrow batches through the Python worker
(no per-row pickling); ``spark.sql.execution.arrow.maxRecordsPerBatch``
bounds peak memory when binary payloads are MBs. Repartition by a size
estimate before heavy decode so one straggler file can't skew a task.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: schema of a multimodal asset table: payload + typed metadata
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("payload_hash", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _decode_image_bytes(payload: bytes) -> tuple[int, int, list[float]]:
    """STUB decode: deterministic fake (width/height from byte stats, an
    8-dim byte-histogram 'feature'). Replace with PIL:

        from PIL import Image; img = Image.open(io.BytesIO(payload))
        return img.width, img.height, extract(img)
    """
    if payload is None or len(payload) == 0:
        raise ValueError("empty payload")
    n = len(payload)
    width = 1 + payload[0] % 64
    height = 1 + payload[-1] % 64
    hist = [0.0] * 8
    for b in payload[:4096]:
        hist[b >> 5] += 1.0
    total = sum(hist) or 1.0
    return width, height, [h / total for h in hist]


def decode_images(assets: DataFrame, batch_size: int = 64) -> DataFrame:
    """payload → (width, height, n_bytes, payload_hash, feature[8]) via
    Arrow-batched mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # columnar batch walk (no iterrows: building a pandas Row object
        # per record costs more than the decode stub itself); the decode
        # kernel stays a per-payload swap point for PIL/librosa
        for pdf in batches:
            widths, heights, feats = [], [], []
            for payload in pdf["payload"].tolist():
                try:
                    w, h, feat = _decode_image_bytes(payload)
                except (ValueError, TypeError):
                    w = h = feat = None
                widths.append(w)
                heights.append(h)
                feats.append(feat)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].to_numpy(),
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                    "n_bytes": [
                        len(p) if p is not None else 0
                        for p in pdf["payload"].tolist()
                    ],
                    "payload_hash": pd.array(
                        [None] * len(pdf), dtype="Int64"
                    ),
                    "feature": feats,
                },
                columns=[f.name for f in IMAGE_FEATURES_SCHEMA],
            )

    with_hash = assets.where(F.col("modality") == "image")
    decoded = with_hash.select("asset_id", "payload").mapInPandas(
        run, IMAGE_FEATURES_SCHEMA
    )
    # payload hash is cheaper JVM-side; join it back in
    hashes = with_hash.select("asset_id", F.xxhash64("payload").alias("payload_hash2"))
    return (
        decoded.drop("payload_hash")
        .join(hashes, "asset_id")
        .withColumnRenamed("payload_hash2", "payload_hash")
    )


def sample_frames(
    assets: DataFrame, every_n_bytes: int = 1024, frame_bytes: int = 16
) -> DataFrame:
    """Video 'frame sampling' plumbing: slice the payload every N bytes
    (stub for ffmpeg keyframe extraction). Emits one row per frame —
    demonstrates the explode-shaped output a real sampler needs."""
    frames = F.expr(
        f"""
        transform(
          sequence(0, greatest(cast(length(payload) / {every_n_bytes} as int) - 1, 0)),
          i -> struct(i as frame_idx,
                      substring(payload, i * {every_n_bytes} + 1, {frame_bytes}) as frame)
        )
        """
    )
    return (
        assets.where(F.col("modality") == "video")
        .select("asset_id", F.explode(frames).alias("f"))
        .select("asset_id", "f.frame_idx", "f.frame")
    )


def synthetic_assets(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake asset table for tests (payload = seeded bytes)."""
    import random

    rnd = random.Random(seed)
    rows = []
    for i in range(n):
        modality = ("image", "audio", "video")[i % 3]
        payload = bytes(rnd.randrange(256) for _ in range(rnd.randrange(64, 2048)))
        rows.append((i, modality, f"application/x-{modality}", payload, {"k": str(i)}))
    return spark.createDataFrame(rows, ASSET_SCHEMA)
