"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas functions via
``mapInPandas``.

The decode kernels are STUBS (the container has no image/audio libraries;
each stub raises NotImplementedError unless ``fake=True`` substitutes a
deterministic synthetic result). The Spark-side contract — schemas,
batch iteration, partition sizing, UDF signatures — is real and tested:
swapping a stub for PIL/torchaudio changes one inner function, not the
pipeline.

Scale notes: binary payloads dominate row size, so ``target_rows_per_batch``
and a ``repartition`` by byte-budget (``pack_by_bytes``) keep Arrow batches
bounded; metadata-only transformations never touch the payload column
(column pruning drops it at the scan).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("codec", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("features", T.ArrayType(T.DoubleType()), True),
    ]
)


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for tests (payload = seeded
    bytes; metadata consistent with payload size)."""
    rows = []
    for i in range(n):
        payload = bytes((i * 31 + j) % 256 for j in range(128 + (i % 5) * 64))
        rows.append(
            (i, payload, ["image", "audio", "video"][i % 3],
             (64 + i % 32, 48 + i % 16, 1000 * (i % 7), "synthetic"))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_image_stub(payload: bytes, fake: bool) -> list[float]:
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/opencv (not in this container); "
            "pass fake=True for the deterministic test double"
        )
    # deterministic 8-dim "feature": byte-histogram moments
    if payload is None or len(payload) == 0:
        return [0.0] * 8
    return [float(sum(payload[k::8]) % 997) / 997.0 for k in range(8)]


def extract_image_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """payload → feature vector via Arrow-batched mapInPandas.

    Real plumbing: batch iterator in, batch iterator out, bounded memory;
    the stub kernel is the only non-production line.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: 0 if p is None else len(p)
                    ),
                    "features": pdf["payload"].map(
                        lambda p: _decode_image_stub(p, fake)
                    ),
                }
            )
            yield out

    return df.filter(F.col("media_type") == "image").mapInPandas(
        run, IMAGE_FEATURES_SCHEMA
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)


def _resize_image_stub(payload: bytes, w: int, h: int, fake: bool) -> bytes:
    if not fake:
        raise NotImplementedError(
            "image resize requires PIL/opencv (not in this container); "
            "pass fake=True for the deterministic test double"
        )
    if payload is None:
        return b""
    # deterministic "resize": truncate/tile payload to w*h bytes
    target = max(1, (w * h) // 64)
    reps = (target // max(1, len(payload))) + 1
    return (payload * reps)[:target]


def resize_images(
    df: DataFrame, width: int = 32, height: int = 32, fake: bool = False
) -> DataFrame:
    """Image resize as mapInPandas: binary in, binary out, metadata
    updated — the write-back shape (payload column replaced, not
    appended) a re-encode pipeline uses."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": pdf["payload"].map(
                        lambda p: _resize_image_stub(p, width, height, fake)
                    ),
                    "width": width,
                    "height": height,
                }
            )

    return df.filter(F.col("media_type") == "image").mapInPandas(run, RESIZED_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("rms", T.DoubleType(), True),
    ]
)


def extract_audio_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Audio feature extraction (duration passthrough + RMS-like scalar);
    stub kernel, real Arrow batch contract."""

    def rms(p: bytes) -> float:
        if not fake:
            raise NotImplementedError(
                "audio decode requires torchaudio/librosa (not in this "
                "container); pass fake=True for the deterministic double"
            )
        if p is None or len(p) == 0:
            return 0.0
        return (sum(b * b for b in p) / len(p)) ** 0.5 / 255.0

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "duration_ms": pdf["meta"].map(
                        lambda m: None if m is None else m["duration_ms"]
                    ),
                    "rms": pdf["payload"].map(rms),
                }
            )

    return df.filter(F.col("media_type") == "audio").mapInPandas(
        run, AUDIO_FEATURES_SCHEMA
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: computes per-row frame timestamps to
    sample (metadata-only — payload column pruned away), the shape a real
    decoder fans out over. Returns (media_id, frame_ts_ms array).
    """
    return df.filter(F.col("media_type") == "video").select(
        "media_id",
        F.when(
            F.col("meta.duration_ms") > 0,
            F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms)),
        )
        .otherwise(F.array().cast("array<bigint>"))
        .alias("frame_ts_ms"),
    )


def pack_by_bytes(df: DataFrame, byte_col: F.Column, target_mb: int = 64) -> DataFrame:
    """Repartition so each partition holds ~target_mb of payload — the
    knob that keeps Arrow batches and executor memory bounded when rows
    are megabytes each."""
    total = df.agg(F.sum(byte_col).alias("b")).first()["b"] or 0
    parts = max(1, int(total / (target_mb * 1024 * 1024)))
    return df.repartition(parts)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_ts_ms", T.LongType(), False),
        T.StructField("frame", T.BinaryType(), True),
    ]
)


def _decode_frame_stub(payload: bytes, ts_ms: int, fake: bool) -> bytes:
    if not fake:
        raise NotImplementedError(
            "video decode requires ffmpeg/opencv (not in this container); "
            "pass fake=True for the deterministic test double"
        )
    if payload is None or len(payload) == 0:
        return b""
    # deterministic "frame": a timestamp-keyed slice of the payload
    start = ts_ms % max(1, len(payload))
    return (payload[start:] + payload[:start])[:32]


def sample_video_frames(
    df: DataFrame, every_ms: int = 1000, fake: bool = False
) -> DataFrame:
    """Video → sampled frames, the fan-OUT multimodal shape: one input row
    becomes len(duration/every_ms) output rows.

    The timestamp plan is computed JVM-side (frame_sample_plan) and the
    payload is carried through ONE mapInPandas that explodes to frames —
    batch iterator in/out, so a 2 GB video with 300 sampled frames never
    materializes all frames of a batch's videos at once beyond the yielded
    frame rows. Decode kernel is the stub; the explode contract is real.
    """
    planned = df.filter(F.col("media_type") == "video").select(
        "media_id",
        "payload",
        F.when(
            F.col("meta.duration_ms") > 0,
            F.sequence(F.lit(0), F.col("meta.duration_ms"), F.lit(every_ms)),
        )
        .otherwise(F.array().cast("array<bigint>"))
        .alias("frame_ts_ms"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, tss, frames = [], [], []
            for mid, payload, ts_list in zip(
                pdf["media_id"], pdf["payload"], pdf["frame_ts_ms"]
            ):
                for ts in ts_list:
                    ids.append(mid)
                    tss.append(int(ts))
                    frames.append(_decode_frame_stub(payload, int(ts), fake))
            yield pd.DataFrame({"media_id": ids, "frame_ts_ms": tss, "frame": frames})

    return planned.mapInPandas(run, FRAME_SCHEMA)
