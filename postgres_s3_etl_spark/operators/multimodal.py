"""Multimodal column plumbing (SURVEY.md §2.7).

Images / audio / video ride through the engine as opaque ``binary``
columns plus a typed metadata struct — the layout a 100 TB
training-data pipeline needs: the bytes never enter a shuffle key,
metadata predicates prune before any decode, and decode/feature
steps run as Arrow-batched ``mapInPandas`` over the partitioned
corpus.

The container has no image/audio libraries, so the actual decoders
are STUBBED: ``decode_stub=True`` (default) derives deterministic
fake features from the bytes; ``decode_stub=False`` raises
``NotImplementedError`` where a real decoder (PIL/ffmpeg/torchcodec)
would plug in. Everything Spark-side — schema, batch iteration,
column pruning, partitioning — is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: media(asset_id, media_type, width, height, duration_ms, payload)
MEDIA_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("payload_digest", StringType()),
        *[StructField(f"f{i}", LongType()) for i in range(FEATURE_DIM)],
    ]
)


def synth_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table (documents-derived bytes
    stand in for real image/audio payloads)."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"asset-{i}".encode()).digest() * (4 + i % 5)
        mt = ("image", "audio", "video")[i % 3]
        rows.append(
            (i, mt, 64 + i % 32, 48 + i % 24, 1000 + 10 * i, bytearray(payload))
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_features(payload: bytes) -> list[int]:
    """Deterministic stand-in for a real feature extractor: 8 ints
    from the md5 of the payload."""
    h = hashlib.md5(payload).digest()
    return [int.from_bytes(h[2 * i : 2 * i + 2], "big") for i in range(FEATURE_DIM)]


def extract_features(
    media: DataFrame, decode_stub: bool = True
) -> DataFrame:
    """Decode + featurize via Arrow-batched ``mapInPandas``.

    The UDF sees pandas batches (never one row at a time); the binary
    column stays within the batch — no driver collect, no shuffle of
    payload bytes. A real decoder replaces ``_fake_features`` only.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg — not in this "
                    "container; run with decode_stub=True"
                )
            payloads = pdf["payload"]
            feats = [ _fake_features(bytes(p)) for p in payloads ]
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "payload_digest": payloads.map(
                        lambda p: hashlib.md5(bytes(p)).hexdigest()
                    ),
                }
            )
            for i in range(FEATURE_DIM):
                out[f"f{i}"] = pd.Series(
                    [f[i] for f in feats], index=pdf.index, dtype="int64"
                )
            yield out

    return media.mapInPandas(batches, FEATURES_SCHEMA)


def media_stats(features: DataFrame) -> DataFrame:
    """Per-media-type stats over extracted features — plain Spark agg
    once the Python boundary is behind us."""
    return (
        features.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum("n_bytes").alias("total_bytes"),
            F.countDistinct("payload_digest").alias("n_distinct_payloads"),
            F.avg("f0").alias("avg_f0"),
        )
        .orderBy("media_type")
    )


def mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing entry (rows-only: media bytes are synthesized, no
    SQL-expressible oracle): synth media → mapInPandas featurize →
    per-type stats."""
    return media_stats(extract_features(synth_media(spark, n=64)))


FRAME_INTERVAL_MS = 250

FRAMES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_ts_ms", IntegerType()),
        StructField("frame_digest", StringType()),
    ]
)


def sample_frames(
    media: DataFrame, interval_ms: int = FRAME_INTERVAL_MS, decode_stub: bool = True
) -> DataFrame:
    """Frame sampling as a 1→N ``mapInPandas`` expansion: each video
    asset yields one row per ``interval_ms`` of duration. The real
    decoder (ffmpeg/torchcodec seek-and-decode) is stubbed with a
    deterministic digest of (payload, frame index); the Spark-side
    shape — batch iteration, row expansion inside the Arrow batch,
    metadata-only pruning before Python — is the production plumbing.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not decode_stub:
                raise NotImplementedError(
                    "real frame decode requires ffmpeg — not in this "
                    "container; run with decode_stub=True"
                )
            out_rows = []
            for asset_id, dur, payload in zip(
                pdf["asset_id"], pdf["duration_ms"], pdf["payload"]
            ):
                n_frames = max(int(dur) // interval_ms, 1)
                for i in range(n_frames):
                    digest = hashlib.md5(bytes(payload) + i.to_bytes(4, "big"))
                    out_rows.append(
                        (int(asset_id), i, i * interval_ms, digest.hexdigest())
                    )
            yield pd.DataFrame(
                out_rows,
                columns=["asset_id", "frame_idx", "frame_ts_ms", "frame_digest"],
            )

    # Metadata predicate prunes BEFORE the Python stage: only video
    # rows (and only the needed columns) cross the Arrow boundary.
    videos = media.where(F.col("media_type") == "video").select(
        "asset_id", "duration_ms", "payload"
    )
    return videos.mapInPandas(batches, FRAMES_SCHEMA)


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-facing entry (rows-only): frame-sample the synthetic
    video assets, then per-asset frame stats JVM-side."""
    frames = sample_frames(synth_media(spark, n=64))
    return (
        frames.groupBy("asset_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.max("frame_ts_ms").alias("last_frame_ts_ms"),
            F.countDistinct("frame_digest").alias("n_distinct_frames"),
        )
        .orderBy("asset_id")
    )


#: rows-only — deterministic-fake decode has no DuckDB twin.
QUERIES = {"mm_decode_stub": mm_decode_stub, "mm_frame_sample": mm_frame_sample}
ORACLES: dict[str, str] = {}
