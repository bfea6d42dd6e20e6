"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched Pandas UDFs over mapInPandas.

The decode step is STUBBED (image/audio libraries are not in this container):
`decode_image_meta` computes deterministic fake features from the bytes so
the Spark-side plumbing — schema, batching, partitioning, UDF signature — is
real and tested. Swap `_fake_decode` for PIL/ffmpeg in production; the plan
shape does not change.

Scale notes: binary payloads ride the scan; mapInPandas streams Arrow
batches so peak memory is one batch per core, controlled by
spark.sql.execution.arrow.maxRecordsPerBatch. Partition by size upstream
when payloads are skewed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Canonical multimodal row: opaque payload + typed metadata struct.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField(
            "media_type",
            StructType(
                [StructField("kind", StringType()), StructField("mime", StringType())]
            ),
        ),
    ]
)


def attach_binary_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata columns computed JVM-side: byte length + content hash."""
    return df.withColumn("payload_bytes", F.length(F.col(payload_col)).cast("long")).withColumn(
        "payload_hash", F.xxhash64(F.col(payload_col))
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image decode: (width, height, channels)
    derived from a content hash. md5, NOT python hash() — hash() is
    per-process salted and would differ across executors/runs, and md5 (vs
    the earlier crc32) is reproducible by the DuckDB oracle, making the
    decode plumbing value-checkable, not just rows-checkable."""
    import hashlib

    if payload is None:
        return (0, 0, 0)
    h = int(hashlib.md5(bytes(payload)).hexdigest()[:15], 16)
    return (64 + h % 512, 64 + (h >> 9) % 512, 3)


DECODED_FIELDS = "media_id long, width int, height int, channels int, n_bytes long"


def decode_image_meta(df: DataFrame, id_col: str = "media_id", payload_col: str = "payload") -> DataFrame:
    """mapInPandas decode: Arrow-batched, one pass, no collect. The UDF
    signature/batch shape is the production one; only `_fake_decode` is a
    stub (no image libs in this container — raises nothing, returns
    deterministic fakes)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [_fake_decode(p) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "width": [m[0] for m in meta],
                    "height": [m[1] for m in meta],
                    "channels": [m[2] for m in meta],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf[payload_col]],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(decode, DECODED_FIELDS)


def frame_sample_stub(df: DataFrame, every_n: int = 10, bytes_per_frame: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing stub: explodes frame indices 0..n-1
    step every_n from a (fake) frame count derived from payload size."""
    n_frames = (F.col("payload_bytes") / bytes_per_frame).cast("long")
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    return df.withColumn("frame_idx", F.explode(idx))


def audio_frame_stub(
    df: DataFrame,
    window_samples: int = 400,
    hop_samples: int = 160,
    bytes_per_sample: int = 2,
) -> DataFrame:
    """Audio framing plumbing stub (the STFT/feature-window front end):
    treats the payload as 16-bit PCM, cuts overlapping analysis frames of
    ``window_samples`` every ``hop_samples`` (the standard 25ms/10ms shape
    at 16kHz), and explodes one row per frame with its start-sample
    offset. Real decode needs ffmpeg (not in this container); the frame
    arithmetic, schema, and explode-parallel fan-out are the real
    contract. Generation is in-row (sequence + explode) — at 100 TB the
    frame rows never pass through the driver."""
    n_samples = F.floor(F.col("payload_bytes") / F.lit(bytes_per_sample)).cast("long")
    # guard before dividing: engines disagree on negative integer division
    # (floor vs truncate-toward-zero), so the shorter-than-one-window case
    # must never reach the divide
    n_frames = F.when(
        n_samples >= window_samples,
        F.floor((n_samples - window_samples) / F.lit(hop_samples)) + 1,
    ).otherwise(F.lit(0)).cast("long")
    idx = F.sequence(F.lit(0), n_frames - 1)
    return (
        df.filter(n_frames > 0)
        .withColumn("frame_idx", F.explode(idx))
        .withColumn(
            "start_sample", (F.col("frame_idx") * hop_samples).cast("long")
        )
        .withColumn("n_samples", n_samples)
    )


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image-resize plumbing stub: real pixel work needs an image lib (not
    in this container) — the Spark-side contract is what matters: the
    payload column rides along untouched, target dims become metadata, and
    the (fake) output size is the decoded-frame budget planners need.
    Swap `resized_bytes` for the real re-encoded binary in production."""
    return (
        df.withColumn("target_width", F.lit(width))
        .withColumn("target_height", F.lit(height))
        .withColumn("resized_bytes", F.lit(width * height * 3).cast("long"))
    )


FEATURE_DIM = 8


def extract_features_stub(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """Feature-extraction plumbing: Arrow-batched mapInPandas emitting a
    fixed-width double vector per payload. The embedding net is STUBBED
    (deterministic per-slot hash: feature[i] = md5(payload ++ ':' ++ i)
    prefix mod 1000 / 1000 — md5 so the DuckDB oracle reproduces every
    value); schema, batch shape, and partition-parallel execution are the
    production ones."""
    import hashlib

    out_schema = f"{id_col} long, features array<double>"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf[payload_col]:
                b = bytes(p) if p is not None else b""
                feats.append(
                    [
                        int(
                            hashlib.md5(b + f":{i}".encode()).hexdigest()[:15], 16
                        ) % 1000 / 1000.0
                        for i in range(FEATURE_DIM)
                    ]
                )
            yield pd.DataFrame({id_col: pdf[id_col].astype("int64"), "features": feats})

    return df.select(id_col, payload_col).mapInPandas(extract, out_schema)
