"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, processed by Arrow-batched pandas
transforms (`mapInPandas`).

The container has no image/audio codecs, so the *decode* step is
stubbed (deterministic fake features derived from the bytes, or
NotImplementedError for the real path) — but the Spark-side plumbing is
real: schema, batch shape, partition sizing, and UDF signatures are
exactly what a production decode would use. At 100 TB the key
properties are (a) mapInPandas streams Arrow batches, never
materializing a partition, and (b) binary payloads never shuffle —
feature extraction happens before any wide transform.
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
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

_FEATURES_SCHEMA = "media_id long, kind string, n_bytes long, sha string, features array<float>"


def real_decode(payload: bytes, mime: str):
    """Production decode hook (PIL / torchaudio / pyav) — not available
    in this container."""
    raise NotImplementedError("media codecs not installed; use fake_features")


def fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a decode+embed step: sha256 bytes
    folded into `dim` floats in [0,1)."""
    h = hashlib.sha256(payload or b"").digest()
    reps = (dim * 4 + len(h) - 1) // len(h)
    buf = (h * reps)[: dim * 4]
    arr = np.frombuffer(buf, dtype=np.uint32, count=dim).astype(np.float64)
    return (arr / 2**32).astype(np.float32)


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, fixed-width
    feature vectors out; payload column dropped on output so downstream
    shuffles never carry blobs."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fake_features(p).tolist() for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "sha": pdf["payload"].map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "features": feats,
                }
            )

    return df.mapInPandas(run, schema=_FEATURES_SCHEMA)


_FRAMES_SCHEMA = "media_id long, frame_idx int, ts_ms long, frame_sha string"


def sample_frames(df: DataFrame, every_ms: int = 1000, max_frames: int = 64) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame
    at `every_ms` intervals (capped at `max_frames`), frame count driven
    by `meta.duration_ms`. A production decoder would seek and decode
    each frame (pyav); the stub derives a deterministic frame hash from
    (payload hex, frame index) so results are verifiable end-to-end.

    Scale shape: mapInPandas row *expansion* inside Arrow batches —
    frames never exist as a driver-side list, and the blob column is
    dropped on output so the expanded rows shuffle cheaply."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"media_id": [], "frame_idx": [], "ts_ms": [], "frame_sha": []}
            for mid, kind, payload, dur in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["duration_ms"]
            ):
                if kind != "video" or dur is None:
                    continue
                n = min(int(dur) // every_ms + 1, max_frames)
                base = (payload or b"").hex()
                for i in range(n):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(i * every_ms)
                    out["frame_sha"].append(hashlib.md5(f"{base}:{i}".encode()).hexdigest())
            yield pd.DataFrame(out).astype(
                {"media_id": "int64", "frame_idx": "int32", "ts_ms": "int64", "frame_sha": "object"}
            )

    sel = df.select(
        "media_id", "kind", "payload", F.col("meta.duration_ms").alias("duration_ms")
    )
    return sel.mapInPandas(run, schema=_FRAMES_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize for image rows (passthrough for other kinds): payload is
    replaced by the stub 'resized' bytes (sha256 of payload-hex + target
    dims — a real impl decodes/resamples/re-encodes here), meta width/
    height updated. Output schema == input schema, so resize composes
    with any downstream media op."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def resize_one(row):
                payload, kind, meta = row["payload"], row["kind"], dict(row["meta"])
                if kind == "image":
                    payload = hashlib.sha256(
                        f"{(payload or b'').hex()}:{width}x{height}".encode()
                    ).digest()
                    meta["width"], meta["height"] = width, height
                return payload, meta

            resized = pdf.apply(resize_one, axis=1)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload": [p for p, _ in resized],
                    "meta": [m for _, m in resized],
                }
            )

    return df.mapInPandas(run, schema=MEDIA_SCHEMA)


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests: payload bytes derived
    from the id."""
    base = spark.range(n).select(
        F.col("id").alias("media_id"),
        F.when(F.col("id") % 3 == 0, "image")
        .when(F.col("id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.unhex(F.sha2(F.col("id").cast("string"), 256)).alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            (F.col("id") * 1000).alias("duration_ms"),
        ).alias("meta"),
    )
    return base
