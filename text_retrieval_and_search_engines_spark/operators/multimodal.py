"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video ride as `binary` columns with a metadata struct; decode /
feature-extract / resize / frame-sample are Arrow kernels over mapInPandas.
The actual media decode is STUBBED (no image/audio libs in this container):
`decode_image` raises NotImplementedError unless `fake=True`, in which case a
deterministic fake decoder (seeded from the payload bytes) exercises the full
Spark plumbing — schema, partitioning, batch shapes — which IS real and
tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("media_id long, kind string, payload binary, "
                "width int, height int, duration_ms int")
FEATURE_DIM = 16


def synth_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=64 + (i % 5) * 32,
                               dtype=np.uint8).tobytes()
        rows.append((i, kind, bytearray(payload), 32 + i % 64, 32 + i % 48,
                     1000 * (1 + i % 30)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, out_dim: int) -> np.ndarray:
    """Deterministic fake 'decoder': stretch a sha256 of the payload into
    `out_dim` floats in [0, 1). Stands in for a real pixel/PCM decode."""
    h = hashlib.sha256(payload).digest()
    reps = (out_dim * 8 + len(h) - 1) // len(h)
    raw = np.frombuffer((h * reps)[: out_dim * 8], dtype=np.uint64)
    return (raw >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """Real decode is unavailable in this container — STUB."""
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/opencv (not in this container); "
            "pass fake=True for the deterministic test decoder")
    return _fake_decode(payload, FEATURE_DIM)


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """media -> (media_id, kind, features array<double>). Arrow batches;
    one fused pass, no shuffle."""

    def kernel(iterator):
        for pdf in iterator:
            feats = [
                decode_image(bytes(p), fake=fake).tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "features": feats,
            })

    return media.select("media_id", "kind", "payload").mapInPandas(
        kernel, schema="media_id long, kind string, features array<double>")


def resize_images(media: DataFrame, w: int, h: int, fake: bool = True
                  ) -> DataFrame:
    """Resize plumbing: filters images, emits new payload + dims. The byte
    transform is the fake decoder re-encoded (real resize would slot in)."""

    def kernel(iterator):
        for pdf in iterator:
            outs = []
            for p in pdf["payload"]:
                v = decode_image(bytes(p), fake=fake)
                outs.append(bytearray((v * 255).astype(np.uint8).tobytes()))
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "payload": outs,
                "width": np.full(len(pdf), w, dtype=np.int32),
                "height": np.full(len(pdf), h, dtype=np.int32),
            })

    return (media.filter(F.col("kind") == "image")
            .select("media_id", "payload")
            .mapInPandas(kernel, schema=("media_id long, payload binary, "
                                         "width int, height int")))


def sample_frames(media: DataFrame, every_ms: int = 5000) -> DataFrame:
    """Frame-sampling plumbing for videos: one row per sampled timestamp
    (JVM-side sequence+explode; the frame decode would be a follow-up
    kernel)."""
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "duration_ms",
                F.explode(F.sequence(
                    F.lit(0), F.col("duration_ms") - 1,
                    F.lit(every_ms))).alias("frame_ts_ms"))
    )
