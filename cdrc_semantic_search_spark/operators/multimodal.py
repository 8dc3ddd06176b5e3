"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / feature-extract / resize / frame-sample are
Arrow-batched ``mapInPandas`` stages.  The decode kernels themselves are
STUBBED in this sandbox (no PIL/ffmpeg in the container): a clearly
marked deterministic fake stands in behind the same UDF signature, batch
shape, and schema, so the Spark-side plumbing — what actually matters at
100 TB — is real and tested.  Swap ``_decode_image_stub`` for a real
decoder (PIL / torchvision) in production; nothing else changes.

Scale notes: binary payloads never shuffle through Python more than once;
feature extraction emits fixed-width vectors (array<float>) so downstream
joins/aggs are columnar; ``spark.sql.files.maxPartitionBytes`` governs
scan granularity for large blobs, and very large assets should be stored
as object-store pointers (url column) with payloads fetched inside the
UDF batch.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "asset_id string, media_type string, width int, height int, n_bytes long"
)


def attach_asset_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Typed metadata columns derived from the raw binary (Catalyst-only)."""
    return df.select(
        "*",
        F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
        F.xxhash64(F.col(payload_col)).alias("content_hash"),
    )


def _decode_image_stub(payload: bytes) -> np.ndarray:
    """STUB decode: deterministic fake pixels from the payload hash.

    Production: ``PIL.Image.open(io.BytesIO(payload))``. The fake keeps
    the contract (H, W, 3) uint8 so downstream shape logic is exercised.
    """
    h = zlib.crc32(payload or b"")
    rng = np.random.default_rng(h)
    return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)


def image_features(
    df: DataFrame, id_col: str = "asset_id", payload_col: str = "payload", dim: int = 16
) -> DataFrame:
    """binary → fixed-width feature vector via mapInPandas batches.

    Decode runs per Arrow batch inside one Python worker call; features
    are channel-statistics projected to ``dim`` floats (stub kernel).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf[payload_col]:
                img = _decode_image_stub(bytes(payload) if payload is not None else b"")
                flat = img.astype(np.float32).reshape(-1)
                # deterministic projection to dim features
                reps = int(np.ceil(dim * 1.0 / 6))
                stats = np.concatenate(
                    [
                        img.mean(axis=(0, 1)),
                        img.std(axis=(0, 1)),
                    ]
                ).astype(np.float32)
                vec = np.tile(stats, reps)[:dim] / 255.0
                feats.append(vec)
                del flat
            yield pd.DataFrame(
                {id_col: pdf[id_col], "features": [list(map(float, v)) for v in feats]}
            )

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=f"{id_col} string, features array<float>"
    )


def _decode_audio_stub(payload: bytes, n_samples: int = 2048) -> np.ndarray:
    """STUB decode: deterministic fake PCM from the payload hash.

    Production: ``soundfile.read(io.BytesIO(payload))`` / ffmpeg. The fake
    keeps the contract (n_samples,) float32 in [-1, 1] so the feature
    logic downstream is exercised for real.
    """
    h = zlib.crc32(payload or b"")
    rng = np.random.default_rng(h)
    return (rng.random(n_samples, dtype=np.float32) * 2.0 - 1.0)


def audio_features(
    df: DataFrame,
    id_col: str = "asset_id",
    payload_col: str = "payload",
    frame: int = 512,
) -> DataFrame:
    """binary → per-asset audio features via mapInPandas batches:
    per-frame RMS energy mean/max + zero-crossing rate. The decode kernel
    is stubbed (no audio libs in the sandbox); the framing/feature math
    and the Spark plumbing (schema, batching, fixed-width output) are
    real — swap the decoder in production, nothing else changes.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rms_mean, rms_max, zcr = [], [], []
            for payload in pdf[payload_col]:
                pcm = _decode_audio_stub(
                    bytes(payload) if payload is not None else b""
                )
                frames = pcm[: len(pcm) - len(pcm) % frame].reshape(-1, frame)
                if frames.size == 0:  # clip shorter than one frame
                    rms_mean.append(0.0)
                    rms_max.append(0.0)
                else:
                    r = np.sqrt((frames**2).mean(axis=1))
                    rms_mean.append(float(r.mean()))
                    rms_max.append(float(r.max()))
                zcr.append(
                    float((np.diff(np.signbit(pcm)) != 0).mean()) if len(pcm) > 1 else 0.0
                )
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "rms_mean": rms_mean,
                    "rms_max": rms_max,
                    "zero_crossing_rate": zcr,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        run,
        schema=f"{id_col} string, rms_mean double, rms_max double, zero_crossing_rate double",
    )


def frame_sample_plan(
    df: DataFrame,
    id_col: str = "asset_id",
    n_frames_col: str = "n_frames",
    every: int = 30,
) -> DataFrame:
    """Video frame sampling as a PLAN (Catalyst-only): one row per sampled
    frame index; the decode of each sampled frame happens in a later
    mapInPandas stage (stubbed as above)."""
    idxs = F.sequence(F.lit(0), F.greatest(F.col(n_frames_col) - 1, F.lit(0)), F.lit(every))
    return df.select(
        F.col(id_col), F.explode(idxs).alias("frame_idx")
    )
