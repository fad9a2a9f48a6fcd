"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The decode step is STUBBED (no image/audio libraries in this container):
``decode_image_batch`` raises NotImplementedError unless
``deterministic_fake=True``, in which case it produces a seeded fake
feature vector derived from the binary's bytes — so the Spark-side
plumbing (schema, Arrow batch shape, partitioning, UDF signature) is real
and tested end-to-end while the codec is swappable.

Pattern for production: put the real decoder (PIL/torchvision/ffmpeg)
behind the same `mapInPandas` signature; nothing else changes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA_DDL = (  # matches make_media_table output (pandas ints -> bigint)
    "media_id long, mime string, width long, height long, payload binary"
)

FEATURE_DIM = 16


def media_rows(n: int = 64, seed: int = 42) -> list:
    """Deterministic fake media rows (media_id, mime, width, height,
    payload bytes) — pure function shared by make_media_table and the
    driver-side oracle precompute."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        w = int(rng.integers(16, 256))
        h = int(rng.integers(16, 256))
        payload = rng.integers(0, 256, size=64, dtype=np.uint8).tobytes()
        rows.append((i, "image/png" if i % 3 else "image/jpeg", w, h, payload))
    return rows


def make_media_table(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payloads with metadata)."""
    pdf = pd.DataFrame(
        media_rows(n, seed), columns=["media_id", "mime", "width", "height", "payload"]
    )
    return spark.createDataFrame(pdf)


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic pseudo-features: sha256-seeded uniform vector."""
    digest = hashlib.sha256(payload).digest()
    seed = int.from_bytes(digest[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.random(dim)


def decode_image_batch(payloads: pd.Series, deterministic_fake: bool = False) -> list:
    """Decode a batch of image binaries to feature vectors.

    Real decode requires an image library not present in this container.
    """
    if not deterministic_fake:
        raise NotImplementedError(
            "image decoding requires PIL/opencv; run with deterministic_fake=True "
            "or install a codec and swap this function"
        )
    return [_fake_features(p) for p in payloads]


def extract_image_features(
    df: DataFrame, payload_col: str = "payload", deterministic_fake: bool = True
) -> DataFrame:
    """(media_id, mime, features array<double>) via Arrow-batched decode.

    Partitioning note: media tables are wide (payload bytes dominate);
    keep maxRecordsPerBatch modest so Arrow batches stay under a few
    hundred MB at production payload sizes.
    """

    def fn(it):
        for pdf in it:
            feats = decode_image_batch(pdf[payload_col], deterministic_fake)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["mime"],
                    "features": [f.tolist() for f in feats],
                }
            )

    return df.mapInPandas(fn, "media_id long, mime string, features array<double>")


def resize_image(
    df: DataFrame,
    target_w: int = 64,
    target_h: int = 64,
    payload_col: str = "payload",
    deterministic_fake: bool = True,
) -> DataFrame:
    """Resize stub with real Spark plumbing: same columns out, metadata
    updated to the target dims, payload re-emitted (a real implementation
    decodes + resamples + re-encodes inside this same batch function).

    With deterministic_fake the 'resized' payload is a length-scaled
    sha256 stream of the original — deterministic, size-plausible, and
    clearly fake."""

    def fn(it):
        for pdf in it:
            if not deterministic_fake:
                raise NotImplementedError(
                    "real resize requires an image codec; run with "
                    "deterministic_fake=True or swap this function"
                )
            n_bytes = max(1, target_w * target_h // 8)
            out_payload = []
            for p in pdf[payload_col]:
                stream = b""
                seed = bytes(p)
                while len(stream) < n_bytes:
                    seed = hashlib.sha256(seed).digest()
                    stream += seed
                out_payload.append(stream[:n_bytes])
            out = pdf.copy()
            out["width"] = np.int32(target_w)
            out["height"] = np.int32(target_h)
            out[payload_col] = out_payload
            yield out

    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    return df.mapInPandas(fn, ddl)


def frame_sample_stub(df: DataFrame, every_n: int = 10, max_samples: int = 10) -> DataFrame:
    """Video frame-sampling stub: emits (media_id, frame_index) plan rows
    for every ``every_n``-th frame (0, every_n, 2*every_n, ...), capped at
    ``max_samples`` — the real sampler (which knows the true frame count
    from the decoded container) slots into the same shape."""
    return df.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0), F.lit((max_samples - 1) * every_n), F.lit(every_n)
            )
        ).alias("frame_index"),
    )
