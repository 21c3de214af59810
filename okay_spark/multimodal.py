"""Multimodal (image/audio/video) columns: opaque binary + typed metadata.

Media payloads are opaque ``binary`` columns with a typed metadata struct;
decode / feature-extraction / resize / frame-sampling run as Arrow-batched
``mapInPandas`` kernels so bytes cross the JVM->Python boundary once per
batch, never per row. The image/audio codec libraries are absent from this
container, so the decode step is STUBBED: ``use_real_codecs=True`` raises
``NotImplementedError`` at the exact seam where PIL/ffmpeg plug in, while the
default path computes deterministic fake features from the bytes — the
Spark-side plumbing (schema, batching, partition behavior, UDF signatures) is
real and tested either way.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_FEATURES_DDL = (
    "media_ref string, media_kind string, n_bytes bigint, "
    "width int, height int, duration_ms int, feature array<float>"
)


def attach_payload(catalog: DataFrame, *, payload_bytes: int = 64) -> DataFrame:
    """Give each catalog row a deterministic opaque binary payload (hash-
    derived; stands in for real image/audio bytes)."""
    chunk = F.unhex(F.md5(F.col("media_ref")))  # 16 bytes
    repeated = F.concat(*([chunk] * max(1, payload_bytes // 16)))
    return catalog.withColumn("payload", repeated.cast("binary"))


def _fake_decode(payload: bytes, kind: str, feature_dim: int) -> dict:
    """Deterministic stand-in for a real codec: derives pseudo-features from
    the payload bytes. Replace body with PIL/torchaudio/ffmpeg calls."""
    import hashlib

    digest = hashlib.sha256(payload or b"").digest()
    width = 16 + digest[0] * 4 if kind == "image" else 0
    height = 16 + digest[1] * 4 if kind == "image" else 0
    duration = (digest[2] * 256 + digest[3]) if kind in ("audio", "video") else 0
    feature = [
        (int.from_bytes(digest[4 + 2 * j : 6 + 2 * j], "big") / 65535.0) * 2 - 1
        for j in range(feature_dim)
    ]
    return {"width": width, "height": height, "duration_ms": duration, "feature": feature}


def extract_media_features(
    media: DataFrame,
    *,
    payload_col: str = "payload",
    kind_col: str = "media_kind",
    ref_col: str = "media_ref",
    feature_dim: int = 8,
    use_real_codecs: bool = False,
) -> DataFrame:
    """Decode + featurize media payloads via ``mapInPandas``.

    Batch shape: the iterator yields pandas DataFrames sized by
    ``spark.sql.execution.arrow.maxRecordsPerBatch``; the kernel is pure
    per-batch Python with no Spark calls, so it parallelizes per input
    partition. Output schema is fixed (``MEDIA_FEATURES_DDL``).
    """
    if use_real_codecs:
        raise NotImplementedError(
            "real codecs (PIL/ffmpeg/torchaudio) are not installed in this "
            "environment; wire them into _fake_decode's seam"
        )

    cols = [ref_col, kind_col, payload_col]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode(p if p is not None else b"", k, feature_dim)
                for p, k in zip(pdf[payload_col], pdf[kind_col])
            ]
            out = pd.DataFrame(
                {
                    "media_ref": pdf[ref_col].values,
                    "media_kind": pdf[kind_col].values,
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf[payload_col]],
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "duration_ms": [f["duration_ms"] for f in feats],
                    "feature": [f["feature"] for f in feats],
                }
            )
            yield out

    return media.select(*cols).mapInPandas(kernel, MEDIA_FEATURES_DDL)


def resize_images(
    media: DataFrame,
    *,
    width: int = 224,
    height: int = 224,
    payload_col: str = "payload",
    ref_col: str = "media_ref",
    use_real_codecs: bool = False,
) -> DataFrame:
    """Image-resize plumbing: (ref, width, height, resized binary) per image.

    Real path would decode -> resample -> re-encode inside the batch loop
    (PIL's ``Image.resize``); here the resized payload is a deterministic
    digest of (payload, target size) so downstream schema/partitioning/
    dedup-on-resized-bytes logic is testable without codecs. Arrow-batched:
    bytes cross the boundary once per batch."""
    if use_real_codecs:
        raise NotImplementedError("PIL is not available in this environment")

    ddl = "media_ref string, width int, height int, resized binary"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        tag = f"|{width}x{height}".encode()
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_ref": pdf[ref_col].values,
                    "width": width,
                    "height": height,
                    "resized": [
                        hashlib.sha256((p or b"") + tag).digest() for p in pdf[payload_col]
                    ],
                }
            )

    return media.select(ref_col, payload_col).mapInPandas(kernel, ddl)


def sample_frames(
    media: DataFrame,
    *,
    every_ms: int = 1000,
    payload_col: str = "payload",
    ref_col: str = "media_ref",
    use_real_codecs: bool = False,
) -> DataFrame:
    """Frame-sampling plumbing for video payloads: one output row per sampled
    frame (ref, frame_idx, ts_ms, frame binary). Decode stubbed as above."""
    if use_real_codecs:
        raise NotImplementedError("ffmpeg not available in this environment")

    ddl = "media_ref string, frame_idx int, ts_ms int, frame binary"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for ref, payload in zip(pdf[ref_col], pdf[payload_col]):
                digest = hashlib.sha256(payload or b"").digest()
                n_frames = 1 + digest[0] % 4  # fake duration-derived count
                for i in range(n_frames):
                    rows.append(
                        (ref, i, i * every_ms, hashlib.sha256(digest + bytes([i])).digest())
                    )
            yield pd.DataFrame(rows, columns=["media_ref", "frame_idx", "ts_ms", "frame"])

    return media.select(ref_col, payload_col).mapInPandas(kernel, ddl)
