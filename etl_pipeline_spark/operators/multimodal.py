"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked stub (deterministic fake features) — but everything
Spark-side is real and tested: binary column schema, typed metadata
extraction, Arrow batch shape through ``mapInPandas``, and partitioning
that keeps large blobs from skewing tasks.

Contract: a multimodal table carries ``(id, modality, content: binary,
meta: struct)``; feature extraction is ``mapInPandas`` over Arrow
batches so each Python worker sees columnar chunks, never rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "id long, modality string, byte_len int, content_hash string, "
    "feat array<double>"
)


def attach_binary(
    df: DataFrame, id_col: str, payload_col: str, modality: str
) -> DataFrame:
    """Wrap a column as an opaque binary payload with typed metadata —
    the ingestion shape for image/audio/video blobs."""
    return df.select(
        F.col(id_col).alias("id"),
        F.lit(modality).alias("modality"),
        F.encode(F.col(payload_col).cast("string"), "UTF-8").alias("content"),
        F.struct(
            F.octet_length(F.encode(F.col(payload_col).cast("string"), "UTF-8")).alias(
                "byte_len"
            ),
            F.lit(modality).alias("mime_class"),
        ).alias("meta"),
    )


def _decode_stub(content: bytes, n_dims: int = 8) -> list[float]:
    """STUB for the real decoder (PIL/librosa/ffmpeg are not in this
    container). Deterministic fake feature vector derived from the md5 of
    the content bytes so tests are stable AND the values are computable
    by the independent SQL oracle (feat[d] = uint16 at hex offset 4d of
    md5(content), scaled to [0,1]). Replace with a real decode on a
    cluster with codecs installed."""
    import hashlib

    if content is None:
        raise NotImplementedError("real decode requires codec libraries")
    if n_dims > 8:
        raise ValueError("stub features are limited to 8 dims (md5 width)")
    h = hashlib.md5(content).hexdigest()
    return [int(h[4 * d : 4 * d + 4], 16) / 65535.0 for d in range(n_dims)]


def extract_features(df: DataFrame, n_dims: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` keeps the transfer columnar; within a batch the work
    is vectorized pandas (hash via content bytes). Batch shape and
    schema are the real contract the stub fills in."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            out = pd.DataFrame(
                {
                    "id": pdf["id"],
                    "modality": pdf["modality"],
                    "byte_len": pdf["content"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "content_hash": pdf["content"].map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                    "feat": pdf["content"].map(
                        lambda b: _decode_stub(b, n_dims) if b is not None else None
                    ),
                }
            )
            yield out

    return df.mapInPandas(_extract, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = (
    "id long, modality string, frame_idx int, frame_pos int, "
    "frame_hash string, f0 double"
)


def frame_sample(
    df: DataFrame,
    id_col: str = "id",
    payload_col: str = "payload",
    modality: str = "video",
    n_frames: int = 4,
    frame_len: int = 48,
) -> DataFrame:
    """Frame sampling for temporal media: emit ``n_frames`` rows per
    payload at evenly spaced offsets (the standard keyframe-sampling
    shape for video/audio pipelines). One input row → many output rows
    THROUGH the Arrow batch — ``mapInPandas`` is the right operator for
    row-expanding extraction because the fan-out happens inside the
    Python worker without a Spark-side explode of the heavy payload.

    The frame *decode* is the documented stub (no codecs in this
    container): a "frame" is a fixed-length window of the payload and
    its feature is md5-derived — deterministic, so the independent SQL
    oracle reproduces every value. Payloads shorter than one frame are
    skipped (no full frame exists)."""
    import hashlib

    src = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(payload_col).cast("string").alias("t"),
    ).filter(F.length("t") >= frame_len)

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _id, t in zip(pdf["id"], pdf["t"]):
                span = len(t) - frame_len
                for f in range(n_frames):
                    pos = int(span * f / (n_frames - 1)) + 1  # 1-based
                    frame = t[pos - 1 : pos - 1 + frame_len]
                    h = hashlib.md5(frame.encode("utf-8")).hexdigest()
                    rows.append(
                        (_id, modality, f, pos, h, int(h[:4], 16) / 65535.0)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "modality", "frame_idx", "frame_pos",
                    "frame_hash", "f0",
                ],
            )

    return src.mapInPandas(_sample, schema=FRAME_SCHEMA)


def resize_stub(
    df: DataFrame, target_bytes: int = 256
) -> DataFrame:
    """Resize/transcode stub: binary → binary with updated metadata —
    the payload is truncated (or kept) to ``target_bytes`` in columnar
    Arrow batches; a real deployment swaps the body for PIL/ffmpeg.
    Keeps the (id, modality, content, meta) multimodal contract so the
    downstream feature/frame operators compose unchanged."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"].map(
                lambda b: b[:target_bytes] if b is not None else None
            )
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "modality": pdf["modality"],
                    "content": content,
                    "byte_len": content.map(
                        lambda b: len(b) if b is not None else 0
                    ),
                }
            )

    return df.select("id", "modality", "content").mapInPandas(
        _resize, schema="id long, modality string, content binary, byte_len int"
    )
