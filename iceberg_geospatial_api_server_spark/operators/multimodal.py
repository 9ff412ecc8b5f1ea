"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video cells are `binary` columns with a metadata struct
(modality, codec, width/height/duration). Decode / feature-extract /
resize / frame-sample run as Arrow-batched `mapInPandas` kernels so each
Python worker sees whole record batches, never single rows.

The actual media decoding is STUBBED (this container has no image/audio
libraries): `decode_stub=True` produces a deterministic fake decode
(byte-histogram features) behind the same schema/partitioning/batch shape
the real kernel would use; swapping in PIL/ffmpeg later changes only the
body of `_decode_batch`.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, payload binary, modality string, codec string, "
    "width int, height int, n_frames int"
)


def synthesize_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Build a multimodal table from the documents corpus: the UTF-8 bytes
    of the text stand in for an encoded media payload, with metadata
    derived deterministically (so the pipeline is fully testable offline)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
        .alias("modality"),
        F.when(F.col("doc_id") % 3 == 0, "png")
        .when(F.col("doc_id") % 3 == 1, "wav")
        .otherwise("mp4")
        .alias("codec"),
        (F.col("doc_id") % 640 + 16).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 16).cast("int").alias("height"),
        (F.col("doc_id") % 30 + 1).cast("int").alias("n_frames"),
    )


def _decode_batch(payloads: pd.Series, stub: bool) -> np.ndarray:
    """Decode a batch of payloads → (n, 8) feature matrix.

    STUB path: deterministic byte-histogram over 8 buckets, L1-normalized
    — stands in for a real decoder+embedder.
    Real path: would decode via PIL/torchaudio/ffmpeg here.
    """
    if not stub:
        raise NotImplementedError(
            "real media decoding requires image/audio libs not present "
            "in this environment; run with stub=True"
        )
    out = np.zeros((len(payloads), 8), dtype="f8")
    for i, buf in enumerate(payloads):
        if buf is None or len(buf) == 0:
            continue
        arr = np.frombuffer(buf, dtype=np.uint8)
        hist = np.bincount(arr >> 5, minlength=8).astype("f8")
        out[i] = hist / hist.sum()
    return out


def extract_features(
    media: DataFrame, stub: bool = True, batch_note: str = "byte-histogram"
) -> DataFrame:
    """Per-item feature extraction via mapInPandas (Arrow batches)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = _decode_batch(pdf["payload"], stub)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "features": list(feats),
                }
            )

    schema = "doc_id long, modality string, n_bytes long, features array<double>"
    return media.mapInPandas(kernel, schema)


def resize_stub(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize metadata transform (decode stubbed): scales the logical
    dimensions and annotates the op; payload passes through untouched."""
    return media.withColumn("width", F.lit(target_w).cast("int")).withColumn(
        "height", F.lit(target_h).cast("int")
    ).withColumn("resize_op", F.lit(f"stub:{target_w}x{target_h}"))


def frame_sample(media: DataFrame, every_k: int = 5) -> DataFrame:
    """Frame sampling plan: one output row per sampled frame index —
    explode on a JVM-generated sequence (no Python), so a billion-video
    corpus fans out map-side with no shuffle."""
    idx = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_k))
    return media.filter(F.col("modality") == "video").select(
        "doc_id",
        "codec",
        F.explode(idx).alias("frame_idx"),
        F.col("payload").alias("frame_payload_ref"),
    )


def media_stats(media: DataFrame) -> DataFrame:
    """Per-modality payload statistics (oracle-checkable surface)."""
    return (
        media.groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.length("payload")).alias("total_bytes"),
            F.min(F.length("payload")).cast("long").alias("min_bytes"),
            F.max(F.length("payload")).cast("long").alias("max_bytes"),
        )
        .orderBy("modality")
    )
