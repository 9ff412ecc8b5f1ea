"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video cells are `binary` columns with a metadata struct
(modality, codec, width/height/duration). Decode / feature-extract /
resize / frame-sample run as Arrow-batched `mapInPandas` kernels so each
Python worker sees whole record batches, never single rows.

Decoding has a REAL path and a stub path:

- real (``stub=False``): `media_codecs` decodes PNG and WAV with
  stdlib-only codecs (zlib chunk walk + scanline unfiltering; wave/PCM)
  and computes genuine image/audio statistics (edge energy, RMS,
  zero-crossing rate, spectral split); Pillow — when installed — extends
  coverage to JPEG &co through the same dispatch, gated exactly like the
  Iceberg jar check. Codecs with no decoder here (mp4 video) raise
  unless ``skip_undecodable=True``, which emits null features for those
  rows instead (the honest 100 TB posture: a corpus sweep must not die
  on the first exotic codec).
- stub (``stub=True``, default): deterministic byte-histogram features
  behind the identical schema/partitioning/batch shape — the offline
  fallback for payloads that are not real media (e.g. the synthesized
  text-bytes corpus).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iceberg_geospatial_api_server_spark.operators import media_codecs

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


def synthesize_real_media(docs: DataFrame) -> DataFrame:
    """Build a multimodal table whose payloads are REAL encoded media:
    even doc_ids carry a PNG (deterministic gradient+checker image seeded
    by the id), odd ones a 16-bit PCM WAV (sine whose frequency derives
    from the id). Runs as mapInPandas so payload encoding is distributed
    exactly like decoding — this is the fixture generator for the real
    decode kernel and the driver-visible `mm_real_decode_stats` entry."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from iceberg_geospatial_api_server_spark.operators import media_codecs

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                if d % 2 == 0:
                    h, w = 12 + d % 5, 16 + d % 7
                    yy, xx = np.mgrid[0:h, 0:w]
                    img = np.stack(
                        [
                            (xx * 255 // max(w - 1, 1)).astype(np.uint8),
                            (yy * 255 // max(h - 1, 1)).astype(np.uint8),
                            (((xx + yy + d) % 2) * 255).astype(np.uint8),
                        ],
                        axis=2,
                    )
                    rows.append((d, media_codecs.encode_png(img), "image", "png"))
                else:
                    rate = 8000
                    freq = 200 + (d % 17) * 50
                    t = np.arange(rate // 10) / rate  # 100 ms clip
                    wav = media_codecs.encode_wav(
                        0.5 * np.sin(2 * np.pi * freq * t), rate
                    )
                    rows.append((d, wav, "audio", "wav"))
            yield pd.DataFrame(
                rows, columns=["doc_id", "payload", "modality", "codec"]
            )

    return docs.select("doc_id").mapInPandas(
        kernel, "doc_id long, payload binary, modality string, codec string"
    )


def _decode_batch(
    payloads: pd.Series,
    codecs: pd.Series,
    stub: bool,
    skip_undecodable: bool = False,
) -> list:
    """Decode a batch of payloads → list of 8-d feature vectors (or None).

    STUB path: deterministic byte-histogram over 8 buckets, L1-normalized.
    REAL path: dispatch by codec through media_codecs (stdlib PNG/WAV
    decoders; Pillow for JPEG &co when installed).
    """
    out: list = []
    for buf, codec in zip(payloads, codecs):
        if buf is None or len(buf) == 0:
            out.append(None)
            continue
        if stub:
            arr = np.frombuffer(buf, dtype=np.uint8)
            hist = np.bincount(arr >> 5, minlength=8).astype("f8")
            out.append(hist / hist.sum())
            continue
        try:
            out.append(media_codecs.decode_features(bytes(buf), codec))
        except NotImplementedError:
            if not skip_undecodable:
                raise
            out.append(None)
    return out


def extract_features(
    media: DataFrame, stub: bool = True, skip_undecodable: bool = False
) -> DataFrame:
    """Per-item feature extraction via mapInPandas (Arrow batches).

    ``stub=False`` runs the real decoders (see module docstring);
    ``skip_undecodable`` turns codec-coverage gaps into null features
    instead of task failures."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = _decode_batch(
                pdf["payload"], pdf["codec"], stub, skip_undecodable
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "features": feats,
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


def resize_images(
    media: DataFrame, target_w: int, target_h: int
) -> DataFrame:
    """REAL image resize for decodable codecs: decode → nearest-neighbor
    resample (numpy index grid, vectorized per image) → re-encode PNG.
    Non-image or undecodable rows pass through untouched with
    ``resized=false`` — a corpus sweep must not die on exotic codecs.
    Arrow-batched mapInPandas like every media kernel here."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from iceberg_geospatial_api_server_spark.operators import media_codecs

        for pdf in batches:
            payloads, widths, heights, resized = [], [], [], []
            for buf, codec, w, h in zip(
                pdf["payload"], pdf["codec"], pdf["width"], pdf["height"]
            ):
                ok = False
                if buf is not None and str(codec).lower() == "png":
                    try:
                        img = media_codecs.decode_png(bytes(buf))
                        # per-image index grid: source sizes vary per row
                        sy = np.arange(target_h) * img.shape[0] // target_h
                        sx = np.arange(target_w) * img.shape[1] // target_w
                        out = img[sy[:, None], sx[None, :]]
                        buf = media_codecs.encode_png(out)
                        w, h, ok = target_w, target_h, True
                    except Exception:
                        ok = False
                payloads.append(buf)
                widths.append(w)
                heights.append(h)
                resized.append(ok)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "modality": pdf["modality"],
                    "codec": pdf["codec"],
                    "width": widths,
                    "height": heights,
                    "resized": resized,
                }
            )

    schema = (
        "doc_id long, payload binary, modality string, codec string, "
        "width int, height int, resized boolean"
    )
    return media.mapInPandas(kernel, schema)


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
