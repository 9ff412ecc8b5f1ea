"""Multimodal pipeline: real stdlib codecs + the mapInPandas kernels.

Parity target: the reference ingests media through its upload path
(reference api/main.py) and treats payloads as opaque binaries with typed
metadata; here the decode kernel is REAL for PNG/WAV (stdlib) and the
Spark plumbing (schema, Arrow batching, null handling) is exercised
end-to-end on genuine encoded bytes.
"""

import struct
import zlib

import numpy as np
import pytest

from iceberg_geospatial_api_server_spark.operators import media_codecs as mc

# ---------------------------------------------------------------------------
# codecs, pure-python level
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_round_trip(channels):
    rng = np.random.default_rng(7 + channels)
    img = rng.integers(0, 256, size=(9, 13, channels), dtype=np.uint8)
    out = mc.decode_png(mc.encode_png(img))
    assert out.shape == (9, 13, channels)
    np.testing.assert_array_equal(out, img)


def test_png_decode_golden_all_filters():
    """Decode scanlines filtered with Sub/Up/Average/Paeth built BY HAND —
    catches encoder/decoder circularity (encode_png only emits filter 0)."""
    img = np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3) * 3
    h, w, ch = img.shape
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    # row 0: Sub, row 1: Up, row 2: Average, row 3: Paeth
    for y, ftype in enumerate([1, 2, 3, 4]):
        raw.append(ftype)
        for x in range(stride):
            left = flat[y, x - ch] if x >= ch else 0
            up = flat[y - 1, x] if y > 0 else 0
            ul = flat[y - 1, x - ch] if (y > 0 and x >= ch) else 0
            if ftype == 1:
                pred = left
            elif ftype == 2:
                pred = up
            elif ftype == 3:
                pred = (left + up) // 2
            else:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
            raw.append((flat[y, x] - pred) & 0xFF)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    buf = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    np.testing.assert_array_equal(mc.decode_png(buf), img)


def test_png_rejects_non_png():
    with pytest.raises(ValueError):
        mc.decode_png(b"GIF89a not a png")


def test_wav_round_trip():
    rate = 16000
    t = np.arange(1600) / rate
    sig = 0.25 * np.sin(2 * np.pi * 440 * t)
    samples, out_rate = mc.decode_wav(mc.encode_wav(sig, rate))
    assert out_rate == rate
    assert samples.shape == (1600, 1)
    np.testing.assert_allclose(samples[:, 0], sig, atol=1.5 / 32768)


def test_wav_stereo_round_trip():
    rng = np.random.default_rng(3)
    sig = rng.uniform(-0.9, 0.9, size=(500, 2))
    samples, rate = mc.decode_wav(mc.encode_wav(sig, 8000))
    assert rate == 8000 and samples.shape == (500, 2)
    np.testing.assert_allclose(samples, sig, atol=1.5 / 32768)


def test_image_features_constant_image():
    img = np.full((10, 20, 3), 77, dtype=np.uint8)
    f = mc.image_features(img)
    assert f[:3].tolist() == [10, 20, 3]
    assert f[3] == pytest.approx(77) and f[4] == 0 and f[7] == 0


def test_audio_features_sine():
    rate, freq = 8000, 400
    t = np.arange(rate) / rate  # exactly 1 s
    f = mc.audio_features(0.5 * np.sin(2 * np.pi * freq * t)[:, None], rate)
    assert f[0] == pytest.approx(1.0)  # duration
    assert f[1] == rate and f[2] == 1
    assert f[3] == pytest.approx(0.5 / np.sqrt(2), rel=1e-3)  # RMS
    # a 400 Hz sine crosses zero 2·freq times per second
    assert f[5] == pytest.approx(2 * freq / rate, rel=0.02)


def test_decode_features_unknown_codec_raises():
    with pytest.raises(NotImplementedError):
        mc.decode_features(b"\x00\x01", "mp4")


def test_media_decode_available():
    assert mc.media_decode_available("png")
    assert mc.media_decode_available("wav")
    assert mc.media_decode_available("jpeg") == mc.pil_available()
    assert not mc.media_decode_available("mp4")


@pytest.mark.skipif(not mc.pil_available(), reason="Pillow not installed")
def test_jpeg_via_pil():
    import io

    import PIL.Image

    img = np.zeros((8, 8, 3), dtype=np.uint8)
    img[:, :4] = 255
    bio = io.BytesIO()
    PIL.Image.fromarray(img).save(bio, format="JPEG")
    f = mc.decode_features(bio.getvalue(), "jpeg")
    assert f[0] == 8 and f[1] == 8 and f[2] == 3


# ---------------------------------------------------------------------------
# Spark kernels
# ---------------------------------------------------------------------------


def test_extract_features_real_kernel(spark, sf_dir):
    from pyspark.sql import functions as F

    from iceberg_geospatial_api_server_spark.operators.multimodal import (
        extract_features,
        synthesize_real_media,
    )
    from iceberg_geospatial_api_server_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(40)
    media = synthesize_real_media(docs)
    out = extract_features(media, stub=False).collect()
    assert len(out) == 40
    by_id = {r["doc_id"]: r for r in out}
    for doc_id, row in by_id.items():
        feats = row["features"]
        assert feats is not None and len(feats) == 8
        if doc_id % 2 == 0:  # PNG: h, w, ch lead the vector
            assert row["modality"] == "image"
            assert feats[0] == 12 + doc_id % 5
            assert feats[1] == 16 + doc_id % 7
            assert feats[2] == 3
        else:  # WAV: 100 ms @ 8 kHz mono
            assert row["modality"] == "audio"
            assert feats[0] == pytest.approx(0.1)
            assert feats[1] == 8000 and feats[2] == 1
            # 0.5-amplitude sine RMS
            assert feats[3] == pytest.approx(0.5 / np.sqrt(2), rel=0.05)
    # determinism: kernel output is stable across runs
    again = {
        r["doc_id"]: r["features"]
        for r in extract_features(media, stub=False).collect()
    }
    assert all(again[d] == by_id[d]["features"] for d in by_id)


def test_extract_features_undecodable_skip(spark):
    from iceberg_geospatial_api_server_spark.operators.multimodal import (
        extract_features,
    )

    media = spark.createDataFrame(
        [(1, b"\x00\x01\x02", "video", "mp4")],
        "doc_id long, payload binary, modality string, codec string",
    )
    rows = extract_features(media, stub=False, skip_undecodable=True).collect()
    assert rows[0]["features"] is None
    with pytest.raises(Exception, match="(?i)no decoder"):
        extract_features(media, stub=False).collect()


def test_extract_features_stub_unchanged(spark, sf_dir):
    """The driver-visible stub path keeps its contract: 8-bucket
    byte-histogram features over the synthesized text-byte payloads."""
    from iceberg_geospatial_api_server_spark.operators.multimodal import (
        extract_features,
        synthesize_media,
    )
    from iceberg_geospatial_api_server_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(5)
    rows = extract_features(synthesize_media(docs), stub=True).collect()
    for r in rows:
        assert len(r["features"]) == 8
        assert sum(r["features"]) == pytest.approx(1.0)


def test_resize_images_real(spark, sf_dir):
    """Real nearest-neighbor resize on real PNGs: output decodes to the
    target dims with resampled content; non-PNG rows pass through with
    resized=false and untouched payload."""
    from pyspark.sql import functions as F

    from iceberg_geospatial_api_server_spark.operators.multimodal import (
        resize_images,
        synthesize_real_media,
    )
    from iceberg_geospatial_api_server_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(10)
    media = synthesize_real_media(docs).withColumn(
        "width", F.lit(0)
    ).withColumn("height", F.lit(0))
    out = {r["doc_id"]: r for r in resize_images(media, 8, 6).collect()}
    originals = {r["doc_id"]: r for r in media.collect()}
    assert len(out) == 10
    for doc_id, row in out.items():
        if doc_id % 2 == 0:  # PNG rows resize
            assert row["resized"] is True
            assert (row["width"], row["height"]) == (8, 6)
            img = mc.decode_png(bytes(row["payload"]))
            assert img.shape == (6, 8, 3)
            src = mc.decode_png(bytes(originals[doc_id]["payload"]))
            # nearest-neighbor: every output pixel exists in the source
            # at the mapped grid position
            sy = np.arange(6) * src.shape[0] // 6
            sx = np.arange(8) * src.shape[1] // 8
            np.testing.assert_array_equal(img, src[sy[:, None], sx[None, :]])
        else:  # WAV rows pass through untouched
            assert row["resized"] is False
            assert bytes(row["payload"]) == bytes(
                originals[doc_id]["payload"]
            )


def test_phash_real_decode_invariances(spark):
    """pHash on the REAL decode path: scale- and brightness-invariant,
    discriminative between unrelated structures."""
    import numpy as np

    from iceberg_geospatial_api_server_spark.operators import media_codecs
    from iceberg_geospatial_api_server_spark.operators.multimodal import (
        phash64_of_gray,
    )

    rng = np.random.RandomState(7)
    base = rng.randint(0, 256, size=(8, 8)).astype("f8")
    small = base.repeat(4, axis=0).repeat(4, axis=1)  # 32x32
    big = base.repeat(8, axis=0).repeat(8, axis=1)  # 64x64
    h_small, h_big = phash64_of_gray(small), phash64_of_gray(big)
    assert bin(h_small ^ h_big).count("1") <= 2  # resize-invariant
    bright = np.clip(small + 30.0, 0, 255)
    assert bin(h_small ^ phash64_of_gray(bright)).count("1") <= 2
    other = rng.randint(0, 256, size=(8, 8)).astype("f8").repeat(4, 0).repeat(4, 1)
    assert bin(h_small ^ phash64_of_gray(other)).count("1") >= 16
    # PNG encode -> stdlib decode round-trip preserves the hash exactly
    rgb = np.stack([small, small, small], axis=2).astype(np.uint8)
    dec = media_codecs.decode_png(media_codecs.encode_png(rgb))
    assert phash64_of_gray(dec.astype("f8").mean(axis=2)) == phash64_of_gray(
        small.astype(np.uint8).astype("f8")
    )


def test_phash_pairs_planted_neardups(spark, sf_dir):
    from pyspark.sql import functions as F

    from iceberg_geospatial_api_server_spark.operators.multimodal import (
        image_phash,
        phash_dedup_pairs,
        synthesize_image_corpus,
    )
    from iceberg_geospatial_api_server_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(100)
    media = synthesize_image_corpus(docs, neardup_every=10)
    hashes = image_phash(media, stub=False)
    pairs = phash_dedup_pairs(hashes, max_hamming=3).collect()
    ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    planted = {
        (d - 1, d) for d in ids if d % 10 == 1 and d > 0 and d - 1 in ids
    }
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert planted <= got  # every planted near-dup recovered
    extras = got - planted
    assert len(extras) <= len(planted) // 5  # essentially no false positives
    assert all(r["hamming"] <= 3 for r in pairs)


def test_image_phash_stub_and_null_paths(spark):
    from iceberg_geospatial_api_server_spark.operators.multimodal import (
        image_phash,
    )

    media = spark.createDataFrame(
        [
            (1, b"some payload bytes", "image", "png"),
            (2, None, "image", "png"),
            (3, b"\x00" * 10, "video", "mp4"),
        ],
        "doc_id long, payload binary, modality string, codec string",
    )
    stub = {r["doc_id"]: r["phash"] for r in image_phash(media, stub=True).collect()}
    assert stub[2] is None and stub[1] is not None and stub[3] is not None
    # real path: undecodable codecs yield null with skip, raise without
    real = {
        r["doc_id"]: r["phash"]
        for r in image_phash(media, stub=False, skip_undecodable=True).collect()
    }
    assert real.get(1) is None  # not a real PNG -> undecodable -> null


def test_phash_pairs_incremental_mode(spark, sf_dir):
    """incremental(new, against=old) ≡ the full-run pairs touching a new
    image — same contract as the text dedup family."""
    from pyspark.sql import functions as F

    from iceberg_geospatial_api_server_spark.operators.multimodal import (
        image_phash,
        phash_dedup_pairs,
        synthesize_image_corpus,
    )
    from iceberg_geospatial_api_server_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(120)
    hashes = image_phash(
        synthesize_image_corpus(docs, neardup_every=10), stub=False
    )
    old = hashes.filter(F.col("doc_id") < 60)
    new = hashes.filter(F.col("doc_id") >= 60)
    inc = {
        (r["id_a"], r["id_b"])
        for r in phash_dedup_pairs(new, against=old).collect()
    }
    full = {
        (r["id_a"], r["id_b"])
        for r in phash_dedup_pairs(hashes).collect()
    }
    touching_new = {p for p in full if p[0] >= 60 or p[1] >= 60}
    assert inc == touching_new
    assert inc  # non-vacuous: boundary near-dup pairs exist across the split


def test_phash_property_invariances():
    """Property-test the DCT hash's algebraic invariances: scaling all
    intensities by c>0 scales every DCT coefficient by c and leaves the
    median-threshold bits EXACTLY unchanged; adding a constant moves
    only the DC coefficient (the 63 AC bits are shift-invariant)."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from iceberg_geospatial_api_server_spark.operators.multimodal import (
        phash64_of_gray,
    )

    @settings(max_examples=25, deadline=None)
    @given(
        seed=st.integers(0, 2**31 - 1),
        h=st.integers(8, 64),
        w=st.integers(8, 64),
        scale=st.floats(0.1, 7.5),
        shift=st.floats(-40.0, 40.0),
    )
    def check(seed, h, w, scale, shift):
        rng = np.random.RandomState(seed)
        img = rng.rand(h, w) * 255.0
        base = phash64_of_gray(img)
        assert phash64_of_gray(img * scale) == base
        shifted = phash64_of_gray(img + shift)
        assert shifted & ~1 == base & ~1  # clear the DC bit (bit 0)

    check()


@pytest.mark.skipif(not mc.pil_available(), reason="Pillow not installed")
def test_image_phash_jpeg_via_pil(spark):
    """The real phash path dispatches through decode_image, so jpeg
    payloads hash when Pillow is installed (a decode_png-only gate
    nulled every non-PNG image)."""
    import io

    import PIL.Image

    from iceberg_geospatial_api_server_spark.operators.multimodal import (
        image_phash,
    )

    img = (np.random.RandomState(5).rand(32, 32, 3) * 255).astype(np.uint8)
    bio = io.BytesIO()
    PIL.Image.fromarray(img).save(bio, format="JPEG")
    media = spark.createDataFrame(
        [(1, bio.getvalue(), "image", "jpeg")],
        "doc_id long, payload binary, modality string, codec string",
    )
    rows = image_phash(media, stub=False).collect()
    assert rows[0]["phash"] is not None


def test_decode_image_dispatch():
    """decode_image: png via the stdlib codec; unknown codecs raise
    NotImplementedError (never silently fall through to decode_png)."""
    img = np.zeros((4, 4, 3), dtype=np.uint8)
    dec = mc.decode_image(mc.encode_png(img), "png")
    assert dec.shape == (4, 4, 3)
    with pytest.raises(NotImplementedError):
        mc.decode_image(b"\x00" * 10, "tiff")
    if not mc.pil_available():
        with pytest.raises(NotImplementedError):
            mc.decode_image(b"\x00" * 10, "jpeg")


def test_audio_fingerprint_planted_neardups(spark, tables):
    """Same-frequency sine clips (synthesize_real_media repeats freq
    every 17 odd ids) fingerprint identically; the block-join pair
    machinery finds them; different frequencies differ."""
    from iceberg_geospatial_api_server_spark.operators.multimodal import (
        audio_fingerprint,
        phash_dedup_pairs,
        synthesize_real_media,
    )

    media = synthesize_real_media(tables["documents"].limit(120))
    fps = audio_fingerprint(media, stub=False)
    rows = {r.doc_id: r.phash for r in fps.collect()}
    # only odd ids are WAV; evens filtered out by the modality gate
    assert all(d % 2 == 1 for d in rows)
    # ids 1 and 35 share freq (1 % 17 == 35 % 17) and duration
    assert rows[1] == rows[35]
    # 1 and 3 have different frequencies -> different fingerprints
    assert rows[1] != rows[3]
    pairs = phash_dedup_pairs(fps, max_hamming=2).collect()
    found = {(p.id_a, p.id_b) for p in pairs}
    assert (1, 35) in found
    assert all(a % 2 == 1 and b % 2 == 1 for a, b in found)


def test_audio_fingerprint_amplitude_invariance():
    """Sign-of-band-energy-delta never flips under uniform gain — the
    robustness property the Haitsma-Kalker family is chosen for."""
    import numpy as np

    from iceberg_geospatial_api_server_spark.operators.multimodal import (
        afp64_of_samples,
    )

    rng = np.random.RandomState(3)
    clip = rng.normal(0, 0.3, 800) + np.sin(np.arange(800) * 0.2)
    base = afp64_of_samples(clip)
    for gain in (0.1, 0.5, 2.0, 10.0):
        assert afp64_of_samples(clip * gain) == base
    # a genuinely different clip must differ
    other = rng.normal(0, 0.3, 800)
    assert afp64_of_samples(other) != base


def test_scene_cuts_planted_boundaries(spark):
    """Frame sequences with scenes every 8 frames: cuts must land
    exactly at the planted boundaries (8, 16) and nowhere else; the
    in-scene vs at-cut hamming separation must be wide."""
    from iceberg_geospatial_api_server_spark.operators.multimodal import (
        scene_cuts,
        synthesize_frame_corpus,
    )

    docs = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    frames = synthesize_frame_corpus(docs, n_frames=24, scene_every=8)
    assert frames.count() == 4 * 24
    out = {r.doc_id: r for r in scene_cuts(frames, hamming_threshold=16).collect()}
    for d in range(4):
        r = out[d]
        assert r.n_frames == 24
        assert r.n_cuts == 2, d  # scenes start at 0, 8, 16 → cuts at 8 and 16
        assert r.first_cut == 8
        # pHash is noise-robust in-scene and far across scenes
        assert r.in_scene_hamming_c < 800  # < 8 bits avg
        assert r.at_cut_hamming_c > 1600  # > 16 bits avg


def test_scene_cuts_single_scene_video(spark):
    from iceberg_geospatial_api_server_spark.operators.multimodal import (
        scene_cuts,
        synthesize_frame_corpus,
    )

    docs = spark.createDataFrame([(7,)], "doc_id long")
    frames = synthesize_frame_corpus(docs, n_frames=6, scene_every=100)
    r = scene_cuts(frames, hamming_threshold=16).collect()[0]
    assert r.n_cuts == 0 and r.first_cut is None


def test_decode_content_stats_hand_computed(spark):
    """The crafted-media round trip on a hand-checkable doc pair: the
    decoded integer content stats must equal pure-Python evaluation of
    the closed forms (the same math mm_decode_parity's SQL oracle runs)."""
    import numpy as np

    from iceberg_geospatial_api_server_spark.operators.multimodal import (
        decode_content_stats,
        synthesize_crafted_media,
    )

    docs = spark.createDataFrame([(4,), (7,)], "doc_id long")
    got = {
        r["doc_id"]: r
        for r in decode_content_stats(synthesize_crafted_media(docs)).collect()
    }

    # image doc 4 (h=16, w=20): gradient+checker closed forms
    d = 4
    h, w = 12 + d % 5, 16 + d % 7
    yy, xx = np.mgrid[0:h, 0:w]
    vals = np.concatenate(
        [
            (xx * 255 // (w - 1)).ravel(),
            (yy * 255 // (h - 1)).ravel(),
            (((xx + yy + d) % 2) * 255).ravel(),
        ]
    ).astype(np.int64)
    r = got[4]
    assert r["modality"] == "image"
    assert r["n_values"] == 3 * h * w
    assert r["sum_val"] == int(vals.sum())
    assert r["sum_abs"] == int(vals.sum())
    assert (r["min_val"], r["max_val"]) == (int(vals.min()), int(vals.max()))

    # audio doc 7: modular sawtooth survives the PCM round trip exactly
    i = np.arange(800, dtype=np.int64)
    s = (7 * 1103 + i * 9973) % 65521 - 32760
    a = got[7]
    assert a["modality"] == "audio"
    assert a["n_values"] == 800
    assert a["sum_val"] == int(s.sum())
    assert a["sum_abs"] == int(np.abs(s).sum())
    assert (a["min_val"], a["max_val"]) == (int(s.min()), int(s.max()))


def test_phash_pairs_hot_bucket_cap(spark):
    """A degenerate block value shared by a large cluster is DROPPED by
    max_bucket_size (r11, VERDICT r10 #1): quadratic pair emission on a
    hot 16-bit bucket is bounded instead of concentrated into one
    aggregation row; healthy buckets are unaffected."""
    from pyspark.sql import functions as F

    from iceberg_geospatial_api_server_spark.operators.multimodal import (
        phash_dedup_pairs,
    )

    # 500 hashes i<<16: blocks 0 (low 16 bits), 2 and 3 are all-zero →
    # three 500-member degenerate buckets; block 1 = i separates them.
    # hamming(i<<16, j<<16) = popcount(i^j), so e.g. (0,1) is a true
    # near-dup pair reachable ONLY through the degenerate buckets.
    hot = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.shiftleft(F.col("id"), 16).alias("phash"),
    )
    capped = phash_dedup_pairs(hot, max_hamming=3, max_bucket_size=100)
    assert capped.count() == 0  # every candidate bucket was over the cap
    full = {
        (r["id_a"], r["id_b"])
        for r in phash_dedup_pairs(hot, max_hamming=3).collect()
    }
    assert (0, 1) in full  # default cap leaves the small corpus exact

    # healthy buckets are unaffected by the cap: a planted near-dup pair
    # in its own bucket survives alongside the dropped hot cluster
    planted = spark.createDataFrame(
        [(1000, 7 << 16 | 0x1234), (1001, 7 << 16 | 0x1235)],
        "doc_id long, phash long",
    )
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in phash_dedup_pairs(
            hot.unionByName(planted), max_hamming=3, max_bucket_size=100
        ).collect()
    }
    assert got == {(1000, 1001, 1)}


def test_phash_pairs_equal_bruteforce_blocked(spark):
    """The two-level (posexplode) pair emission returns exactly the
    blocked brute-force pair set, hamming values included — pins the
    r11 rework of the flattened O(bucket²) single-row emission."""
    from pyspark.sql import functions as F

    from iceberg_geospatial_api_server_spark.operators.multimodal import (
        phash_dedup_pairs,
    )

    rng = np.random.default_rng(42)
    vals = rng.integers(-(1 << 62), 1 << 62, size=300).tolist()
    # plant near-dups: every 7th hash is a 1-2 bit twiddle of its
    # predecessor
    for i in range(7, 300, 7):
        vals[i] = vals[i - 1] ^ (1 << int(rng.integers(0, 64)))
    rows = [(i, int(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "doc_id long, phash long")
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in phash_dedup_pairs(df, max_hamming=3).collect()
    }

    def blocks_of(p):
        return {(b, (p >> (16 * b)) & 0xFFFF) for b in range(4)}

    expect = set()
    for i, a in rows:
        for j, b in enumerate(vals):
            if j <= i:
                continue
            if blocks_of(a) & blocks_of(int(b)):
                h = bin((a ^ int(b)) & ((1 << 64) - 1)).count("1")
                if h <= 3:
                    expect.add((i, j, h))
    assert got == expect
