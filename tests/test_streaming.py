"""Structured Streaming smoke tests: file-source stream driven to
completion via memory sink (bounded input ⇒ deterministic results), and
equivalence with the batch operators."""

import os

import pytest
from pyspark.sql import functions as F

from iceberg_geospatial_api_server_spark.util import epoch_of


@pytest.fixture(scope="module")
def events_path(sf_dir, tmp_path_factory, spark):
    """Re-encode events to micro-ts parquet (streaming schema wants a
    TimestampType column, the raw file stores nanos)."""
    from iceberg_geospatial_api_server_spark.sources.tables import load_table

    out = str(tmp_path_factory.mktemp("stream") / "events")
    load_table(spark, sf_dir, "events").write.parquet(out)
    return out


def test_windowed_counts_stream_matches_batch(spark, events_path):
    from iceberg_geospatial_api_server_spark.streaming.windows import (
        read_event_stream,
        run_to_memory_sink,
        windowed_counts,
    )

    stream = read_event_stream(spark, events_path)
    assert stream.isStreaming
    agg = windowed_counts(stream, window="60 minutes", watermark="10 minutes")
    run_to_memory_sink(agg, "win_out", mode="complete")
    got = {
        (r.window_start, r.event_type): (r.n_events, round(r.sum_value, 4))
        for r in spark.sql("SELECT * FROM win_out").collect()
    }

    batch = (
        spark.read.parquet(events_path)
        .groupBy(F.window("ts", "60 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("v"))
    )
    want = {
        (r["w"]["start"], r.event_type): (r.n, r.v) for r in batch.collect()
    }
    assert got == want


def test_session_windows_stream(spark, events_path):
    from iceberg_geospatial_api_server_spark.streaming.windows import (
        read_event_stream,
        run_to_memory_sink,
        session_windows,
    )

    stream = read_event_stream(spark, events_path)
    sess = session_windows(stream, gap="30 minutes")
    run_to_memory_sink(sess, "sess_out", mode="complete")
    rows = spark.sql("SELECT * FROM sess_out").collect()
    assert rows
    # session count per user must match the batch sessionizer
    from iceberg_geospatial_api_server_spark.operators.relational import sessionize

    batch_sessions = (
        sessionize(spark.read.parquet(events_path), gap_minutes=30)
        .groupBy("user_id")
        .count()
        .collect()
    )
    want = {r.user_id: r["count"] for r in batch_sessions}
    got: dict = {}
    for r in rows:
        got[r.user_id] = got.get(r.user_id, 0) + 1
    assert got == want


def test_foreach_batch_upsert_idempotent(spark, events_path, tmp_path):
    from iceberg_geospatial_api_server_spark.streaming.windows import (
        foreach_batch_upsert,
        read_event_stream,
    )

    target = str(tmp_path / "upsert_target")
    stream = read_event_stream(spark, events_path).select("event_id", "user_id", "value")
    q = foreach_batch_upsert(stream, target, ["event_id"]).start()
    q.awaitTermination(120)
    n1 = spark.read.parquet(target).count()

    # replay the same input: anti-join must keep the target unchanged
    q2 = foreach_batch_upsert(
        read_event_stream(spark, events_path).select("event_id", "user_id", "value"),
        target,
        ["event_id"],
    ).start()
    q2.awaitTermination(120)
    n2 = spark.read.parquet(target).count()
    assert n1 == n2 == spark.read.parquet(events_path).count()


def test_stateful_running_totals(spark, events_path):
    from iceberg_geospatial_api_server_spark.streaming.stateful import (
        running_user_totals,
    )
    from iceberg_geospatial_api_server_spark.streaming.windows import (
        read_event_stream,
        run_to_memory_sink,
    )

    stream = read_event_stream(spark, events_path)
    out = running_user_totals(stream, threshold=1000.0)
    run_to_memory_sink(out, "state_out", mode="update")
    # last update per user is the final running total
    rows = spark.sql(
        """SELECT user_id, max_by(n_events, n_events) AS n,
                  max_by(total_value, n_events) AS total
           FROM state_out GROUP BY user_id"""
    ).collect()
    got = {r.user_id: (r.n, r.total) for r in rows}

    batch = (
        spark.read.parquet(events_path)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("total"))
        .collect()
    )
    want = {r.user_id: (r.n, r.total) for r in batch}
    assert got == want


def test_streaming_funnel_matches_batch(spark, sf_dir, tmp_path_factory):
    """The incremental funnel state machine must reproduce the batch
    windowed-funnel counts when micro-batches arrive in ts order (two
    ts-ordered files, one per trigger)."""
    import time

    from iceberg_geospatial_api_server_spark.operators.relational import (
        events_funnel,
    )
    from iceberg_geospatial_api_server_spark.sources.tables import load_table
    from iceberg_geospatial_api_server_spark.streaming.stateful import (
        streaming_funnel,
    )
    from iceberg_geospatial_api_server_spark.streaming.windows import (
        read_event_stream,
        run_to_memory_sink,
    )

    events = load_table(spark, sf_dir, "events")
    us = epoch_of(events, "ts")
    cut = events.agg(F.percentile_approx(us("ts"), 0.5)).first()[0]
    base = tmp_path_factory.mktemp("funnel_stream")
    early = str(base / "events")
    # file source processes oldest-modified first: write the early half,
    # then the late half, so triggers replay the stream in ts order
    events.filter(us("ts") <= cut).coalesce(1).write.mode(
        "overwrite"
    ).parquet(early)
    time.sleep(1.1)
    events.filter(us("ts") > cut).coalesce(1).write.mode(
        "append"
    ).parquet(early)

    stream = read_event_stream(spark, early, max_files_per_trigger=1)
    out = streaming_funnel(stream, max_gap_minutes=240)
    run_to_memory_sink(out, "funnel_out", mode="update")
    rows = spark.sql(
        """SELECT user_id, max_by(stage, stage) AS stage
           FROM funnel_out GROUP BY user_id"""
    ).collect()
    got_counts = {
        k: sum(1 for r in rows if r.stage >= k) for k in (1, 2, 3)
    }

    want = {
        r["step"]: r["n_users"]
        for r in events_funnel(events, max_gap_minutes=240).collect()
    }
    assert got_counts == want


def test_streaming_geo_grid_aggregate(spark, events_path):
    """Cross-feature: windowed grid heatmap over a stream — event points
    (derived from user_id/value) binned per tumbling window."""
    from iceberg_geospatial_api_server_spark.streaming.windows import (
        read_event_stream,
        run_to_memory_sink,
    )

    stream = read_event_stream(spark, events_path)
    pts = stream.select(
        "ts",
        ((F.col("user_id") * 37 % 360) - 180.0).alias("x"),
        ((F.col("value").cast("int") % 170) - 85.0).alias("y"),
    )
    heat = (
        pts.withWatermark("ts", "1 hour")
        .groupBy(
            F.window("ts", "6 hours").alias("w"),
            F.floor(F.col("x") / 30).alias("cx"),
            F.floor(F.col("y") / 30).alias("cy"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    run_to_memory_sink(heat, "heat_out", mode="complete")
    rows = spark.sql("SELECT * FROM heat_out").collect()
    assert rows and sum(r.n for r in rows) == spark.read.parquet(events_path).count()


def test_dedup_stream_drops_planted_duplicates(spark, events_path, tmp_path):
    """Duplicate the first 50 events into a second file; the streaming
    dedup must emit each event_id exactly once."""
    from iceberg_geospatial_api_server_spark.streaming.windows import (
        dedup_stream,
        read_event_stream,
        run_to_memory_sink,
    )

    src = str(tmp_path / "dup_events")
    base = spark.read.parquet(events_path)
    base.write.parquet(src)
    base.orderBy("event_id").limit(50).write.mode("append").parquet(src)

    stream = read_event_stream(spark, src)
    out = dedup_stream(stream, ["event_id"], watermark="365 days")
    run_to_memory_sink(out, "dedup_out", mode="append")
    got = spark.sql("SELECT COUNT(*) c, COUNT(DISTINCT event_id) d FROM dedup_out").first()
    total = base.count()
    assert got.c == got.d == total


def test_stream_stream_attribution_matches_batch(spark, events_path):
    """Watermarked stream-stream range join ≡ the same join in batch."""
    from iceberg_geospatial_api_server_spark.streaming.windows import (
        read_event_stream,
        run_to_memory_sink,
        stream_stream_attribution,
    )

    joined = stream_stream_attribution(read_event_stream(spark, events_path))
    run_to_memory_sink(joined, "ss_out", mode="append")
    got = {
        (r.trigger_id, r.outcome_id)
        for r in spark.sql("SELECT * FROM ss_out").collect()
    }

    ev = spark.read.parquet(events_path)
    t = ev.filter(F.col("event_type") == "view").alias("t")
    o = ev.filter(F.col("event_type") == "purchase").alias("o")
    want = {
        (r.trigger_id, r.outcome_id)
        for r in t.join(
            o,
            (F.col("t.user_id") == F.col("o.user_id"))
            & (F.col("o.ts") >= F.col("t.ts"))
            & (F.col("o.ts") <= F.col("t.ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select(
            F.col("t.event_id").alias("trigger_id"),
            F.col("o.event_id").alias("outcome_id"),
        )
        .collect()
    }
    assert got == want
    assert len(got) > 0


def test_epoch_of_matches_for_ltz_and_ntz(spark):
    """Testdata timestamp physical types change across driver rounds
    (r2: nanos→LTZ via legacy conf; r3: naive micros→NTZ). epoch_of must
    return identical epochs for the same wall-clock instants regardless
    of column dtype, pinned to UTC, at both MICROSECOND and SECOND
    units — this is what keeps oracle hashes timezone-independent."""
    from pyspark.sql import functions as F

    from iceberg_geospatial_api_server_spark.util import epoch_of

    rows = [("2024-03-01 12:34:56.789012",), ("1999-12-31 23:59:59.5",)]
    base = spark.createDataFrame(rows, "s string")
    ltz = base.select(F.to_timestamp("s").alias("ts"))
    ntz = base.select(F.col("s").cast("timestamp_ntz").alias("ts"))
    assert dict(ltz.dtypes)["ts"] == "timestamp"
    assert dict(ntz.dtypes)["ts"] == "timestamp_ntz"

    for unit, expect in [
        ("MICROSECOND", [1709296496789012, 946684799500000]),
        ("SECOND", [1709296496, 946684799]),
    ]:
        got_ltz = sorted(
            r[0] for r in ltz.select(epoch_of(ltz, "ts")("ts", unit)).collect()
        )
        got_ntz = sorted(
            r[0] for r in ntz.select(epoch_of(ntz, "ts")("ts", unit)).collect()
        )
        assert got_ltz == got_ntz == sorted(expect), (unit, got_ltz, got_ntz)


def test_neardup_stream_matches_batch(spark, sf_dir, tmp_path_factory):
    """Streaming near-dup (incremental minhash per micro-batch): feeding
    the corpus in two chunks yields exactly the batch run's pair set —
    every pair lands once, in the batch where its later doc arrives."""
    import os
    import time as _time

    from iceberg_geospatial_api_server_spark.operators.dedup import (
        dedup_minhash_lsh,
    )
    from iceberg_geospatial_api_server_spark.sources.tables import load_table
    from iceberg_geospatial_api_server_spark.streaming.windows import (
        neardup_stream,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    full = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup_minhash_lsh(docs, storage_level=None).collect()
    }
    assert full, "vacuous: corpus has no near-dup pairs"
    spark.catalog.clearCache()

    base = tmp_path_factory.mktemp("neardup_stream")
    src = str(base / "src")
    schema = "doc_id long, text string"
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(src)
    _time.sleep(1.1)  # distinct mtimes: file source orders by mod time
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    corpus_dir = str(base / "corpus")
    pairs_dir = str(base / "pairs")
    q = neardup_stream(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        corpus_dir,
        pairs_dir,
        str(base / "ckpt"),
    ).start()
    q.awaitTermination(120)

    assert os.path.isdir(pairs_dir)
    got_rows = spark.read.parquet(pairs_dir).collect()
    got = {(r["id_a"], r["id_b"], r["jaccard"]) for r in got_rows}
    assert got == full
    # two non-empty batches ran, and state accumulated the whole corpus
    assert {r["batch_id"] for r in got_rows} <= {0, 1}
    assert spark.read.parquet(corpus_dir).count() == docs.count()


def test_streaming_pack_matches_batch(spark, sf_dir, tmp_path_factory):
    """Incremental packing must agree with the batch pack_sequences map
    when micro-batches arrive in doc_id order (two id-ordered files, one
    per trigger): same offsets, same pack spans, continued — not reset —
    across batches."""
    import time

    from pyspark.sql import types as T

    from iceberg_geospatial_api_server_spark.operators.text import (
        pack_sequences,
    )
    from iceberg_geospatial_api_server_spark.sources.tables import load_table
    from iceberg_geospatial_api_server_spark.streaming.stateful import (
        streaming_pack,
    )
    from iceberg_geospatial_api_server_spark.streaming.windows import (
        run_to_memory_sink,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    cut = docs.agg(F.expr("percentile_approx(doc_id, 0.5)")).first()[0]
    base = tmp_path_factory.mktemp("pack_stream")
    path = str(base / "docs")
    docs.filter(F.col("doc_id") <= cut).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)
    time.sleep(1.1)
    docs.filter(F.col("doc_id") > cut).coalesce(1).write.mode(
        "append"
    ).parquet(path)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(path)
    )
    out = streaming_pack(stream, max_tokens=128)
    run_to_memory_sink(out, "pack_out", mode="append")
    got = {
        r.doc_id: (r.shard, r.n_tokens, r.stream_offset, r.pack_first,
                   r.pack_last, r.n_packs)
        for r in spark.sql("SELECT * FROM pack_out").collect()
    }

    want = {
        r.doc_id: (r.shard, r.n_tokens, r.stream_offset, r.pack_first,
                   r.pack_last, r.n_packs)
        for r in pack_sequences(docs, max_tokens=128).collect()
    }
    assert got == want


def test_image_neardup_stream_matches_batch(spark, sf_dir, tmp_path_factory):
    """Streaming pHash image dedup: feeding the image corpus in two
    chunks yields exactly the batch run's pair set, and the persisted
    state is the hash table (8 bytes/image), never payloads."""
    import os
    import time as _time

    from iceberg_geospatial_api_server_spark.operators.multimodal import (
        image_phash,
        phash_dedup_pairs,
        synthesize_image_corpus,
    )
    from iceberg_geospatial_api_server_spark.sources.tables import load_table
    from iceberg_geospatial_api_server_spark.streaming.windows import (
        image_neardup_stream,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id").limit(100)
    media = synthesize_image_corpus(docs, neardup_every=10)
    full = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in phash_dedup_pairs(image_phash(media, stub=False)).collect()
    }
    assert full, "vacuous: no planted image near-dups"

    base = tmp_path_factory.mktemp("image_neardup_stream")
    src = str(base / "src")
    media.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(src)
    _time.sleep(1.1)  # distinct mtimes: file source orders by mod time
    media.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    schema = "doc_id long, payload binary, modality string, codec string"
    hashes_dir, pairs_dir = str(base / "hashes"), str(base / "pairs")
    q = image_neardup_stream(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        hashes_dir,
        pairs_dir,
        str(base / "ckpt"),
        stub=False,
    ).start()
    q.awaitTermination(120)

    got_rows = spark.read.parquet(pairs_dir).collect()
    got = {(r["id_a"], r["id_b"], r["hamming"]) for r in got_rows}
    assert got == full
    state = spark.read.parquet(hashes_dir)
    assert state.count() == 100
    # hashes + the replay-idempotency partition key, never payloads
    assert set(state.columns) == {"doc_id", "phash", "batch_id"}
    # failure-recovery idempotency: a REPLAYED batch id (same checkpoint
    # lineage -> same batch content) overwrites its own partition with
    # identical rows instead of appending — pin the mechanism directly
    from iceberg_geospatial_api_server_spark.streaming.windows import (
        _idempotent_batch_write,
    )

    n_hashes = spark.read.parquet(hashes_dir).count()
    replay = spark.read.parquet(hashes_dir).filter(
        F.col("batch_id") == 1
    ).drop("batch_id")
    _idempotent_batch_write(replay, hashes_dir, 1)  # the "replay"
    assert spark.read.parquet(hashes_dir).count() == n_hashes
    # and an untouched partition is not clobbered by dynamic overwrite
    assert (
        spark.read.parquet(hashes_dir).filter(F.col("batch_id") == 0).count()
        > 0
    )


def test_boilerplate_stream_matches_batch(spark, sf_dir, tmp_path_factory):
    """The streaming boilerplate registry must emit exactly the segment
    hashes whose corpus-wide occurrence count reaches the threshold —
    each exactly once — regardless of how documents split into
    micro-batches."""
    import time

    from pyspark.sql import types as T

    from iceberg_geospatial_api_server_spark.operators.text import (
        segment_hashes,
    )
    from iceberg_geospatial_api_server_spark.sources.tables import load_table
    from iceberg_geospatial_api_server_spark.streaming.stateful import (
        boilerplate_segments_stream,
    )
    from iceberg_geospatial_api_server_spark.streaming.windows import (
        run_to_memory_sink,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    cut = docs.agg(F.expr("percentile_approx(doc_id, 0.5)")).first()[0]
    base = tmp_path_factory.mktemp("boiler_stream")
    path = str(base / "docs")
    docs.filter(F.col("doc_id") <= cut).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)
    time.sleep(1.1)
    docs.filter(F.col("doc_id") > cut).coalesce(1).write.mode(
        "append"
    ).parquet(path)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(path)
    )
    out = boilerplate_segments_stream(stream, min_seen=2)
    run_to_memory_sink(out, "boiler_out", mode="update")
    emitted = [
        r.seg_hash for r in spark.sql("SELECT * FROM boiler_out").collect()
    ]
    assert len(emitted) == len(set(emitted))  # exactly-once per hash

    want = {
        r["__h"]
        for r in segment_hashes(docs)
        .groupBy("__h")
        .count()
        .filter(F.col("count") >= 2)
        .collect()
    }
    assert set(emitted) == want
    assert want  # non-vacuous: the corpus does contain boilerplate


def test_curate_stream_matches_batch(spark, sf_dir, tmp_path_factory):
    """Streaming an id-ordered split must keep exactly the batch
    curation pipeline's survivor set (first-arrival == smallest-id when
    batches arrive in id order), with no duplicate hashes in the store."""
    import time

    from pyspark.sql import types as T

    from iceberg_geospatial_api_server_spark.operators.text import (
        curate_corpus,
    )
    from iceberg_geospatial_api_server_spark.sources.tables import load_table
    from iceberg_geospatial_api_server_spark.streaming.windows import (
        curate_stream,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )
    cut = docs.agg(F.expr("percentile_approx(doc_id, 0.5)")).first()[0]
    base = tmp_path_factory.mktemp("curate_stream")
    path = str(base / "docs")
    docs.filter(F.col("doc_id") <= cut).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)
    time.sleep(1.1)
    docs.filter(F.col("doc_id") > cut).coalesce(1).write.mode(
        "append"
    ).parquet(path)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(path)
    )
    q = curate_stream(
        stream,
        kept_dir=str(base / "kept"),
        checkpoint=str(base / "ckpt"),
    ).start()
    q.awaitTermination(120)

    kept = spark.read.parquet(str(base / "kept"))
    # the batch report aggregates survivors; rebuild it from the stream's
    # kept docs and compare per-language counts and token totals
    from iceberg_geospatial_api_server_spark.operators.text import (
        token_count,
    )

    got = {
        r["lang"]: (r["n"], r["t"])
        for r in kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(token_count(F.col("text")).cast("long")).alias("t"),
        )
        .collect()
    }
    want = {
        r["lang"]: (r["n_docs"], r["total_tokens"])
        for r in curate_corpus(docs).collect()
    }
    assert got == want
    # the store's hash column (the dedup state) has no duplicates, and a
    # REPLAYED batch commits nothing (single-store idempotency)
    kept_hashes = spark.read.parquet(str(base / "kept")).select("__h")
    assert kept_hashes.count() == kept_hashes.distinct().count()
    n_before = kept_hashes.count()
    q2 = curate_stream(
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(path),
        kept_dir=str(base / "kept"),
        checkpoint=str(base / "ckpt2"),  # fresh checkpoint = full replay
    ).start()
    q2.awaitTermination(120)
    assert spark.read.parquet(str(base / "kept")).count() == n_before


def test_audio_neardup_stream_matches_batch(spark, sf_dir, tmp_path_factory):
    """The audio mode of the media near-dup stream: streaming a split of
    the WAV corpus yields exactly the full-run fingerprint pair set."""
    import time as _time

    from iceberg_geospatial_api_server_spark.operators.multimodal import (
        audio_fingerprint,
        phash_dedup_pairs,
        synthesize_real_media,
    )
    from iceberg_geospatial_api_server_spark.sources.tables import load_table
    from iceberg_geospatial_api_server_spark.streaming.windows import (
        image_neardup_stream,
    )

    docs = load_table(spark, sf_dir, "documents").limit(120)
    media = synthesize_real_media(docs).filter(F.col("modality") == "audio")
    full = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in phash_dedup_pairs(
            audio_fingerprint(media, stub=False), max_hamming=2
        ).collect()
    }
    assert full, "vacuous: no planted same-frequency clips"

    base = tmp_path_factory.mktemp("audio_neardup_stream")
    src = str(base / "media")
    media.filter(F.col("doc_id") < 60).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    _time.sleep(1.1)
    media.filter(F.col("doc_id") >= 60).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    schema = "doc_id long, payload binary, modality string, codec string"
    q = image_neardup_stream(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        str(base / "hashes"),
        str(base / "pairs"),
        str(base / "ckpt"),
        stub=False,
        fingerprint="audio",
        max_hamming=2,
    ).start()
    q.awaitTermination(120)
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in spark.read.parquet(str(base / "pairs")).collect()
    }
    assert got == full


def test_neardup_stream_with_signature_store_matches_batch(
    spark, sf_dir, tmp_path_factory
):
    """sigs_dir mode: the signature store replaces historical recompute,
    and the streamed pair set still equals the batch run exactly; the
    store accumulates one signature row per eligible doc."""
    import os
    import time as _time

    from iceberg_geospatial_api_server_spark.operators.dedup import (
        dedup_minhash_lsh,
    )
    from iceberg_geospatial_api_server_spark.sources.tables import load_table
    from iceberg_geospatial_api_server_spark.streaming.windows import (
        neardup_stream,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    full = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup_minhash_lsh(docs, storage_level=None).collect()
    }
    spark.catalog.clearCache()

    base = tmp_path_factory.mktemp("neardup_sigs_stream")
    src = str(base / "src")
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.parquet(src)
    _time.sleep(1.1)
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    corpus_dir, pairs_dir = str(base / "corpus"), str(base / "pairs")
    sigs_dir = str(base / "sigs")
    q = neardup_stream(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        corpus_dir,
        pairs_dir,
        str(base / "ckpt"),
        sigs_dir=sigs_dir,
    ).start()
    q.awaitTermination(120)

    got = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in spark.read.parquet(pairs_dir).collect()
    }
    assert got == full
    assert os.path.isdir(sigs_dir)
    n_eligible = docs.filter(
        F.size(F.split(F.col("text"), " ")) >= 3
    ).count()
    assert spark.read.parquet(sigs_dir).count() == n_eligible


def test_neardup_sigs_guard_skips_partial_store(spark, tmp_path):
    """The metadata-only coverage probe: a sigs store missing corpus
    partitions (enabled mid-stream) must NOT be treated as covering."""
    from iceberg_geospatial_api_server_spark.streaming.windows import (
        _state_partitions,
    )

    corpus = tmp_path / "corpus"
    sigs = tmp_path / "sigs"
    for b in (0, 1):
        (corpus / f"batch_id={b}").mkdir(parents=True)
    (sigs / "batch_id=1").mkdir(parents=True)

    assert not _state_partitions(str(sigs)) >= _state_partitions(str(corpus))
    (sigs / "batch_id=0").mkdir()
    assert _state_partitions(str(sigs)) >= _state_partitions(str(corpus))
    assert _state_partitions(str(tmp_path / "absent")) == set()


def test_tile_stream_matches_batch(spark, tmp_path):
    """Streaming per-tile counts ≡ batch tile_aggregate per window: the
    live-map feed is the same deterministic binning."""
    import datetime as dt

    import pandas as pd

    from iceberg_geospatial_api_server_spark.geo.tiles import tile_cols
    from iceberg_geospatial_api_server_spark.streaming.windows import (
        run_to_memory_sink,
        tile_stream,
    )

    rng = __import__("random").Random(9)
    rows = [
        {
            "ts": dt.datetime(2024, 3, 1) + dt.timedelta(minutes=i),
            "x": rng.uniform(-179, 179),
            "y": rng.uniform(-80, 80),
        }
        for i in range(300)
    ]
    src = str(tmp_path / "pts")
    spark.createDataFrame(pd.DataFrame(rows)).repartition(5).write.parquet(src)

    schema = "ts timestamp, x double, y double"
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 2)
        .load(src)
    )
    agg = tile_stream(stream, zoom=3, window="60 minutes")
    run_to_memory_sink(agg, "tiles_out", mode="complete")
    got = {
        (r.window_start, r.tile_x, r.tile_y): r.n
        for r in spark.sql("SELECT * FROM tiles_out").collect()
    }

    tx, ty = tile_cols("x", "y", 3)
    batch = (
        spark.read.parquet(src)
        .groupBy(
            F.window("ts", "60 minutes").alias("w"),
            tx.alias("tile_x"),
            ty.alias("tile_y"),
        )
        .count()
    )
    want = {
        (r["w"]["start"], r.tile_x, r.tile_y): r["count"]
        for r in batch.collect()
    }
    assert got == want and got


def test_streaming_cusum_matches_batch(spark, sf_dir, tmp_path_factory):
    """The stateful CUSUM detector must reproduce the batch closed form
    exactly — per-user alarm counts, max statistic, and first-alarm
    time — when micro-batches arrive in ts order."""
    import time

    from iceberg_geospatial_api_server_spark.operators.relational import (
        events_cusum,
    )
    from iceberg_geospatial_api_server_spark.sources.tables import load_table
    from iceberg_geospatial_api_server_spark.streaming.stateful import (
        streaming_cusum,
    )
    from iceberg_geospatial_api_server_spark.streaming.windows import (
        read_event_stream,
        run_to_memory_sink,
    )

    events = load_table(spark, sf_dir, "events")
    us = epoch_of(events, "ts")
    cut = events.agg(F.percentile_approx(us("ts"), 0.5)).first()[0]
    base = tmp_path_factory.mktemp("cusum_stream")
    path = str(base / "events")
    events.filter(us("ts") <= cut).coalesce(1).write.mode(
        "overwrite"
    ).parquet(path)
    time.sleep(1.1)
    events.filter(us("ts") > cut).coalesce(1).write.mode("append").parquet(
        path
    )

    stream = read_event_stream(spark, path, max_files_per_trigger=1)
    # threshold low enough that alarms occur at the test SF
    out = streaming_cusum(stream, drift=60.0, threshold=120.0)
    run_to_memory_sink(out, "cusum_out", mode="update")
    got = {
        r.user_id: (r.n_events, r.n_alarms, r.max_cusum, r.first_alarm_s)
        for r in spark.sql(
            """SELECT user_id, n_events, n_alarms, max_cusum, first_alarm_s
               FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                                  ORDER BY n_events DESC) rn
                     FROM cusum_out) WHERE rn = 1"""
        ).collect()
    }
    want = {
        r.user_id: (r.n_events, r.n_alarms, r.max_cusum, r.first_alarm_s)
        for r in events_cusum(events, drift=60.0, threshold=120.0).collect()
    }
    assert got == want
    assert any(v[1] > 0 for v in want.values())  # alarms actually occur


def test_streaming_seasonal_flags_match_batch(spark, events_path):
    """Every emitted live hour scores exactly like the batch predicate
    against the same static baseline; append mode may hold back only
    the trailing hours inside the watermark."""
    from iceberg_geospatial_api_server_spark.operators.relational import (
        SEASONAL_FLAG,
        seasonal_baseline,
    )
    from iceberg_geospatial_api_server_spark.streaming.windows import (
        read_event_stream,
        run_to_memory_sink,
        streaming_seasonal_flags,
    )

    batch = spark.read.parquet(events_path)
    baseline = seasonal_baseline(batch)

    stream = read_event_stream(spark, events_path)
    out = streaming_seasonal_flags(stream, baseline, watermark="2 hours")
    run_to_memory_sink(out, "seasonal_out", mode="append")
    got = {
        r.hour_start: (r.how, r.n_events, r.is_anomaly)
        for r in spark.sql("SELECT * FROM seasonal_out").collect()
    }

    want_df = (
        batch.groupBy(F.window("ts", "60 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "how",
            F.pmod(
                F.floor(F.unix_timestamp(F.col("w.start")) / F.lit(3600)),
                F.lit(168),
            ).cast("long"),
        )
        .join(baseline.select("how", "mean_c", "var_c"), "how")
        .select(
            F.col("w.start").alias("hour_start"),
            "how",
            F.col("c").alias("n_events"),
            F.expr(SEASONAL_FLAG).alias("is_anomaly"),
        )
    )
    want = {
        r.hour_start: (r.how, r.n_events, r.is_anomaly)
        for r in want_df.collect()
    }
    assert len(got) >= len(want) - 4  # only the watermark tail may lag
    assert got == {h: want[h] for h in got}


def test_streaming_quality_counters_match_batch(spark, events_path):
    """Per-window expectation counters: stream ≡ batch, including a
    planted violation file (negative values + unknown type)."""
    import datetime as dt

    from iceberg_geospatial_api_server_spark.streaming.windows import (
        read_event_stream,
        run_to_memory_sink,
        streaming_quality_counters,
    )

    allowed = [
        r.event_type
        for r in spark.read.parquet(events_path)
        .select("event_type")
        .distinct()
        .collect()
    ]
    bad = spark.createDataFrame(
        [
            (900001, dt.datetime(2024, 6, 1, 0, 10), 1, "zzz_bad", 1.0, "{}"),
            (900002, dt.datetime(2024, 6, 1, 0, 20), 2, allowed[0], -5.0, "{}"),
            # NULL type must count as unknown (F.when's NULL-is-pass trap)
            (900003, dt.datetime(2024, 6, 1, 0, 30), 3, None, 1.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    import tempfile

    src = tempfile.mkdtemp() + "/q_events"
    spark.read.parquet(events_path).write.parquet(src)
    bad.write.mode("append").parquet(src)

    out = streaming_quality_counters(
        read_event_stream(spark, src), allowed, watermark="2 hours"
    )
    run_to_memory_sink(out, "q_out", mode="complete")
    got = {
        r.hour_start: (r.n_events, r.null_user, r.negative_value, r.unknown_type)
        for r in spark.sql("SELECT * FROM q_out").collect()
    }

    # batch twin: identical aggregation over the static read
    df = spark.read.parquet(src)
    want_df = (
        df.groupBy(F.window("ts", "60 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("user_id").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("nu"),
            F.sum(
                F.when(
                    F.col("value").isNull() | (F.col("value") < 0), 1
                ).otherwise(0)
            )
            .cast("long")
            .alias("nv"),
            F.sum(
                F.when(
                    F.col("event_type").isNull()
                    | ~F.col("event_type").isin(allowed),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("ut"),
        )
    )
    want = {
        r["w"]["start"]: (r.n, r.nu, r.nv, r.ut) for r in want_df.collect()
    }
    assert got == want
    planted = got[dt.datetime(2024, 6, 1, 0, 0)]
    assert planted[2] == 1 and planted[3] == 2  # -5.0; zzz_bad + NULL type


def test_hour_of_week_ntz_and_tz_agree(spark):
    """The seasonal scorer's hour-of-week key must be identical for
    TIMESTAMP and TIMESTAMP_NTZ columns holding the same wall times —
    the ADVICE r4 misalignment (unix_timestamp is session-TZ-dependent
    and rejects NTZ) regression-tested at the helper level."""
    from pyspark.sql import functions as F

    from iceberg_geospatial_api_server_spark.streaming.windows import (
        hour_of_week,
    )

    walls = ["1995-01-01 00:00:00", "1995-01-03 07:00:00",
             "1995-02-28 23:00:00", "2001-08-01 12:00:00"]
    tz = spark.createDataFrame([(w,) for w in walls], "w string").select(
        F.col("w").cast("timestamp").alias("ts")
    )
    ntz = spark.createDataFrame([(w,) for w in walls], "w string").select(
        F.col("w").cast("timestamp_ntz").alias("ts")
    )
    got_tz = [r[0] for r in tz.select(hour_of_week(tz, "ts")).collect()]
    got_ntz = [r[0] for r in ntz.select(hour_of_week(ntz, "ts")).collect()]
    assert got_tz == got_ntz
    # pinned values: epoch hours mod 168 (UTC session)
    import datetime

    want = [
        int(
            datetime.datetime.strptime(w, "%Y-%m-%d %H:%M:%S")
            .replace(tzinfo=datetime.timezone.utc)
            .timestamp()
        )
        // 3600
        % 168
        for w in walls
    ]
    assert got_tz == want


def test_tws_processor_logic_cross_batch(spark):
    """RunningCountsProcessor's recursion verified DIRECTLY (the TWS
    harness needs the protobuf package, absent in this container —
    environment-gated like the Iceberg jar): a fake ValueState handle
    replays two micro-batches and the final emission must equal the
    batch integer-cents aggregate."""
    import numpy as np
    import pandas as pd

    from iceberg_geospatial_api_server_spark.streaming.stateful import (
        RunningCountsProcessor,
    )

    class FakeState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class FakeHandle:
        def __init__(self):
            self.state = FakeState()

        def getValueState(self, name, schema):
            return self.state

    proc = RunningCountsProcessor()
    handle = FakeHandle()
    proc.init(handle)
    b1 = pd.DataFrame({"value": [1.004, 2.005]})   # 100 + 201 cents
    # NULL value arrives as NaN: must be SKIPPED (SQL SUM semantics),
    # not floored into INT64_MIN garbage
    b2 = pd.DataFrame({"value": [0.994, 10.0, float("nan")]})
    out1 = list(proc.handleInputRows((7,), iter([b1]), None))
    out2 = list(proc.handleInputRows((7,), iter([b2]), None))
    assert out1[0]["n_events"].iloc[0] == 2
    assert out1[0]["sum_cents"].iloc[0] == 301
    assert out2[0]["n_events"].iloc[0] == 5
    exp = int(
        np.floor(
            np.array([1.004, 2.005, 0.994, 10.0]) * 100.0 + 0.5
        ).sum()
    )
    assert out2[0]["sum_cents"].iloc[0] == exp == 1400
    assert handle.state.get() == (5, 1400)


@pytest.mark.skipif(
    not __import__(
        "iceberg_geospatial_api_server_spark.streaming.stateful",
        fromlist=["tws_available"],
    ).tws_available(),
    reason="transformWithState needs the protobuf package "
    "(absent in this container; environment-gated)",
)
def test_tws_stream_equals_batch(spark, tmp_path, tables):
    """End-to-end stream ≡ batch for the TWS operator — runs the day
    the protobuf package lands (the iceberg_smoke gate pattern)."""
    from pyspark.sql import functions as F

    from iceberg_geospatial_api_server_spark.streaming.stateful import (
        streaming_user_counts_tws,
    )
    from iceberg_geospatial_api_server_spark.streaming.windows import (
        read_event_stream,
        run_to_memory_sink,
        write_ts_split_stream_files,
    )

    events = tables["events"].filter(F.col("ts").isNotNull())
    path = str(tmp_path / "tws_events")
    write_ts_split_stream_files(spark, events, path)
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        stream = read_event_stream(spark, path, max_files_per_trigger=1)
        run_to_memory_sink(
            streaming_user_counts_tws(stream), "tws_counts", mode="update"
        )
        got = {
            r["user_id"]: (r["n_events"], r["sum_cents"])
            for r in spark.sql(
                """SELECT user_id, n_events, sum_cents FROM (
                     SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                       ORDER BY n_events DESC) rn FROM tws_counts)
                   WHERE rn = 1"""
            ).collect()
        }
        cents = F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("long")
        want = {
            r["user_id"]: (r["n"], r["c"])
            for r in events.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"), F.sum(cents).alias("c"))
            .collect()
        }
        assert got == want
    finally:
        spark.catalog.dropTempView("tws_counts")
        if prev is not None:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
        else:
            spark.conf.unset(
                "spark.sql.streaming.stateStore.providerClass"
            )


def test_variant_props_extraction_equals_from_json(spark, tables):
    """Spark 4 VARIANT path over the free-form props payload: typed
    variant_get through the binary VARIANT encoding must agree with
    the from_json route events_props_stats ships, on every row —
    including malformed payloads (try_parse_json nulls, from_json
    nulls)."""
    from pyspark.sql import functions as F

    v = tables["events"].select(
        F.expr(
            "variant_get(try_parse_json(props), '$.k', 'bigint')"
        ).alias("kv"),
        F.from_json("props", "k bigint")["k"].alias("kj"),
    )
    assert v.filter("kv IS DISTINCT FROM kj").count() == 0
    # malformed and missing-key payloads null out identically
    bad = spark.createDataFrame(
        [("{not json",), ('{"other": 1}',), (None,)], "props string"
    ).select(
        F.expr(
            "variant_get(try_parse_json(props), '$.k', 'bigint')"
        ).alias("kv"),
        F.from_json("props", "k bigint")["k"].alias("kj"),
    )
    assert bad.filter("kv IS DISTINCT FROM kj").count() == 0


def test_scd2_cdc_stream_equals_batch_and_replay_idempotent(
    spark, tmp_path
):
    """The CDC→SCD2 upsert sink: (a) streaming a crafted changelog in
    two event-time micro-batches lands the identical dimension a
    one-shot rebuild produces (stream ≡ batch), with one immutable
    snapshot per batch; (b) a REPLAYED micro-batch (same batch_ref) is
    detected and skipped — the dimension neither double-applies
    changes nor grows a third snapshot (exactly-once)."""
    from datetime import datetime, timedelta

    from iceberg_geospatial_api_server_spark.operators.relational import (
        scd2_from_changelog,
    )
    from iceberg_geospatial_api_server_spark.sources.fs_versioned import (
        VersionedTable,
    )
    from iceberg_geospatial_api_server_spark.streaming.windows import (
        read_event_stream,
        scd2_cdc_stream,
        write_ts_split_stream_files,
    )
    from iceberg_geospatial_api_server_spark.util import epoch_of

    base = datetime(2024, 1, 1)
    rows = [
        # user 1: a -> a (run-dedup) -> b across the split boundary
        (base + timedelta(hours=1), 1, "a"),
        (base + timedelta(hours=2), 1, "a"),
        (base + timedelta(hours=40), 1, "b"),
        # user 2: single version, first half only
        (base + timedelta(hours=3), 2, "x"),
        # user 3: appears only in the second half (new-key insert)
        (base + timedelta(hours=41), 3, "n"),
    ]
    events = spark.createDataFrame(
        rows, "ts timestamp, user_id long, event_type string"
    )
    path = str(tmp_path / "events")
    write_ts_split_stream_files(spark, events, path)
    table = str(tmp_path / "dim")
    q = scd2_cdc_stream(
        read_event_stream(spark, path, max_files_per_trigger=1),
        table,
        checkpoint=str(tmp_path / "ckpt"),
    ).start()
    q.awaitTermination()

    vt = VersionedTable(spark, table)
    hist = vt.history().collect()
    assert [r["version"] for r in hist] == [1, 2]
    sec = epoch_of(events, "ts")
    cl = (
        events.select(
            "user_id",
            sec("ts", "MICROSECOND").alias("ts_us"),
            "event_type",
        )
        .groupBy("user_id", "ts_us")
        .agg(F.max("event_type").alias("attr"))
    )
    want = sorted(map(tuple, scd2_from_changelog(cl).collect()))
    got = sorted(map(tuple, vt.read().collect()))
    assert got == want
    # the intermediate snapshot is the first-half dimension (time
    # travel across the CDC history comes free with the sink)
    v1 = vt.read(version=1)
    assert v1.filter(F.col("user_id") == 3).count() == 0
    assert sorted(
        r["attr"] for r in v1.filter(F.col("is_current")).collect()
    ) == ["a", "x"]

    # partition-scoped CoW (VERDICT r9 directive 2's pytest bar):
    # batch 2 touched users 1 and 3 only — every bucket holding
    # neither key must carry its data files PATH-IDENTICAL from v1
    # into v2 (zero bytes rewritten), and at least one such bucket
    # must exist in this fixture for the assertion to bite
    bmap = {
        r["user_id"]: str(r["b"])
        for r in spark.createDataFrame(
            [(1,), (2,), (3,)], "user_id long"
        )
        .select(
            "user_id",
            F.pmod(F.xxhash64("user_id"), F.lit(8))
            .cast("int")
            .alias("b"),
        )
        .collect()
    }
    touched_b2 = {bmap[1], bmap[3]}
    untouched = {
        b for b in vt.buckets(version=1) if b not in touched_b2
    }
    assert untouched, "fixture must leave at least one bucket untouched"
    for b in untouched:
        assert (
            vt.buckets(version=2)[b]["files"]
            == vt.buckets(version=1)[b]["files"]
        )

    # restart from the SAME checkpoint: the bounded source has no new
    # files, so nothing re-delivers and the dimension is untouched
    # (epoch-level replay dedup itself is pinned in
    # test_fs_versioned.py's batch_ref tests — a replayed epoch under
    # the same stream identity no-ops inside the sink)
    q2 = scd2_cdc_stream(
        read_event_stream(spark, path, max_files_per_trigger=1),
        table,
        checkpoint=str(tmp_path / "ckpt"),
    ).start()
    q2.awaitTermination()
    assert vt.history().count() == 2
    assert sorted(map(tuple, vt.read().collect())) == want

    # a GENUINELY NEW stream (fresh checkpoint, fresh source) carrying
    # LATER changes must APPLY, not be skipped as a replay — ADVICE r9
    # medium: the old epoch-id-only batch_ref made this exact case
    # silently lose data because the new stream's epochs restart at 0
    rows2 = [
        (base + timedelta(hours=50), 1, "c"),
        (base + timedelta(hours=51), 2, "y"),
    ]
    events2 = spark.createDataFrame(
        rows2, "ts timestamp, user_id long, event_type string"
    )
    path2 = str(tmp_path / "events2")
    events2.coalesce(1).write.parquet(path2)
    q3 = scd2_cdc_stream(
        read_event_stream(spark, path2, max_files_per_trigger=1),
        table,
        checkpoint=str(tmp_path / "ckpt3"),
    ).start()
    q3.awaitTermination()
    assert vt.history().count() == 3
    cl_all = (
        events.unionByName(events2)
        .select(
            "user_id",
            sec("ts", "MICROSECOND").alias("ts_us"),
            "event_type",
        )
        .groupBy("user_id", "ts_us")
        .agg(F.max("event_type").alias("attr"))
    )
    want_all = sorted(map(tuple, scd2_from_changelog(cl_all).collect()))
    assert sorted(map(tuple, vt.read().collect())) == want_all


def test_scd2_cdc_stream_with_delete_ops(spark, tmp_path):
    """CDC delete ops through the STREAMING sink (r10): a delete in
    micro-batch 2 closes the open version without opening a new one,
    and the final dimension equals the delete-aware batch rebuild."""
    from datetime import datetime, timedelta

    from iceberg_geospatial_api_server_spark.operators.relational import (
        scd2_from_changelog,
    )
    from iceberg_geospatial_api_server_spark.sources.fs_versioned import (
        VersionedTable,
    )
    from iceberg_geospatial_api_server_spark.streaming.windows import (
        scd2_cdc_stream,
        write_ts_split_stream_files,
    )
    from iceberg_geospatial_api_server_spark.util import epoch_of

    base = datetime(2024, 1, 1)
    rows = [
        (base + timedelta(hours=1), 1, "a", "upsert"),
        (base + timedelta(hours=2), 2, "x", "upsert"),
        (base + timedelta(hours=40), 1, "zz", "delete"),
        (base + timedelta(hours=41), 2, "y", "upsert"),
    ]
    schema = "ts timestamp, user_id long, event_type string, op string"
    events = spark.createDataFrame(rows, schema)
    path = str(tmp_path / "cdc")
    write_ts_split_stream_files(spark, events, path)
    stream = (
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(path)
    )
    table = str(tmp_path / "dim")
    q = scd2_cdc_stream(
        stream,
        table,
        checkpoint=str(tmp_path / "ckpt"),
        op_col="op",
    ).start()
    q.awaitTermination()
    vt = VersionedTable(spark, table)
    assert vt.history().count() == 2
    sec = epoch_of(events, "ts")
    cl = events.select(
        "user_id",
        sec("ts", "MICROSECOND").alias("ts_us"),
        F.col("event_type").alias("attr"),
        "op",
    )
    want = sorted(
        map(tuple, scd2_from_changelog(cl, op_col="op").collect())
    )
    assert sorted(map(tuple, vt.read().collect())) == want
    # user 1's only version is CLOSED at the delete ts; user 2 has two
    got = {
        r.user_id: (r.attr, r.is_current)
        for r in vt.read().filter(F.col("is_current")).collect()
    }
    assert got == {2: ("y", True)}
