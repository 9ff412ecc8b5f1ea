"""Training-shard sink: pack materialization against a pure-Python
reference, token conservation, layout/manifest contract."""

import glob
import json
import os

import pyspark.sql.functions as F
import pytest

from iceberg_geospatial_api_server_spark.sources.shards import (
    MANIFEST,
    materialize_packs,
    write_training_shards,
)

KNUTH_MOD = 506952114
MERSENNE = 2147483647


def _shard(doc_id: int, n_shards: int) -> int:
    return ((doc_id % MERSENNE) % MERSENNE * KNUTH_MOD) % MERSENNE % n_shards


def _reference_packs(rows, max_tokens, n_shards):
    """Pure-Python packing: concatenate docs per shard in doc_id order,
    slice every max_tokens tokens."""
    shards = {}
    for doc_id, text in sorted(rows):
        shards.setdefault(_shard(doc_id, n_shards), []).append(
            (doc_id, text.split(" "))
        )
    out = {}
    for s, docs in shards.items():
        stream = [(doc_id, t) for doc_id, toks in docs for t in toks]
        for p in range(0, len(stream), max_tokens):
            window = stream[p : p + max_tokens]
            out[(s, p // max_tokens)] = {
                "tokens": [t for _, t in window],
                "n_docs": len({d for d, _ in window}),
                "first_doc_id": window[0][0],
            }
    return out


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, " ".join(f"w{i}_{j}" for j in range(5 + i % 7))) for i in range(60)]
    return rows, spark.createDataFrame(rows, "doc_id long, text string")


def test_packs_match_reference(spark, docs):
    rows, df = docs
    got = {
        (r["shard"], r["pack_id"]): r
        for r in materialize_packs(df, max_tokens=16, n_shards=4).collect()
    }
    want = _reference_packs(rows, max_tokens=16, n_shards=4)
    assert set(got) == set(want)
    for key, ref in want.items():
        assert got[key]["tokens"] == ref["tokens"], key
        assert got[key]["n_docs"] == ref["n_docs"], key
        assert got[key]["first_doc_id"] == ref["first_doc_id"], key


def test_token_conservation_and_pack_sizes(spark, docs):
    rows, df = docs
    packs = materialize_packs(df, max_tokens=16, n_shards=4).collect()
    total = sum(len(t.split(" ")) for _, t in rows)
    assert sum(r["n_tokens"] for r in packs) == total
    last = {r["shard"]: max(p["pack_id"] for p in packs if p["shard"] == r["shard"])
            for r in packs}
    for r in packs:
        assert r["n_tokens"] == len(r["tokens"])
        if r["pack_id"] < last[r["shard"]]:
            assert r["n_tokens"] == 16, (r["shard"], r["pack_id"])
        else:
            assert 1 <= r["n_tokens"] <= 16


def test_agrees_with_pack_sequences_map(spark, docs):
    from iceberg_geospatial_api_server_spark.operators.text import pack_sequences

    _, df = docs
    mapped = pack_sequences(df, max_tokens=16, n_shards=4).collect()
    packs = materialize_packs(df, max_tokens=16, n_shards=4).collect()
    n_packs_by_shard = {}
    for r in packs:
        n_packs_by_shard[r["shard"]] = max(
            n_packs_by_shard.get(r["shard"], 0), r["pack_id"] + 1
        )
    for m in mapped:
        # the map's pack range for each doc must exist in the materialization
        assert m["pack_last"] < n_packs_by_shard[m["shard"]], m


def test_write_layout_and_manifest(spark, docs, tmp_path):
    _, df = docs
    path = str(tmp_path / "shards")
    manifest = write_training_shards(
        df, path, max_tokens=16, n_shards=4, rows_per_file=1
    )
    on_disk = json.load(open(os.path.join(path, MANIFEST)))
    assert on_disk == manifest
    assert manifest["total_tokens"] == sum(
        s["n_tokens"] for s in manifest["shards"]
    )
    # one directory per shard, and rows_per_file=1 bounds every file
    shard_dirs = sorted(glob.glob(os.path.join(path, "shard=*")))
    assert [d.split("=")[-1] for d in shard_dirs] == [
        str(s["shard"]) for s in manifest["shards"]
    ]
    for d in shard_dirs:
        for f in glob.glob(os.path.join(d, "*.parquet")):
            assert spark.read.parquet(f).count() <= 1
    # read-back equals the materialization
    back = spark.read.parquet(path)
    assert back.count() == manifest["total_packs"]
    ref = materialize_packs(df, max_tokens=16, n_shards=4)
    assert (
        back.select("shard", "pack_id", F.concat_ws(" ", "tokens").alias("s"))
        .exceptAll(
            ref.select("shard", "pack_id", F.concat_ws(" ", "tokens").alias("s"))
        )
        .count()
        == 0
    )


def test_shard_sink_stream_matches_batch(spark, docs, tmp_path):
    """Streaming an id-ordered split: completed packs across batches plus
    the final carry must equal the batch materialization exactly."""
    import time

    from pyspark.sql import types as T

    from iceberg_geospatial_api_server_spark.streaming.shard_sink import (
        read_carry,
        read_completed_packs,
        shard_sink_stream,
    )

    rows, df = docs
    src = str(tmp_path / "src")
    ids = sorted(r[0] for r in rows)
    cuts = [ids[len(ids) // 3], ids[2 * len(ids) // 3]]
    df.filter(F.col("doc_id") <= cuts[0]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    for lo, hi in [(cuts[0], cuts[1]), (cuts[1], 1 << 60)]:
        time.sleep(1.1)  # distinct mtimes keep file-stream batch order
        df.filter(
            (F.col("doc_id") > lo) & (F.col("doc_id") <= hi)
        ).coalesce(1).write.mode("append").parquet(src)

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    packs_dir = str(tmp_path / "packs")
    q = shard_sink_stream(
        spark.readStream.format("parquet")
        .schema(schema)
        .option("maxFilesPerTrigger", 1)
        .load(src),
        packs_dir,
        checkpoint=str(tmp_path / "ckpt"),
        max_tokens=16,
        n_shards=4,
    ).start()
    q.awaitTermination(120)

    ref = materialize_packs(df, max_tokens=16, n_shards=4).collect()
    ref_full = {
        (r["shard"], r["pack_id"]): r["tokens"] for r in ref if r["n_tokens"] == 16
    }
    ref_rem = {
        r["shard"]: (r["pack_id"] * 16, r["tokens"])
        for r in ref
        if r["n_tokens"] < 16
    }
    got_full = {
        (r["shard"], r["pack_id"]): r["tokens"]
        for r in read_completed_packs(spark, packs_dir).collect()
    }
    assert got_full == ref_full
    carry = {
        r["shard"]: (r["base_pos"], r["rem"])
        for r in read_carry(spark, packs_dir).collect()
        if len(r["rem"]) > 0
    }
    assert carry == ref_rem


def test_shard_sink_replay_is_idempotent(spark, docs, tmp_path):
    """Re-running a batch with the same batch_id (the crash-replay path)
    must leave completed packs and carry identical."""
    from iceberg_geospatial_api_server_spark.streaming.shard_sink import (
        process_batch,
        read_carry,
        read_completed_packs,
    )

    _, df = docs
    packs_dir = str(tmp_path / "packs")
    b0 = df.filter(F.col("doc_id") < 30)
    b1 = df.filter(F.col("doc_id") >= 30)
    process_batch(b0, 0, packs_dir, max_tokens=16, n_shards=4)
    process_batch(b1, 1, packs_dir, max_tokens=16, n_shards=4)

    def snap():
        full = sorted(
            (r["shard"], r["pack_id"], tuple(r["tokens"]))
            for r in read_completed_packs(spark, packs_dir).collect()
        )
        carry = sorted(
            (r["shard"], r["base_pos"], tuple(r["rem"]))
            for r in read_carry(spark, packs_dir).collect()
        )
        return full, carry

    before = snap()
    process_batch(b1, 1, packs_dir, max_tokens=16, n_shards=4)  # replay
    assert snap() == before


def test_materialize_packs_edge_shapes(spark):
    """Empty-string docs (split('') == ['']), 1-token docs, and a doc
    longer than many packs all conserve tokens and match the reference."""
    rows = [
        (0, ""),                                  # one empty-string token
        (1, "a"),
        (2, " ".join(f"t{j}" for j in range(57))),  # spans many packs
        (3, "x y"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    packs = materialize_packs(df, max_tokens=8, n_shards=2).collect()
    want = _reference_packs(rows, max_tokens=8, n_shards=2)
    got = {(r["shard"], r["pack_id"]): r["tokens"] for r in packs}
    assert got == {k: v["tokens"] for k, v in want.items()}
    total = sum(len(t.split(" ")) for _, t in rows)
    assert sum(r["n_tokens"] for r in packs) == total


def test_read_training_shards_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    """The loader half of the loop: full read matches the manifest, a
    claimed shard subset PRUNES unclaimed partitions at planning time
    (PartitionFilters on shard), validate=True passes on an intact
    layout, and unknown shard claims raise."""
    import pytest
    from pyspark.sql import functions as F

    from iceberg_geospatial_api_server_spark.plans import formatted_plan
    from iceberg_geospatial_api_server_spark.sources.shards import (
        read_training_shards,
        write_training_shards,
    )
    from iceberg_geospatial_api_server_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / "shards")
    manifest = write_training_shards(docs, path, n_shards=8)

    full = read_training_shards(spark, path, validate=True)
    assert full.count() == manifest["total_packs"]

    sub = read_training_shards(spark, path, shards=[3, 5], validate=True)
    expect = sum(
        s["n_packs"] for s in manifest["shards"] if s["shard"] in (3, 5)
    )
    assert sub.count() == expect
    assert sub.select(F.countDistinct("shard")).collect()[0][0] <= 2
    plan = formatted_plan(sub)
    assert "PartitionFilters" in plan and "shard" in plan.split(
        "PartitionFilters", 1
    )[1][:200], plan[:2000]

    with pytest.raises(ValueError, match="not in manifest"):
        read_training_shards(spark, path, shards=[99])
