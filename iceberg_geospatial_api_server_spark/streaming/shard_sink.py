"""Streaming training-shard sink: the continuous form of
`sources.shards.write_training_shards` for a corpus that arrives over time
(the daily-ingest pattern — new documents extend each shard's token stream
and close packs incrementally, without repacking history).

Layout under ``packs_dir``::

    __bid=<batch>/shard=<s>/*.parquet   completed packs (always max_tokens)
    _state/batch=<batch>/*.parquet      per-shard carry after that batch
                                        (shard, base_pos, rem tokens)

Per micro-batch the handler prepends each shard's carried remainder to the
batch's documents (doc_id order), materializes packs with the SAME
single-exchange plan as the batch operator (offset window on shard,
map-side posexplode, pack groupBy reusing the shard partitioning), emits
only the COMPLETED packs, and snapshots the new carry. State is one row
per shard — `base_pos` (the remainder's global stream position) plus at
most max_tokens carried tokens — independent of corpus size.

Replay-idempotent by construction (the lesson the versioned/curate sinks
learned): both writes key on the batch id. Completed packs land via
DYNAMIC partition overwrite of ``__bid=<batch>`` (a replayed batch
rewrites its own partition, never duplicates), and the carry snapshot
overwrites ``_state/batch=<batch>``; the handler always READS the latest
state strictly BEFORE the current batch id, so a crash between the two
writes replays to the identical result.

Equivalence contract (asserted in tests/test_shards.py): when batches
arrive in doc_id order, completed packs across all batches plus the final
carries equal the batch `materialize_packs` output exactly — same pack
ids, same token windows.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from iceberg_geospatial_api_server_spark.operators.sampling import id_hash
from iceberg_geospatial_api_server_spark.operators.text import tokens

STATE_SUBDIR = "_state"


def _latest_state_batch(state_dir: str, before: int) -> int | None:
    if not os.path.isdir(state_dir):
        return None
    ids = [
        int(m.group(1))
        for d in os.listdir(state_dir)
        if (m := re.fullmatch(r"batch=(\d+)", d))
    ]
    ids = [i for i in ids if i < before]
    return max(ids) if ids else None


def process_batch(
    batch: DataFrame,
    batch_id: int,
    packs_dir: str,
    max_tokens: int = 512,
    n_shards: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """One micro-batch of the shard sink (module-level so replay
    idempotency is directly testable: calling it twice with the same
    ``batch_id`` must leave the layout identical)."""
    L = int(max_tokens)
    state_dir = os.path.join(packs_dir, STATE_SUBDIR)
    spark = batch.sparkSession
    prev = _latest_state_batch(state_dir, int(batch_id))
    shard = F.pmod(id_hash(F.col(id_col)), F.lit(int(n_shards))).cast("int")
    docs = batch.select(
        shard.alias("shard"),
        F.lit(1).alias("__is_doc"),
        F.col(id_col).cast("long").alias("__seq"),
        tokens(F.col(text_col)).alias("__t"),
    )
    carry = None
    base = None
    stream = docs
    if prev is not None:
        carry = spark.read.parquet(os.path.join(state_dir, f"batch={prev}"))
        rem = carry.filter(F.size("rem") > 0).select(
            "shard",
            F.lit(0).alias("__is_doc"),  # sorts before every doc row
            F.lit(0).cast("long").alias("__seq"),
            F.col("rem").alias("__t"),
        )
        base = carry.select("shard", "base_pos")
        stream = docs.unionByName(rem)

    w = (
        Window.partitionBy("shard")
        .orderBy("__is_doc", "__seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    stream = stream.withColumn(
        "__off", F.sum(F.size("__t").cast("long")).over(w) - F.size("__t")
    )
    if base is not None:
        # base_pos is per-shard and tiny (n_shards rows): broadcast
        stream = stream.join(F.broadcast(base), "shard", "left").withColumn(
            "__off", F.col("__off") + F.coalesce("base_pos", F.lit(0))
        )
    keyed = stream.select(
        "shard", "__off", F.posexplode("__t").alias("__i", "__tok")
    ).select(
        "shard",
        F.expr(f"(__off + CAST(__i AS BIGINT)) DIV {L}").alias("pack_id"),
        F.pmod(F.col("__off") + F.col("__i").cast("long"), F.lit(L))
        .cast("int")
        .alias("__pp"),
        "__tok",
    )
    packs = (
        keyed.groupBy("shard", "pack_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("__pp").alias("p"), F.col("__tok").alias("t"))
                )
            ).alias("__arr"),
        )
        .select(
            "shard",
            "pack_id",
            "n_tokens",
            F.transform("__arr", lambda s: s["t"]).alias("tokens"),
        )
    )
    # two consumers below (completed packs, carry snapshot): pin the
    # per-batch-sized frame so window+explode+groupBy run once
    packs = packs.persist()
    try:
        completed = packs.filter(F.col("n_tokens") == L).withColumn(
            "__bid", F.lit(int(batch_id))
        )
        (
            completed.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__bid", "shard")
            .parquet(packs_dir)
        )
        # new carry: per shard, the (single) short pack if any, else an
        # empty remainder starting right after the last completed pack
        agg = packs.groupBy("shard").agg(
            F.max(F.col("pack_id") * L + F.col("n_tokens").cast("long")).alias(
                "__end"
            )
        )
        rem_rows = packs.filter(F.col("n_tokens") < L).select(
            "shard",
            (F.col("pack_id") * L).alias("base_pos"),
            F.col("tokens").alias("rem"),
        )
        full_rows = agg.join(rem_rows.select("shard"), "shard", "left_anti").select(
            "shard",
            F.col("__end").alias("base_pos"),
            F.array().cast("array<string>").alias("rem"),
        )
        touched = rem_rows.unionByName(full_rows)
        if carry is not None:
            untouched = carry.join(touched.select("shard"), "shard", "left_anti")
            snapshot = touched.unionByName(untouched)
        else:
            snapshot = touched
        snapshot.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"batch={int(batch_id)}")
        )
    finally:
        packs.unpersist()


def shard_sink_stream(
    docs_stream: DataFrame,
    packs_dir: str,
    checkpoint: str,
    max_tokens: int = 512,
    n_shards: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Build the writeStream (caller `.start()`s it). Output rows are
    (shard, pack_id, n_tokens, tokens) — doc attribution is the map's
    job (`stateful.streaming_pack`); the sink's contract is the packed
    token windows themselves."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        process_batch(
            batch,
            batch_id,
            packs_dir,
            max_tokens=max_tokens,
            n_shards=n_shards,
            text_col=text_col,
            id_col=id_col,
        )

    return (
        docs_stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(handle)
        .trigger(availableNow=True)
    )


def read_completed_packs(spark, packs_dir: str) -> DataFrame:
    """All completed packs across batches (the loader's view)."""
    return (
        spark.read.option("basePath", packs_dir)
        .parquet(os.path.join(packs_dir, "__bid=*"))
        .drop("__bid")
    )


def read_carry(spark, packs_dir: str) -> DataFrame:
    """The latest per-shard carry (shard, base_pos, rem)."""
    state_dir = os.path.join(packs_dir, STATE_SUBDIR)
    latest = _latest_state_batch(state_dir, before=1 << 62)
    if latest is None:
        raise FileNotFoundError(f"no state snapshots under {state_dir}")
    return spark.read.parquet(os.path.join(state_dir, f"batch={latest}"))
