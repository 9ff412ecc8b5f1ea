"""Training-shard sink: materialize GPT-style fixed-token packs and write
them as a sharded, size-bounded parquet layout with a manifest.

`operators.text.pack_sequences` computes the packing MAP (which packs each
document lands in); this module materializes the packs themselves — one row
per pack holding the actual `max_tokens`-token window — and writes them in
the layout a training loader consumes: one directory per shard, row-group
sizes bounded by `maxRecordsPerFile`, and a `_shards_manifest.json` whose
per-shard totals a loader can trust without listing files.

Scale posture (100 TB): the materialization is pure DataFrame ops — no
pandas, no shard-sized memory. The token stream explodes map-side with its
global position (the per-doc stream offset comes from one window over the
doc-level shard exchange, doc-granular, not token-granular); packs then
group on (shard, pack_id), so aggregation state is one ≤`max_tokens` pack
per key, never a whole shard. ONE exchange total, doc-granular: the pack
groupBy's keys are a superset of the window's shard partitioning, so
EnsureRequirements reuses it — tokens never shuffle at token granularity
(plan-asserted in tests/test_plans.py). Shard skew bounds the window's
partition size; bound shard token mass by raising `n_shards`, exactly as
in `pack_sequences`.

(Training-pipeline adjacency; the reference has no packing/shard sink
analog — its ingestion surface ends at upload, api/main.py:678-899.)
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from iceberg_geospatial_api_server_spark.operators.sampling import id_hash
from iceberg_geospatial_api_server_spark.operators.text import tokens


def materialize_packs(
    df: DataFrame,
    max_tokens: int = 512,
    n_shards: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per pack: (shard, pack_id, n_tokens, n_docs, first_doc_id,
    tokens) where `tokens` is the pack's actual token window — documents
    concatenated in (shard, doc_id) order and sliced every `max_tokens`
    tokens, straddling document boundaries exactly like the
    `pack_sequences` map (same shard hash, same stream order, so the map
    and the materialized packs agree row for row).

    Every pack has exactly `max_tokens` tokens except each shard's last.
    """
    L = int(max_tokens)
    shard = F.pmod(id_hash(F.col(id_col)), F.lit(int(n_shards))).cast("int")
    base = df.select(
        F.col(id_col), shard.alias("shard"), tokens(F.col(text_col)).alias("__t")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    off = F.sum(F.size("__t").cast("long")).over(w) - F.size("__t")
    stream = base.withColumn("__off", off).select(
        id_col, "shard", "__off", F.posexplode("__t").alias("__i", "__tok")
    )
    # integer arithmetic only — double division would round above 2^53,
    # token positions at corpus scale live in long range
    pos = F.col("__off") + F.col("__i").cast("long")
    keyed = stream.select(
        id_col,
        "shard",
        F.expr(f"(__off + CAST(__i AS BIGINT)) DIV {L}").alias("pack_id"),
        F.pmod(pos, F.lit(L)).cast("int").alias("__pp"),
        "__tok",
    )
    arr = F.array_sort(
        F.collect_list(F.struct(F.col("__pp").alias("p"), F.col("__tok").alias("t")))
    )
    return (
        keyed.groupBy("shard", "pack_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.countDistinct(id_col).cast("long").alias("n_docs"),
            F.min(id_col).alias("first_doc_id"),
            arr.alias("__arr"),
        )
        .select(
            "shard",
            "pack_id",
            "n_tokens",
            "n_docs",
            "first_doc_id",
            F.transform("__arr", lambda s: s["t"]).alias("tokens"),
        )
    )


MANIFEST = "_shards_manifest.json"


def write_training_shards(
    df: DataFrame,
    path: str,
    max_tokens: int = 512,
    n_shards: int = 32,
    rows_per_file: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Materialize packs and write the training-shard layout:

    * parquet partitioned by `shard` (one directory per shard — the unit
      a data-loader worker claims);
    * `rows_per_file` bounds packs per parquet file via
      `maxRecordsPerFile` (files split at the bound, so shard directories
      stay seekable no matter how hot a shard is);
    * `_shards_manifest.json` with per-shard pack/token totals computed
      by re-reading the WRITTEN files (the manifest certifies what is on
      disk, not what the plan intended). The stats collect is bounded at
      `n_shards` rows — never pack- or token-granular.

    Returns the manifest dict.
    """
    packs = materialize_packs(
        df, max_tokens=max_tokens, n_shards=n_shards,
        text_col=text_col, id_col=id_col,
    )
    writer = packs.write.mode("overwrite").partitionBy("shard")
    if rows_per_file is not None:
        writer = writer.option("maxRecordsPerFile", int(rows_per_file))
    writer.parquet(path)

    spark = df.sparkSession
    stats = (
        spark.read.parquet(path)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_packs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
        .orderBy("shard")
        .collect()
    )
    manifest = {
        "format": "training-shards/v1",
        "max_tokens": int(max_tokens),
        "n_shards": int(n_shards),
        "shards": [
            {"shard": r["shard"], "n_packs": r["n_packs"], "n_tokens": r["n_tokens"]}
            for r in stats
        ],
        "total_packs": int(sum(r["n_packs"] for r in stats)),
        "total_tokens": int(sum(r["n_tokens"] for r in stats)),
    }
    with open(os.path.join(path, MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def read_training_shards(
    spark,
    path: str,
    shards: list[int] | None = None,
    validate: bool = False,
) -> DataFrame:
    """Read the training-shard layout back — the data-loader half of the
    loop `write_training_shards` starts.

    ``shards=``: a worker's claimed subset. The filter lands on the
    PARTITION column, so Spark prunes unclaimed shard directories at
    planning time — a reader asking for shard 7 scans ONLY shard=7/
    files (plan-asserted in tests), which is what lets N data-loader
    workers share one layout without N full scans.

    ``validate=True`` recounts packs per shard against the manifest
    (one count job over the claimed subset) and raises on drift —
    off by default because the manifest already certifies the write
    by construction."""
    with open(os.path.join(path, MANIFEST)) as f:
        manifest = json.load(f)
    if manifest.get("format") != "training-shards/v1":
        raise ValueError(
            f"not a training-shard layout: {manifest.get('format')!r}"
        )
    df = spark.read.parquet(path)
    claimed = manifest["shards"]
    if shards is not None:
        want = sorted(int(s) for s in shards)
        known = {s["shard"] for s in claimed}
        missing = [s for s in want if s not in known]
        if missing:
            raise ValueError(f"shards not in manifest: {missing}")
        df = df.filter(F.col("shard").isin(want))
        claimed = [s for s in claimed if s["shard"] in set(want)]
    if validate:
        got = {
            r["shard"]: r["n"]
            for r in df.groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        expect = {s["shard"]: s["n_packs"] for s in claimed}
        if got != expect:
            raise ValueError(
                f"shard layout drifted from manifest: {got} != {expect}"
            )
    return df
