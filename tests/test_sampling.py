"""Deterministic sampling operators: reproducibility, nesting, exact
per-group counts."""

from pyspark.sql import functions as F

from iceberg_geospatial_api_server_spark.operators.sampling import (
    sample_fraction,
    sample_per_group,
    weighted_mixture,
)


def test_fraction_sample_deterministic_and_nested(tables):
    docs = tables["documents"]
    a1 = {r.doc_id for r in sample_fraction(docs, 0.2).select("doc_id").collect()}
    a2 = {r.doc_id for r in sample_fraction(docs, 0.2).select("doc_id").collect()}
    assert a1 == a2, "same fraction must select identical rows"
    b = {r.doc_id for r in sample_fraction(docs, 0.5).select("doc_id").collect()}
    assert a1 <= b, "hash-threshold samples must nest (0.2 subset of 0.5)"
    n = docs.count()
    assert 0.1 * n < len(a1) < 0.3 * n


def test_sample_per_group_exact_counts(tables):
    docs = tables["documents"]
    out = sample_per_group(docs, ["lang"], 5)
    sizes = {r.lang: r.n for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    group_sizes = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, total in group_sizes.items():
        assert sizes[lang] == min(5, total)


def test_weighted_mixture_rates(tables):
    docs = tables["documents"]
    mixed = weighted_mixture(docs, {"en": 0.0, "de": 1.0})
    langs = {r.lang for r in mixed.select("lang").distinct().collect()}
    assert "en" not in langs and "de" in langs
    n_de = mixed.filter(F.col("lang") == "de").count()
    assert n_de == docs.filter(F.col("lang") == "de").count(), "rate 1.0 keeps all"


def test_id_hash_safe_for_huge_ids(spark):
    """ids ≥ ~3.5e9 overflowed the naive product (ANSI throw / silent
    wrap); the modular form must stay exact for any 64-bit id."""
    from iceberg_geospatial_api_server_spark.operators.sampling import (
        MERSENNE, id_hash, sample_fraction,
    )
    from pyspark.sql import functions as F

    ids = [2**62 + i * 9_999_999_937 for i in range(200)] + [0, -5, 2**63 - 1]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    hashes = [r.h for r in df.select(id_hash(F.col("doc_id")).alias("h")).collect()]
    assert all(0 <= h < MERSENNE for h in hashes)
    # modular form must equal the exact bignum product (Python int is exact)
    expected = [(i * 2654435761) % MERSENNE for i in ids]
    assert hashes == expected
    kept = sample_fraction(df, 0.5).count()
    assert 0 < kept < len(ids)


def test_hash_split_proportions_and_stability(spark, sf_dir):
    """Split proportions approach 80/10/10, every row gets exactly one
    split, and — the property exact quantile splits lack — a document's
    assignment is unchanged when the corpus shrinks or grows."""
    from pyspark.sql import functions as F

    from iceberg_geospatial_api_server_spark.operators.sampling import (
        hash_split,
    )
    from iceberg_geospatial_api_server_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    out = hash_split(docs)
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == n
    assert abs(counts["train"] / n - 0.8) < 0.1

    # stability: assignments on a half-corpus agree with the full corpus
    half = hash_split(docs.filter(F.col("doc_id") % 2 == 0))
    joined = (
        out.select("doc_id", F.col("split").alias("full_split"))
        .join(half.select("doc_id", "split"), "doc_id")
    )
    assert joined.filter(F.col("split") != F.col("full_split")).count() == 0


def test_decontaminate_removes_planted_overlap(spark):
    from iceberg_geospatial_api_server_spark.operators.text import (
        decontaminate,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated text about spark engines here"),
            (3, "shares quick brown fox phrase with the benchmark"),
            (4, "tiny"),  # < n tokens: no grams, never contaminated
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "a quick brown fox appears in this benchmark item")],
        "doc_id long, text string",
    )
    kept = sorted(r["doc_id"] for r in decontaminate(docs, bench).collect())
    assert kept == [2, 4], kept


def test_temperature_mixture_weights_crafted(spark):
    """80/20 split at alpha=0.5: keep rates (0.5, 1.0) make the kept
    corpus realize the temperature shares (2/3, 1/3) exactly."""
    from iceberg_geospatial_api_server_spark.operators.sampling import (
        temperature_mixture_weights,
    )

    df = spark.createDataFrame(
        [(i, "big" if i < 80 else "small") for i in range(100)],
        "doc_id long, source string",
    )
    rows = {r["source"]: r for r in
            temperature_mixture_weights(df, alpha=0.5).collect()}
    assert rows["big"]["p"] == 0.8 and rows["small"]["p"] == 0.2
    assert abs(rows["big"]["q"] - 2 / 3) < 1e-6
    assert abs(rows["small"]["q"] - 1 / 3) < 1e-6
    assert rows["big"]["keep_rate"] == 0.5
    assert rows["small"]["keep_rate"] == 1.0
    assert rows["big"]["expected_docs"] == 40.0
    assert rows["small"]["expected_docs"] == 20.0
    # kept corpus realizes q: expected shares proportional to n*rate
    tot = sum(r["expected_docs"] for r in rows.values())
    assert abs(rows["big"]["expected_docs"] / tot - rows["big"]["q"]) < 1e-6


def test_temperature_mixture_alpha_one_is_identity(spark):
    """alpha=1 keeps the natural distribution: every rate is 1."""
    from iceberg_geospatial_api_server_spark.operators.sampling import (
        temperature_mixture_weights,
    )

    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(60)], "doc_id long, source string"
    )
    for r in temperature_mixture_weights(df, alpha=1.0).collect():
        assert r["keep_rate"] == 1.0
        assert r["q"] == r["p"]


def test_epoch_shuffle_is_a_permutation_and_deterministic(spark):
    """Every row gets exactly one (shard, pos); positions are contiguous
    0..n-1 within each shard; re-running yields the identical order."""
    from iceberg_geospatial_api_server_spark.operators.sampling import (
        epoch_shuffle,
    )

    df = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    )
    out = epoch_shuffle(df, epoch=1, n_shards=4)
    rows = out.select("doc_id", "shard", "pos").collect()
    assert len(rows) == 200
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(4))
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss))), shard
    again = epoch_shuffle(df, epoch=1, n_shards=4).select(
        "doc_id", "shard", "pos"
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_epoch_shuffle_epochs_are_distinct_permutations(spark):
    """Different epochs produce different orders over the same corpus,
    and epoch 0 matches the base id_hash order."""
    from iceberg_geospatial_api_server_spark.operators.sampling import (
        epoch_key, epoch_shuffle, id_hash,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
    e1 = {r["doc_id"]: (r["shard"], r["pos"])
          for r in epoch_shuffle(df, epoch=1).collect()}
    e2 = {r["doc_id"]: (r["shard"], r["pos"])
          for r in epoch_shuffle(df, epoch=2).collect()}
    assert e1 != e2  # a fresh permutation per epoch
    base = df.select(
        (epoch_key(F.col("doc_id"), 0) - id_hash(F.col("doc_id"))).alias("d")
    ).agg(F.max(F.abs(F.col("d")))).collect()[0][0]
    assert base == 0


def test_epoch_shuffle_single_exchange(spark):
    """The permutation costs ONE hash exchange (on shard) — no global
    range sort."""
    from iceberg_geospatial_api_server_spark.operators.sampling import (
        epoch_shuffle,
    )
    from iceberg_geospatial_api_server_spark.plans import (
        formatted_plan, hash_exchange_count, range_exchange_count,
    )

    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    out = epoch_shuffle(df, epoch=2, n_shards=8)
    plan = formatted_plan(out)
    assert hash_exchange_count(out) == 1, plan[:1500]
    assert range_exchange_count(out) == 0, plan[:1500]


def test_epoch_key_exact_for_any_64bit_id(spark):
    """The epoch-mixed modular form must equal the exact bignum
    ((id + epoch·P)·KNUTH) mod M for huge and negative ids alike (the
    congruence the corpus_epoch_order oracle recomputes in SQL)."""
    from iceberg_geospatial_api_server_spark.operators.sampling import (
        KNUTH, MERSENNE, epoch_key,
    )
    from pyspark.sql import functions as F

    ids = [2**62 + i * 9_999_999_937 for i in range(100)] + [0, -5, -2**62, 2**63 - 1]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    for epoch in (0, 3, 7):
        got = [
            r.h
            for r in df.select(
                epoch_key(F.col("doc_id"), epoch).alias("h")
            ).collect()
        ]
        expected = [((i + epoch * 2971215073) * KNUTH) % MERSENNE for i in ids]
        assert got == expected, epoch
        assert all(0 <= h < MERSENNE for h in got)
