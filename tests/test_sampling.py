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
