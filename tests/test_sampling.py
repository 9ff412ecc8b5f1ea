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
