"""Tests for the round-2 corpus-curation operators: repetition profiling
and token-budget selection."""

import pytest
from pyspark.sql import functions as F

from iceberg_geospatial_api_server_spark.operators.text import (
    corpus_token_budget,
    repetition_profile,
    token_budget_filter,
)


def _docs(spark, rows):
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]),
        "doc_id long, text string",
    )


def test_repetition_profile_flags_planted_spam(spark):
    clean = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    spam_words = "buy now " * 20  # 40 tokens, 2 distinct
    spam_tris = "one two three " * 10  # repeated trigram block
    df = _docs(
        spark,
        [(1, clean), (2, spam_words.strip()), (3, spam_tris.strip())],
    )
    out = {r["doc_id"]: r for r in repetition_profile(df).collect()}
    assert out[1]["keep"] and out[1]["dup_word_ratio"] == 0.0
    assert not out[2]["keep"] and out[2]["dup_word_ratio"] > 0.9
    assert not out[3]["keep"] and out[3]["dup_trigram_ratio"] > 0.5


def test_repetition_profile_short_doc_no_trigrams(spark):
    df = _docs(spark, [(1, "just two")])
    r = repetition_profile(df).first()
    assert r["dup_trigram_ratio"] == 0.0 and r["keep"]


def test_token_budget_summary_monotone(spark, tables):
    tb = corpus_token_budget(tables["documents"], 10000).collect()
    buckets = [r["bucket"] for r in tb]
    assert buckets == sorted(buckets, reverse=True)
    cums = [r["cum_tokens"] for r in tb]
    assert cums == sorted(cums)
    assert cums[-1] == sum(r["n_tokens"] for r in tb)
    # kept is a prefix property of the descending-bucket order
    kept = [r["kept"] for r in tb]
    assert kept == sorted(kept, reverse=True)


def test_token_budget_filter_respects_budget_and_quality(spark, tables):
    docs = tables["documents"]
    budget = 10000
    sel = token_budget_filter(docs, budget).cache()
    total = sel.agg(F.sum("n_tokens")).first()[0]
    assert total <= budget
    # greedy: adding any single unselected doc must overflow the
    # boundary remainder OR come from a lower-quality bucket; at minimum
    # the selection cannot be empty and must beat 90% budget utilization
    # on this corpus (boundary granularity is single documents)
    assert total > 0.9 * budget
    # deterministic
    sel2 = token_budget_filter(docs, budget)
    a = {r["doc_id"] for r in sel.collect()}
    b = {r["doc_id"] for r in sel2.collect()}
    assert a == b


def test_token_budget_filter_budget_covers_everything(spark, tables):
    docs = tables["documents"]
    all_tokens = (
        docs.select(F.size(F.split("text", " ")).alias("t"))
        .agg(F.sum("t"))
        .first()[0]
    )
    sel = token_budget_filter(docs, int(all_tokens))
    assert sel.count() == docs.count()


def test_token_budget_filter_zero_budget(spark, tables):
    assert token_budget_filter(tables["documents"], 0).count() == 0


def test_pii_scrub_counts_and_replacement(spark):
    """pii_scrub: counts per class and tag replacement, fixed order;
    text without PII passes through untouched."""
    from iceberg_geospatial_api_server_spark.operators.text import pii_scrub

    rows = [
        (1, "mail me at a.b+c@ex-am.ple.org or x@y.io thanks"),
        (2, "server 192.168.0.1 and 10.0.0.255 up"),
        (3, "call +1 (555) 010-1234 now"),
        (4, "plain text no pii"),
        (5, "mix j@d.co 8.8.8.8 +44 (020) 793-0000"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert (got[1]["n_emails"], got[1]["n_ips"], got[1]["n_phones"]) == (2, 0, 0)
    assert got[1]["scrubbed"] == "mail me at <EMAIL> or <EMAIL> thanks"
    assert got[2]["n_ips"] == 2
    assert got[2]["scrubbed"] == "server <IP> and <IP> up"
    assert got[3]["n_phones"] == 1
    assert got[3]["scrubbed"] == "call <PHONE> now"
    assert got[4]["scrubbed"] == "plain text no pii"
    assert (got[5]["n_emails"], got[5]["n_ips"], got[5]["n_phones"]) == (1, 1, 1)
    assert got[5]["scrubbed"] == "mix <EMAIL> <IP> <PHONE>"
