"""BPE subword tokenizer: the textbook merge sequence must fall out of
the distributed pair counting, and encoding must invert to the word."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def sennrich_corpus(spark):
    # the worked example from Sennrich et al. 2016: word frequencies
    # low:5  lower:2  newest:6  widest:3
    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    return spark.createDataFrame(
        [(0, " ".join(words))], "doc_id long, text string"
    )


def test_bpe_train_textbook_merges(spark, sennrich_corpus):
    from iceberg_geospatial_api_server_spark.operators.bpe import bpe_train

    merges = bpe_train(sennrich_corpus, num_merges=4)
    # counts: (e,s)=9 from newest+widest, then (es,t)=9, then (est,</w>)=9
    assert merges[:3] == [("e", "s"), ("es", "t"), ("est", "</w>")]
    assert merges[3] == ("l", "o")  # next best: 7 from low+lower


def test_bpe_encode_roundtrip_and_fertility(spark, sennrich_corpus):
    from iceberg_geospatial_api_server_spark.operators.bpe import (
        END,
        _encode_word,
        bpe_encode,
        bpe_train,
    )

    merges = bpe_train(sennrich_corpus, num_merges=10)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ["low", "lower", "newest", "widest", "unseen"]:
        syms = _encode_word(w, ranks)
        assert "".join(syms) == w + END  # lossless segmentation
    df = spark.createDataFrame(
        [(1, "low lower newest"), (2, ""), (3, "newest newest")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in bpe_encode(df, merges).collect()}
    assert rows[1]["n_words"] == 3
    assert rows[1]["n_subwords"] >= 3  # at least one subword per word
    assert rows[2]["n_words"] == 0 and rows[2]["fertility"] == 0.0
    # 'newest' encodes identically wherever it appears
    assert rows[3]["n_subwords"] == 2 * (
        rows[1]["n_subwords"]
        - len(_encode_word("low", ranks))
        - len(_encode_word("lower", ranks))
    )


def test_bpe_more_merges_never_increase_subwords(spark, sennrich_corpus):
    from iceberg_geospatial_api_server_spark.operators.bpe import (
        bpe_encode,
        bpe_train,
    )

    merges = bpe_train(sennrich_corpus, num_merges=12)
    df = sennrich_corpus
    n_few = bpe_encode(df, merges[:2]).collect()[0]["n_subwords"]
    n_more = bpe_encode(df, merges).collect()[0]["n_subwords"]
    assert n_more <= n_few


def test_bpe_greedy_overlap_semantics(spark):
    """'a a a' with merge (a,a) fuses leftmost-first: ['aa','a']; the
    fold-based distributed apply and the encoder must agree."""
    from iceberg_geospatial_api_server_spark.operators.bpe import (
        _encode_word,
        bpe_train,
    )

    df = spark.createDataFrame(
        [(0, " ".join(["aaa"] * 4))], "doc_id long, text string"
    )
    merges = bpe_train(df, num_merges=1)
    assert merges == [("a", "a")]
    assert _encode_word("aaa", {("a", "a"): 0}) == ["aa", "a", "</w>"]
