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


def _ref_bpe_train(word_freqs: dict, num_merges: int, min_count: int = 2):
    """Pure-python Sennrich reference: recount all adjacent pairs each
    round, merge the (count desc, pair lexicographic) argmax."""
    vocab = {tuple(w) + ("</w>",): f for w, f in word_freqs.items()}
    merges = []
    for _ in range(num_merges):
        counts = {}
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] = (
                    counts.get((syms[i], syms[i + 1]), 0) + f
                )
        if not counts:
            break
        # deterministic tiebreak: count desc, then lexicographically
        # smallest (a, b) — matches bpe_train's orderBy(desc(cnt), a, b)
        top = max(counts.values())
        best = min(p for p, c in counts.items() if c == top)
        if counts[best] < min_count:
            break
        merges.append(best)
        a, b = best
        new_vocab = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges


def test_bpe_train_random_corpora_vs_reference(spark):
    """Seeded random corpora over a 4-letter alphabet (dense pair
    collisions): the distributed merge learner must reproduce the
    pure-python Sennrich reference merge-for-merge."""
    import random

    from iceberg_geospatial_api_server_spark.operators.bpe import bpe_train

    for seed in range(3):
        rng = random.Random(seed)
        words = [
            "".join(rng.choice("abcd") for _ in range(rng.randint(1, 6)))
            for _ in range(30)
        ]
        freqs: dict = {}
        for w in words:
            freqs[w] = freqs.get(w, 0) + rng.randint(1, 5)
        text = " ".join(w for w, f in freqs.items() for _ in range(f))
        df = spark.createDataFrame([(0, text)], "doc_id long, text string")
        got = bpe_train(df, num_merges=8)
        want = _ref_bpe_train(freqs, 8)
        assert got == want, f"seed {seed}: {got} != {want}"
