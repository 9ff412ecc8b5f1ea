"""Winnowing fingerprints: exact selected-set equality with a pure-Python
reference (rightmost-min per window), the winnowing coverage guarantee
(every window contributes a selection; max gap between selected positions
< w), and the shared-substring detection property that motivates the
scheme."""

import hashlib
import random

from iceberg_geospatial_api_server_spark.operators.text import (
    winnow_fingerprints,
)


def _word_hash(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % 2147483647


def _ref_winnow(words, k=3, w=4):
    """Direct implementation of the Schleimer et al. selection rule."""
    grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    hs = [_word_hash(g) for g in grams]
    m = len(hs)
    if m == 0:
        return set()
    nw = max(1, m - w + 1)
    selected = set()
    for i in range(nw):
        window = hs[i : i + w]
        mn = min(window)
        # rightmost minimal position
        pos = max(j for j in range(i, min(i + w, m)) if hs[j] == mn)
        selected.add((pos, hs[pos]))
    return selected


def _docs_df(spark, docs):
    return spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)],
        "doc_id long, text string",
    )


def test_selected_set_matches_reference(spark):
    rng = random.Random(7)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta"]
    docs = [
        [rng.choice(vocab) for _ in range(n)] for n in [3, 4, 5, 9, 30, 80]
    ]
    out = winnow_fingerprints(_docs_df(spark, docs), k=3, w=4, detailed=True)
    got = {}
    for r in out.collect():
        got.setdefault(r.doc_id, set()).add((r.fp_pos, r.fp_hash))
    for i, ws in enumerate(docs):
        assert got.get(i, set()) == _ref_winnow(ws), f"doc {i}"


def test_coverage_guarantee(spark):
    """Winnowing's defining guarantee: selected positions are at most w
    apart, so any window of w consecutive grams contains a fingerprint."""
    rng = random.Random(11)
    words = [f"w{rng.randrange(50)}" for _ in range(300)]
    out = winnow_fingerprints(_docs_df(spark, [words]), k=3, w=4, detailed=True)
    poss = sorted(r.fp_pos for r in out.collect())
    assert poss[0] < 4
    gaps = [b - a for a, b in zip(poss, poss[1:])]
    assert max(gaps) <= 4
    # density ~ 2/(w+1) on random data (loose band)
    density = len(poss) / (len(words) - 2)
    assert 0.2 < density < 0.6


def test_shared_substring_shares_fingerprint(spark):
    """Two documents sharing a run of w+k-1 = 6 identical words must share
    at least one (hash) fingerprint — the plagiarism-detection property."""
    rng = random.Random(3)
    shared = ["the", "quick", "brown", "fox", "jumps", "over"]
    a = [f"a{rng.randrange(1000)}" for _ in range(40)] + shared + [
        f"b{rng.randrange(1000)}" for _ in range(40)
    ]
    b = [f"c{rng.randrange(1000)}" for _ in range(25)] + shared + [
        f"d{rng.randrange(1000)}" for _ in range(25)
    ]
    out = winnow_fingerprints(_docs_df(spark, [a, b]), k=3, w=4, detailed=True)
    fps = {}
    for r in out.collect():
        fps.setdefault(r.doc_id, set()).add(r.fp_hash)
    assert fps[0] & fps[1]


def test_short_documents(spark):
    """m < w: one window over all grams; m == 0: no output row."""
    docs = [["a", "b", "c"], ["x", "y"]]
    out = winnow_fingerprints(_docs_df(spark, docs), k=3, w=4)
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {0}
    assert rows[0].n_grams == 1 and rows[0].n_windows == 1
    assert rows[0].n_fingerprints == 1


def test_winnow_pairs_finds_planted_overlap(spark):
    """Docs sharing a long common substring must pair with high
    n_shared; unrelated docs must not pair."""
    import random

    from iceberg_geospatial_api_server_spark.operators.text import winnow_pairs

    rng = random.Random(21)
    shared = [f"s{i}" for i in range(30)]
    docs = [
        [f"a{rng.randrange(10**6)}" for _ in range(20)] + shared,
        shared + [f"b{rng.randrange(10**6)}" for _ in range(20)],
        [f"c{rng.randrange(10**6)}" for _ in range(50)],
    ]
    df = _docs_df(spark, docs)
    pairs = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in winnow_pairs(df, min_shared=2, max_bucket_size=50).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] >= 5
    assert all(2 not in p for p in pairs)


def test_winnow_pairs_bucket_cap_drops_boilerplate(spark):
    """A fingerprint present in EVERY doc is boilerplate: with the cap
    below the corpus size it contributes no pairs."""
    from iceberg_geospatial_api_server_spark.operators.text import winnow_pairs

    boiler = ["x", "y", "z", "w", "v", "u"]
    docs = [[f"d{i}{j}" for j in range(10)] + boiler for i in range(8)]
    df = _docs_df(spark, docs)
    capped = winnow_pairs(df, min_shared=1, max_bucket_size=4).collect()
    uncapped = winnow_pairs(df, min_shared=1, max_bucket_size=100).collect()
    assert len(uncapped) > len(capped)
    # the all-docs boilerplate fingerprints alone produce the full
    # 8-choose-2 clique uncapped
    assert len(uncapped) == 28


def test_zipf_fit_powerlaw_slope(spark):
    """A synthetic corpus with freq(rank) ∝ 1/rank must fit slope ≈ −1
    with near-perfect R²; a two-value frequency profile fits far from
    −1. Cross-checked against numpy.polyfit on the same points."""
    import math

    import numpy as np

    from iceberg_geospatial_api_server_spark.operators.text import zipf_fit

    words = []
    n_types = 80
    for r in range(1, n_types + 1):
        words += [f"w{r:03d}"] * max(1, int(round(400 / r)))
    docs = [" ".join(words)]
    df = spark.createDataFrame([(0, docs[0])], "doc_id long, text string")
    got = zipf_fit(df, top_n=n_types).collect()[0]
    assert got.n_used == n_types
    assert -1.15 < got.slope < -0.85
    assert got.r2 > 0.97
    # numpy reference on the identical quantized points
    freqs = sorted(
        ((max(1, int(round(400 / r)))) for r in range(1, n_types + 1)),
        reverse=True,
    )
    lx = [math.floor(math.log(i + 1) * 1e6 + 0.5) for i in range(n_types)]
    ly = [math.floor(math.log(f) * 1e6 + 0.5) for f in freqs]
    slope, intercept = np.polyfit(lx, ly, 1)
    assert abs(got.slope - round(slope, 6)) < 1e-4


def test_decontaminate_spans_crafted(spark):
    """Planted contamination: corpus doc shares two separated trigram
    runs with the benchmark doc — exactly those token spans mask,
    overlapping windows merge into maximal spans, and the scrubbed text
    matches the hand-built expectation."""
    import hashlib

    from iceberg_geospatial_api_server_spark.operators.text import (
        decontaminate_spans,
    )
    from pyspark.sql import functions as F

    bench = "alpha beta gamma delta xxx yyy zzz omega psi chi"
    clean = ["c%d" % i for i in range(12)]
    # doc 1: a 4-token contaminated run (two overlapping trigrams) at
    # 3..6 and a separate 3-token run at 10..12
    doc1 = (
        "a0 a1 a2 alpha beta gamma delta a7 a8 a9 omega psi chi a13"
    )
    df = spark.createDataFrame(
        [(0, bench), (1, doc1), (2, " ".join(clean))],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in decontaminate_spans(
            df, bench_pred=F.col("doc_id") == 0, gram_tokens=3
        ).collect()
    }
    assert set(out) == {1, 2}
    r1 = out[1]
    assert r1.n_spans == 2
    assert r1.n_masked == 4 + 3
    expected = (
        "a0 a1 a2 <MASK> <MASK> <MASK> <MASK> a7 a8 a9 "
        "<MASK> <MASK> <MASK> a13"
    )
    assert r1.scrubbed_md5 == hashlib.md5(expected.encode()).hexdigest()
    r2 = out[2]
    assert r2.n_masked == 0 and r2.n_spans == 0
    assert r2.scrubbed_md5 == hashlib.md5(" ".join(clean).encode()).hexdigest()


def test_dedup_spans_scrub_keep_first(spark):
    """Two docs share an 8-token run: the smaller doc id keeps it, the
    larger gets it masked; a third unrelated doc is untouched."""
    import hashlib

    from iceberg_geospatial_api_server_spark.operators.text import (
        dedup_spans_scrub,
    )

    shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    d0 = f"a1 a2 {shared} a3 a4"
    d1 = f"b1 b2 b3 {shared} b4"
    d2 = "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"
    df = spark.createDataFrame(
        [(0, d0), (1, d1), (2, d2)], "doc_id long, text string"
    )
    out = {
        r.doc_id: r
        for r in dedup_spans_scrub(df, gram_tokens=8, min_docs=2).collect()
    }
    assert out[0].n_masked == 0  # keeper
    assert out[1].n_masked == 8 and out[1].n_spans == 1
    expected = "b1 b2 b3 " + " ".join(["<MASK>"] * 8) + " b4"
    assert out[1].scrubbed_md5 == hashlib.md5(expected.encode()).hexdigest()
    assert out[2].n_masked == 0
