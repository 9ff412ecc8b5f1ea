"""Semantics tests for the training-pipeline operators added in round 3:
sequence packing, int8 embedding quantization, per-user outlier profile.
(Oracle parity for the same operators lives in test_oracle_parity.py —
these tests pin the semantic invariants the hash compare can't express.)
"""

import pytest
from pyspark.sql import functions as F

from iceberg_geospatial_api_server_spark.plans import (
    formatted_plan as _plan,
    hash_exchange_count,
    range_exchange_count,
    single_partition_exchange_count,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from iceberg_geospatial_api_server_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "documents")


def test_pack_sequences_tiles_shard_streams(docs):
    """Per shard, document token spans must tile the stream contiguously:
    offsets are the running sum of preceding token counts, and pack ids
    follow from integer division of the span endpoints."""
    from iceberg_geospatial_api_server_spark.operators.text import (
        pack_sequences,
    )

    out = pack_sequences(docs, max_tokens=128).collect()
    by_shard: dict = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    assert len(by_shard) > 1
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r.doc_id)
        cum = 0
        for r in rows:
            assert r.stream_offset == cum, (shard, r)
            assert r.pack_first == r.stream_offset // 128
            assert r.pack_last == (r.stream_offset + r.n_tokens - 1) // 128
            assert r.n_packs == r.pack_last - r.pack_first + 1
            cum += r.n_tokens
    # with 128-token packs and ~150-token docs, straddles must exist
    assert any(r.n_packs > 1 for r in out)


def test_pack_sequences_single_shard_exchange(docs):
    from iceberg_geospatial_api_server_spark.operators.text import (
        pack_sequences,
    )

    plan = _plan(pack_sequences(docs))
    assert hash_exchange_count(plan) <= 1, plan
    assert single_partition_exchange_count(plan) == 0, plan


def test_quantize_embeddings_reconstruction(spark, sf_dir):
    """Codes stay in [0, 255] and dequantization reconstructs every
    component to within one quantization step."""
    from iceberg_geospatial_api_server_spark.operators.ann import (
        quantize_embeddings,
    )
    from iceberg_geospatial_api_server_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    orig = {r.vec_id: list(r.embedding) for r in emb.collect()}
    for row in quantize_embeddings(emb).collect():
        vec = orig[row.vec_id]
        assert row.n_dims == len(vec)
        assert all(0 <= c <= 255 for c in row.codes)
        rng = row.v_max - row.v_min
        step = rng / 255.0 if rng else 0.0
        for x, c in zip(vec, row.codes):
            assert abs((row.v_min + c * step) - x) <= step + 1e-9


def test_quantize_embeddings_is_scan_side(spark, sf_dir):
    """Quantization must be a pure map-side transform: no shuffle, no
    Python (BatchEvalPython/ArrowEvalPython) in the plan."""
    from iceberg_geospatial_api_server_spark.operators.ann import (
        quantize_embeddings,
    )
    from iceberg_geospatial_api_server_spark.sources.tables import load_table

    plan = _plan(quantize_embeddings(load_table(spark, sf_dir, "embeddings")))
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_events_outliers_flags_planted_spike(spark):
    """A user with a flat stream plus one massive spike reports exactly
    one outlier; a perfectly flat user reports none."""
    from iceberg_geospatial_api_server_spark.operators.relational import (
        events_outliers,
    )

    rows = [(1, float(v)) for v in [10.0] * 20 + [10000.0]] + [
        (2, 5.0)
    ] * 10
    df = spark.createDataFrame(rows, "user_id LONG, value DOUBLE")
    out = {r.user_id: r for r in events_outliers(df).collect()}
    assert out[1].n_outliers == 1
    assert out[1].n_events == 21
    assert out[2].n_outliers == 0


def test_events_outliers_single_exchange(spark, sf_dir):
    from iceberg_geospatial_api_server_spark.operators.relational import (
        events_outliers,
    )
    from iceberg_geospatial_api_server_spark.sources.tables import load_table

    plan = _plan(events_outliers(load_table(spark, sf_dir, "events")))
    # r4 shape: per-user stats via groupBy partial agg (exchange 1),
    # broadcast back for the z-test, final per-user agg (exchange 2) —
    # both exchanges carry aggregated/user-sized data, never raw sorted
    # events (the old windowed form shuffled + sorted the event stream)
    assert hash_exchange_count(plan) <= 2, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "Window" not in plan, plan


def test_corpus_source_stats_exact_median(spark):
    """Lower-median definition pinned: even count → the ⌈n/2⌉-th value."""
    from iceberg_geospatial_api_server_spark.operators.text import (
        corpus_source_stats,
    )

    rows = [
        (1, "a b c", "en", "s1", 10),
        (2, "a b", "en", "s1", 20),
        (3, "a", "de", "s1", 30),
        (4, "a b c d", "en", "s1", 40),
        (5, "x y", "fr", "s2", 7),
    ]
    df = spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    )
    out = {r.source: r for r in corpus_source_stats(df).collect()}
    assert out["s1"].n_docs == 4
    assert out["s1"].n_langs == 2
    assert out["s1"].total_tokens == 3 + 2 + 1 + 4
    assert out["s1"].median_chars == 20  # position ceil(4/2)=2 of 10,20,30,40
    assert out["s2"].median_chars == 7


def test_corpus_source_stats_shares_source_exchange(docs):
    from iceberg_geospatial_api_server_spark.operators.text import (
        corpus_source_stats,
    )

    plan = _plan(corpus_source_stats(docs))
    # windows + agg on source; countDistinct may add its expand exchange
    assert hash_exchange_count(plan) <= 2, plan
    assert single_partition_exchange_count(plan) == 0, plan


def test_cross_source_overlap_symmetric_pairs(docs):
    """Every reported pair is ordered (a < b) and the shared-prefix count
    agrees with a brute-force recount over collected prefixes."""
    from collections import defaultdict

    from iceberg_geospatial_api_server_spark.operators.text import (
        cross_source_overlap,
    )

    out = cross_source_overlap(docs, prefix_tokens=20).collect()
    assert all(r.source_a < r.source_b for r in out)
    import hashlib

    seen = defaultdict(set)
    for r in docs.select("text", "source").collect():
        prefix = " ".join(r.text.split(" ")[:20])
        seen[hashlib.md5(prefix.encode()).hexdigest()].add(r.source)
    expect = defaultdict(int)
    for srcs in seen.values():
        ss = sorted(srcs)
        for i in range(len(ss)):
            for j in range(i + 1, len(ss)):
                expect[(ss[i], ss[j])] += 1
    got = {(r.source_a, r.source_b): r.n_shared_prefixes for r in out}
    assert got == dict(expect)


def test_gopher_rules_crafted_docs(spark):
    from iceberg_geospatial_api_server_spark.operators.text import (
        gopher_structural_rules,
    )

    good = "the quick brown fox jumps over the lazy dog and then " * 10
    docs = spark.createDataFrame(
        [
            (1, good.strip()),                        # passes everything
            (2, "too short with the and of that"),    # fails min_words
            (3, ("## " * 30 + "the of and with " * 20).strip()),  # symbols
            (4, "\n".join("- bullet line the of and" for _ in range(10))),
            (5, ("zz " * 60).strip()),                # no stopwords
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in gopher_structural_rules(docs).collect()}
    assert rows[1]["keep"] is True
    assert rows[2]["keep"] is False and rows[2]["n_words"] < 50
    assert rows[3]["keep"] is False and rows[3]["symbol_ratio"] > 0.1
    assert rows[4]["keep"] is False and rows[4]["bullet_line_frac"] == 1.0
    assert rows[5]["keep"] is False and rows[5]["n_stop_hits"] == 0
    # signal sanity on the passing doc
    assert 3.0 <= rows[1]["mean_word_len"] <= 10.0
    assert rows[1]["alpha_word_frac"] == 1.0


def test_gopher_rules_scan_stage_only(docs):
    from iceberg_geospatial_api_server_spark.operators.text import (
        gopher_structural_rules,
    )
    from iceberg_geospatial_api_server_spark.plans.explain import shuffle_count

    out = gopher_structural_rules(docs)
    assert shuffle_count(out) == 0  # pure map-side filter battery


def test_quantize_embeddings_null_vector_row(spark):
    from iceberg_geospatial_api_server_spark.operators.ann import (
        quantize_embeddings,
    )

    df = spark.createDataFrame(
        [(1, [0.0, 2.0]), (2, None), (3, [5.0, 5.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    assert rows[1]["codes"] == [0, 255]
    assert rows[2]["codes"] is None and rows[2]["v_min"] is None
    assert rows[2]["n_dims"] is None
    assert rows[3]["codes"] == [0, 0]  # constant vector


def test_pca_null_vector_row(spark):
    import numpy as np

    from iceberg_geospatial_api_server_spark.operators.ann import pca_project

    rng = np.random.RandomState(3)
    data = [(i, rng.rand(4).tolist()) for i in range(20)]
    data.append((99, None))
    df = spark.createDataFrame(data, "vec_id long, embedding array<float>")
    rows = {r["vec_id"]: r["proj"] for r in pca_project(df, k=2).collect()}
    assert rows[99] is None          # null row projects to null
    assert rows[0] is not None and len(rows[0]) == 2


def test_pii_scrub_counts_match_emitted_tags(spark):
    """Counts are of replacements PERFORMED: an IP-shaped substring
    inside an email is consumed by the email pass and must not count."""
    from iceberg_geospatial_api_server_spark.operators.text import pii_scrub

    df = spark.createDataFrame(
        [(1, "contact a@1.2.3.4.com now"), (2, "plain 1.2.3.4 here")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert rows[1]["n_emails"] == 1
    assert rows[1]["n_ips"] == 0            # consumed by <EMAIL>
    assert "<IP>" not in rows[1]["scrubbed"]
    assert rows[2]["n_ips"] == 1 and "<IP>" in rows[2]["scrubbed"]


def test_segment_dedup_crafted(spark):
    """Shared 10-word segments across docs are boilerplate; unique ones
    are kept with their token counts."""
    from iceberg_geospatial_api_server_spark.operators.text import (
        segment_dedup_stats,
    )

    shared = " ".join(f"s{i}" for i in range(10))
    tail_a = " ".join(f"a{i}" for i in range(10))
    tail_b = " ".join(f"b{i}" for i in range(10))
    uniq = " ".join(f"u{i}" for i in range(15))
    df = spark.createDataFrame(
        [(0, f"{shared} {tail_a}"), (1, f"{shared} {tail_b}"), (2, uniq)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in segment_dedup_stats(df).collect()}
    assert rows[0]["n_segs"] == 2 and rows[0]["n_dup_segs"] == 1
    assert rows[0]["n_tokens_kept"] == 10
    assert rows[1]["n_dup_segs"] == 1 and rows[1]["n_tokens_kept"] == 10
    assert rows[2]["n_segs"] == 2  # 10 + short 5
    assert rows[2]["n_dup_segs"] == 0 and rows[2]["n_tokens_kept"] == 15
    assert rows[0]["dup_seg_frac"] == 0.5


def test_segment_dedup_final_short_segment_not_conflated(spark):
    """A short FINAL segment must hash as its own window — not equal a
    full segment with the same prefix (regression guard on slicing)."""
    from iceberg_geospatial_api_server_spark.operators.text import (
        segment_dedup_stats,
    )

    ten = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        # doc 0 ends with the 5-word prefix of doc 1's full segment
        [(0, ten + " w0 w1 w2 w3 w4"), (1, ten + " " + ten)],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in segment_dedup_stats(df).collect()}
    # only the full 10-word segment is shared (both docs), the 5-word
    # tail of doc 0 differs from doc 1's second full segment
    assert rows[0]["n_dup_segs"] == 1 and rows[0]["n_tokens_kept"] == 5
    assert rows[1]["n_dup_segs"] == 2 and rows[1]["n_tokens_kept"] == 0


def test_dup_span_stats_planted_run(spark):
    """A 12-token run shared by two docs yields one maximal span of 12
    tokens in each; within-doc-only repetition does not count."""
    from iceberg_geospatial_api_server_spark.operators.text import (
        dup_span_stats,
    )

    run = " ".join(f"s{i}" for i in range(12))
    pre = " ".join(f"p{i}" for i in range(5))
    post = " ".join(f"q{i}" for i in range(4))
    tail = " ".join(f"t{i}" for i in range(6))
    rep8 = " ".join(f"r{i}" for i in range(8))
    df = spark.createDataFrame(
        [
            (0, f"{pre} {run} {post}"),  # 21 tokens, run at 5..16
            (1, f"{run} {tail}"),  # 18 tokens, run at 0..11
            (2, " ".join(f"u{i}" for i in range(20))),  # unique
            (3, f"{rep8} {rep8}"),  # internal repeat, single doc
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in dup_span_stats(df).collect()}
    assert rows[0]["n_spans"] == 1 and rows[0]["dup_tokens"] == 12
    assert rows[0]["n_dup_grams"] == 5  # gram starts 5..9
    assert rows[0]["dup_token_frac"] == round(12 / 21, 6)
    assert rows[1]["n_spans"] == 1 and rows[1]["dup_tokens"] == 12
    assert rows[2]["n_spans"] == 0 and rows[2]["dup_tokens"] == 0
    # cross-doc gate: min_docs counts DISTINCT docs
    assert rows[3]["n_spans"] == 0 and rows[3]["n_dup_grams"] == 0


def test_dup_span_stats_interval_union_no_double_count(spark):
    """Overlapping duplicated windows merge: two dup grams 3 apart cover
    11 distinct tokens, not 16 (the Lee-et-al span semantics)."""
    from iceberg_geospatial_api_server_spark.operators.text import (
        dup_span_stats,
    )

    w = [f"w{i}" for i in range(11)]
    a = " ".join(w)  # grams at starts 0..3
    b1 = "x1 x2 x3 " + " ".join(w[0:8])  # shares A's gram start 0
    b2 = " ".join(w[3:11]) + " y1 y2 y3"  # shares A's gram start 3
    df = spark.createDataFrame(
        [(0, a), (1, b1), (2, b2)], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in dup_span_stats(df).collect()}
    assert rows[0]["n_dup_grams"] == 2  # starts {0, 3} only
    assert rows[0]["n_spans"] == 1  # gap 3 <= 8 merges
    assert rows[0]["dup_tokens"] == 11  # union, not 2*8
    assert rows[0]["dup_token_frac"] == 1.0


def test_segment_dedup_distinct_count_is_pair_keyed(docs):
    """The boilerplate count aggregates on (hash, doc) before (hash):
    a segment occurring in every document never funnels one reducer.
    Plan must show the expanded two-key partial aggregate and no
    corpus-side broadcast or cartesian."""
    from iceberg_geospatial_api_server_spark.operators.text import (
        segment_dedup_stats,
    )

    plan = _plan(segment_dedup_stats(docs))
    assert "CartesianProduct" not in plan
    # count(distinct doc_id) per hash plans as keys=[__h, doc_id] first
    assert "__h" in plan and "doc_id" in plan


def test_quality_classifier_matches_reference_math(spark):
    """Score equals the pure-Python hashed-weight mean (portable md5
    hash), keep == (score >= 0), prob is the calibrated sigmoid."""
    import hashlib
    import math

    from iceberg_geospatial_api_server_spark.operators.text import (
        quality_classifier_score,
    )

    M = 2147483647

    def whash(w):
        return int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % M

    texts = ["alpha beta gamma", "delta delta delta", "x"]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in quality_classifier_score(df).collect()}
    for i, t in enumerate(texts):
        ws = sum(whash(w) % 2001 - 1000 for w in t.split(" "))
        n = len(t.split(" "))
        score = ws / (n * 1000)
        assert rows[i]["n_tokens"] == n
        assert rows[i]["score"] == round(score, 6)
        assert rows[i]["prob"] == round(1 / (1 + math.exp(-4 * score)), 6)
        assert rows[i]["keep"] == (score >= 0)
    # repetition invariance of the mean: 'w' and 'w w w' score the same
    assert (
        rows[1]["score"]
        == round(whash("delta") % 2001 / 1000 - 1.0, 6)
    )


def test_new_pipeline_ops_plan_shapes(docs):
    """Pin the r4 training-pipeline plans: classifier is ONE doc-key
    exchange; temperature's windows run on the strata-sized aggregate
    (one stratum exchange + one single-partition window); BPE encoding
    is pure map-side (ZERO exchanges — 100 TB encodes without a
    shuffle); segment-dedup and dup-spans keep their designed three
    exchanges (pair-keyed distinct, hash join-back, doc re-agg) and
    never go cartesian."""
    from iceberg_geospatial_api_server_spark.operators.bpe import bpe_encode
    from iceberg_geospatial_api_server_spark.operators.sampling import (
        temperature_mixture_weights,
    )
    from iceberg_geospatial_api_server_spark.operators.text import (
        dup_span_stats,
        quality_classifier_score,
        segment_dedup_stats,
    )

    p = _plan(quality_classifier_score(docs))
    assert hash_exchange_count(p) == 1

    p = _plan(temperature_mixture_weights(docs, stratum_col="lang"))
    assert hash_exchange_count(p) == 1
    assert single_partition_exchange_count(p) == 1

    p = _plan(bpe_encode(docs, [("a", "b")]))
    assert hash_exchange_count(p) == 0
    assert single_partition_exchange_count(p) == 0

    for op in (segment_dedup_stats, dup_span_stats):
        p = _plan(op(docs))
        assert hash_exchange_count(p) == 3
        assert "CartesianProduct" not in p


def test_perplexity_crafted_smoothing_math(spark):
    """Add-one bigram math on a two-doc corpus: train 'a b a c'
    (V=3, cu(a)=2), score 'a b z' -> p(b|a)=2/5, p(z|b)=1/4, with the
    quantized log-probs summed exactly."""
    import math

    from iceberg_geospatial_api_server_spark.operators.text import (
        perplexity_profile,
    )

    df = spark.createDataFrame(
        [(0, "a b a c"), (1, "a b z")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in perplexity_profile(df, F.col("doc_id") == 0).collect()
    }
    lpq = lambda p: math.floor(math.log(p) * 1_000_000)
    want = lpq(2 / 5) + lpq(1 / 4)
    assert rows[1]["n_bigrams"] == 2
    assert rows[1]["ln_sum_q"] == want
    assert rows[1]["ppl"] == round(math.exp(-want / 1_000_000 / 2), 6)
    # the train doc scores itself too: p(b|a)=2/5, p(a|b)=1/2, p(c|a)=2/5
    assert rows[0]["ln_sum_q"] == 2 * lpq(2 / 5) + lpq(1 / 2)


def _ref_dup_spans(docs: dict, n: int = 8, min_docs: int = 2):
    """Brute-force reference for dup_span_stats: gram -> doc-set index,
    then per-doc interval UNION (no island algebra — independently
    validates the lag/row_number merge)."""
    grams, gram_lists = {}, {}
    for d, t in docs.items():
        ws = [w for w in t.split(" ") if w]
        gs = [" ".join(ws[i : i + n]) for i in range(max(len(ws) - n + 1, 0))]
        gram_lists[d] = gs
        for g in gs:
            grams.setdefault(g, set()).add(d)
    out = {}
    for d, t in docs.items():
        ws = [w for w in t.split(" ") if w]
        dup_pos = [
            i for i, g in enumerate(gram_lists[d]) if len(grams[g]) >= min_docs
        ]
        covered = set()
        for p in dup_pos:
            covered.update(range(p, p + n))
        spans, prev = 0, None
        for p in dup_pos:
            if prev is None or p - prev > n:
                spans += 1
            prev = p
        out[d] = (
            len(ws),
            len(gram_lists[d]),
            len(dup_pos),
            spans,
            len(covered),
            round(len(covered) / len(ws), 6) if ws else 0.0,
        )
    return out


def test_dup_span_stats_random_corpora_vs_reference(spark):
    """Seeded random corpora over a 5-word vocab (dense collisions):
    the distributed pipeline must equal the brute-force union reference
    on every column, including that island token sums NEVER differ from
    the true interval union."""
    import random

    from iceberg_geospatial_api_server_spark.operators.text import (
        dup_span_stats,
    )

    vocab = ["v0", "v1", "v2", "v3", "v4"]
    for seed in range(4):
        rng = random.Random(seed)
        docs = {
            d: " ".join(rng.choice(vocab) for _ in range(rng.randint(5, 30)))
            for d in range(12)
        }
        df = spark.createDataFrame(
            list(docs.items()), "doc_id long, text string"
        )
        got = {
            r["doc_id"]: (
                r["n_tokens"], r["n_grams"], r["n_dup_grams"],
                r["n_spans"], r["dup_tokens"], r["dup_token_frac"],
            )
            for r in dup_span_stats(df).collect()
        }
        assert got == _ref_dup_spans(docs), f"seed {seed}"


def test_segment_dedup_random_corpora_vs_reference(spark):
    """Same device for the segment pipeline: distinct-doc counting and
    kept-token accounting vs a dict-based reference."""
    import random

    from iceberg_geospatial_api_server_spark.operators.text import (
        segment_dedup_stats,
    )

    vocab = ["v0", "v1", "v2"]
    k, min_docs = 10, 2
    for seed in range(4):
        rng = random.Random(100 + seed)
        docs = {
            d: " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 35)))
            for d in range(10)
        }
        seg_docs: dict = {}
        segs = {}
        for d, t in docs.items():
            ws = t.split(" ")
            ss = [
                " ".join(ws[i : i + k]) for i in range(0, max(len(ws), 1), k)
            ]
            segs[d] = ss
            for s in ss:
                seg_docs.setdefault(s, set()).add(d)
        want = {}
        for d in docs:
            dup = [s for s in segs[d] if len(seg_docs[s]) >= min_docs]
            kept_toks = sum(
                len(s.split(" ")) for s in segs[d] if len(seg_docs[s]) < min_docs
            )
            want[d] = (
                len(segs[d]),
                len(dup),
                round(len(dup) / len(segs[d]), 6),
                kept_toks,
            )
        df = spark.createDataFrame(
            list(docs.items()), "doc_id long, text string"
        )
        got = {
            r["doc_id"]: (
                r["n_segs"], r["n_dup_segs"], r["dup_seg_frac"],
                r["n_tokens_kept"],
            )
            for r in segment_dedup_stats(df, seg_tokens=k).collect()
        }
        assert got == want, f"seed {seed}"


def test_corpus_diff_crafted(spark):
    """All four statuses from a crafted pair of snapshots, counted
    exactly (full-outer join + fingerprint compare)."""
    from iceberg_geospatial_api_server_spark.operators.text import (
        corpus_diff,
    )

    old = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(2, "beta"), (3, "gamma CHANGED"), (4, "delta")],
        "doc_id long, text string",
    )
    got = {r["status"]: r["n_docs"] for r in corpus_diff(old, new).collect()}
    assert got == {"added": 1, "removed": 1, "modified": 1, "unchanged": 1}


def test_length_quantiles_r7_definition(spark):
    """Quantiles follow R-7 (rank p(n-1), linear interpolation): pinned
    on a hand-computed stratum."""
    from iceberg_geospatial_api_server_spark.operators.text import (
        length_quantiles,
    )

    # token counts 1,2,3,4,10 for lang 'en'
    rows = [(i, " ".join(["w"] * c), "en") for i, c in enumerate([1, 2, 3, 4, 10])]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    r = length_quantiles(df).collect()[0]
    assert (r["p25"], r["p50"], r["p75"]) == (2.0, 3.0, 4.0)
    assert r["p95"] == round(4 + 0.8 * 6, 6)  # rank 3.8 between 4 and 10
    assert r["n_docs"] == 5


def test_curate_corpus_stage_gates(spark):
    """Each gate drops its crafted offender; the survivor set dedups
    keep-first; the report aggregates the kept docs only."""
    from iceberg_geospatial_api_server_spark.operators.text import (
        curate_corpus,
    )

    import hashlib
    import itertools
    import string

    # purely-alphabetic distinct words (digits would zero the alpha
    # ratio and fail the quality gate before the gates under test)
    vocab = [
        "".join(p) for p in itertools.product(string.ascii_lowercase, repeat=2)
    ]
    good = " ".join(vocab[:30])
    repet = " ".join(["dup"] * 30)  # fails dup_word_ratio
    other = " ".join(vocab[40:65])
    rows = [
        (1, good, "en"),
        (2, good, "en"),  # exact duplicate of 1 -> dropped (keep-first)
        (3, "aa bb", "en"),  # fails min_tokens
        (4, repet, "de"),  # fails repetition gate
        (5, other, "de"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r["lang"]: r for r in curate_corpus(df).collect()}

    def cls_keep(t):  # the classifier gate, recomputed in pure python
        M = 2147483647
        return (
            sum(
                int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % M % 2001
                - 1000
                for w in t.split(" ")
            )
            >= 0
        )

    if cls_keep(good):
        assert got["en"]["n_docs"] == 1  # duplicate 2 dropped, 3 gated
        assert got["en"]["total_tokens"] == 30
    else:
        assert "en" not in got
    if cls_keep(other):
        assert got["de"]["n_docs"] == 1  # repet doc 4 gated out
        assert got["de"]["total_tokens"] == 25
    else:
        assert "de" not in got


def test_curate_corpus_plan_shape(docs):
    """All four gates evaluate in the scan stage; exactly one md5
    exchange (dedup window) + one lang exchange; no cartesian."""
    from iceberg_geospatial_api_server_spark.operators.text import (
        curate_corpus,
    )

    p = _plan(curate_corpus(docs))
    assert hash_exchange_count(p) == 2, p
    assert "CartesianProduct" not in p


def test_tfidf_top_terms_crafted_math(spark):
    """Crafted 4-doc corpus with hand-computable tf/df: per-source top
    terms, quantized-idf scores, and the term-asc tiebreak."""
    import math

    from iceberg_geospatial_api_server_spark.operators.text import (
        tfidf_top_terms,
    )

    df = spark.createDataFrame(
        [
            (1, "apple apple banana", "web"),
            (2, "apple cherry", "web"),
            (3, "banana banana banana", "books"),
            (4, "cherry date", "books"),
        ],
        "doc_id long, text string, source string",
    )
    out = tfidf_top_terms(df, k=2)
    rows = {(r["source"], r["term"]): r for r in out.collect()}
    n = 4.0

    def idf_q(dfreq):
        return round(math.log(n / dfreq) * 1e9)

    # books: banana tf=3 df=2, cherry tf=1 df=2, date tf=1 df=1
    # scores: banana 3·idf(2), date 1·idf(1), cherry 1·idf(2)
    # idf(1)=ln(4)≈1.386e9 > idf(2)=ln(2)≈0.693e9·1 → date beats cherry
    assert set(k for k in rows if k[0] == "books") == {
        ("books", "banana"), ("books", "date")
    }
    assert rows[("books", "banana")]["tf"] == 3
    assert rows[("books", "banana")]["tfidf"] == round(3 * idf_q(2) / 1e9, 4)
    assert rows[("books", "date")]["tfidf"] == round(1 * idf_q(1) / 1e9, 4)
    # web: apple tf=3 df=2 → top; banana tf=1 df=2 ties cherry tf=1 df=2
    # on score — term-asc tiebreak keeps banana
    assert set(k for k in rows if k[0] == "web") == {
        ("web", "apple"), ("web", "banana")
    }


def test_tfidf_plan_shape(docs):
    """One wide exchange over the exploded tokens (the (doc,source,term)
    partial agg); the N side is a broadcast single-row aggregate; the
    top-k window partitions the reduced frame; no cartesian."""
    from iceberg_geospatial_api_server_spark.operators.text import (
        tfidf_top_terms,
    )

    out = tfidf_top_terms(docs, k=5)
    p = _plan(out)
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p
    # exchanges: token partial-agg, tf re-agg, dfreq re-agg, tf⋈idf join
    # sides, source window — all keyed on reduced frames except the first
    assert hash_exchange_count(out) <= 6, p
    assert single_partition_exchange_count(out) <= 1, p


def test_tfidf_random_corpora_vs_reference(spark):
    """Seeded random corpora: the distributed TF-IDF top-k must equal a
    brute-force Python reference — same quantized-idf scores, same
    term-asc tiebreaks — across collision-dense vocabularies."""
    import math
    import random
    from collections import Counter

    from iceberg_geospatial_api_server_spark.operators.text import (
        tfidf_top_terms,
    )

    vocab = ["alpha", "beta", "gamma", "delta", "eps"]
    for seed in range(4):
        rng = random.Random(100 + seed)
        rows = [
            (d, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12))),
             rng.choice(["s0", "s1"]))
            for d in range(10)
        ]
        n = float(len(rows))
        tf = Counter()
        docfreq = Counter()
        for d, text, src in rows:
            terms = Counter(text.split(" "))
            for t, c in terms.items():
                tf[(src, t)] += c
                docfreq[t] += 1
        scored = [
            (src, t, cnt, cnt * round(math.log(n / docfreq[t]) * 1e9))
            for (src, t), cnt in tf.items()
        ]
        expect = set()
        for src in {s for s, _, _, _ in scored}:
            group = sorted(
                (x for x in scored if x[0] == src),
                key=lambda x: (-x[3], x[1]),
            )[:3]
            expect |= {
                (src, t, cnt, round(s / 1e9, 4)) for _, t, cnt, s in group
            }
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        got = {
            (r["source"], r["term"], r["tf"], r["tfidf"])
            for r in tfidf_top_terms(df, k=3).collect()
        }
        assert got == expect, f"seed {seed}"


def test_brand_affinity_crafted_lift(spark):
    """3 orders, 3 brands: hand-computed co-occurrence counts and lift
    (n_both·N / (n_a·n_b)); within-order duplicate parts of one brand
    count once."""
    from iceberg_geospatial_api_server_spark.operators.relational import (
        brand_affinity,
    )

    part = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B"), (4, "C")],
        "p_partkey long, p_brand string",
    )
    li = spark.createDataFrame(
        [(10, 1), (10, 2), (10, 3),   # order 10: A (twice), B
         (20, 1), (20, 4),            # order 20: A, C
         (30, 3), (30, 4)],           # order 30: B, C
        "l_orderkey long, l_partkey long",
    )
    rows = {(r["brand_a"], r["brand_b"]): r
            for r in brand_affinity(li, part).collect()}
    # N=3; n_A=2, n_B=2, n_C=2; each pair co-occurs once
    assert set(rows) == {("A", "B"), ("A", "C"), ("B", "C")}
    for r in rows.values():
        assert r["n_both"] == 1
        assert r["lift"] == round(1 * 3 / (2 * 2), 6)


def test_brand_affinity_plan_shape(spark, sf_dir):
    """Scale shape of the r7 bitmask rewrite: the part dimension joins
    broadcast, no cartesian, and the lineitem FACT table is SCANNED
    EXACTLY ONCE (the old three-consumer formulation recomputed the
    basket build per consumer). The part DIMENSION may appear a few
    times (the brand-index subplan and the pair-emission sides are all
    ≤brands-row broadcast subtrees — corpus-size-free by construction),
    but never more than 4."""
    from iceberg_geospatial_api_server_spark.operators.relational import (
        brand_affinity,
    )
    from iceberg_geospatial_api_server_spark.plans import (
        assert_broadcast_join, assert_no_cartesian,
    )
    from iceberg_geospatial_api_server_spark.plans.explain import (
        formatted_plan,
    )
    from iceberg_geospatial_api_server_spark.sources.tables import load_table

    out = brand_affinity(
        load_table(spark, sf_dir, "lineitem"), load_table(spark, sf_dir, "part")
    )
    assert_no_cartesian(out)
    assert_broadcast_join(out, min_count=1)
    plan = formatted_plan(out)
    fact_scans = plan.count("lineitem.parquet")
    dim_scans = plan.count("part.parquet")
    assert fact_scans == 1, plan
    assert dim_scans <= 4, plan


def test_mad_outlier_profile_crafted(spark):
    """Hand-computed lower medians and MAD on a crafted user: values
    [1,2,3,4,100] → median 3 (pos ⌈5/2⌉=3), deviations [2,1,0,1,97] →
    MAD 1, outliers where dev > 3·1 → exactly the 100."""
    from iceberg_geospatial_api_server_spark.operators.relational import (
        mad_outlier_profile,
    )

    events = spark.createDataFrame(
        [(i, 7, float(v)) for i, v in enumerate([1, 2, 3, 4, 100])]
        + [(10, 8, 5.0), (11, 8, 5.0)],  # constant user: mad 0
        "event_id long, user_id long, value double",
    )
    rows = {r["user_id"]: r for r in mad_outlier_profile(events).collect()}
    r7 = rows[7]
    assert (r7["n_events"], r7["median_value"], r7["mad"]) == (5, 3.0, 1.0)
    assert r7["n_outliers"] == 1
    r8 = rows[8]  # dev 0 everywhere, mad 0: 0 > 3·0 is false → 0 outliers
    assert (r8["mad"], r8["n_outliers"]) == (0.0, 0)


def test_mad_outlier_profile_single_exchange(spark, sf_dir):
    """All four windows + the final agg partition by user_id: ONE hash
    exchange, later stages only re-sort within partitions."""
    from iceberg_geospatial_api_server_spark.operators.relational import (
        mad_outlier_profile,
    )
    from iceberg_geospatial_api_server_spark.plans import (
        formatted_plan, hash_exchange_count,
    )
    from iceberg_geospatial_api_server_spark.sources.tables import load_table

    out = mad_outlier_profile(load_table(spark, sf_dir, "events"))
    p = formatted_plan(out)
    assert hash_exchange_count(out) == 1, p[:2000]


def test_interval_overlap_join_crafted(spark):
    """Exactly-once emission (a pair sharing MANY grid cells appears
    once), inclusive endpoints (touching intervals match), disjoint
    intervals don't, and cross-bucket overlaps are found."""
    from iceberg_geospatial_api_server_spark.operators.relational import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [(1, 0, 10_000), (2, 50, 60), (3, 100, 200)],
        "lid long, st_a long, en_a long",
    )
    right = spark.createDataFrame(
        [(10, 5_000, 12_000),   # overlaps 1 across ~7 shared 1000s cells
         (20, 60, 70),          # touches 2 at t=60 (inclusive) and 1
         (30, 20_000, 20_100)],  # disjoint from everything
        "rid long, st_b long, en_b long",
    )
    rows = sorted(
        (r["lid"], r["rid"])
        for r in interval_overlap_join(
            left, right, "st_a", "en_a", "st_b", "en_b",
            bucket_seconds=1000,
        ).collect()
    )
    assert rows == [(1, 10), (1, 20), (2, 20)]


def test_interval_overlap_join_matches_bruteforce(spark):
    """Seeded random intervals: grid-bucketed result ≡ the brute-force
    cross-check, across bucket sizes straddling the interval lengths."""
    import random

    from iceberg_geospatial_api_server_spark.operators.relational import (
        interval_overlap_join,
    )

    rng = random.Random(7)
    lrows = []
    for i in range(40):
        s = rng.randint(0, 5000)
        lrows.append((i, s, s + rng.randint(0, 800)))
    rrows = []
    for i in range(40):
        s = rng.randint(0, 5000)
        rrows.append((100 + i, s, s + rng.randint(0, 800)))
    expect = sorted(
        (l[0], r[0])
        for l in lrows for r in rrows
        if l[1] <= r[2] and r[1] <= l[2]
    )
    left = spark.createDataFrame(lrows, "lid long, st_a long, en_a long")
    right = spark.createDataFrame(rrows, "rid long, st_b long, en_b long")
    for bucket in (100, 1000, 10000):
        got = sorted(
            (r["lid"], r["rid"])
            for r in interval_overlap_join(
                left, right, "st_a", "en_a", "st_b", "en_b",
                bucket_seconds=bucket,
            ).collect()
        )
        assert got == expect, bucket
