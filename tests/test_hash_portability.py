"""Engine-portability property tests for the JVM-side hash kernels.

Every oracle-checked dedup/text entry relies on the SQL oracle
reproducing these hashes bit-for-bit, so the invariant worth pinning is
the MATH, not one engine's output: the Spark expressions must equal a
pure-Python reference (md5-prefix word hash + Horner shingle combine)
on arbitrary Unicode inputs — the md5 kernel hashes UTF-8 bytes, so
unlike the old ascii() fold it has no printable-ASCII domain limit."""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from iceberg_geospatial_api_server_spark.operators.dedup import (
    MERSENNE,
    shingle_hashes,
    word_hash,
)

_token = st.text(
    alphabet=st.characters(
        min_codepoint=33, max_codepoint=0x2FFF, blacklist_categories=("Cs",)
    ),
    min_size=1,
    max_size=8,
)


def _ref_word_hash(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16) % MERSENNE


def _ref_shingles(tokens: list[str], k: int = 3) -> list[int]:
    th = [_ref_word_hash(t) for t in tokens]
    out = []
    for i in range(max(len(th) - (k - 1), 0)):
        acc = 0
        for j in range(k):
            acc = (acc * 1000003 + th[i + j]) % MERSENNE
        out.append(acc)
    return out


@given(st.lists(_token, min_size=0, max_size=12))
@settings(max_examples=25, deadline=None)
def test_word_and_shingle_hashes_match_reference(spark, tokens):
    text = " ".join(tokens)
    row = (
        spark.range(1)
        .select(
            word_hash(F.lit(text)).alias("wh"),
            shingle_hashes(F.split(F.lit(text), " ")).alias("sh"),
        )
        .first()
    )
    # split(" ") of "" yields [""], mirroring the operators' real input
    effective = text.split(" ") if text else [""]
    assert row.wh == _ref_word_hash(text)
    assert list(row.sh) == _ref_shingles(effective)


@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=1,
                max_size=6))
@settings(max_examples=15, deadline=None)
def test_minhash_permutation_params_stay_in_range(spark, xs):
    """The (a·x + b) mod p permutations must stay inside non-overflowing
    long arithmetic for any shingle hash < MERSENNE — pin the bound the
    fast path's comment claims."""
    from iceberg_geospatial_api_server_spark.operators.dedup import (
        _minhash_params,
    )

    for a, b in _minhash_params(16):
        assert 0 <= a < MERSENNE and 0 <= b < MERSENNE
        for x in xs:
            v = (x % MERSENNE) * a + b
            assert v < 2**63  # no ANSI overflow under any 64-bit id


@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
@settings(max_examples=40, deadline=None)
def test_id_hash_matches_oracle_for_any_long(spark, val):
    """engine ≡ oracle for id_hash over the FULL signed-64 id domain —
    negative ids exercise the double-mod template (r2 ADVICE): Spark's
    pmod and the oracle's ((id % M) + M) % M must agree, and the Python
    modular reference pins the math itself."""
    import duckdb

    from iceberg_geospatial_api_server_spark.operators.sampling import (
        _KNUTH_MOD,
        id_hash,
    )

    spark_v = (
        spark.range(1)
        .select(id_hash(F.lit(val).cast("long")).alias("h"))
        .first()["h"]
    )
    # CAST like the real oracles: _IDHASH runs on BIGINT id columns
    # (a bare small literal would be INT32 and overflow the +M step)
    oracle_sql = (
        f"SELECT ((((CAST({val} AS BIGINT) % 2147483647) + 2147483647)"
        f" % 2147483647) * {_KNUTH_MOD}) % 2147483647"
    )
    duck_v = duckdb.sql(oracle_sql).fetchone()[0]
    py_v = ((val % MERSENNE) * _KNUTH_MOD) % MERSENNE
    assert spark_v == duck_v == py_v
    assert 0 <= spark_v < MERSENNE


_WORD = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1,
    max_size=6,
)


@given(st.lists(_WORD, min_size=0, max_size=10))
@settings(max_examples=25, deadline=None)
def test_overlapping_gram_strings_match_split_windows(spark, words):
    """The regex gram extractor ≡ split(' ') windows on single-spaced
    text (its documented contract) for arbitrary printable tokens —
    including regex metacharacters inside tokens."""
    from iceberg_geospatial_api_server_spark.operators.text import (
        overlapping_gram_strings,
    )

    text = " ".join(words)
    row = (
        spark.range(1)
        .select(overlapping_gram_strings(F.lit(text), 3).alias("g"))
        .first()
    )
    toks = text.split(" ") if text else [""]
    expected = [
        " ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 0))
    ]
    assert list(row.g) == expected


def test_pii_patterns_agree_across_engines(spark):
    """The PII patterns live in the RE2 ∩ java.regex subset: Spark
    (java.util.regex) and DuckDB (RE2) must agree on match counts AND
    the scrubbed text for adversarial inputs — the exact invariant the
    corpus_pii_scrub oracle depends on."""
    import duckdb

    from iceberg_geospatial_api_server_spark.operators.text import (
        PII_PATTERNS,
        pii_scrub,
    )

    cases = [
        "a@b.co a@b.c a@@b.co x.y+z@sub.do-main.org trailing@",
        "1.2.3.4 999.999.999.999 1.2.3 10.0.0.255.7 .1.2.3.4",
        "+1 (555) 010-1234 +12 (000) 000-0000 +1 (55) 010-1234 1 (555) 010-1234",
        "mixed a@b.io at 8.8.8.8 call +9 (123) 456-7890 end",
        "no pii here, just text with @ and . and + ( )",
        "",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "doc_id LONG, text STRING"
    )
    got = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    con = duckdb.connect()
    for i, t in enumerate(cases):
        scrub = t
        for name, pat, tag in PII_PATTERNS:
            n_duck = con.execute(
                "SELECT LEN(regexp_extract_all(?, ?))", [t, pat]
            ).fetchone()[0]
            assert got[i][f"n_{name}s"] == n_duck, (i, name, t)
            scrub = con.execute(
                "SELECT regexp_replace(?, ?, ?, 'g')", [scrub, pat, tag]
            ).fetchone()[0]
        assert got[i]["scrubbed"] == scrub, (i, t)
