"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All JVM-side array/string built-ins — no Python
in the hot path — so they run at scan speed over a 100 TB corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pyspark import StorageLevel

from iceberg_geospatial_api_server_spark.operators.dedup import MERSENNE, word_hash

# Same multi-consumer pin convention as operators.dedup: the tokenized
# base feeds four plan branches (model unigrams, model bigrams, scoring
# stream, per-doc token counts) and Spark has no cross-branch common
# subexpression reuse — uncached, each branch re-scans and re-splits the
# corpus. MEMORY_AND_DISK spills, never OOMs; pass None to run cache-free.
_PPL_DEFAULT_STORAGE = None

# Small public stopword marker sets per language (enough for a ratio
# heuristic; real corpora would use larger lists — same plan shape).
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "ein"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es"],
    "fr": ["le", "la", "et", "les", "des", "un", "est", "que"],
}


def tokens(col: Column) -> Column:
    return F.split(col, " ")


def token_count(col: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def wordlike_token_count(col: Column) -> Column:
    """BPE-ish token proxy: count word-piece units = alphabetic runs plus
    digit runs plus punctuation marks (a cheap, deterministic stand-in for
    a learned tokenizer's piece count)."""
    return (
        F.size(F.filter(tokens(col), lambda w: w.rlike("^[a-zA-Z]+$")))
        + F.size(F.filter(tokens(col), lambda w: w.rlike("^[0-9]+$"))) * 2
        + F.size(F.filter(tokens(col), lambda w: ~w.rlike("^[a-zA-Z0-9]*$"))) * 3
    )


def stopword_ratio(col: Column, lang: str) -> Column:
    sw = STOPWORDS[lang]
    toks = tokens(col)
    hits = F.size(F.filter(toks, lambda w: w.isin(*sw)))
    return hits.cast("double") / F.size(toks).cast("double")


def language_id(col: Column) -> Column:
    """Heuristic language ID: argmax of stopword-hit ratio across the
    marker sets ('und' = undetermined when nothing matches)."""
    toks = tokens(col)
    scores = {
        lang: F.size(F.filter(toks, lambda w: w.isin(*sw)))
        for lang, sw in STOPWORDS.items()
    }
    best = None
    langs = sorted(STOPWORDS)  # deterministic tie order: de < en < es < fr
    expr = F.lit("und")
    best_score = F.lit(0)
    for lang in langs:
        s = scores[lang]
        is_better = s > best_score
        expr = F.when(is_better, F.lit(lang)).otherwise(expr)
        best_score = F.when(is_better, s).otherwise(best_score)
    return expr


def quality_score(col: Column) -> Column:
    """Composite quality score in [0,1]:
    0.4·distinct-token ratio + 0.3·length factor + 0.3·alpha-token ratio.
    (Same spirit as Gopher/C4-style heuristics, arithmetic only.)"""
    toks = tokens(col)
    n = F.size(toks).cast("double")
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n
    length_factor = F.least(n / F.lit(100.0), F.lit(1.0))
    alpha_ratio = (
        F.size(F.filter(toks, lambda w: w.rlike("^[a-zA-Z]+$"))).cast("double") / n
    )
    return (
        F.lit(0.4) * distinct_ratio
        + F.lit(0.3) * length_factor
        + F.lit(0.3) * alpha_ratio
    )


def fingerprint(col: Column) -> Column:
    """md5-prefix fingerprint of the whole document (first 60 bits mod
    2^31-1) — portable across engines (see dedup.word_hash)."""
    return word_hash(col)


def text_profile(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Full per-document profile: token stats, language, quality, fingerprint."""
    c = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.length(c).alias("n_chars"),
        token_count(c).alias("n_tokens"),
        F.size(F.array_distinct(tokens(c))).alias("n_distinct_tokens"),
        wordlike_token_count(c).alias("n_wordpieces"),
        language_id(c).alias("lang_pred"),
        F.round(quality_score(c), 6).alias("quality"),
        fingerprint(c).alias("fingerprint"),
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into token-bounded overlapping chunks (the
    context-window prep step of a training pipeline).

    Chunk i covers tokens [i·step, i·step + chunk_tokens) with
    step = chunk_tokens − overlap; the final chunk may be short. All JVM:
    sequence → transform → explode — the fan-out happens map-side with no
    shuffle, and chunk count per row is bounded by ~n_tokens/step.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    step = chunk_tokens - overlap
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # n <= chunk_tokens → 1 chunk; else 1 + ceil((n - chunk_tokens)/step)
    last_idx = F.when(n <= chunk_tokens, F.lit(0)).otherwise(
        F.floor((n - F.lit(chunk_tokens) + F.lit(step - 1)) / F.lit(step)).cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), last_idx),
        lambda i: F.struct(
            i.cast("long").alias("chunk_idx"),
            F.slice(toks, i * step + 1, chunk_tokens).alias("toks"),
        ),
    )
    return (
        df.select(F.col(id_col), F.explode(chunks).alias("__c"))
        .select(
            id_col,
            F.col("__c.chunk_idx").alias("chunk_idx"),
            F.size("__c.toks").cast("long").alias("n_chunk_tokens"),
            F.concat_ws(" ", F.col("__c.toks")).alias("chunk_text"),
        )
    )


# PII patterns: the RE2 ∩ java.util.regex subset (no lookaround, no
# backreferences), so the DuckDB oracle matches the Spark scan
# byte-for-byte. Ship as python strings through F.lit / f-string
# embedding — NEVER through Spark SQL single-quoted literals, whose
# backslash escaping differs from DuckDB's raw single-quote strings.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"(?:[0-9]{1,3}\.){3}[0-9]{1,3}", "<IP>"),
    ("phone", r"\+[0-9]{1,2} \([0-9]{3}\) [0-9]{3}-[0-9]{4}", "<PHONE>"),
]


def pii_scrub(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """PII redaction — the standard pre-training privacy pass (C4 /
    RefinedWeb-style pipelines scrub emails/IPs/phones before anything
    else sees the text). Per document: occurrence counts per PII class
    and the scrubbed text with each match replaced by its tag, classes
    applied in the fixed PII_PATTERNS order (replacement tags contain
    no digits, so later patterns cannot match inside earlier tags).

    Each class is COUNTED on the text as already scrubbed by the
    earlier classes, so the count is the number of replacements
    actually performed and per-class counts always reconcile with the
    tags in `scrubbed` (counting every class on the raw text would
    report an <IP>-shaped substring inside an email that the email
    pass had already consumed).

    Scale posture: counts and replacement are JVM regexp built-ins in
    the scan stage — map-side, no shuffle, no Python.

    (Training-pipeline adjacency; the reference has no scrub analog —
    its ingestion ends at upload, ref api/main.py:678-899.)
    """
    cur = F.col(text_col)
    counts = []
    for name, pat, tag in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
            .cast("long")
            .alias(f"n_{name}s")
        )
        cur = F.regexp_replace(cur, pat, tag)
    return df.select(
        F.col(id_col), *counts, cur.alias("scrubbed")
    )


def clean_corpus(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 20,
    min_quality: float = 0.5,
) -> DataFrame:
    """Quality-filter + exact-dedup pipeline (keep the smallest-id copy of
    each distinct text): the canonical first pass of corpus curation.

    Filters are JVM expressions evaluated in the scan stage; the dedup is
    one shuffle on md5(text) (self-salting: distinct docs → distinct
    reducers) with a row_number window sharing that partitioning.

    Output row order is UNDEFINED (r11, ADVICE r10): the final
    presentational sort was dropped in r10 because its
    RangePartitioning sampling pass re-executed the pipeline;
    callers needing an order must sort the returned frame.
    """
    from pyspark.sql import Window

    c = F.col(text_col)
    filtered = df.filter(
        (token_count(c) >= min_tokens) & (quality_score(c) >= min_quality)
    )
    w = Window.partitionBy(F.md5(c)).orderBy(id_col)
    return (
        filtered.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            id_col,
            token_count(c).cast("long").alias("n_tokens"),
            F.round(quality_score(c), 6).alias("quality"),
        )
        # no final orderBy (r10, the r7 final-sort rule): the range
        # sampling re-executed this stage's windows/aggregates; every
        # consumer compares order-insensitively
    )


# Gopher-rule stopword markers (Rae et al. 2021 §A1.1 uses a similar
# tiny English function-word list as a "has real prose" signal).
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_structural_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Gopher-style structural quality rules (Rae et al. 2021 §A1.1),
    the standard pre-training corpus filter battery. Complements
    `repetition_profile` (which carries the duplicate-word/-n-gram
    rules): word-count bounds, mean word length, symbol-to-word ratio
    (# and ellipsis), bullet-/ellipsis-line fractions, alphabetic-word
    fraction, and a stopword-presence check.

    Emits the raw signals plus a `keep` verdict so downstream filters
    can threshold differently without recomputing. Every signal is a
    JVM string/array built-in evaluated in the scan stage — no shuffle,
    no Python — so the filter runs at scan speed over a 100 TB corpus.
    Mean word length is computed arithmetically (non-space chars /
    words) rather than with a per-word higher-order fold, which runs
    interpreted (see `overlapping_gram_strings`).
    """
    c = F.col(text_col)
    toks = tokens(c)
    n_words = F.size(toks)
    nw = n_words.cast("double")
    # non-space chars / words — avoids an interpreted per-word fold
    mean_wl = F.length(F.replace(c, F.lit(" "), F.lit(""))).cast("double") / nw
    n_hash = F.length(c) - F.length(F.replace(c, F.lit("#"), F.lit("")))
    n_ellipsis = (F.length(c) - F.length(F.replace(c, F.lit("..."), F.lit("")))) / F.lit(3)
    symbol_ratio = (n_hash + n_ellipsis).cast("double") / nw
    lines = F.split(c, "\n")
    n_lines = F.size(lines).cast("double")
    bullet_frac = (
        F.size(
            F.filter(
                lines,
                lambda l: l.startswith("- ")
                | l.startswith("* ")
                | l.startswith("•"),
            )
        ).cast("double")
        / n_lines
    )
    ellipsis_frac = (
        F.size(F.filter(lines, lambda l: l.endswith("..."))).cast("double")
        / n_lines
    )
    # single-pass JVM regex counts, not per-word HOF lambdas (interpreted
    # — measured 0.30s vs 0.21s for these two signals at sf0.1). Word
    # boundaries are EXACTLY split-on-space's: lookaround on `^| ` and
    # ` |\z` (`\z` = absolute end — Java's `$` would also match before a
    # trailing newline, where DuckDB's RE2 `$` would not).
    alpha_frac = (
        F.size(
            F.regexp_extract_all(c, F.lit(r"(?<=^| )[a-zA-Z]+(?= |\z)"), 0)
        ).cast("double")
        / nw
    )
    stop_hits = F.size(
        F.regexp_extract_all(
            c,
            F.lit(
                "(?<=^| )(?:" + "|".join(GOPHER_STOPWORDS) + r")(?= |\z)"
            ),
            0,
        )
    )
    out = df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_frac, 6).alias("bullet_line_frac"),
        F.round(ellipsis_frac, 6).alias("ellipsis_line_frac"),
        F.round(alpha_frac, 6).alias("alpha_word_frac"),
        stop_hits.cast("long").alias("n_stop_hits"),
    )
    keep = (
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("symbol_ratio") <= max_symbol_ratio)
        & (F.col("bullet_line_frac") <= max_bullet_frac)
        & (F.col("ellipsis_line_frac") <= max_ellipsis_frac)
        & (F.col("alpha_word_frac") >= min_alpha_frac)
        & (F.col("n_stop_hits") >= min_stop_hits)
    )
    return out.withColumn("keep", keep)


def overlapping_gram_strings(col: Column, n: int = 3) -> Column:
    """Overlapping word n-gram strings ('w1 w2 w3') per document, via a
    single regexp_extract_all with a zero-width token-start anchor and a
    capturing lookahead — one JVM regex pass per document, measured 2×
    faster at sf0.1 than the rolling zip_with-concat build (0.27s vs
    0.50s corpus pass) because higher-order functions evaluate
    interpreted per element.

    Contract: tokens are the nonempty runs between single spaces —
    identical to split(' ') windows on single-space-normalized text
    (what `corpus_clean` emits, and what the testdata corpus is; rows
    with doubled/leading/trailing spaces would differ from the
    split-based definition by dropping empty tokens). Portable: the
    same windows are expressible with list slicing in ANSI-ish SQL, so
    gram pipelines stay oracle-checkable."""
    pat = "(?:(?<= )|^)(?=(" + " ".join(["[^ ]+"] * n) + "))"
    return F.regexp_extract_all(col, F.lit(pat), 1)


def trigram_strings(col: Column) -> Column:
    """Word-trigram strings ('w1 w2 w3') per document (see
    `overlapping_gram_strings`)."""
    return overlapping_gram_strings(col, 3)


def repetition_profile(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dup_word_ratio: float = 0.30,
    max_dup_trigram_ratio: float = 0.20,
) -> DataFrame:
    """Gopher-style repetition filter signals, per document: the fraction
    of word occurrences that are repeats and the fraction of word-trigram
    occurrences that are repeats, plus the resulting keep/drop flag.

    Highly repetitive documents (boilerplate, keyword stuffing, template
    spam) are a standard removal class in training-corpus curation. All
    JVM array built-ins — map-side, scan speed, no shuffle.
    """
    c = F.col(text_col)
    toks = tokens(c)
    n_w = F.size(toks).cast("double")
    dup_w = (F.size(toks) - F.size(F.array_distinct(toks))).cast("double")
    dup_word_ratio = F.when(n_w > 0, dup_w / n_w).otherwise(F.lit(0.0))
    tris = trigram_strings(c)
    n_t = F.size(tris).cast("double")
    dup_t = (F.size(tris) - F.size(F.array_distinct(tris))).cast("double")
    dup_tri_ratio = F.when(n_t > 0, dup_t / n_t).otherwise(F.lit(0.0))
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(dup_word_ratio, 6).alias("dup_word_ratio"),
        F.round(dup_tri_ratio, 6).alias("dup_trigram_ratio"),
        (
            (dup_word_ratio <= max_dup_word_ratio)
            & (dup_tri_ratio <= max_dup_trigram_ratio)
        ).alias("keep"),
    )


def corpus_token_budget(
    df: DataFrame,
    budget_tokens: int,
    n_buckets: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """Token-budget selection summary: quality-bucket histogram with
    descending-quality cumulative token counts and a kept flag per
    bucket (`cum_tokens <= budget`).

    This is the scale-correct shape for "take the best N tokens": one
    map-side pass computes (bucket, tokens), a partial-agg shuffle
    collapses to ≤ n_buckets rows, and only that tiny frame goes through
    the ordered cumulative window — never a global sort of the corpus.
    `token_budget_filter` turns the summary into the actual document
    selection.
    """
    from pyspark.sql import Window

    c = F.col(text_col)
    q = quality_score(c)
    bucket = F.least(
        F.floor(q * n_buckets).cast("int"), F.lit(n_buckets - 1)
    )
    agg = (
        df.select(bucket.alias("bucket"), token_count(c).alias("__t"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__t").cast("long").alias("n_tokens"),
        )
    )
    # ≤ n_buckets rows: the single-partition window is over the
    # aggregate, not the corpus
    w = Window.orderBy(F.desc("bucket")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        agg.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .withColumn("kept", F.col("cum_tokens") <= F.lit(int(budget_tokens)))
        .orderBy(F.desc("bucket"))
    )


def token_budget_filter(
    df: DataFrame,
    budget_tokens: int,
    n_buckets: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Select documents best-quality-first until the token budget is
    spent: every document in fully-kept quality buckets, plus documents
    from the boundary bucket in deterministic hash order until the
    remainder runs out.

    The bucket decision collects ≤ n_buckets summary rows (never ids);
    the boundary refinement sorts only the boundary bucket's slice
    (~1/n_buckets of the corpus) — pick n_buckets so that slice fits a
    sort, exactly like choosing a partition count.
    """
    from pyspark.sql import Window

    from iceberg_geospatial_api_server_spark.operators.sampling import id_hash

    summary = corpus_token_budget(
        df, budget_tokens, n_buckets=n_buckets, text_col=text_col
    ).collect()
    full = [r["bucket"] for r in summary if r["kept"]]
    boundary = None
    remaining = 0
    for r in sorted(summary, key=lambda r: -r["bucket"]):
        if not r["kept"]:
            boundary = r["bucket"]
            prev = [x["cum_tokens"] for x in summary if x["bucket"] > r["bucket"]]
            remaining = int(budget_tokens) - (max(prev) if prev else 0)
            break

    c = F.col(text_col)
    q = quality_score(c)
    bucket = F.least(F.floor(q * n_buckets).cast("int"), F.lit(n_buckets - 1))
    tagged = df.withColumn("__bucket", bucket).withColumn(
        "__t", token_count(c).cast("long")
    )
    selected = tagged.filter(F.col("__bucket").isin(full)) if full else None
    if boundary is not None and remaining > 0:
        edge = tagged.filter(F.col("__bucket") == boundary)
        w = Window.orderBy(id_hash(F.col(id_col)), id_col).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        edge = edge.withColumn("__cum", F.sum("__t").over(w)).filter(
            F.col("__cum") <= remaining
        ).drop("__cum")
        selected = edge if selected is None else selected.unionByName(edge)
    if selected is None:
        return df.filter(F.lit(False)).select(id_col)
    return selected.select(id_col, F.col("__t").alias("n_tokens"))


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    portable_hash: bool = False,
) -> DataFrame:
    """Benchmark decontamination: drop every document sharing ANY hashed
    word n-gram with the benchmark corpus — the standard eval-leakage
    guard in training-data pipelines (n-gram collision counts as
    contamination; false positives are the safe direction).

    Scale shape: benchmark suites are tiny next to a 100 TB corpus, so
    the DISTINCT benchmark n-gram set broadcasts; corpus n-grams explode
    map-side into a broadcast semi-join (no corpus shuffle), the
    surviving contaminated-id set is near-output-sized, and the final
    anti-join prunes by id.

    Hash shape: grams are built as STRINGS (rolling zip_with concat —
    cheap interpreted work) and hashed AFTER the explode, at row level,
    where the hash expression participates in whole-stage codegen.
    Hashing inside the per-element `transform` lambda runs interpreted
    — measured 2.4× slower for the portable hash at sf0.1 (1.97s vs
    0.83s for the corpus gram pass). The default hash is native
    xxhash64 (the 100 TB path); ``portable_hash=True`` switches to the
    md5-prefix `word_hash`, reproducible in ANSI SQL — the
    oracle-checked driver entry uses it so DuckDB can verify the whole
    pipeline value-for-value.
    """
    from iceberg_geospatial_api_server_spark.operators.dedup import (
        MERSENNE,
        word_hash,
    )

    if portable_hash:
        hasher = word_hash
    else:
        hasher = lambda c: F.pmod(F.xxhash64(c), F.lit(MERSENNE))  # noqa: E731

    def gram_rows(df: DataFrame, *keep: str) -> DataFrame:
        # no per-doc array_distinct: the downstream set ops (bench-side
        # .distinct(), contaminated-id .distinct()) dedup anyway, and
        # the per-row explode+hash is codegen while array_distinct is
        # an interpreted per-doc hash set (measured +0.18s at sf0.1)
        acc = overlapping_gram_strings(F.col(text_col), n)
        out = df.select(*keep, F.explode(acc).alias("__gs"))
        return out.select(*keep, hasher(F.col("__gs")).alias("__g"))

    bench_grams = gram_rows(benchmark).distinct()
    doc_grams = gram_rows(docs, id_col)
    contaminated = (
        doc_grams.join(F.broadcast(bench_grams), on="__g")
        .select(id_col)
        .distinct()
    )
    return docs.join(contaminated, on=id_col, how="left_anti")


def pack_sequences(
    df: DataFrame,
    max_tokens: int = 512,
    n_shards: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """GPT-style sequence packing map: concatenate documents into a token
    stream and slice fixed `max_tokens` context windows ("packs");
    documents straddle pack boundaries, exactly like pre-tokenized
    training-data packing (no padding waste, no first-fit heuristics).

    The stream order is (shard, doc_id) where shard =
    ``id_hash(id) % n_shards`` — each shard is an independent token
    stream, so packing is embarrassingly parallel AND deterministic:
    a document's pack depends only on its shard's members, never on a
    global sequential fold. At 100 TB, n_shards scales with the cluster
    (each shard's window is one partition — bound shard token mass, not
    the corpus, by raising n_shards); the per-shard running total is the
    only non-scan work (one hash exchange on the shard key).

    Returns one row per document: its shard, token count, byte offset in
    the shard stream, and the first/last pack it lands in.

    (Training-pipeline adjacency; the reference has no packing analog —
    cited for scope: its /api ingestion ends at upload, main.py:678-899.)
    """
    from pyspark.sql import Window

    from iceberg_geospatial_api_server_spark.operators.sampling import id_hash

    c = F.col(text_col)
    shard = F.pmod(id_hash(F.col(id_col)), F.lit(n_shards)).cast("int")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = df.select(
        F.col(id_col),
        shard.alias("shard"),
        token_count(c).cast("long").alias("n_tokens"),
    )
    cum = F.sum("n_tokens").over(w)
    mx = F.lit(float(max_tokens))
    return (
        base.withColumn("__cum", cum)
        .select(
            id_col,
            "shard",
            "n_tokens",
            (F.col("__cum") - F.col("n_tokens")).alias("stream_offset"),
            F.floor((F.col("__cum") - F.col("n_tokens")) / mx)
            .cast("long")
            .alias("pack_first"),
            F.floor((F.col("__cum") - 1) / mx).cast("long").alias("pack_last"),
        )
        .withColumn(
            "n_packs", (F.col("pack_last") - F.col("pack_first") + 1).cast("long")
        )
    )


def corpus_source_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    lang_col: str = "lang",
    chars_col: str = "n_chars",
) -> DataFrame:
    """Per-source data card: doc/lang counts, total tokens, and the EXACT
    lower median of document length (rank ⌈n/2⌉ — the percentile_disc
    definition, portable across engines, unlike approximate sketches).

    One source-key exchange: the ranking window, the partition count
    window, and the final aggregate all partition by source; the median
    falls out of the same shuffle as the sums (no second pass, no
    driver-side sort).

    Output row order is UNDEFINED (r11, ADVICE r10): the final
    presentational sort was dropped in r10 because its
    RangePartitioning sampling pass re-executed the pipeline;
    callers needing an order must sort the returned frame.
    """
    from pyspark.sql import Window

    w_ord = Window.partitionBy(source_col).orderBy(chars_col, id_col)
    w_all = Window.partitionBy(source_col)
    rn = F.row_number().over(w_ord)
    cnt = F.count(F.lit(1)).over(w_all)
    med_pos = F.floor((cnt + 1) / 2)
    return (
        df.select(
            source_col,
            lang_col,
            F.col(chars_col),
            token_count(F.col(text_col)).cast("long").alias("__t"),
            F.col(id_col),
        )
        .withColumn("__rn", rn)
        .withColumn("__med_pos", med_pos)
        .groupBy(source_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct(lang_col).cast("long").alias("n_langs"),
            F.sum("__t").cast("long").alias("total_tokens"),
            F.max(
                F.when(F.col("__rn") == F.col("__med_pos"), F.col(chars_col))
            )
            .cast("long")
            .alias("median_chars"),
        )
        # no final orderBy (r10, the r7 final-sort rule): the range
        # sampling re-executed this stage's windows/aggregates; every
        # consumer compares order-insensitively
    )


def quality_classifier_score(
    df: DataFrame,
    scale: float = 4.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Model-based quality filter plumbing (the FineWeb-Edu / DCLM
    stage: a fasttext-style linear classifier over hashed bag-of-words
    scores every document; low scorers drop).

    The WEIGHT TABLE is a deterministic stand-in — per-token weight
    w(t) = (word_hash(t) mod 2001 − 1000)/1000 ∈ [−1, 1] — because no
    learned model ships in this container; a real deployment broadcasts
    its learned hashed-feature weights into exactly this plan. The
    Spark side is the real thing and is what the oracle grades: hashed
    lookup per token, mean pooling, sigmoid calibration, keep flag.

    Plan: explode + codegen md5 hashing (the repo's fast portable-hash
    shape — per-token HOF folds run interpreted), one doc-key exchange
    with partial aggregation, then map-side sigmoid on the ≤1-row-per-
    doc aggregate. Mean pooling sums exact INTEGER weights and divides
    once — float summation order differs between engines (and between
    partitionings), so an AVG(double) would not hash-match the oracle.
    """
    toks = tokens(F.col(text_col))
    ex = df.select(F.col(id_col), F.explode(toks).alias("__w"))
    iw = word_hash(F.col("__w")) % 2001 - 1000  # exact long in [-1000, 1000]
    agg = ex.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(iw).alias("__ws"),
    )
    score = F.col("__ws").cast("double") / (
        F.col("n_tokens") * 1000
    ).cast("double")
    prob = 1.0 / (1.0 + F.exp(-F.lit(float(scale)) * score))
    # score's value grid (1/(n·1000)) lands EXACTLY on 5e-7 rounding
    # halves for many n (surfaced at sf0.1: 4 docs), where Spark
    # HALF_UPs the decimal rendering and DuckDB rounds the binary —
    # floor(x·1e6 + 0.5) is the same float op sequence on both engines
    score6 = F.floor(score * 1e6 + F.lit(0.5)) / 1e6
    return agg.select(
        id_col,
        "n_tokens",
        score6.alias("score"),
        F.round(prob, 6).alias("prob"),
        (score >= 0.0).alias("keep"),
    ).orderBy(id_col)


def curation_keep_predicate(
    c: Column,
    min_tokens: int = 20,
    min_quality: float = 0.5,
    max_dup_word_ratio: float = 0.30,
    max_dup_trigram_ratio: float = 0.20,
) -> Column:
    """The curation gate predicate — length, composite quality, Gopher
    repetition ratios, and the hashed-feature classifier sign — as ONE
    scan-stage boolean Column. Shared by `curate_corpus` and the
    streaming `curate_stream`, whose stream ≡ batch survivor contract
    requires the expressions to stay bit-identical."""
    toks = tokens(c)
    n_w = F.size(toks).cast("double")
    dup_w = (F.size(toks) - F.size(F.array_distinct(toks))).cast("double")
    dup_word_ratio = F.when(n_w > 0, dup_w / n_w).otherwise(F.lit(0.0))
    tris = trigram_strings(c)
    n_t = F.size(tris).cast("double")
    dup_t = (F.size(tris) - F.size(F.array_distinct(tris))).cast("double")
    dup_tri_ratio = F.when(n_t > 0, dup_t / n_t).otherwise(F.lit(0.0))
    cls_sum = F.aggregate(
        F.transform(toks, lambda w: word_hash(w) % 2001 - 1000),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    return (
        (token_count(c) >= min_tokens)
        & (quality_score(c) >= min_quality)
        & (dup_word_ratio <= max_dup_word_ratio)
        & (dup_tri_ratio <= max_dup_trigram_ratio)
        & (cls_sum >= 0)
    )


def curate_corpus(
    df: DataFrame,
    min_tokens: int = 20,
    min_quality: float = 0.5,
    max_dup_word_ratio: float = 0.30,
    max_dup_trigram_ratio: float = 0.20,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """The composed curation pass a training-data team actually runs:
    length/quality gates → Gopher repetition gates → model-quality
    gate (hashed-feature classifier, exact integer pooling) → exact
    dedup keep-first → per-language report. Every stage is individually
    graded elsewhere; THIS entry hash-grades the composition — stage
    order, survivor sets, and the final aggregate all at once.

    Plan: all four gates evaluate in the SCAN stage (JVM expressions,
    including the classifier sum as an aggregate fold over the token
    array — no explode, no extra exchange); survivors take exactly one
    md5 shuffle for keep-first dedup, then one lang-key aggregate.
    Mean quality quantizes to integers (·1e6) before summing — the
    standard cross-engine convention here."""
    c = F.col(text_col)
    filtered = df.filter(
        curation_keep_predicate(
            c,
            min_tokens=min_tokens,
            min_quality=min_quality,
            max_dup_word_ratio=max_dup_word_ratio,
            max_dup_trigram_ratio=max_dup_trigram_ratio,
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(F.md5(c)).orderBy(id_col)
    kept = (
        filtered.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col(lang_col),
            token_count(c).cast("long").alias("__nt"),
            F.round(quality_score(c) * 1e6).cast("long").alias("__q6"),
        )
    )
    return (
        kept.groupBy(lang_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("__nt").cast("long").alias("total_tokens"),
            F.round(
                F.sum("__q6").cast("double")
                / F.count(F.lit(1)).cast("double")
                / 1e6,
                6,
            ).alias("mean_quality"),
        )
        .orderBy(lang_col)
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Snapshot-to-snapshot corpus diff: added / removed / modified /
    unchanged document counts between two corpus versions (the audit
    step between `fs_versioned` snapshots — "what changed since the
    last training run" is the first question a data-lineage review
    asks, and re-fingerprinting beats trusting upstream changelogs).

    One full-outer equi-join on the id; content comparison is the
    portable md5-prefix fingerprint, so the verdict matches the oracle
    hash-for-hash. Presence tests use carried ID columns, never hash
    nullability — a NULL text hashes to NULL and would misread a
    present row as absent. Output is ≤4 rows."""
    o = old.select(
        F.col(id_col).alias("__id"),
        F.col(id_col).alias("__oid"),
        word_hash(F.col(text_col)).alias("__ho"),
    )
    n = new.select(
        F.col(id_col).alias("__id"),
        F.col(id_col).alias("__nid"),
        word_hash(F.col(text_col)).alias("__hn"),
    )
    status = (
        F.when(F.col("__oid").isNull(), F.lit("added"))
        .when(F.col("__nid").isNull(), F.lit("removed"))
        .when(
            F.col("__ho").eqNullSafe(F.col("__hn")), F.lit("unchanged")
        )
        .otherwise(F.lit("modified"))
    )
    return (
        o.join(n, "__id", "full_outer")
        .select(status.alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .orderBy("status")
    )


def length_quantiles(
    df: DataFrame,
    by: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """Per-stratum EXACT token-length quantiles (p25/p50/p75/p95) — the
    distribution half of a data card (mean/median alone hide the long
    tail that drives packing efficiency and truncation rates).

    Spark's `percentile` and DuckDB's `quantile_cont` both implement
    R-7 interpolation (rank p·(n−1), linear between neighbors) and
    were verified bit-identical on the same input — so the entry
    hash-grades EXACT quantiles, no sketch. One stratum-key exchange;
    the per-group sort is over stratum-sized partitions. (For a
    100 TB single-group quantile you'd switch to approx_percentile —
    same plan shape, sketch merge instead of sort.)"""
    c = token_count(F.col(text_col)).alias("__n")
    g = df.select(F.col(by), c)
    exprs = [
        F.round(F.expr(f"percentile(__n, {p})"), 6).alias(name)
        for p, name in [(0.25, "p25"), (0.5, "p50"), (0.75, "p75"), (0.95, "p95")]
    ]
    return (
        g.groupBy(by)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            *exprs,
        )
        .orderBy(by)
    )


def perplexity_profile(
    df: DataFrame,
    train_pred: Column | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    quant: int = 1_000_000,
    storage_level: "StorageLevel | None" = _PPL_DEFAULT_STORAGE,
) -> DataFrame:
    """CCNet-style language-model perplexity scoring: train an add-one
    bigram LM on a reference slice of the corpus, score every document
    by its per-bigram cross-entropy, and report perplexity — the filter
    CCNet buckets documents by (head/middle/tail) before training-set
    selection. (CCNet uses a KenLM 5-gram trained on Wikipedia; the
    bigram form keeps the same plan shape with a model the oracle can
    rebuild in SQL.)

    ``train_pred``: rows where it holds form the reference slice
    (default: doc_id % 7 == 0 — a deterministic stand-in for the clean
    reference corpus).

    Cross-engine exactness: each bigram's log-prob quantizes to an
    integer (FLOOR(ln·quant)) before the per-doc sum — float summation
    order is engine- and partitioning-dependent, so summing raw
    doubles would not hash-match; the quantized sum is exact and the
    final exp/divide runs on identical inputs.

    Plan: model counts are two (train-slice-sized) aggregates; scoring
    joins the corpus bigram stream to the model on the bigram key (the
    model side is reference-corpus-sized — broadcastable when the
    reference is small, shuffle join when it isn't; Spark picks by
    stats) and re-aggregates per doc. Vocabulary size rides along as a
    broadcast single-row frame — never a driver scalar."""
    if train_pred is None:
        train_pred = F.col(id_col) % 7 == 0
    toks = tokens(F.col(text_col))
    base = df.select(F.col(id_col), train_pred.alias("__train"), toks.alias("__t"))
    # Four consumers below (train unigrams/bigrams, scoring stream, doc
    # token counts) CAN pin the tokenized form so the corpus scan + regex
    # split run once, not per branch — pass storage_level=
    # StorageLevel.MEMORY_AND_DISK for the 100 TB posture, where four
    # full corpus re-scans are the dominant I/O (the pinned frame is
    # (id, bool, token array) — a fraction of the raw corpus — and
    # spills). The default is None because at bench scale the persist
    # is NOT a wash: materializing + re-reading the token arrays costs
    # ~0.7s of the query's 1.7s at sf0.1 while the four re-scans of a
    # 5k-doc parquet cost ~nothing (measured r6; the spread() lesson
    # again — per-pipeline measurement beats blanket caching).
    if storage_level is not None:
        base = base.persist(storage_level)

    big = base.select(
        id_col,
        "__train",
        F.explode(
            F.when(
                F.size("__t") < 2,
                F.array().cast("array<struct<a:string,b:string>>"),
            ).otherwise(
                F.transform(
                    F.sequence(F.lit(0), F.size("__t") - 2),
                    lambda i: F.struct(
                        F.get(F.col("__t"), i).alias("a"),
                        F.get(F.col("__t"), i + 1).alias("b"),
                    ),
                )
            )
        ).alias("__p"),
    ).select(id_col, "__train", F.col("__p.a").alias("__a"), F.col("__p.b").alias("__b"))

    train_uni = (
        base.filter("__train")
        .select(F.explode("__t").alias("__w"))
        .groupBy("__w")
        .agg(F.count(F.lit(1)).alias("__cu"))
    )
    train_big = (
        big.filter("__train")
        .groupBy("__a", "__b")
        .agg(F.count(F.lit(1)).alias("__cb"))
    )
    vocab = train_uni.agg(F.count(F.lit(1)).alias("__V"))

    scored = (
        big.join(train_big, ["__a", "__b"], "left")
        .join(train_uni, big["__a"] == train_uni["__w"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            F.floor(
                F.log(
                    (F.coalesce("__cb", F.lit(0)) + 1).cast("double")
                    / (F.coalesce("__cu", F.lit(0)) + F.col("__V")).cast(
                        "double"
                    )
                )
                * quant
            )
            .cast("long")
            .alias("__lpq"),
        )
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.sum("__lpq").cast("long").alias("ln_sum_q"),
    )
    docs = base.select(
        F.col(id_col), F.size("__t").cast("long").alias("n_tokens")
    )
    ent = (
        F.col("ln_sum_q").cast("double")
        / F.lit(float(quant))
        / F.col("n_bigrams").cast("double")
    )
    return (
        docs.join(agg, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("ln_sum_q", F.lit(0)).cast("long").alias("ln_sum_q"),
            F.when(
                F.coalesce("n_bigrams", F.lit(0)) == 0, F.lit(0.0)
            )
            .otherwise(F.round(F.exp(-ent), 6))
            .alias("ppl"),
        )
        # no final sort (r7 lesson): the RangePartitioning sampling
        # re-executed the docs⋈agg join; every consumer compares
        # order-insensitively
    )


def segment_hashes(
    df: DataFrame,
    seg_tokens: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document k-word segments as (id, __seg_ntok, __h) rows —
    the deterministic line-break stand-in shared by the batch
    `segment_dedup_stats` and the streaming boilerplate detector. Pure
    map-side: sequence → slice → explode → portable md5 hash."""
    k = int(seg_tokens)
    toks = tokens(F.col(text_col))
    n_segs = F.greatest(
        F.ceil(F.size(toks) / F.lit(float(k))).cast("int"), F.lit(1)
    )
    segs = F.transform(
        F.sequence(F.lit(0), n_segs - 1),
        lambda i: F.slice(toks, i * k + 1, k),
    )
    return df.select(F.col(id_col), F.explode(segs).alias("__seg")).select(
        id_col,
        F.size("__seg").alias("__seg_ntok"),
        word_hash(F.concat_ws(" ", F.col("__seg"))).alias("__h"),
    )


def segment_dedup_stats(
    df: DataFrame,
    seg_tokens: int = 10,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style shared-segment statistics (the line-dedup analog).

    CCNet/RefinedWeb drop lines repeated across many documents before
    any document-level dedup — boilerplate (headers, navbars, license
    blurbs) dominates a crawl's duplicate mass at line granularity. The
    corpus here is single-line, so a deterministic segmentation stands
    in for line breaks: consecutive ``seg_tokens``-word windows (final
    window short). A segment counts as *duplicated* when its portable
    hash occurs in ≥ ``min_docs`` DISTINCT documents; per document we
    report how many segments are boilerplate and how many tokens a
    line-dedup pass would keep.

    Plan (the CCNet hash-count-join shape, scale-safe at 100 TB):
    segments explode map-side (sequence → transform, like
    `chunk_documents`); distinct-doc counts per segment hash are a
    two-phase aggregate keyed on (hash, doc) first — so a boilerplate
    segment appearing in every document never funnels one reducer; the
    join back is an equi-join on the hash and the per-doc re-agg is the
    final exchange. Nothing corpus-sized broadcasts or collects.

    r11 (guide §2.4): the segment stream repartitions on the hash key
    before the count aggregate, so HashPartitioning(__h) satisfies BOTH
    the (__h, id) distinct clustering AND the final per-hash count —
    the counts branch runs its whole countDistinct chain on ONE
    exchange instead of two (the (h,id) pre-exchange disappears).
    Interleaved A/B at sf0.1: 1.18 → 0.96 s, output verified
    row-identical. Honest plan note: the gram+md5 pass still executes
    on both join branches — column pruning projects the branches
    differently, so the two repartition subtrees are not identical and
    ReusedExchange does NOT fire. A persisted/localCheckpointed segment
    stream (true single pass) measured 0.79/0.71 s but caches a
    corpus-GRAM-sized stream — the §5 executor-memory hazard the
    minhash path deliberately avoids (signatures-not-shingles rule) —
    and flips the bench entry to eager rebuild, whose construction cost
    eats the gain; examined and declined.
    """
    ex = segment_hashes(df, seg_tokens, text_col, id_col).repartition(
        F.col("__h")
    )
    counts = ex.groupBy("__h").agg(
        F.countDistinct(id_col).alias("__nd")
    )
    dup = F.col("__nd") >= min_docs
    return (
        ex.join(counts, "__h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_segs"),
            F.sum(dup.cast("int")).cast("long").alias("n_dup_segs"),
            F.round(
                F.sum(dup.cast("int")).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("dup_seg_frac"),
            F.sum(F.when(~dup, F.col("__seg_ntok")).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_tokens_kept"),
        )
        # no final sort (r7 lesson): the sampling pass re-executed the
        # hash-count join; consumers compare order-insensitively
        # (measured 1.2 → 0.9s at sf0.1)
    )


def dup_span_stats(
    df: DataFrame,
    gram_tokens: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Duplicated-span statistics — the distributable approximation of
    exact-substring dedup (Lee et al., "Deduplicating Training Data
    Makes Language Models Better": remove any ≥50-token substring that
    appears twice in the corpus; their exact tool is a suffix array,
    which doesn't shard).

    The Spark-native equivalent: a token ``gram_tokens``-gram occurring
    in ≥ ``min_docs`` distinct documents marks its token window as
    duplicated; overlapping/adjacent duplicated windows merge into
    maximal spans (interval union, so tokens are never double-counted).
    Reported per document: duplicated-gram/span counts, the exact number
    of tokens inside duplicated spans, and the duplicated-token
    fraction — the signal span-level dedup cuts on.

    Plan: grams explode map-side with positions; the cross-doc gram
    count is a two-phase (hash, doc)-keyed aggregate (hot boilerplate
    grams don't skew a reducer); surviving positions re-shuffle once on
    the doc key where lag/row_number windows do the interval merge.
    Per-doc span state is bounded by document length, never corpus size.
    (r10 note: a (hash, doc)-keyed census variant — collect positions
    per gram-doc, count docs off the census, explode back — was
    measured against this plan in an interleaved A/B at sf0.1 and LOST
    (min 1.93s vs 1.57s): the census adds a full gram-stream exchange
    while the dup-hash branch's column pruning already drops positions,
    so the dual explode it tried to remove is cheaper than the extra
    shuffle. Left as-is deliberately.)

    Output row order is UNDEFINED (r11, ADVICE r10): the final
    presentational sort was dropped in r10 because its
    RangePartitioning sampling pass re-executed the pipeline;
    callers needing an order must sort the returned frame.
    """
    from pyspark.sql import Window

    n = int(gram_tokens)
    c = F.col(text_col)
    grams = overlapping_gram_strings(c, n)
    ex = df.select(
        F.col(id_col), F.posexplode(grams).alias("pos", "__g")
    ).select(id_col, "pos", word_hash(F.col("__g")).alias("__h"))
    dup_hashes = (
        ex.groupBy("__h")
        .agg(F.countDistinct(id_col).alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("__h")
    )
    dup_pos = ex.join(dup_hashes, "__h").select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    # new span when the gap to the previous duplicated gram start
    # exceeds n (intervals [p, p+n-1] overlap or touch iff gap <= n)
    brk = F.when(
        F.col("pos") - F.lag("pos").over(w) > F.lit(n), F.lit(1)
    ).otherwise(F.lit(0))
    spans = (
        dup_pos.withColumn("__isl", F.sum(brk).over(w))
        .groupBy(id_col, "__isl")
        .agg(
            F.count(F.lit(1)).alias("__grams"),
            (F.max("pos") - F.min("pos") + n).alias("__span_tokens"),
        )
        .groupBy(id_col)
        .agg(
            F.sum("__grams").cast("long").alias("n_dup_grams"),
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.sum("__span_tokens").cast("long").alias("dup_tokens"),
        )
    )
    # n_grams arithmetically (r11, guide §1.2 "don't compute things
    # twice"): the gram builder emits one gram per window start, so its
    # count is exactly greatest(n_tokens − (n−1), 0) on the single-space
    # contract this operator already requires (see
    # overlapping_gram_strings) — and the ORACLE's list_transform over
    # generate_series(1, greatest(LEN−7, 0)) is literally this formula.
    # Dropping size(grams) removes the base branch's second full gram
    # REGEX pass (interleaved A/B at sf0.1: 1.49 → 1.30 s; output
    # verified row-identical). A shared hash-keyed exchange for the two
    # count-branch passes was ALSO A/B'd and REJECTED (1.57 vs 1.63 s —
    # shipping positions through the extra exchange costs what the
    # regex recompute saves; same verdict as the r10 census variant).
    ntok = token_count(c).cast("long")
    base = df.select(
        F.col(id_col),
        ntok.alias("n_tokens"),
        F.greatest(ntok - F.lit(n - 1), F.lit(0)).cast("long").alias("n_grams"),
    )
    return (
        base.join(spans, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            "n_grams",
            F.coalesce("n_dup_grams", F.lit(0)).cast("long").alias("n_dup_grams"),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0)).cast("double")
                / F.col("n_tokens").cast("double"),
                6,
            ).alias("dup_token_frac"),
        )
        # no final orderBy (r10, the r7 final-sort rule): the range
        # exchange's sampling pass re-executed the child's last stage —
        # here the per-doc token/gram REGEX projections — so every doc
        # paid the gram regex twice; every consumer compares
        # order-insensitively
    )


def cross_source_overlap(
    df: DataFrame,
    prefix_tokens: int = 20,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Content overlap between corpus sources: pairs of sources sharing
    documents with identical `prefix_tokens`-word prefixes (the dataset-
    curation question "which of my crawls duplicate each other" —
    boilerplate and mirrored content show up here before full-text
    dedup).

    Scale posture: the per-(prefix-hash, source) distinct is one uniform
    md5-key shuffle; the pair self-join is keyed on the same hash, and
    per-key fan-out is bounded by the number of SOURCES (a dimension,
    not the corpus), so the join can never go quadratic in documents.
    """
    prefix = F.concat_ws(
        " ", F.slice(F.split(F.col(text_col), " "), 1, prefix_tokens)
    )
    h = df.select(
        F.md5(prefix).alias("__m"), F.col(source_col).alias("__src")
    ).distinct()
    a = h.select(F.col("__m"), F.col("__src").alias("source_a"))
    b = h.select(F.col("__m"), F.col("__src").alias("source_b"))
    return (
        a.join(b, "__m")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared_prefixes"))
        .orderBy("source_a", "source_b")
    )


def tfidf_top_terms(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Per-source TF-IDF keyword extraction: the top-`k` terms that
    characterize each corpus source (the data-card "what is this crawl
    about" summary; also the classic relevance-weighting building block).

    tf(source, term) = term occurrences across the source's documents;
    df(term) = distinct documents containing the term; idf = ln(N/df).

    Cross-engine exactness (same convention as temperature_mixture /
    quality_classifier): idf QUANTIZES to an integer grain
    (round(ln(N/df)·1e9) — a 1e-9 relative grain, invisible at the 4-dp
    output) so the ranking key tf·idf_q is exact integer arithmetic;
    engine float-log ulp differences can never reorder the top-k. Ties
    break on term ascending.

    Scale shape: ONE wide exchange — the (doc, source, term) partial
    aggregate over the exploded tokens, where in-document repeats combine
    map-side. Everything downstream runs on reduced frames: tf re-aggs
    by (source, term); df is a COUNT per term over the SAME frame (its
    rows are already doc-distinct, no second distinct pass); the
    tf⋈idf join is keyed on term with AQE; the top-k window partitions
    the (source, term) aggregate, never the corpus. N comes from a
    broadcast 1-row count, not a driver action. (No spread in front of
    the explode: measured at sf0.1, exchanging full text payloads to
    parallelize the token pass costs MORE than the single-task pass
    itself — 0.96s vs 0.69s — unlike the md5-heavy shingle pipelines
    where spread pays; the partial agg after the explode is where the
    real reduction happens and it parallelizes on its own exchange.)"""
    n = df.select(F.count(F.lit(1)).cast("double").alias("__n"))
    base = df.select(
        F.col(id_col).alias("__doc"),
        F.col(group_col).alias("source"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), " "),
                lambda w: w.rlike("^[a-z]+$"),
            )
        ).alias("term"),
    )
    # one exchange: per-document term counts (map-side combine collapses
    # in-doc repeats before the shuffle)
    c0 = base.groupBy("__doc", "source", "term").agg(
        F.count(F.lit(1)).alias("tf_doc")
    )
    tf = c0.groupBy("source", "term").agg(
        F.sum("tf_doc").cast("long").alias("tf")
    )
    # c0 rows are (doc, term)-distinct by construction: df(term) is a
    # plain COUNT, no countDistinct shuffle
    dfreq = c0.groupBy("term").agg(F.count(F.lit(1)).alias("__df"))
    idf_q = F.round(
        F.log(F.col("__n") / F.col("__df").cast("double")) * F.lit(1e9)
    ).cast("long")
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("__score", F.col("tf") * idf_q)
    )
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(
        F.col("__score").desc(), F.col("term")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(
            "source",
            "term",
            "tf",
            # half-free 4-dp rounding (the SURVEY-documented convention):
            # score lands exactly on a decimal half whenever
            # score % 100000 == 50000, where Spark's BigDecimal HALF_UP
            # and DuckDB's double ROUND can split — FLOOR(x/1e5 + 0.5)
            # runs the identical IEEE ops on both engines instead
            (
                F.floor(
                    F.col("__score").cast("double") / F.lit(100000.0)
                    + F.lit(0.5)
                )
                / F.lit(10000.0)
            ).alias("tfidf"),
        )
        # no presentational orderBy: its RangePartitioning sampling job
        # re-executes the top-k window stage over the vocab-sized scored
        # frame (the winnow r7 lesson); consumers compare
        # order-insensitively
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints (Schleimer, Wilkerson, Aiken — SIGMOD 2003, MOSS)
# ---------------------------------------------------------------------------

_POS_BASE = 4294967296  # 2^32: packs (hash, pos) into one exact BIGINT


def winnow_fingerprints(
    df: DataFrame,
    k: int = 3,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    detailed: bool = False,
) -> DataFrame:
    """Winnowing document fingerprints: in every window of ``w``
    consecutive word-``k``-gram hashes, select the minimum hash
    (rightmost position on ties) — the MOSS fingerprinting scheme, whose
    selected-set guarantee (any shared substring of length w+k-1 shares a
    fingerprint) makes it the local-fingerprint complement of minhash.

    Distributed shape: grams posexplode map-side; the per-window
    rightmost-argmin is ONE sliding-frame window function — MIN of the
    packed key ``h·2^32 + (2^32−1−pos)`` over ``ROWS BETWEEN CURRENT ROW
    AND w-1 FOLLOWING`` (the packing makes (min hash, max pos) the
    integer minimum, so the rightmost-tie rule costs no struct
    ordering). No fan-out, no (doc, window) shuffle: the window pass and
    the per-doc aggregate share ONE doc-key exchange (an earlier
    explode-each-position-into-its-w-windows formulation shuffled w×
    the gram count and ran 2.8× slower at sf0.1). Exact integer
    arithmetic on the portable md5-prefix `word_hash` end-to-end, so a
    DuckDB oracle grades it value-for-value.

    ``detailed=True`` returns (id, fp_pos, fp_hash) rows; default returns
    the per-doc summary (n_grams, n_windows, n_fingerprints,
    n_distinct_hashes, min_fp). Documents with no full k-gram emit
    nothing (same on both engines).
    """
    from pyspark.sql import Window

    from iceberg_geospatial_api_server_spark.util import spread

    # id-keyed spread BEFORE the gram explode: the md5-per-gram pass is
    # the dominant cost and the sf-scale documents file is a single row
    # group (one task without it); partitioning on the doc id IS the
    # window's partitioning, so the exchange is paid once, not added
    df = spread(df, None, id_col)
    c = F.col(text_col)
    grams = df.select(
        F.col(id_col),
        F.posexplode(overlapping_gram_strings(c, k)).alias("pos", "gram"),
        F.greatest(
            F.size(F.split(c, " ")) - F.lit(k - 1), F.lit(0)
        ).alias("m"),
    ).withColumn("h", word_hash(F.col("gram")))
    nw = F.greatest(F.col("m") - F.lit(w - 1), F.lit(1))
    packed = (
        F.col("h").cast("long") * F.lit(_POS_BASE)
        + (F.lit(_POS_BASE - 1) - F.col("pos"))
    )
    frame = (
        Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, w - 1)
    )
    # one row per WINDOW START (pos < n_windows); the frame truncates at
    # partition end, which for m < w makes window 0 span all m grams —
    # exactly the short-document semantics
    wmin = (
        grams.withColumn("sel", F.min(packed).over(frame))
        .filter(F.col("pos") < nw)
        .select(id_col, F.col("pos").alias("j"), "sel", "m")
    )
    # decode with integer DIV, never `/`: long/long promotes to DOUBLE,
    # whose 53-bit mantissa rounds a 63-bit packed key across the hash
    # boundary for small positions
    unpack_hash = F.expr(f"CAST(sel DIV {_POS_BASE} AS BIGINT)")
    if detailed:
        # no presentation orderBy: a global sort's RangePartitioning
        # SAMPLES its child, re-executing the whole post-shuffle stage
        # (the window sort + selection live in ONE stage with the
        # aggregate) — measured 0.55s of pure recompute at sf0.1 on the
        # summary branch. Consumers (winnow_pairs) re-shuffle anyway.
        return wmin.select(
            id_col,
            (F.lit(_POS_BASE - 1) - F.col("sel") % _POS_BASE)
            .cast("long")
            .alias("fp_pos"),
            unpack_hash.alias("fp_hash"),
        ).distinct()
    # dedup selections FIRST — and on the SAME doc exchange: a position
    # selected by several windows is always selected by a CONSECUTIVE
    # run of them (any window between two selectors contains the
    # position, and a better candidate there would beat it in one of the
    # endpoints too), so "new fingerprint" ⟺ sel ≠ lag(sel) — one more
    # window function instead of a distinct (which would re-shuffle the
    # full window-row set on (id, sel))
    run = Window.partitionBy(id_col).orderBy("j")
    fps = (
        wmin.withColumn("__prev", F.lag("sel").over(run))
        .filter(F.col("__prev").isNull() | (F.col("__prev") != F.col("sel")))
        .select(id_col, "sel", "m")
    )
    # size(collect_set) instead of countDistinct: the distinct
    # aggregate plans as a two-phase Expand over the full selection
    # stream, while a per-group hash set is one aggregate pass — the
    # set is bounded by the doc's window count, never the corpus
    # (measured 0.93s → 0.79s at sf0.1 before the sort removal).
    # No final orderBy: RangePartitioning samples its child and
    # re-executes the whole single-exchange window+agg stage — measured
    # 0.79s → 0.24s at sf0.1. The driver canonicalizer and every test
    # compare order-insensitively.
    return fps.groupBy(id_col).agg(
        F.first("m").cast("long").alias("n_grams"),
        F.greatest(F.first("m") - F.lit(w - 1), F.lit(1))
        .cast("long")
        .alias("n_windows"),
        F.count(F.lit(1)).alias("n_fingerprints"),
        F.size(F.collect_set(unpack_hash))
        .cast("long")
        .alias("n_distinct_hashes"),
        F.expr(f"CAST(MIN(sel) DIV {_POS_BASE} AS BIGINT)").alias(
            "min_fp"
        ),
    )


def winnow_pairs(
    df: DataFrame,
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    max_bucket_size: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MOSS's comparison step: candidate document pairs ranked by how
    many winnowing fingerprints they share. Fingerprint HASHES bucket
    the join (the minhash-LSH band-bucket shape): per-hash doc lists
    meet on a hash equi-join — never a doc×doc product — and hashes
    whose bucket exceeds ``max_bucket_size`` drop first (a fingerprint
    shared by half the corpus is boilerplate, exactly minhash's hot
    bucket; cost is O(bucket) to count, never O(bucket²) to pair).

    Deterministic end-to-end (selection rule + integer hashes), so the
    whole candidate generation is DuckDB-oracle-gradeable — unlike
    minhash, winnowing needs no probabilistic recall argument.
    """
    fps = winnow_fingerprints(
        df, k=k, w=w, text_col=text_col, id_col=id_col, detailed=True
    )
    dh = fps.select(F.col(id_col), F.col("fp_hash")).distinct()
    sizes = dh.groupBy("fp_hash").agg(F.count(F.lit(1)).alias("__bs"))
    elig = dh.join(
        F.broadcast(sizes.filter(F.col("__bs") > max_bucket_size)),
        "fp_hash",
        "left_anti",
    )
    a = elig.select(F.col(id_col).alias("doc_a"), "fp_hash")
    b = elig.select(F.col(id_col).alias("doc_b"), "fp_hash")
    return (
        a.join(b, "fp_hash")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
        .orderBy("doc_a", "doc_b")
    )


ZIPF_STEPS: list[tuple[str, str]] = [
    # least-squares over the quantized (ln rank, ln freq) points:
    # identical text both engines; inputs are exact integer sums
    ("n_d", "CAST(n_used AS DOUBLE)"),
    (
        "slope",
        "(n_d * CAST(sxy AS DOUBLE) - CAST(sxq AS DOUBLE) * CAST(syq AS DOUBLE))"
        " / (n_d * CAST(sxx AS DOUBLE) - CAST(sxq AS DOUBLE) * CAST(sxq AS DOUBLE))",
    ),
    (
        "intercept",
        "(CAST(syq AS DOUBLE) - slope * CAST(sxq AS DOUBLE)) / n_d",
    ),
    (
        "r2",
        "(n_d * CAST(sxy AS DOUBLE) - CAST(sxq AS DOUBLE) * CAST(syq AS DOUBLE))"
        " * (n_d * CAST(sxy AS DOUBLE) - CAST(sxq AS DOUBLE) * CAST(syq AS DOUBLE))"
        " / ((n_d * CAST(sxx AS DOUBLE) - CAST(sxq AS DOUBLE) * CAST(sxq AS DOUBLE))"
        "    * (n_d * CAST(syy AS DOUBLE) - CAST(syq AS DOUBLE) * CAST(syq AS DOUBLE)))",
    ),
]


def zipf_fit(
    df: DataFrame,
    top_n: int = 500,
    text_col: str = "text",
    quant: int = 1_000_000,
) -> DataFrame:
    """Zipf's-law fit for the corpus data card: least-squares slope of
    ln(frequency) against ln(rank) over the top-N vocabulary (natural
    corpora slope ≈ −1; a far-off slope flags synthetic or degenerate
    text).

    Cross-engine exactness: each point's ln values QUANTIZE to integers
    (FLOOR(ln·1e9 + 0.5) — the corpus_perplexity pattern) before the
    regression sums, so Σx, Σy, Σxy, Σx², Σy² are exact integers on any
    partitioning and the closed-form slope/intercept/R² are shared
    expression text over them. Scale shape: one token exchange for the
    vocabulary counts, TakeOrdered top-N (never a global sort), then
    windows/sums over the bounded N-row frame. quant=1e6 keeps the
    squared-term sums far inside signed-64 (ln f < 50 ⇒ terms < 2.5e15,
    ×top_n ≪ 2⁶³) while quantization error ~5e-7 per point is orders
    below the 6-dp output grain."""
    toks = (
        df.select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), "tok")
        .limit(top_n)
    )
    from pyspark.sql import Window

    w = Window.partitionBy(F.lit(1)).orderBy(F.col("freq").desc(), "tok")
    q = F.lit(float(quant))
    pts = toks.withColumn("rank", F.row_number().over(w)).select(
        F.floor(F.log(F.col("rank").cast("double")) * q + F.lit(0.5))
        .cast("long")
        .alias("lx"),
        F.floor(F.log(F.col("freq").cast("double")) * q + F.lit(0.5))
        .cast("long")
        .alias("ly"),
    )
    sums = pts.agg(
        F.count(F.lit(1)).alias("n_used"),
        F.sum("lx").alias("sxq"),
        F.sum("ly").alias("syq"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
        F.sum(F.col("ly") * F.col("ly")).alias("syy"),
    )
    out = sums
    for name, sql in ZIPF_STEPS:
        out = out.withColumn(name, F.expr(sql))
    return out.select(
        F.col("n_used").cast("long").alias("n_used"),
        (F.round("slope", 6) + F.lit(0.0)).alias("slope"),
        (F.round("intercept", 6) + F.lit(0.0)).alias("intercept"),
        (F.round("r2", 6) + F.lit(0.0)).alias("r2"),
    )


def decontaminate_spans(
    df: DataFrame,
    bench_pred: Column | None = None,
    gram_tokens: int = 8,
    mask_token: str = "<MASK>",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """SPAN-LEVEL benchmark decontamination: instead of dropping every
    document sharing an n-gram with the benchmark (`decontaminate`),
    mask only the contaminated token spans — the surgical variant
    production pipelines use when whole-doc dropping wastes too much
    clean text (contaminated windows merge into maximal spans by
    interval union, exactly dup_span_stats' island machinery).

    ``bench_pred`` selects the benchmark slice (default doc_id % 97 == 0,
    the `decontaminate` convention). Returns per KEPT-corpus document:
    n_tokens, n_masked, n_spans, and md5 of the reconstructed masked
    text — so an oracle grades the reconstruction itself, not just the
    counts.

    Plan: benchmark grams broadcast (benchmark-sized); corpus gram
    positions explode map-side into the broadcast semi-join (no corpus
    shuffle to find hits); hit positions shuffle ONCE on the doc key
    for the island merge; the merged interval list (bounded per doc)
    joins back and the mask applies as a JVM higher-order transform
    over the token array — no Python anywhere.
    """
    from pyspark.sql import Window

    if bench_pred is None:
        bench_pred = F.col(id_col) % 97 == 0
    n = int(gram_tokens)
    c = F.col(text_col)
    corpus = df.filter(~bench_pred)
    bench_grams = (
        df.filter(bench_pred)
        .select(F.explode(overlapping_gram_strings(c, n)).alias("__g"))
        .select(word_hash(F.col("__g")).alias("__h"))
        .distinct()
    )
    ex = corpus.select(
        F.col(id_col), F.posexplode(overlapping_gram_strings(c, n)).alias("pos", "__g")
    ).select(id_col, "pos", word_hash(F.col("__g")).alias("__h"))
    hits = ex.join(F.broadcast(bench_grams), "__h").select(id_col, "pos")
    return _mask_hit_spans(corpus, hits, n, mask_token, text_col, id_col)


def _mask_hit_spans(
    corpus: DataFrame,
    hits: DataFrame,
    n: int,
    mask_token: str,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Shared span-masking pipeline: hit gram positions (id, pos) merge
    into maximal [pos, pos+n-1] spans by interval union (ONE doc-key
    exchange), the bounded per-doc span list joins back, and the mask
    applies as a JVM higher-order transform; output carries the
    reconstructed-text md5 so oracles grade the reconstruction."""
    from pyspark.sql import Window

    c = F.col(text_col)
    w = Window.partitionBy(id_col).orderBy("pos")
    brk = F.when(
        F.col("pos") - F.lag("pos").over(w) > F.lit(n), F.lit(1)
    ).otherwise(F.lit(0))
    spans = (
        hits.withColumn("__isl", F.sum(brk).over(w))
        .groupBy(id_col, "__isl")
        .agg(
            F.min("pos").cast("long").alias("lo"),
            (F.max("pos") + F.lit(n - 1)).cast("long").alias("hi"),
        )
        .groupBy(id_col)
        .agg(
            F.collect_list(F.struct("lo", "hi")).alias("__spans"),
            F.count(F.lit(1)).alias("n_spans"),
        )
    )
    toks = tokens(c)
    joined = corpus.join(spans, id_col, "left")
    empty = F.array().cast("array<struct<lo:bigint,hi:bigint>>")
    sp = F.coalesce(F.col("__spans"), empty)
    in_span = lambda i: F.exists(  # noqa: E731
        sp, lambda s: (s["lo"] <= i.cast("long")) & (i.cast("long") <= s["hi"])
    )
    masked_tok = F.transform(
        toks, lambda t, i: F.when(in_span(i), F.lit(mask_token)).otherwise(t)
    )
    n_masked = F.size(
        F.filter(F.sequence(F.lit(0), F.size(toks) - 1), in_span)
    )
    return joined.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        n_masked.cast("long").alias("n_masked"),
        F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        F.md5(F.concat_ws(" ", masked_tok).cast("binary")).alias(
            "scrubbed_md5"
        ),
    ).orderBy(id_col)


def dedup_spans_scrub(
    df: DataFrame,
    gram_tokens: int = 8,
    min_docs: int = 2,
    mask_token: str = "<MASK>",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Span-level dedup MATERIALIZATION — the removal step of Lee et
    al.'s substring dedup over `dup_span_stats`'s signal: a token
    n-gram occurring in ≥ ``min_docs`` distinct documents is kept in
    its SMALLEST doc id (the deterministic keep-first convention the
    exact-dedup family uses) and masked everywhere else; overlapping
    masked windows merge into maximal spans.

    Plan: the cross-doc gram census aggregates on (hash, doc) FIRST
    (boilerplate grams never funnel one reducer — the dup_span_stats
    shape) then per hash (distinct-doc count + keeper); non-keeper hit
    positions re-shuffle once on the doc key into the shared masking
    pipeline. The keeper doc keeps ALL its occurrences (within-doc
    repetition is `text_repetition_profile`'s business, not dedup's).
    """
    n = int(gram_tokens)
    c = F.col(text_col)
    ex = df.select(
        F.col(id_col),
        F.posexplode(overlapping_gram_strings(c, n)).alias("pos", "__g"),
    ).select(id_col, "pos", word_hash(F.col("__g")).alias("__h"))
    per_doc = ex.groupBy("__h", id_col).agg(F.count(F.lit(1)).alias("__c"))
    census = per_doc.groupBy("__h").agg(
        F.count(F.lit(1)).alias("__nd"),
        F.min(id_col).alias("__keeper"),
    )
    dup = census.filter(F.col("__nd") >= min_docs).select("__h", "__keeper")
    hits = (
        ex.join(dup, "__h")
        .filter(F.col(id_col) != F.col("__keeper"))
        .select(id_col, "pos")
    )
    return _mask_hit_spans(df, hits, n, mask_token, text_col, id_col)


ENTROPY_STEPS: list[tuple[str, str]] = [
    # closing algebra over exact integer sums (shared expression text):
    # H = ln N − (Σ c·qln(c))/(quant·N), normalized by ln V
    (
        "h_nats",
        "LN(CAST(n_tokens AS DOUBLE))"
        " - CAST(s_clnc AS DOUBLE) / 1000000.0"
        "   / CAST(n_tokens AS DOUBLE)",
    ),
    # n_types = 1 ⇒ ln V = 0: a degenerate one-token vocabulary has
    # zero entropy; define its normalized form as 0 rather than 0/0
    # (ANSI Spark raises on the bare division, DuckDB yields NaN)
    (
        "h_norm",
        "CASE WHEN n_types > 1 THEN h_nats / LN(CAST(n_types AS DOUBLE))"
        " ELSE 0.0 END",
    ),
]


def corpus_entropy(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus vocabulary entropy for the data card: unigram Shannon
    entropy in nats (H = ln N − Σc·ln c / N), its normalized form
    H/ln V (1.0 = uniform vocabulary, → 0 = degenerate repetition),
    and the type/token ratio at integer micro grain. The corpus-level
    twin of text_repetition_profile's per-doc redundancy.

    Cross-engine exactness: ln c quantizes to an integer
    (FLOOR(ln·1e6 + 0.5) — the zipf/perplexity pattern), each c·qln(c)
    term is a BIGINT, and the sum accumulates as DECIMAL (exact and
    associative on any partitioning; per-term signed-64 holds while any
    single token's count stays under ~4e11 — beyond that drop quant).
    The closing entropy algebra is shared expression text over the
    exact sums; ln-derived outputs ROUND safely (halves measure zero).

    Scale shape: one token-key exchange builds the vocabulary with
    map-side partial counts; the closing aggregate is a single row.
    """
    counts = (
        df.select(F.explode(tokens(F.col(text_col))).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    qln = F.floor(
        F.expr("LN(CAST(c AS DOUBLE))") * F.lit(1000000.0) + F.lit(0.5)
    ).cast("long")
    agg = counts.agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum((F.col("c") * qln).cast("decimal(38,0)")).alias("s_clnc"),
    )
    for name, sql in ENTROPY_STEPS:
        agg = agg.withColumn(name, F.expr(sql))
    return agg.select(
        "n_tokens",
        F.col("n_types").cast("long").alias("n_types"),
        (F.round("h_nats", 6) + F.lit(0.0)).alias("entropy_nats"),
        (F.round("h_norm", 6) + F.lit(0.0)).alias("norm_entropy"),
        F.expr("CAST((n_types * 1000000) DIV n_tokens AS BIGINT)").alias(
            "ttr_micro"
        ),
    )


def lexical_complexity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_syll_ppm: int = 1_450_000,
    max_complex_ppm: int = 60_000,
) -> DataFrame:
    """Flesch-style lexical-complexity profile — the readability half of
    a curation battery (Flesch/FK readability over syllable density;
    sentence features are meaningless on unpunctuated corpora, so the
    word-level components carry the signal). Syllables ≈ vowel-group
    runs ([aeiouy]+ — the standard heuristic); complex words have ≥3.

    Everything is exact integers: counts from single-pass JVM
    regexp_extract_all (RE2 ∩ java.regex — the pii_scrub portability
    contract), densities on the ppm grid via BIGINT DIV. Zero shuffle —
    pure scan-stage column math, the corpus_curate gate shape."""
    words = F.split(F.col(text_col), " ")
    n_words = F.size(words)
    n_syll = F.size(F.expr(f"regexp_extract_all({text_col}, '[aeiouy]+', 0)"))
    n_complex = F.size(
        F.filter(
            words,
            lambda w: F.size(
                F.regexp_extract_all(w, F.lit("[aeiouy]+"), F.lit(0))
            )
            >= F.lit(3),
        )
    )
    return (
        df.filter(F.length(text_col) > 0)
        .select(
            id_col,
            n_words.cast("long").alias("n_words"),
            n_syll.cast("long").alias("n_syllables"),
            n_complex.cast("long").alias("n_complex"),
        )
        .withColumn(
            "syll_ppm",
            F.expr("(n_syllables * 1000000) DIV n_words"),
        )
        .withColumn(
            "complex_ppm",
            F.expr("(n_complex * 1000000) DIV n_words"),
        )
        .withColumn(
            "keep",
            (F.col("syll_ppm") <= F.lit(max_syll_ppm))
            & (F.col("complex_ppm") <= F.lit(max_complex_ppm)),
        )
    )


def fuzzy_match_candidates(
    records: DataFrame,
    name_col: str,
    block_col: Column | str,
    max_dist: int = 3,
    id_count_col: str = "n_records",
) -> DataFrame:
    """Record-linkage candidate generation (entity resolution): fuzzy
    match over the DISTINCT name vocabulary, blocked, scored with exact
    Levenshtein — the canonical dedupe-then-link pipeline step (think
    merging supplier/part catalogs from two sources).

    The load-bearing order of operations for 100 TB: records collapse
    to (name, block, support-count) FIRST — the distinct-name
    vocabulary is orders of magnitude smaller than the record stream
    and grows sublinearly (new records mostly repeat known names) — and
    the quadratic candidate join runs over the BLOCKED DISTINCT
    vocabulary only, never over records. Output: one row per unordered
    candidate pair (name_a < name_b, same block, levenshtein ≤
    ``max_dist``) with both sides' record support counts, ready for a
    verify/merge stage. Levenshtein is the classic DP, identical
    integers in any engine — the score is hash-gradable.

    Plan: one name-keyed exchange for the vocab collapse; the pair join
    keys on the block column (broadcast-sized vocab ⇒ AQE broadcasts);
    everything else map-side.
    """
    block = (
        F.col(block_col) if isinstance(block_col, str) else block_col
    )
    vocab = (
        records.select(
            F.col(name_col).alias("name"), block.alias("__block")
        )
        .filter(F.col("name").isNotNull())
        .groupBy("name", "__block")
        .agg(F.count(F.lit(1)).alias(id_count_col))
    )
    a = vocab.select(
        F.col("name").alias("name_a"),
        F.col("__block").alias("__block"),
        F.col(id_count_col).alias(f"{id_count_col}_a"),
    )
    b = vocab.select(
        F.col("name").alias("name_b"),
        F.col("__block").alias("__block"),
        F.col(id_count_col).alias(f"{id_count_col}_b"),
    )
    return (
        a.join(b, "__block")
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn(
            "dist", F.levenshtein("name_a", "name_b").cast("long")
        )
        .filter(F.col("dist") <= F.lit(int(max_dist)))
        .select(
            "name_a",
            "name_b",
            "dist",
            f"{id_count_col}_a",
            f"{id_count_col}_b",
        )
    )
