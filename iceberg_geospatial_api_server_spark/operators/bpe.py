"""Byte-pair-encoding subword tokenizer, Spark-first.

The learned-tokenizer stage of a training-data pipeline (Sennrich et
al. 2016, "Neural Machine Translation of Rare Words with Subword
Units"; the algorithm behind GPT-2/SentencePiece vocabularies):

* ``bpe_train`` — classic frequency-greedy merge learning over a
  word-frequency table. Spark shape: the corpus collapses to distinct
  words ONCE (one exchange — 100 TB of text becomes a vocabulary-sized
  frame), optionally capped to the top ``max_words`` by frequency (the
  standard practice: subword vocabularies are trained on frequency
  tables, and sampling/capping the tail does not change the head
  merges). Each merge iteration explodes adjacent symbol pairs over
  the VOCAB frame, aggregates pair counts weighted by word frequency,
  and collects exactly ONE row (the argmax pair — deterministic
  tiebreak: count desc, then lexicographic). The vocabulary never
  sits on the driver.

* ``bpe_encode`` — greedy rank-based merge application with the
  learned table broadcast, one Arrow batch at a time (mapInPandas).
  Pure map-side: encoding 100 TB shuffles nothing.

No counterpart in the reference engine (it has no NLP surface); this
implements the operator class the build brief's training-pipeline
section calls for.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

END = "</w>"  # end-of-word marker (Sennrich's convention)

# truncate the iteration lineage every N merges: each merge rewrites the
# symbol arrays, and 50 stacked HOF projections otherwise make analysis
# itself quadratic (same device as dedup.connected_components)
_CHECKPOINT_EVERY = 8


def _word_freqs(
    df: DataFrame, text_col: str, max_words: int | None
) -> DataFrame:
    words = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    if max_words is not None:
        # top-N by frequency (deterministic tiebreak) — a TakeOrdered,
        # not a global sort
        words = words.orderBy(F.desc("freq"), "w").limit(int(max_words))
    return words


def _merge_fold(syms: Column, a: str, b: str) -> Column:
    """Leftmost-greedy single-pair merge over a symbol array: fold that
    appends each symbol, fusing it with the accumulator tail when the
    tail is `a` and the symbol is `b` (matches the classic in-place
    scan: after "a b" fuses, the fused token participates as the new
    tail, so "a b a b" -> "ab ab" and "a a a" with (a,a) -> "aa a")."""
    ab = a + b
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (s == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(ab))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def bpe_train(
    df: DataFrame,
    num_merges: int = 32,
    text_col: str = "text",
    max_words: int | None = 100_000,
    min_pair_count: int = 2,
    with_counts: bool = False,
) -> list[tuple[str, str]] | list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges from the corpus; returns the
    ordered merge list [(a, b), ...] (rank = list position), or
    [(a, b, pair_count), ...] with ``with_counts`` (the form the
    corpus_bpe_merges value oracle grades).

    Stops early when the best remaining pair occurs fewer than
    ``min_pair_count`` times (nothing left worth fusing). Driver
    traffic is one row per iteration; the vocab frame persists across
    iterations with periodic localCheckpoints to keep the plan flat.
    Cache lifecycle: each iteration's `first()` is the action that
    materializes the CURRENT vocab's persist, so the PREVIOUS
    generation releases only after that action has run — unpersisting
    eagerly would drop the only materialized cache and recompute the
    corpus word-count shuffle every iteration.
    """
    words = _word_freqs(df, text_col, max_words)
    vocab = words.select(
        "freq",
        F.concat(
            F.split(F.col("w"), ""), F.array(F.lit(END))
        ).alias("syms"),
    ).persist()

    merges: list = []
    to_release = None
    try:
        for it in range(int(num_merges)):
            pairs = vocab.select(
                "freq",
                F.explode(
                    F.when(F.size("syms") < 2, F.array().cast("array<struct<a:string,b:string>>"))
                    .otherwise(
                        F.transform(
                            F.sequence(F.lit(0), F.size("syms") - 2),
                            lambda i: F.struct(
                                F.get(F.col("syms"), i).alias("a"),
                                F.get(F.col("syms"), i + 1).alias("b"),
                            ),
                        )
                    )
                ).alias("p"),
            )
            best = (
                pairs.groupBy("p.a", "p.b")
                .agg(F.sum("freq").alias("cnt"))
                .orderBy(F.desc("cnt"), "a", "b")
                .first()
            )
            # this first() materialized `vocab`'s persist — the
            # generation before it is now safe to drop
            if to_release is not None:
                to_release.unpersist()
                to_release = None
            if best is None or best["cnt"] < min_pair_count:
                break
            a, b = best["a"], best["b"]
            merges.append(
                (a, b, int(best["cnt"])) if with_counts else (a, b)
            )
            nxt = vocab.select(
                "freq", _merge_fold(F.col("syms"), a, b).alias("syms")
            )
            if (it + 1) % _CHECKPOINT_EVERY == 0:
                # eager checkpoint materializes NOW: release immediately
                nxt = nxt.localCheckpoint(eager=True)
                vocab.unpersist()
            else:
                nxt = nxt.persist()
                to_release = vocab
            vocab = nxt
    finally:
        vocab.unpersist()
        if to_release is not None:
            to_release.unpersist()
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Classic rank-greedy BPE apply: repeatedly fuse the best-ranked
    adjacent pair present (leftmost occurrence on rank ties)."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank, best_i = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_word_cache: int = 65_536,
) -> DataFrame:
    """Encode documents with a learned merge table: per doc, the
    subword count, the whitespace-token count, and the fertility
    (subwords per word — THE tokenizer-quality number a data card
    reports). Merge ranks broadcast inside the closure; encoding is
    map-side mapInPandas with a per-batch word memo (corpus words
    repeat — the memo turns per-occurrence cost into per-distinct-word
    cost)."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_words", T.LongType()),
            T.StructField("n_subwords", T.LongType()),
            T.StructField("fertility", T.DoubleType()),
        ]
    )

    def _encode(batches):
        memo: dict[str, int] = {}
        for pdf in batches:
            n_words, n_sub = [], []
            for text in pdf[text_col]:
                words = [w for w in text.split(" ") if w]
                total = 0
                for w in words:
                    c = memo.get(w)
                    if c is None:
                        c = len(_encode_word(w, ranks))
                        if len(memo) < batch_word_cache:
                            memo[w] = c
                    total += c
                n_words.append(len(words))
                n_sub.append(total)
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_words": pd.Series(n_words, dtype="int64"),
                    "n_subwords": pd.Series(n_sub, dtype="int64"),
                }
            )
            out["fertility"] = (
                out["n_subwords"] / out["n_words"].where(out["n_words"] > 0)
            ).fillna(0.0).round(6)
            yield out

    return df.select(id_col, text_col).mapInPandas(_encode, out_schema)
