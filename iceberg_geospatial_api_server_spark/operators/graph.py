"""Iterative graph analytics over lakehouse tables.

PageRank is THE canonical iterative Spark workload; this one is built to
be hash-graded against a SQL oracle — normally impossible for float
fixpoint algorithms — by running the ENTIRE recursion in integer
arithmetic: ranks live in micro-units (1.0 = 1_000_000) and each edge
contribution is the integer division (85 · r) DIV (100 · deg), so every
iteration is exact, partitioning-independent, and identical on any
engine (the oracle unrolls the same iterations as chained CTEs — the
shared-steps pattern applied to a loop).

Scale posture: each iteration is one edges⋈ranks join (shuffle on the
node key, reused round-over-round) + one destination aggregate; lineage
is truncated every ``checkpoint_every`` rounds (the connected-components
convention) so plan size stays O(checkpoint_every); the edge set is
checkpointed once and re-read per round. Convergence is fixed-iteration
by design — integer PageRank is used for deterministic RANKING, not for
ε-residual guarantees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000
BASE_MICRO = 150_000  # 0.15 damping complement in micro-units


def pagerank_int(
    edges: DataFrame, iters: int = 10, checkpoint_every: int = 3
) -> DataFrame:
    """Integer-exact PageRank (damping 0.85, fixed ``iters`` rounds)
    over a directed edge list (src, dst). The node set is DISTINCT src
    (exactly the oracle's nodes CTE): a sink-only node — one appearing
    only as dst — gets NO rank row and its inbound mass is dropped.
    Symmetrize the graph (as graph_pagerank does) when every node
    should rank. Returns (id, rank_micro).

    r₀ = 1.0; rᵢ₊₁(v) = 0.15 + Σ_{u→v} (85·rᵢ(u)) DIV (100·deg(u)),
    all in micro-units — exact BIGINT everywhere.
    """
    e = edges.select(
        F.col("src").cast("long"), F.col("dst").cast("long")
    ).distinct()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = e.join(deg, "src").localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("id")).distinct().localCheckpoint()
    )
    ranks = nodes.withColumn("r", F.lit(MICRO).cast("long"))
    for i in range(iters):
        contrib = (
            ed.join(ranks, ed["src"] == ranks["id"])
            .select(
                F.col("dst").alias("id"),
                F.expr("(85 * r) DIV (100 * deg)").alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(contrib, "id", "left").select(
            "id",
            (
                F.lit(BASE_MICRO).cast("long")
                + F.coalesce("s", F.lit(0)).cast("long")
            ).alias("r"),
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            ranks = ranks.localCheckpoint()
    return ranks.select("id", F.col("r").alias("rank_micro"))
