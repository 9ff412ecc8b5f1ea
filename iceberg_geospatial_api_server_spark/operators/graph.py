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
    edges: DataFrame,
    iters: int = 10,
    checkpoint_every: int = 3,
    include_sinks: bool = False,
    assume_symmetric: bool = False,
) -> DataFrame:
    """Integer-exact PageRank (damping 0.85, fixed ``iters`` rounds)
    over a directed edge list (src, dst). Returns (id, rank_micro).

    Node set: DISTINCT src by default (exactly the oracle's nodes CTE —
    a symmetrized graph, as graph_pagerank builds, has src ∪ dst = src).
    For RAW directed graphs pass ``include_sinks=True``: nodes = src ∪
    dst, so sink-only nodes (appearing only as dst) get rank rows and
    their inbound mass is kept (they contribute nothing outward — deg
    is 0 — matching the no-teleport-redistribution convention of this
    integer form). With the default, a graph whose dst set exceeds its
    src set RAISES rather than silently dropping inbound mass
    (ADVICE r4: the silent drop was an easy correctness footgun).
    ``assume_symmetric=True`` skips that guard's extra anti-join job —
    for callers that construct the symmetric union themselves (the
    guard is provably vacuous there; keep it on for raw inputs).

    r₀ = 1.0; rᵢ₊₁(v) = 0.15 + Σ_{u→v} (85·rᵢ(u)) DIV (100·deg(u)),
    all in micro-units — exact BIGINT everywhere.
    """
    e = edges.select(
        F.col("src").cast("long"), F.col("dst").cast("long")
    ).distinct()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    ed = e.join(deg, "src").localCheckpoint()
    if include_sinks:
        node_col = e.select(F.col("src").alias("id")).union(
            e.select(F.col("dst").alias("id"))
        )
    elif assume_symmetric:
        node_col = e.select(F.col("src").alias("id"))
    else:
        n_sink_only = (
            e.select(F.col("dst").alias("id"))
            .distinct()
            .join(
                e.select(F.col("src").alias("id")).distinct(),
                "id",
                "left_anti",
            )
            .count()
        )
        if n_sink_only:
            raise ValueError(
                f"{n_sink_only} sink-only node(s) (appear only as dst) "
                "would get no rank row and their inbound mass would be "
                "dropped; pass include_sinks=True for raw directed "
                "graphs, or symmetrize the edge list"
            )
        node_col = e.select(F.col("src").alias("id"))
    nodes = node_col.distinct().localCheckpoint()
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


def common_neighbor_pairs(
    edges: DataFrame,
    k: int = 25,
    min_cn: int = 1,
    center_degree_cap: "int | None" = None,
    broadcast_deg: bool = True,
) -> DataFrame:
    """Link prediction over an UNDIRECTED edge list: for every node pair
    NOT already connected, the common-neighbor count and the Jaccard
    neighbor similarity (the two classic link-prediction scores —
    Liben-Nowell & Kleinberg 2003), top-``k`` by similarity. Returns
    (x, z, cn, jaccard_ppm) with x < z.

    Algorithm: one equi-join of the directed adjacency against itself on
    the CENTER node (never a cartesian) enumerates every
    (pair, common-neighbor) witness once — the wedge stream is exactly
    the output mass Σ_c d(c)·(d(c)−1)/2, the inherent cost of exact CN
    counting — then a (x, z) aggregate, an anti-join dropping
    already-connected pairs, and two degree joins for the Jaccard
    denominator. Everything is exact BIGINT (jaccard in ppm via integer
    DIV: cn·10⁶ DIV (d(x)+d(z)−cn)), so the score is
    partitioning-independent and hash-gradable; the top-k order is
    totally tiebroken (jaccard DESC, cn DESC, x, z).

    Scale posture: the wedge stream is quadratic in per-CENTER degree —
    hub nodes are the hazard (the same Σd² shape the triangle census
    escapes via degree orientation; CN cannot, because a pair's witness
    count needs ALL its centers). ``center_degree_cap`` is the standard
    production mitigation: centers above the cap are excluded as
    witnesses (a hub shared by everyone carries no similarity signal —
    the same reasoning as LSH hot-bucket drops and IDF down-weighting),
    bounding the stream by cap²·n_hot + Σ_cold d². Default None = exact.
    """
    und = (
        edges.select(
            F.least(F.col("src"), F.col("dst")).cast("long").alias("u"),
            F.greatest(F.col("src"), F.col("dst")).cast("long").alias("v"),
        )
        .filter(F.col("u") < F.col("v"))
        .distinct()
    )
    adj = und.select(
        F.col("u").alias("c"), F.col("v").alias("n")
    ).union(und.select(F.col("v").alias("c"), F.col("u").alias("n")))
    deg = adj.groupBy("c").agg(F.count(F.lit(1)).alias("d"))
    centers = adj
    if center_degree_cap is not None:
        centers = adj.join(
            deg.filter(F.col("d") <= F.lit(center_degree_cap)), "c"
        ).select("c", "n")
    left = centers.select("c", F.col("n").alias("x"))
    right = centers.select("c", F.col("n").alias("z"))
    cn = (
        left.join(right, "c")
        .filter(F.col("x") < F.col("z"))
        .groupBy("x", "z")
        .agg(F.count(F.lit(1)).alias("cn"))
        .filter(F.col("cn") >= F.lit(min_cn))
    )
    nonadj = cn.join(
        und,
        (cn["x"] == und["u"]) & (cn["z"] == und["v"]),
        "left_anti",
    )
    # r10 (guide §3.1): deg is one row per node — the same frame the
    # triangle census broadcasts; hinting it saves shuffling the
    # wedge-mass pair stream twice (by x, then by z) through two
    # sort-merge joins. `broadcast_deg` gates the hint (r11, ADVICE
    # r10: a hint OVERRIDES autoBroadcastJoinThreshold, so at node
    # counts where the degree frame cannot broadcast the caller must
    # be able to degrade to the shuffle joins without a code edit —
    # the same escape hatch triangle_stats' broadcast_adj provides).
    dx = deg.select(F.col("c").alias("x"), F.col("d").alias("dx"))
    dz = deg.select(F.col("c").alias("z"), F.col("d").alias("dz"))
    if broadcast_deg:
        dx, dz = F.broadcast(dx), F.broadcast(dz)
    scored = (
        nonadj.join(dx, "x")
        .join(dz, "z")
        .select(
            "x",
            "z",
            "cn",
            F.expr("(cn * 1000000) DIV (dx + dz - cn)").alias(
                "jaccard_ppm"
            ),
        )
    )
    return scored.orderBy(
        F.col("jaccard_ppm").desc(),
        F.col("cn").desc(),
        F.col("x"),
        F.col("z"),
    ).limit(k)


def triangle_stats(
    edges: DataFrame, broadcast_adj: bool = True
) -> DataFrame:
    """Exact triangle census over an UNDIRECTED edge list — the other
    canonical distributed-graph workload next to PageRank (community
    density / clustering analysis). Input: one row per undirected edge;
    orientation, dedup, and self-loop drops happen here.

    Algorithm (r8 rework — VERDICT r7 item 3): DEGREE-ORIENTED
    adjacency intersection. Every edge orients from its (degree,
    id)-smaller endpoint, so each triangle is counted exactly once at
    its (degree, id)-minimum edge as |N⁺(a) ∩ N⁺(b)|. The oriented
    out-neighborhoods are collected once (`adj`, one node-keyed
    exchange) and each edge's intersection evaluates MAP-SIDE against
    the broadcast adjacency — the wedge stream (Σ d_out(d_out−1)/2
    rows, the O(m^1.5) intermediate the previous two-equi-join kernel
    materialized and re-shuffled on (x,z)) never exists. Measured at
    sf0.1 (299k edges / 18.5M wedges / 236k triangles): 1.7-2.0s vs
    2.4-3.5s for the wedge join in the same sessions — the win is the
    two dropped wedge-sized exchanges.

    The orientation stays load-bearing at scale: it bounds every
    out-neighborhood by O(√m) (naive id-ordering leaves hub arrays
    d-sized), so per-row intersection work totals Σ|N⁺(a)|+|N⁺(b)| =
    O(m^1.5) worst-case — the same bound as the wedge join but with
    NO shuffled intermediate. `broadcast_adj` gates the broadcast (adj
    is edge-count longs ≈ 8m bytes — fine to ~100M edges on executor
    heaps); at billion-edge scale pass False and the same plan runs as
    two node-keyed shuffle joins, still wedge-stream-free. Wedges
    (open triads) still come from the UNDIRECTED degree frame:
    Σ d(d−1)/2. Global clustering coefficient = 3·triangles / wedges,
    reported in exact ppm (BIGINT DIV) so the hash is stable.

    Returns one row: (n_nodes, n_edges, n_wedges, n_triangles,
    clustering_ppm)."""
    und = (
        edges.select(
            F.least(F.col("src"), F.col("dst")).cast("long").alias("u"),
            F.greatest(F.col("src"), F.col("dst")).cast("long").alias("v"),
        )
        .filter(F.col("u") < F.col("v"))
        .distinct()
        # NO eager pin (r6): every consumer below reads und through the
        # identical distinct-exchange, which AQE deduplicates via
        # ReusedExchange — a localCheckpoint added a blocking
        # materialization job and measured SLOWER (2.5-2.7s vs 2.3-2.6s
        # at sf0.1) than letting the shuffle output be shared
    )
    nodes = und.select(F.col("u").alias("id")).union(
        und.select(F.col("v").alias("id"))
    )
    deg = nodes.groupBy("id").agg(F.count(F.lit(1)).alias("d"))
    base = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum("d").alias("deg_sum"),
        F.sum(F.expr("d * (d - 1)")).alias("wedges2"),
    )
    du = deg.select(F.col("id").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("id").alias("v"), F.col("d").alias("dv"))
    if broadcast_adj:
        # r10 (guide §3.1): deg is n_nodes (id, d) rows — strictly
        # smaller than the adjacency broadcast below, so whenever adj
        # fits on the executors deg does too. Hinting it removes the
        # two sort-merge joins that re-shuffled AND re-sorted the edge
        # stream by u then by v (plan: 2 Exchange + 4 Sort dropped;
        # measured 2.75s → 2.32s at sf0.1). At billion-edge scale the
        # same broadcast_adj=False switch that degrades adj to shuffle
        # joins degrades these too.
        du, dv = F.broadcast(du), F.broadcast(dv)
    lo_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    e = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("a"),
            F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("b"),
        )
        # three join legs below share e's exchanges the same way —
        # ReusedExchange beats an eager checkpoint (measured, see und)
    )
    adj = e.groupBy("a").agg(F.collect_list("b").alias("nbrs"))
    na = adj.select(F.col("a").alias("__ka"), F.col("nbrs").alias("__na"))
    nb = adj.select(F.col("a").alias("__kb"), F.col("nbrs").alias("__nb"))
    if broadcast_adj:
        na, nb = F.broadcast(na), F.broadcast(nb)
    tri = (
        e.join(na, F.col("a") == F.col("__ka"))
        .join(nb, F.col("b") == F.col("__kb"))
        .select(F.size(F.array_intersect("__na", "__nb")).alias("__c"))
        # SUM over zero rows is NULL where COUNT(*) was 0 — coalesce so
        # a triangle-free (or empty) graph still reports 0
        .agg(
            F.coalesce(F.sum("__c"), F.lit(0))
            .cast("long")
            .alias("n_triangles")
        )
    )
    return base.crossJoin(tri).select(
        "n_nodes",
        F.expr("deg_sum DIV 2").alias("n_edges"),
        F.expr("wedges2 DIV 2").alias("n_wedges"),
        "n_triangles",
        F.expr(
            "CASE WHEN wedges2 > 0 THEN (6 * n_triangles * 1000000)"
            " DIV wedges2 ELSE 0 END"
        ).alias("clustering_ppm"),
    )
