"""Re-aggregable sketch state for distinct counting at 100 TB.

The pattern: persist one HLL sketch per (day, segment) — a few KB each —
and answer ANY date-range / segment-rollup distinct-user question by
UNIONING sketches, never rescanning events. HLL register union is
lossless (union of sketches ≡ sketch of the union), so a merged estimate
equals the direct estimate EXACTLY — asserted in tests, which is what
makes pre-aggregated sketch tables safe to build incrementally (each
day's ingest appends its sketch; history is never touched).

Spark-native: `hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`
(Apache DataSketches under the hood, JVM-side aggregates with map-side
partial combine — one day-key exchange, no row-level state). The exact
rolling-distinct counterpart (events_dau_rolling) fans the (day, user)
frame out per window; sketches replace that with constant-size state
when ±2% error is acceptable — the standard trade at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iceberg_geospatial_api_server_spark.util import epoch_of


def hll_daily_user_sketches(
    events: DataFrame, lg_k: int = 12
) -> DataFrame:
    """One HLL sketch of distinct user_ids per UTC day: (day, sketch
    binary, dau_est). The persistable pre-aggregate — a few KB per day
    regardless of event volume; one day-key exchange with map-side
    partial sketch combine."""
    sec = epoch_of(events, "ts")
    day = F.floor(sec("ts", "SECOND") / F.lit(86_400)).cast("long")
    return (
        events.groupBy(day.alias("day"))
        .agg(F.hll_sketch_agg("user_id", F.lit(lg_k)).alias("sketch"))
        .select(
            "day",
            "sketch",
            F.hll_sketch_estimate("sketch").cast("long").alias("dau_est"),
        )
    )


def hll_range_estimate(
    daily: DataFrame, day_from: int, day_to: int
) -> DataFrame:
    """Distinct users over [day_from, day_to] by unioning the persisted
    daily sketches — the events table is never rescanned. Returns one
    row (n_days, users_est). The strict union (allowDifferentLgConfigK
    False) guards against mixing sketch tables built at different
    precisions."""
    window = daily.filter(
        (F.col("day") >= day_from) & (F.col("day") <= day_to)
    )
    return window.agg(
        F.count(F.lit(1)).alias("n_days"),
        # hll_union_agg over zero rows is NULL — an empty range means 0
        # distinct users, not a NULL a caller's arithmetic trips over
        F.coalesce(
            F.hll_sketch_estimate(
                F.hll_union_agg("sketch", F.lit(False))
            ).cast("long"),
            F.lit(0).cast("long"),
        ).alias("users_est"),
    )


def theta_daily_user_sketches(
    events: DataFrame, lg_nom_entries: int = 12
) -> DataFrame:
    """One THETA sketch of distinct user_ids per UTC day: (day, sketch
    binary). Theta is the SET-OPERATION sketch family: unlike HLL (union
    only), persisted theta sketches support INTERSECTION and DIFFERENCE
    — overlap/retention/churn between any two day ranges without
    rescanning events. Same shape as the HLL table: a few KB per day,
    one day-key exchange, map-side partial combine. ``lg_nom_entries``
    = 12 (4096 retained hashes, the hll lg_k convention) keeps the
    sketch in exact mode below ~4k distinct keys per day and ~1.6% RSE
    beyond."""
    sec = epoch_of(events, "ts")
    day = F.floor(sec("ts", "SECOND") / F.lit(86_400)).cast("long")
    return events.groupBy(day.alias("day")).agg(
        F.theta_sketch_agg("user_id", F.lit(lg_nom_entries)).alias(
            "sketch"
        )
    )


def theta_day_overlap(
    events: DataFrame, lg_nom_entries: int = 12
) -> DataFrame:
    """Day-over-day retained users via theta-sketch INTERSECTION — the
    retention/overlap query HLL structurally cannot answer (inclusion-
    exclusion on HLL unions amplifies error; theta intersects natively).
    Returns (day, overlap_est) for each day with a successor: the
    estimated |active(day) ∩ active(day+1)|. Built from the persisted
    daily sketch table — at 100 TB this never rescans events; here the
    sketch build is inlined for a self-contained operator."""
    daily = theta_daily_user_sketches(events, lg_nom_entries)
    nxt = daily.select(
        (F.col("day") - F.lit(1)).alias("day"),
        F.col("sketch").alias("sketch_next"),
    )
    return (
        daily.join(nxt, "day")
        .select(
            "day",
            F.theta_sketch_estimate(
                F.theta_intersection("sketch", "sketch_next")
            )
            .cast("long")
            .alias("overlap_est"),
        )
    )


def topk_daily_sketches(
    events: DataFrame,
    item_col: str = "event_type",
    max_items_tracked: int = 64,
) -> DataFrame:
    """One mergeable HEAVY-HITTERS sketch per UTC day (approx_top_k
    accumulate state) — the fourth sketch family beside HLL (distinct),
    theta (set ops), and the GK quantile contract: re-aggregable
    frequent-items state that answers "top items over any day range"
    without rescanning events. Exact while the per-sketch distinct item
    count stays ≤ ``max_items_tracked`` (the hll-sparse/theta-exact
    analog); beyond it counts degrade to the frequent-items guarantee.
    Same table shape as the HLL/theta stores: one day-key exchange,
    map-side partial accumulate."""
    sec = epoch_of(events, "ts")
    day = F.floor(sec("ts", "SECOND") / F.lit(86_400)).cast("long")
    return events.groupBy(day.alias("day")).agg(
        F.expr(
            f"approx_top_k_accumulate({item_col}, {int(max_items_tracked)})"
        ).alias("sketch")
    )


def topk_merged_counts(
    events: DataFrame,
    item_col: str = "event_type",
    k: int = 5,
    max_items_tracked: int = 64,
) -> DataFrame:
    """Top-k items over the whole range by COMBINING the per-day
    sketches (never rescanning events): accumulate → combine →
    estimate. Returns (item, count)."""
    daily = topk_daily_sketches(events, item_col, max_items_tracked)
    merged = daily.agg(
        F.expr(
            f"approx_top_k_combine(sketch, {int(max_items_tracked)})"
        ).alias("sketch")
    )
    return merged.select(
        F.explode(F.expr(f"approx_top_k_estimate(sketch, {int(k)})")).alias(
            "e"
        )
    ).select("e.item", "e.count")
