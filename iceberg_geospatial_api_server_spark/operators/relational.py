"""Relational analytics operators over the lakehouse tables.

These are the bench headliners: TPC-H-shaped aggregation/join plans that
exercise exactly the properties that matter at 100 TB — map-side partial
aggregation, broadcast of dimension tables, AQE-coalesced shuffles, and
pushdown of every filter into the parquet scan.

(The reference exposes its analytics through DuckDB SQL on Iceberg scans —
cookbook §1.4/§2.5 aggregations, §1.5/§2.6 joins; the specific query
shapes here match the driver's TPC-H-ish testdata.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def q1_pricing_summary(lineitem: DataFrame, cutoff: str = "1998-09-01") -> DataFrame:
    """TPC-H Q1: scan-heavy groupBy with 8 aggregates.

    Plan: filter pushed to parquet scan, partial HashAggregate map-side,
    2-key shuffle (≤ a few dozen groups) — the shuffle is trivially small
    at any scale; all expression work is whole-stage codegen.
    """
    return (
        lineitem.filter(F.col("l_shipdate") < F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    date: str = "1995-03-15",
) -> DataFrame:
    """TPC-H Q3: 3-way join + agg + top-k.

    customer is a dimension → broadcast to the orders scan; the only big
    shuffle is lineitem⋈orders on orderkey (AQE-coalesced); final top-10
    is TakeOrderedAndProject (no global sort).
    """
    d = F.lit(date).cast("timestamp")
    cust = customer.filter(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = orders.filter(F.col("o_orderdate") < d).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = lineitem.filter(F.col("l_shipdate") > d).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        )
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


def q5_local_supplier_volume(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "EUROPE",
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q5 shape: 6-way join where every dimension chain
    (region→nation→supplier, customer) broadcasts; lineitem only shuffles
    once on orderkey. (The classic c_nationkey == s_nationkey locality
    constraint is dropped — the synthetic testdata never satisfies it —
    revenue groups by the *supplier's* nation instead; the join DAG and
    its physical plan are unchanged.)
    """
    nr = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == region_name)),
            nation.n_regionkey == region.r_regionkey,
        ).select("n_nationkey", "n_name")
    )
    cust = customer.select("c_custkey")
    supp = supplier.join(
        F.broadcast(nr), supplier.s_nationkey == nr.n_nationkey
    ).select("s_suppkey", "n_name")

    d0 = F.lit(date_from).cast("timestamp")
    d1 = F.lit(date_to).cast("timestamp")
    ords = orders.filter((F.col("o_orderdate") >= d0) & (F.col("o_orderdate") < d1))

    return (
        lineitem.join(ords, lineitem.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), lineitem.l_suppkey == supp.s_suppkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


def q4_order_priority(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → left-semi join. The semi join shuffles on
    orderkey once; lineitem is pre-filtered and projected to the key only
    before the exchange."""
    d0 = F.lit("1996-07-01").cast("timestamp")
    d1 = F.lit("1996-10-01").cast("timestamp")
    # EXISTS condition: the order has at least one high-quantity item
    # (this testdata lacks commit/receipt dates, so the classic "late
    # delivery" predicate becomes a quantity predicate — same semi-join)
    late_items = lineitem.filter(F.col("l_quantity") > 45.0).select("l_orderkey")
    return (
        orders.filter((F.col("o_orderdate") >= d0) & (F.col("o_orderdate") < d1))
        .join(late_items, orders.o_orderkey == late_items.l_orderkey, "leftsemi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q10_returned_items(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, nation: DataFrame
) -> DataFrame:
    """TPC-H Q10: revenue lost to returns, top-20 customers."""
    d0 = F.lit("1996-01-01").cast("timestamp")
    d1 = F.lit("1996-04-01").cast("timestamp")
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter((F.col("o_orderdate") >= d0) & (F.col("o_orderdate") < d1)),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        # DECIMAL accumulation: the revenue sum is order-independent and
        # exact, so the 2dp round can never flip on a last-ulp boundary
        # between engines (bitten once at sf0.01: ...3.595 rounded .60/.59)
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,6)")
                    * (F.lit(1).cast("decimal(18,6)") - F.col("l_discount").cast("decimal(18,6)"))
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


def q12_shipmode_priority(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q12 shape (no shipmode column in this testdata → bucket by
    linenumber parity): conditional aggregation after one join."""
    d0 = F.lit("1996-01-01").cast("timestamp")
    d1 = F.lit("1997-01-01").cast("timestamp")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long")
    return (
        lineitem.filter((F.col("l_shipdate") >= d0) & (F.col("l_shipdate") < d1))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy((F.col("l_linenumber") % 2).alias("ship_bucket"))
        .agg(
            F.sum(high).alias("high_line_count"),
            F.sum(1 - high).alias("low_line_count"),
        )
        .orderBy("ship_bucket")
    )


def q14_promo_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q14: promo revenue share — broadcast part, single scalar."""
    d0 = F.lit("1996-03-01").cast("timestamp")
    d1 = F.lit("1996-04-01").cast("timestamp")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(0.0)
    return (
        lineitem.filter((F.col("l_shipdate") >= d0) & (F.col("l_shipdate") < d1))
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(F.sum(promo) * 100.0 / F.sum(rev), 4).alias("promo_revenue_pct")
        )
    )


def q18_large_volume(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, threshold: float
) -> DataFrame:
    """TPC-H Q18: customers with large-volume orders (HAVING subquery →
    inner join against the aggregated key set)."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > threshold)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            "o_totalprice",
            F.round("total_qty", 2).alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
    )


def q19_disjunctive(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate across the join — Catalyst
    pushes the common conjuncts and keeps the disjunction post-join."""
    j = lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("l_quantity").between(1, 11)) & (F.col("p_size").between(1, 5)))
        | ((F.col("p_brand") == "Brand#2") & (F.col("l_quantity").between(10, 20)) & (F.col("p_size").between(1, 10)))
        | ((F.col("p_brand") == "Brand#3") & (F.col("l_quantity").between(20, 30)) & (F.col("p_size").between(1, 15)))
    )
    return j.filter(cond).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def top_k_per_group(
    df: DataFrame, group_col: str, order_col: str, k: int, tiebreak: str
) -> DataFrame:
    """Top-K per group: window row_number, rank shuffle partitioned by the
    group key (map-side combine not possible, but partition count follows
    AQE; skewed groups can be pre-limited per partition at scale)."""
    w = Window.partitionBy(group_col).orderBy(F.desc(order_col), F.col(tiebreak))
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def events_windowed_agg(events: DataFrame, minutes: int = 60) -> DataFrame:
    """Tumbling-window aggregation over the event stream table (batch form
    of the structured-streaming windows in streaming/windows.py)."""
    bucket = (
        F.floor(F.unix_timestamp("ts") / (minutes * 60)) * (minutes * 60)
    ).cast("long")
    return (
        events.groupBy(bucket.alias("window_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("window_start", "event_type")
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionization: per-user lag + cumulative gap counter. One shuffle
    on user_id; both window passes reuse the same partitioning."""
    gap_us = gap_minutes * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy("ts")
    with_gap = events.withColumn(
        "new_session",
        (
            F.coalesce(
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)),
                F.lit(gap_us + 1),
            )
            > gap_us
        ).cast("int"),
    )
    with_sid = with_gap.withColumn(
        "session_seq", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        with_sid.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.unix_timestamp(F.min("ts")).alias("session_start"),
            F.unix_timestamp(F.max("ts")).alias("session_end"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
        .orderBy("user_id", "session_seq")
    )


def asof_join_events_orders(events: DataFrame, orders: DataFrame) -> DataFrame:
    """As-of join: each event matched to the latest order of the same
    customer at-or-before the event time (user_id ≡ custkey in testdata).

    Spark lacks a native as-of join; scale path = union the two streams
    tagged by side, one shuffle on the key, per-key time sort, last_value
    of the order side carried forward — a single window pass, no range
    cross product. (pd.merge_asof per group via applyInPandas is the
    fallback for semantics Spark windows can't express.)
    """
    ev = events.select(
        F.col("user_id").alias("k"),
        F.col("ts"),
        F.lit(1).alias("is_event"),
        "event_id",
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("double").alias("o_totalprice"),
    )
    od = orders.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("ts"),
        F.lit(0).alias("is_event"),
        F.lit(None).cast("long").alias("event_id"),
        "o_orderkey",
        "o_totalprice",
    )
    unioned = ev.unionByName(od)
    # orders sort before events at the same timestamp (is_event ascending)
    w = (
        Window.partitionBy("k")
        .orderBy("ts", "is_event", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "k",
        "ts",
        "is_event",
        "event_id",
        F.last("o_orderkey", ignorenulls=True).over(w).alias("asof_orderkey"),
        F.last("o_totalprice", ignorenulls=True).over(w).alias("asof_totalprice"),
    )
    return (
        carried.filter(F.col("is_event") == 1)
        .select(
            "event_id",
            F.col("k").alias("user_id"),
            F.unix_micros("ts").alias("event_ts"),
            "asof_orderkey",
            "asof_totalprice",
        )
        .orderBy("event_id")
    )


def events_pivot(events: DataFrame) -> DataFrame:
    """Pivot: event_type × day matrix of counts (ref cookbook §2.5-style
    reshaping). Pivot values enumerated → single-pass pivot aggregate."""
    types = ["click", "view", "purchase", "signup", "error"]
    day = F.date_format("ts", "yyyy-MM-dd").alias("day")
    out = (
        events.groupBy(day)
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
        .orderBy("day")
    )
    return out


def orders_rollup(orders: DataFrame) -> DataFrame:
    """Rollup totals: (status, priority) with subtotals and grand total."""
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


def user_stats(events: DataFrame) -> DataFrame:
    """Exact per-user stats (the oracle-checkable face of the approx
    variants: approx_count_distinct / percentile_approx live in bench)."""
    return (
        events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.round(F.max("value"), 4).alias("max_value"),
        )
        .filter(F.col("n_events") >= 3)
        .orderBy("user_id")
    )
