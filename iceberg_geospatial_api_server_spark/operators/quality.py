"""Declarative data-quality expectations over lakehouse tables.

The validation stage every 100 TB ingest pipeline runs before promoting
a snapshot (the Great-Expectations / dbt-test capability class,
expressed as Spark aggregates): null-rate, range, uniqueness, and
referential-integrity rules, each reported as (rule, failing, total,
passed). The reference exposes table health through its catalog stats
routes (api/main.py table metadata + .files); this module is the
engine-side generalization.

Scale posture: every per-table rule family compiles into ONE aggregate
pass over that table (map-side partials — no per-rule scans);
uniqueness rides the same pass as a distinct-count; referential
integrity is a single LEFT ANTI join counted, never a row-level
materialization. The report itself is rules-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _failing(cond: Column) -> Column:
    """Count of rows violating the expectation (cond = violation).

    Callers must express NULL-handling IN the condition: F.when treats
    a NULL predicate as false, so a bare `col <= 0` would let an
    all-NULL column sail through a positivity gate — range/positivity
    rules below OR an explicit isNull() into the violation."""
    return F.sum(F.when(cond, 1).otherwise(0)).cast("long")


def quality_report(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Expectation suite over the order-lines fact and its parent table:
    positivity/range/null rules, key uniqueness, and lineitem→orders
    referential integrity — one aggregate pass per table plus one anti
    join, unioned into a rules-sized report.

    Output: (rule_id, table_name, n_failing, n_total, passed 0/1,
    fail_micro = failing-per-million — integer-exact, engine-portable).
    """
    li = lineitem.agg(
        F.count(F.lit(1)).alias("n"),
        # NULL counts as a violation of every range/positivity rule: a
        # broken column mapping must not green-light the gate
        _failing(
            F.col("l_quantity").isNull() | (F.col("l_quantity") <= 0)
        ).alias("bad_qty"),
        _failing(
            F.col("l_discount").isNull()
            | (F.col("l_discount") < 0)
            | (F.col("l_discount") > 0.1)
        ).alias("bad_disc"),
        _failing(F.col("l_shipdate").isNull()).alias("null_ship"),
        _failing(
            F.col("l_extendedprice").isNull()
            | (F.col("l_extendedprice") <= 0)
        ).alias("bad_price_li"),
    )
    od = orders.agg(
        F.count(F.lit(1)).alias("n_o"),
        F.countDistinct("o_orderkey").alias("n_keys"),
        _failing(
            F.col("o_totalprice").isNull() | (F.col("o_totalprice") <= 0)
        ).alias("bad_price"),
        _failing(F.col("o_custkey").isNull()).alias("null_cust"),
    )
    orphans = lineitem.join(
        orders,
        lineitem["l_orderkey"] == orders["o_orderkey"],
        "left_anti",
    ).agg(F.count(F.lit(1)).alias("n_orphans"))

    one = li.crossJoin(od).crossJoin(orphans)  # three 1-row frames
    rules = F.array(
        *[
            F.struct(
                F.lit(rid).alias("rule_id"),
                F.lit(tbl).alias("table_name"),
                failing.cast("long").alias("n_failing"),
                total.cast("long").alias("n_total"),
            )
            for rid, tbl, failing, total in [
                ("lineitem_quantity_positive", "lineitem", F.col("bad_qty"), F.col("n")),
                ("lineitem_discount_in_range", "lineitem", F.col("bad_disc"), F.col("n")),
                ("lineitem_shipdate_not_null", "lineitem", F.col("null_ship"), F.col("n")),
                ("lineitem_extendedprice_positive", "lineitem", F.col("bad_price_li"), F.col("n")),
                ("lineitem_orderkey_in_orders", "lineitem", F.col("n_orphans"), F.col("n")),
                ("orders_orderkey_unique", "orders", F.col("n_o") - F.col("n_keys"), F.col("n_o")),
                ("orders_totalprice_positive", "orders", F.col("bad_price"), F.col("n_o")),
                ("orders_custkey_not_null", "orders", F.col("null_cust"), F.col("n_o")),
            ]
        ]
    )
    return (
        one.select(F.explode(rules).alias("r"))
        .select(
            "r.rule_id",
            "r.table_name",
            "r.n_failing",
            "r.n_total",
            F.when(F.col("r.n_failing") == 0, 1)
            .otherwise(0)
            .cast("int")
            .alias("passed"),
            # n_total = 0 (empty snapshot) must report, not raise
            # DIVIDE_BY_ZERO under ANSI: zero failures over zero rows
            F.expr(
                "CASE WHEN r.n_total > 0 THEN"
                " CAST((r.n_failing * 1000000) DIV r.n_total AS BIGINT)"
                " ELSE CAST(0 AS BIGINT) END"
            ).alias("fail_micro"),
        )
        .orderBy("rule_id")
    )
