"""Physical-plan inspection utilities.

Every operator in this engine was iterated against `.explain("formatted")`
until the plan was the one we'd want at 100 TB (pushdown, pruning,
broadcasts, no cartesian products). These helpers make those properties
assertable — tests/test_plans.py pins them in CI, and operators can
self-check in development.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """The predicates that reached the parquet scan."""
    plan = formatted_plan(df)
    out = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        out.extend(p.strip() for p in m.group(1).split(",") if p.strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    plan = formatted_plan(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: ([^\n]+)", plan)]


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    pushed = " | ".join(pushed_filters(df))
    for f in fragments:
        assert f in pushed, f"filter {f!r} not pushed; pushed: {pushed}"


def assert_broadcast_join(df: DataFrame, min_count: int = 1) -> None:
    plan = formatted_plan(df)
    n = plan.count("BroadcastHashJoin")
    assert n >= min_count, f"expected ≥{min_count} broadcast joins, got {n}"


def assert_no_cartesian(df: DataFrame) -> None:
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, "plan contains a cartesian product"


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges (hash + range + single-partition) —
    the scale currency. Counts partitioning kinds, not the raw string
    "Exchange", which would also match BroadcastExchange (a broadcast is
    deliberately NOT a shuffle here) and undercount in formatted mode
    (see the counters below)."""
    plan = formatted_plan(df)
    return (
        hash_exchange_count(plan)
        + range_exchange_count(plan)
        + single_partition_exchange_count(plan)
    )


# ---------------------------------------------------------------------------
# Exchange counting that works in BOTH explain styles.
#
# In `mode="formatted"` an exchange prints as a bare "(9) Exchange" tree node
# with its partitioning on a separate "Arguments: hashpartitioning(...)"
# line, so the simple-mode substring "Exchange hashpartitioning" NEVER
# occurs — a `plan.count("Exchange hashpartitioning") <= N` assertion is
# vacuously true in formatted mode (and a `>= N` one vacuously false).
# These helpers count the partitioning kind in either rendering.
# ---------------------------------------------------------------------------

_HASH_EXCHANGE = re.compile(
    r"Exchange hashpartitioning|Arguments: hashpartitioning"
)
_SINGLE_EXCHANGE = re.compile(
    r"Exchange SinglePartition|Arguments: SinglePartition"
)
_RANGE_EXCHANGE = re.compile(
    r"Exchange rangepartitioning|Arguments: rangepartitioning"
)


def _plan_text(df_or_plan) -> str:
    if isinstance(df_or_plan, str):
        return df_or_plan
    return formatted_plan(df_or_plan)


def hash_exchange_count(df_or_plan) -> int:
    """Number of hash-partitioned shuffles (the scale currency)."""
    return len(_HASH_EXCHANGE.findall(_plan_text(df_or_plan)))


def single_partition_exchange_count(df_or_plan) -> int:
    """Number of funnel-everything-to-one-task exchanges (scale killers
    unless the input is a bounded aggregate)."""
    return len(_SINGLE_EXCHANGE.findall(_plan_text(df_or_plan)))


def range_exchange_count(df_or_plan) -> int:
    """Number of range-partitioned shuffles (global sorts)."""
    return len(_RANGE_EXCHANGE.findall(_plan_text(df_or_plan)))
