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
    """Number of exchanges (shuffles) in the plan — the scale currency."""
    return formatted_plan(df).count("Exchange")
