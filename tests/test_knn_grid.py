"""Fact-scale grid kNN join: exactness vs the broadcast kernel, the
empty-ring expansion path, and the no-fact-broadcast plan contract."""

import io
from contextlib import redirect_stdout

import pyspark.sql.functions as F

from iceberg_geospatial_api_server_spark.geo.functions import (
    knn_join_broadcast,
    knn_join_grid,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _cols(df):
    return df.select("s_suppkey", "nn_rank", "nn_c_custkey", "nn_dist")


def test_grid_equals_broadcast_on_testdata(spark, tables):
    from iceberg_geospatial_api_server_spark.sources.synthetic import (
        customer_points,
        supplier_points,
    )

    supp = supplier_points(tables["supplier"])
    cust = customer_points(tables["customer"])
    args = (supp, cust, "s_suppkey", "x", "y", "x", "y", ["c_custkey"])
    g = _cols(knn_join_grid(*args, k=3)).collect()
    b = _cols(knn_join_broadcast(*args, k=3)).collect()
    key = lambda r: (r["s_suppkey"], r["nn_rank"])  # noqa: E731
    assert sorted(g, key=key) == sorted(b, key=key)
    assert len(g) == supp.count() * 3


def test_grid_expands_ring_for_isolated_left_rows(spark):
    """A left row parked in an empty region of the grid has ZERO
    candidates in its first ring — it must expand (doubling) until the
    true neighbors are provably inside, never drop silently."""
    left = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 1000.0, 1000.0)], "lid long, x double, y double"
    )
    right = spark.createDataFrame(
        [(10, 1.0, 0.0), (11, 2.0, 0.0), (12, 3.0, 0.0)],
        "rid long, x double, y double",
    )
    out = knn_join_grid(
        left, right, "lid", "x", "y", "x", "y", ["rid"], k=2
    )
    rows = {
        (r["lid"], r["nn_rank"]): r["nn_rid"]
        for r in out.collect()
    }
    # both left rows get their exact 2 nearest, including the isolated one
    assert rows[(1, 1)] == 10 and rows[(1, 2)] == 11
    assert rows[(2, 1)] == 12 and rows[(2, 2)] == 11


def test_grid_handles_nan_and_fewer_than_k(spark):
    left = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, float("nan"), 1.0)],
        "lid long, x double, y double",
    )
    right = spark.createDataFrame(
        [(10, 1.0, 0.0)], "rid long, x double, y double"
    )
    out = knn_join_grid(
        left, right, "lid", "x", "y", "x", "y", ["rid"], k=3
    ).collect()
    # NaN left row drops; the single right point caps the neighbor list
    assert [(r["lid"], r["nn_rank"], r["nn_rid"]) for r in out] == [
        (1, 1, 10)
    ]


def test_grid_plan_no_cartesian_no_fact_broadcast(spark, tables):
    """The scale contract: candidate generation is an equi-join on cell
    keys — no CartesianProduct/BroadcastNestedLoopJoin ever, and with
    auto-broadcast off the fact right side shuffles instead of
    broadcasting (nothing collects it to the driver either — the only
    driver traffic is the two bounded 1-row extent aggregates)."""
    from iceberg_geospatial_api_server_spark.sources.synthetic import (
        customer_points,
        supplier_points,
    )

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        supp = supplier_points(tables["supplier"])
        cust = customer_points(tables["customer"])
        out = knn_join_grid(
            supp, cust, "s_suppkey", "x", "y", "x", "y", ["c_custkey"], k=3
        )
        plan = _plan(out)
        assert "CartesianProduct" not in plan, plan[:2000]
        assert "BroadcastNestedLoop" not in plan, plan[:2000]
        assert "BroadcastExchange" not in plan, plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_grid_duplicate_left_ids_rank_per_row(spark):
    """Duplicate left_id values must each get the top-k of their OWN
    coordinates (ADVICE r6: the id-keyed search merged both rows'
    candidate pools and fanned the merged winners to every duplicate).
    Two rows share lid=1 at opposite ends of the axis; each must rank
    its own nearest neighbor first."""
    left = spark.createDataFrame(
        [(1, 0.0, 0.0), (1, 100.0, 0.0), (2, 50.0, 0.0)],
        "lid long, x double, y double",
    )
    right = spark.createDataFrame(
        [(10, 1.0, 0.0), (11, 99.0, 0.0), (12, 49.0, 0.0)],
        "rid long, x double, y double",
    )
    out = knn_join_grid(
        left, right, "lid", "x", "y", "x", "y", ["rid"], k=1
    ).collect()
    got = {(r["lid"], r["x"]): r["nn_rid"] for r in out}
    assert got == {(1, 0.0): 10, (1, 100.0): 11, (2, 50.0): 12}
    assert len(out) == 3  # no fan-out beyond one winner per left ROW
