"""Bucketed co-located joins: the write-once-shuffle-never contract,
plan-asserted."""

import io
from contextlib import contextmanager, redirect_stdout

import pytest

from iceberg_geospatial_api_server_spark.sources.bucketed import (
    read_bucketed,
    write_bucketed,
)


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@contextmanager
def _no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


@pytest.fixture(scope="module")
def bucketed_pair(spark, tables, tmp_path_factory):
    base = tmp_path_factory.mktemp("bkt")
    li = tables["lineitem"].select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    od = tables["orders"].select("o_orderkey", "o_orderdate", "o_totalprice")
    write_bucketed(
        li, "bkt_lineitem", ["l_orderkey"], 8,
        sort_cols=["l_orderkey"], path=str(base / "li"),
    )
    write_bucketed(
        od, "bkt_orders", ["o_orderkey"], 8,
        sort_cols=["o_orderkey"], path=str(base / "od"),
    )
    yield read_bucketed(spark, "bkt_lineitem"), read_bucketed(
        spark, "bkt_orders"
    )
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    spark.sql("DROP TABLE IF EXISTS bkt_orders")


def test_bucketed_join_has_no_exchange(spark, tables, bucketed_pair):
    li, od = bucketed_pair
    with _no_broadcast(spark):
        joined = li.join(od, li.l_orderkey == od.o_orderkey)
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        # same join on the raw (unbucketed) frames shuffles both sides
        raw = tables["lineitem"].join(
            tables["orders"],
            tables["lineitem"].l_orderkey == tables["orders"].o_orderkey,
        )
        assert "Exchange" in _plan(raw)
        # and the results agree
        assert joined.count() == raw.count()


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_pair):
    li, _ = bucketed_pair
    with _no_broadcast(spark):
        agg = li.groupBy("l_orderkey").count()
        assert "Exchange" not in _plan(agg), _plan(agg)


def test_write_bucketed_validates(spark, tables):
    with pytest.raises(ValueError):
        write_bucketed(tables["orders"], "t", [], 8)
