"""Salted holistic aggregation: exactness on planted-skew data and the
plan property that buys the skew resistance (stage-1 shuffle keyed on
(key, salt), so a hot key spreads across reducers)."""

import pytest
from pyspark.sql import functions as F

from iceberg_geospatial_api_server_spark.operators.skew import (
    salted_count_distinct,
    salted_topk_per_key,
)
from iceberg_geospatial_api_server_spark.plans import (
    formatted_plan as _plan,
    hash_exchange_count,
    range_exchange_count,
    single_partition_exchange_count,
)


@pytest.fixture(scope="module")
def skewed(spark):
    """One key holds ~90% of rows (the hot-key regime), values repeat."""
    hot = spark.range(0, 9000).select(
        F.lit("hot").alias("k"),
        (F.col("id") % 700).alias("v"),
        (F.col("id") % 97).cast("double").alias("score"),
        F.col("id").alias("rid"),
    )
    cold = spark.range(0, 1000).select(
        F.concat(F.lit("c"), (F.col("id") % 20).cast("string")).alias("k"),
        (F.col("id") % 50).alias("v"),
        (F.col("id") % 89).cast("double").alias("score"),
        (F.col("id") + 10_000).alias("rid"),
    )
    return hot.unionAll(cold)


def test_salted_count_distinct_exact(skewed):
    got = {
        r.k: r.n_distinct
        for r in salted_count_distinct(skewed, ["k"], "v", n_salts=8).collect()
    }
    want = {
        r.k: r.d
        for r in skewed.groupBy("k")
        .agg(F.countDistinct("v").alias("d"))
        .collect()
    }
    assert got == want
    assert got["hot"] == 700


def test_salted_count_distinct_two_stage_plan(skewed):
    plan = _plan(salted_count_distinct(skewed, ["k"], "v", n_salts=8))
    # stage-1 exchange must key on (k, salt) — the skew spreader; Catalyst
    # rewrites the salt alias into a _groupingexpression, so assert the
    # hash expression itself plus the two-stage exchange structure
    assert "xxhash64" in plan, plan
    assert hash_exchange_count(plan) >= 2, plan


def test_salted_topk_exact(skewed):
    got = [
        (r.k, r.rid, r.rank)
        for r in salted_topk_per_key(
            skewed, ["k"], "score", k=5, n_salts=8, tiebreak_cols=["rid"]
        )
        .orderBy("k", "rank")
        .collect()
    ]
    from pyspark.sql import Window

    w = Window.partitionBy("k").orderBy(F.desc("score"), "rid")
    want = [
        (r.k, r.rid, r.rank)
        for r in skewed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .orderBy("k", "rank")
        .collect()
    ]
    assert got == want


def test_salted_topk_prunes_before_final_window(skewed):
    """The final per-key window must rank only k·n_salts survivors: the
    plan carries BOTH window passes (salted then global)."""
    plan = _plan(
        salted_topk_per_key(
            skewed, ["k"], "score", k=5, n_salts=8, tiebreak_cols=["rid"]
        )
    )
    assert plan.count("RunningWindowFunction") + plan.count("Window") >= 2, plan
