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


def test_key_skew_profile_planted_hot_key(spark):
    """90%-hot-key data: every profile number is hand-checkable — the
    hot key leads with its exact ppm share, and the p50/p99 spread
    separates the tail from the head."""
    from pyspark.sql import functions as F

    from iceberg_geospatial_api_server_spark.operators.skew import (
        key_skew_profile,
    )

    # key 7 holds 90 rows; keys 0..9 (excl. 7) hold 1 row each
    df = spark.range(0, 90).select(F.lit(7).alias("k")).unionByName(
        spark.range(0, 10).filter("id != 7").select(F.col("id").alias("k"))
    )
    rows = key_skew_profile(df, "k", k=3).collect()
    assert [r["rank"] for r in rows] == [1, 2, 3]
    top = rows[0]
    assert top["key"] == 7 and top["cnt"] == 90
    assert top["n_rows"] == 99 and top["n_keys"] == 10
    assert top["share_ppm"] == 90 * 1_000_000 // 99
    assert top["max_cnt"] == 90
    assert top["p50_cnt"] == 1.0  # 9 of 10 keys hold exactly one row
    # rank 2/3 are the smallest-keyed singleton keys (total tiebreak)
    assert (rows[1]["key"], rows[2]["key"]) == (0, 1)
    assert rows[1]["cnt"] == 1
