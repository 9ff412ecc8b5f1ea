"""Planted-semantics tests for the r8 record-linkage and gap-fill
operators (their external grades run on the part/events tables; these
pin each rule where it is individually visible)."""

import hashlib
from datetime import datetime

from pyspark.sql import functions as F

from iceberg_geospatial_api_server_spark.operators.relational import (
    events_gapfill_ffill,
)
from iceberg_geospatial_api_server_spark.operators.text import (
    fuzzy_match_candidates,
)

M = 2147483647


def _whash(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % M


def test_fuzzy_match_blocked_scored_counted(spark):
    rows = [
        ("blue rod",),
        ("glue rod",),
        ("red bolt",),
        ("red bolt",),
        ("reed bolt",),
        ("cold widget",),  # alone in its block -> no pair
    ]
    df = spark.createDataFrame(rows, "p_name string")
    out = fuzzy_match_candidates(
        df,
        "p_name",
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)),
        max_dist=3,
    )
    got = {
        (r.name_a, r.name_b): (r.dist, r.n_records_a, r.n_records_b)
        for r in out.collect()
    }
    # levenshtein(blue, glue)=1; (red bolt, reed bolt)=1 with support
    # 2 on the duplicated name; cross-block pairs must not appear
    assert got == {
        ("blue rod", "glue rod"): (1, 1, 1),
        ("red bolt", "reed bolt"): (1, 2, 1),
    }


def test_fuzzy_match_threshold_excludes(spark):
    df = spark.createDataFrame(
        [("blue rod",), ("chocolate rod",)], "p_name string"
    )
    out = fuzzy_match_candidates(
        df,
        "p_name",
        F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)),
        max_dist=3,
    )
    assert out.count() == 0  # same block, distance 8 > 3


def test_gapfill_ffill_planted_series(spark):
    # user 1: events at hour H, H+3 (same value 'a' then 'b') -> spine
    # of 4 hours, 2 filled; user 2: single event -> 1 hour, 0 filled
    def ts(h, m=0):
        return datetime(2024, 1, 1, h, m)

    rows = [
        (1, ts(10, 5), "a"),
        (1, ts(13, 30), "b"),
        (2, ts(7), "x"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        r.user_id: (r.n_hours, r.n_filled, r.series_checksum)
        for r in events_gapfill_ffill(df).collect()
    }
    # expected checksum: hour indices 0..3 carry a,a,a,b
    cks1 = sum(
        (i % M) * (_whash(v) % M) % M
        for i, v in enumerate(["a", "a", "a", "b"])
    ) % M
    assert got[1] == (4, 2, cks1)
    assert got[2] == (1, 0, (0 * _whash("x")) % M)


def test_gapfill_hour_collapse_max_tie_rule(spark):
    # two events in ONE hour pick MAX(event_type); no gap exists
    rows = [
        (5, datetime(2024, 1, 1, 9, 1), "a"),
        (5, datetime(2024, 1, 1, 9, 50), "z"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    r = events_gapfill_ffill(df).collect()[0]
    assert (r.n_hours, r.n_filled) == (1, 0)
    assert r.series_checksum == 0 * _whash("z") % M
