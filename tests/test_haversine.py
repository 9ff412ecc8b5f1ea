"""Great-circle distance: known geodesic anchors (pure-Python haversine
+ published city-pair distance), degenerate cases, and the kNN plan
shape (TakeOrderedAndProject, no global sort)."""

import math

from pyspark.sql import functions as F

from iceberg_geospatial_api_server_spark.geo.functions import (
    haversine_knn,
    haversine_meters,
)


def _ref_haversine(lon1, lat1, lon2, lat2, r=6371008.8):
    p1, p2 = math.radians(lat1), math.radians(lat2)
    dp = p2 - p1
    dl = math.radians(lon2 - lon1)
    h = math.sin(dp / 2) ** 2 + math.cos(p1) * math.cos(p2) * math.sin(dl / 2) ** 2
    return 2 * r * math.asin(math.sqrt(h))


def _dist(spark, x1, y1, x2, y2):
    df = spark.createDataFrame([(x1, y1)], "x double, y double")
    return df.select(
        haversine_meters("x", "y", repr(x2), repr(y2)).alias("d")
    ).collect()[0].d


def test_matches_python_reference(spark):
    cases = [
        (-0.1278, 51.5074, -74.0060, 40.7128),  # London → New York
        (2.3522, 48.8566, 139.6917, 35.6895),  # Paris → Tokyo
        (0.0, 0.0, 0.0, 90.0),  # equator → pole
        (10.0, -30.0, 10.3, -30.2),  # short hop
    ]
    for x1, y1, x2, y2 in cases:
        got = _dist(spark, x1, y1, x2, y2)
        assert abs(got - _ref_haversine(x1, y1, x2, y2)) < 1e-6


def test_known_anchors(spark):
    # London–NYC great-circle ≈ 5570 km; equator→pole = quarter meridian
    assert abs(_dist(spark, -0.1278, 51.5074, -74.0060, 40.7128) - 5.57e6) < 2e4
    quarter = math.pi / 2 * 6371008.8
    assert abs(_dist(spark, 0.0, 0.0, 0.0, 90.0) - quarter) < 1e-3


def test_degenerate_zero_distance(spark):
    assert _dist(spark, 12.5, -33.0, 12.5, -33.0) == 0.0


def test_knn_plan_is_take_ordered(spark):
    from iceberg_geospatial_api_server_spark.plans.explain import (
        formatted_plan,
    )

    df = spark.createDataFrame(
        [(float(i), float(i % 90), i) for i in range(100)],
        "x double, y double, fid long",
    )
    out = haversine_knn(df, "x", "y", 0.0, 0.0, 5, id_cols=["fid"])
    plan = formatted_plan(out)
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan
    rows = out.collect()
    assert len(rows) == 5
    assert rows == sorted(rows, key=lambda r: (r.dist_m, r.fid))


def test_knn_join_matches_bruteforce(spark):
    """k=3 join vs a pure-Python lateral: ids, ranks, and tie order."""
    import itertools
    import math
    import random

    from iceberg_geospatial_api_server_spark.geo.functions import (
        knn_join_broadcast,
    )

    rng = random.Random(13)
    left = [(i, rng.uniform(-50, 50), rng.uniform(-50, 50)) for i in range(40)]
    right = [(j, rng.uniform(-50, 50), rng.uniform(-50, 50)) for j in range(25)]
    ldf = spark.createDataFrame(left, "lid long, x double, y double")
    rdf = spark.createDataFrame(right, "rid long, x double, y double")
    out = knn_join_broadcast(ldf, rdf, "lid", "x", "y", "x", "y", ["rid"], k=3)
    got = {}
    for r in out.collect():
        got.setdefault(r.lid, []).append((r.nn_rank, r.nn_rid, r.nn_dist))
    for lid, lx, ly in left:
        want = sorted(
            (
                (math.sqrt((lx - rx) ** 2 + (ly - ry) ** 2), rid)
                for rid, rx, ry in right
            )
        )[:3]
        rows = sorted(got[lid])
        assert [w[1] for w in want] == [r[1] for r in rows], lid
        for (rank, rid, dist), (wd, wrid) in zip(rows, want):
            assert abs(dist - wd) < 1e-12


def test_knn_join_k_exceeds_right(spark):
    from iceberg_geospatial_api_server_spark.geo.functions import (
        knn_join_broadcast,
    )

    ldf = spark.createDataFrame([(1, 0.0, 0.0)], "lid long, x double, y double")
    rdf = spark.createDataFrame(
        [(7, 1.0, 0.0), (8, 2.0, 0.0)], "rid long, x double, y double"
    )
    rows = knn_join_broadcast(
        ldf, rdf, "lid", "x", "y", "x", "y", ["rid"], k=5
    ).collect()
    assert [(r.nn_rank, r.nn_rid) for r in sorted(rows, key=lambda r: r.nn_rank)] == [
        (1, 7),
        (2, 8),
    ]
