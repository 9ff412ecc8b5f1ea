"""Distributed DBSCAN (geo/cluster.py): crafted-cluster semantics vs a
reference single-node implementation, core/border/noise classification,
and the neighbor-join plan shape (cell equi-join, no cartesian)."""

import math
import random

import pytest
from pyspark.sql import functions as F

from iceberg_geospatial_api_server_spark.geo.cluster import (
    dbscan,
    dbscan_profile,
    eps_neighbors,
)


def _ref_dbscan(pts, eps, min_pts):
    """Reference DBSCAN with the repo's deterministic conventions:
    clusters labeled by smallest core id; borders attach to the smallest
    cluster among their in-eps cores."""
    n = len(pts)
    ids = sorted(pts)
    nb = {
        i: [
            j
            for j in ids
            if j != i
            and (pts[i][0] - pts[j][0]) ** 2 + (pts[i][1] - pts[j][1]) ** 2
            <= eps * eps
        ]
        for i in ids
    }
    cores = {i for i in ids if len(nb[i]) + 1 >= min_pts}
    parent = {i: i for i in cores}

    def find(u):
        while parent[u] != u:
            parent[u] = parent[parent[u]]
            u = parent[u]
        return u

    for i in cores:
        for j in nb[i]:
            if j in cores:
                ri, rj = find(i), find(j)
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    label = {}
    comp_min: dict = {}
    for i in cores:
        comp_min.setdefault(find(i), []).append(i)
    for root, members in comp_min.items():
        lbl = min(members)
        for m in members:
            label[m] = lbl
    out = {}
    for i in ids:
        if i in cores:
            out[i] = ("core", label[i])
        else:
            in_eps_cores = [label[j] for j in nb[i] if j in cores]
            if in_eps_cores:
                out[i] = ("border", min(in_eps_cores))
            else:
                out[i] = ("noise", None)
    return out


def _df(spark, pts):
    return spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in pts.items()],
        "fid long, x double, y double",
    )


@pytest.fixture(scope="module")
def crafted(spark):
    """Two dense blobs, a bridge-free gap, a border point, and isolated
    noise."""
    rng = random.Random(4)
    pts = {}
    fid = 0
    for cx, cy in [(0.0, 0.0), (50.0, 10.0)]:
        for _ in range(20):
            pts[fid] = (cx + rng.uniform(-2, 2), cy + rng.uniform(-2, 2))
            fid += 1
    pts[100] = (4.6, 0.0)  # border of blob 1 at eps=3 (near its rim)
    pts[101] = (25.0, 25.0)  # noise
    pts[102] = (-30.0, -30.0)  # noise
    return pts


def test_dbscan_matches_reference(spark, crafted):
    eps, mp = 3.0, 4
    want = _ref_dbscan(crafted, eps, mp)
    got = {
        r.fid: r
        for r in dbscan(_df(spark, crafted), "x", "y", "fid", eps, mp).collect()
    }
    assert set(got) == set(want)
    for i, (kind, lbl) in want.items():
        r = got[i]
        assert r.is_core == (kind == "core"), i
        assert r.cluster_id == lbl, (i, kind)
    # sanity: both blobs clustered, distinct labels, noise present
    labels = {v[1] for v in want.values() if v[1] is not None}
    assert len(labels) == 2
    assert any(v[0] == "noise" for v in want.values())


def test_dbscan_profile_matches_reference(spark, crafted):
    eps, mp = 3.0, 4
    want = _ref_dbscan(crafted, eps, mp)
    got = {
        r.fid: r
        for r in dbscan_profile(
            _df(spark, crafted), "x", "y", "fid", eps, mp
        ).collect()
    }
    for i in crafted:
        kind, _ = want[i]
        assert got[i].is_core == (kind == "core")
        if kind == "noise":
            assert got[i].core_anchor is None


def test_eps_neighbors_exact_and_symmetric(spark):
    pts = {0: (0.0, 0.0), 1: (1.0, 0.0), 2: (0.0, 2.1), 3: (10.0, 10.0)}
    rows = {
        (r.id_a, r.id_b)
        for r in eps_neighbors(_df(spark, pts), "x", "y", "fid", 2.0).collect()
    }
    assert rows == {(0, 1), (1, 0)}


def test_neighbor_join_no_cartesian(spark, crafted):
    from iceberg_geospatial_api_server_spark.plans.explain import (
        formatted_plan,
    )

    plan = formatted_plan(
        eps_neighbors(_df(spark, crafted), "x", "y", "fid", 3.0)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_distance_join_matches_bruteforce(spark):
    import math
    import random

    from iceberg_geospatial_api_server_spark.geo.cluster import distance_join

    rng = random.Random(31)
    left = [(i, rng.uniform(-30, 30), rng.uniform(-30, 30)) for i in range(60)]
    right = [(j, rng.uniform(-30, 30), rng.uniform(-30, 30)) for j in range(80)]
    ldf = spark.createDataFrame(left, "lid long, lx double, ly double")
    rdf = spark.createDataFrame(right, "rid long, rx double, ry double")
    got = {
        (r.lid, r.rid): r.dist
        for r in distance_join(ldf, rdf, "lx", "ly", "rx", "ry", 5.0).collect()
    }
    want = {}
    for lid, lx, ly in left:
        for rid, rx, ry in right:
            d = math.sqrt((lx - rx) ** 2 + (ly - ry) ** 2)
            if d * d <= 25.0:
                want[(lid, rid)] = d
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12
