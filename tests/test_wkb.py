"""WKB/WKT codec round-trips and geometry kernels (pure python, no Spark)."""

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_geospatial_api_server_spark.geo import wkb as W

finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


@given(finite, finite)
@settings(max_examples=200, deadline=None)
def test_point_roundtrip(x, y):
    buf = W.encode_point(x, y)
    code, (px, py) = W.decode(buf)
    assert code == W.POINT and px == x and py == y
    assert W.geometry_type_name(buf) == "Point"
    assert W.bbox(buf) == (x, y, x, y)


def test_linestring_polygon_roundtrip():
    line = W.encode_linestring([(0, 0), (1, 2), (3, 1)])
    code, coords = W.decode(line)
    assert code == W.LINESTRING
    np.testing.assert_array_equal(coords, [[0, 0], [1, 2], [3, 1]])

    ring = [(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]
    hole = [(1, 1), (2, 1), (2, 2), (1, 2), (1, 1)]
    poly = W.encode_polygon([ring, hole])
    code, rings = W.decode(poly)
    assert code == W.POLYGON and len(rings) == 2
    assert W.area(poly) == pytest.approx(16 - 1)
    cx, cy = W.centroid(poly)
    assert (cx, cy) == pytest.approx((2.0333333, 2.0333333), abs=1e-3)
    assert W.bbox(poly) == (0, 0, 4, 4)


def test_multi_roundtrip():
    mp = W.encode_multipoint([(0, 0), (5, 5)])
    assert W.geometry_type_name(mp) == "MultiPoint"
    assert W.bbox(mp) == (0, 0, 5, 5)

    mpoly = W.encode_multi(
        W.MULTIPOLYGON,
        [
            W.encode_polygon([[(0, 0), (1, 0), (1, 1), (0, 1), (0, 0)]]),
            W.encode_polygon([(np.array([(2, 2), (3, 2), (3, 3), (2, 3), (2, 2)]))]),
        ],
    )
    assert W.area(mpoly) == pytest.approx(2.0)


def test_wkt_bridge():
    buf = W.from_wkt("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    assert W.geometry_type_name(buf) == "Polygon"
    assert W.area(buf) == pytest.approx(100)
    assert "POLYGON" in W.to_wkt(buf)
    pt = W.from_wkt("POINT (3.5 -2)")
    assert W.decode(pt)[1] == (3.5, -2.0)


def test_geojson_bridge():
    g = {"type": "LineString", "coordinates": [[0, 0], [1, 1]]}
    buf = W.from_geojson(g)
    assert W.to_geojson(buf) == {"type": "LineString", "coordinates": [[0.0, 0.0], [1.0, 1.0]]}


def test_point_in_polygon_with_hole():
    rings = [
        np.array([(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)], dtype="f8"),
        np.array([(1, 1), (3, 1), (3, 3), (1, 3), (1, 1)], dtype="f8"),
    ]
    assert W.point_in_polygon(0.5, 0.5, rings)
    assert not W.point_in_polygon(2, 2, rings)  # inside the hole
    assert not W.point_in_polygon(5, 5, rings)
    poly = W.encode_polygon(rings)
    assert W.contains(poly, 0.5, 2.0)
    assert not W.contains(poly, 2.0, 2.0)


def test_convex_hull_and_simplify():
    pts = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [2, 2], [1, 3]], dtype="f8")
    hull = W.convex_hull(pts)
    # square corners only, closed ring
    assert len(hull) == 5
    a, _, _ = W._ring_centroid(hull)
    assert abs(a) == pytest.approx(16)

    line = np.array([[0, 0], [1, 0.01], [2, -0.01], [3, 0], [3, 3]], dtype="f8")
    simp = W.simplify_dp(line, tolerance=0.1)
    np.testing.assert_array_equal(simp, [[0, 0], [3, 0], [3, 3]])


def test_mercator_roundtrip():
    lon = np.array([-120.0, 0.0, 77.7])
    lat = np.array([-60.0, 0.0, 45.0])
    x, y = W.lonlat_to_mercator(lon, lat)
    lon2, lat2 = W.mercator_to_lonlat(x, y)
    np.testing.assert_allclose(lon2, lon, atol=1e-9)
    np.testing.assert_allclose(lat2, lat, atol=1e-9)
    # known value: equator scale
    assert x[1] == 0.0 and y[1] == pytest.approx(0.0, abs=1e-9)


def test_buffer_point():
    buf = W.buffer_point(10, 20, 2.0, segments=64)
    assert W.geometry_type_name(buf) == "Polygon"
    assert W.area(buf) == pytest.approx(math.pi * 4, rel=0.01)
    assert W.contains(buf, 10, 20)
    assert not W.contains(buf, 12.5, 20)
