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


def _snyder_utm(lon, lat, zone):
    """Independent forward-UTM implementation (Snyder, USGS PP 1395
    eq. 8-9..8-13) used only to cross-check the Krüger series."""
    a = 6378137.0
    f = 1 / 298.257223563
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    k0 = 0.9996
    lon0 = math.radians(-183 + 6 * zone)
    lat = math.radians(lat)
    lon = math.radians(lon)
    N = a / math.sqrt(1 - e2 * math.sin(lat) ** 2)
    T = math.tan(lat) ** 2
    C = ep2 * math.cos(lat) ** 2
    A = (lon - lon0) * math.cos(lat)
    M = a * (
        (1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256) * lat
        - (3 * e2 / 8 + 3 * e2**2 / 32 + 45 * e2**3 / 1024) * math.sin(2 * lat)
        + (15 * e2**2 / 256 + 45 * e2**3 / 1024) * math.sin(4 * lat)
        - (35 * e2**3 / 3072) * math.sin(6 * lat)
    )
    E = 500000 + k0 * N * (
        A
        + (1 - T + C) * A**3 / 6
        + (5 - 18 * T + T**2 + 72 * C - 58 * ep2) * A**5 / 120
    )
    Nn = k0 * (
        M
        + N
        * math.tan(lat)
        * (
            A**2 / 2
            + (5 - T + 9 * C + 4 * C**2) * A**4 / 24
            + (61 - 58 * T + T**2 + 600 * C - 330 * ep2) * A**6 / 720
        )
    )
    return E, Nn


def test_utm_central_meridian_anchor():
    # zone 33 central meridian (15°E) on the equator is exactly the
    # false easting / zero northing by construction
    e, n = W.lonlat_to_utm(np.array([15.0]), np.array([0.0]), 33, True)
    assert e[0] == pytest.approx(500000.0, abs=1e-6)
    assert n[0] == pytest.approx(0.0, abs=1e-6)
    # southern-hemisphere false northing
    e, n = W.lonlat_to_utm(np.array([15.0]), np.array([-0.001]), 33, False)
    assert n[0] < 10000000.0 and n[0] == pytest.approx(10000000.0, abs=200)


@given(
    lon_off=st.floats(-2.9, 2.9),
    lat=st.floats(-80.0, 84.0),
    zone=st.integers(1, 60),
)
@settings(max_examples=60, deadline=None)
def test_utm_matches_snyder_and_roundtrips(lon_off, lat, zone):
    lon = -183.0 + 6 * zone + lon_off
    north = lat >= 0
    e, n = W.lonlat_to_utm(np.array([lon]), np.array([lat]), zone, north)
    es, ns = _snyder_utm(lon, lat, zone)
    if not north:
        ns += 10000000.0
    # two independent formulations agree to < 2 mm inside the zone
    assert e[0] == pytest.approx(es, abs=2e-3)
    assert n[0] == pytest.approx(ns, abs=2e-3)
    lon2, lat2 = W.utm_to_lonlat(e, n, zone, north)
    assert lon2[0] == pytest.approx(lon, abs=1e-8)
    assert lat2[0] == pytest.approx(lat, abs=1e-8)


def test_utm_wkid_params():
    assert W.utm_wkid_params(32633) == (33, True)
    assert W.utm_wkid_params(32756) == (56, False)
    assert W.utm_wkid_params(27700) is None
    assert W.utm_wkid_params(3857) is None


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


def test_line_and_polygon_metrics_reject_wrong_types(spark):
    """The metric kernels fail LOUD on the wrong geometry class (a
    silent bbox-ish fallback would grade garbage)."""
    import pandas as pd
    import pytest as _pytest

    from iceberg_geospatial_api_server_spark.geo import wkb as W
    from iceberg_geospatial_api_server_spark.geo.functions import (
        line_metrics,
        polygon_metrics,
    )

    pt = W.encode_point(1.0, 2.0)
    df = spark.createDataFrame(
        pd.DataFrame({"id": [1], "geometry": [pt]})
    )
    with _pytest.raises(Exception, match="LineString"):
        line_metrics(df, id_cols=["id"]).collect()
    with _pytest.raises(Exception, match="Polygon"):
        polygon_metrics(df, id_cols=["id"]).collect()
