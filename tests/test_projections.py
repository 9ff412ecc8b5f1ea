"""Correctness anchors for the conic/azimuthal projection kernels
(geo/projections.py) — the arbitrary-EPSG outSR surface the reference
serves via pyproj (ref query/geometry.py:85-95).

Two independent checks, mirroring how geo_utm was validated:
1. Snyder's published worked examples (USGS PP 1395, Clarke 1866): each
   family must reproduce the book's E/N to sub-meter.
2. forward→inverse round-trips across each registered CRS's domain.
"""

import numpy as np
import pytest

from iceberg_geospatial_api_server_spark.geo.projections import (
    CLARKE_1866,
    EPSG_PROJECTIONS,
    ProjParams,
    albers_forward,
    albers_inverse,
    laea_forward,
    laea_inverse,
    lcc_forward,
    lcc_inverse,
    projection_fn,
    projection_inverse_fn,
)

# (params, test lon/lat, expected E/N) — Snyder, Map Projections: A
# Working Manual, numerical examples for the ellipsoidal forms:
# LCC pp. 296-297, Albers pp. 292-293, LAEA pp. 334-335.
_SNYDER_CASES = [
    (
        "lcc2sp",
        ProjParams("lcc2sp", CLARKE_1866, lat0=23.0, lon0=-96.0,
                   lat1=33.0, lat2=45.0),
        (-75.0, 35.0),
        (1894410.9, 1564649.5),
    ),
    (
        "albers",
        ProjParams("albers", CLARKE_1866, lat0=23.0, lon0=-96.0,
                   lat1=29.5, lat2=45.5),
        (-75.0, 35.0),
        (1885472.7, 1535925.0),
    ),
    (
        "laea",
        ProjParams("laea", CLARKE_1866, lat0=40.0, lon0=-100.0),
        (-110.0, 30.0),
        (-965932.1, -1056814.9),
    ),
]

_FWD = {"lcc2sp": lcc_forward, "albers": albers_forward, "laea": laea_forward}
_INV = {"lcc2sp": lcc_inverse, "albers": albers_inverse, "laea": laea_inverse}


@pytest.mark.parametrize("kind,p,pt,expected", _SNYDER_CASES)
def test_snyder_worked_examples(kind, p, pt, expected):
    x, y = _FWD[kind](np.array([pt[0]]), np.array([pt[1]]), p)
    assert abs(x[0] - expected[0]) < 0.5
    assert abs(y[0] - expected[1]) < 0.5
    lon, lat = _INV[kind](x, y, p)
    assert abs(lon[0] - pt[0]) < 1e-9
    assert abs(lat[0] - pt[1]) < 1e-9


# representative in-domain lon/lat grids per registered code
_DOMAINS = {
    2263: (-75.5, -71.5, 40.0, 41.5),
    2229: (-121.0, -114.0, 32.5, 35.8),
    2154: (-5.0, 9.0, 41.0, 51.0),
    3034: (-10.0, 30.0, 35.0, 70.0),
    5070: (-124.0, -67.0, 24.0, 49.0),
    3577: (113.0, 154.0, -43.0, -10.0),
    3035: (-10.0, 30.0, 35.0, 70.0),
    3413: (-180.0, 180.0, 45.0, 89.9),
    3031: (-180.0, 180.0, -89.9, -55.0),
    3976: (-180.0, 180.0, -89.9, -55.0),
    32661: (-180.0, 180.0, 55.0, 89.9),
    32761: (-180.0, 180.0, -89.9, -55.0),
}


@pytest.mark.parametrize("wkid", sorted(EPSG_PROJECTIONS))
def test_registered_codes_round_trip(wkid):
    lo0, lo1, la0, la1 = _DOMAINS[wkid]
    lons, lats = np.meshgrid(
        np.linspace(lo0, lo1, 9), np.linspace(la0, la1, 9)
    )
    lons, lats = lons.ravel(), lats.ravel()
    fwd, inv = projection_fn(wkid), projection_inverse_fn(wkid)
    x, y = fwd(lons, lats)
    assert np.all(np.isfinite(x)) and np.all(np.isfinite(y))
    lon2, lat2 = inv(x, y)
    # longitudes compare modulo 360: ±180 name the same meridian (the
    # polar codes' domain legitimately spans the antimeridian)
    dlon = np.abs((lon2 - lons + 180.0) % 360.0 - 180.0)
    assert np.max(dlon) < 1e-8
    assert np.max(np.abs(lat2 - lats)) < 1e-8


def test_known_coordinates_sanity():
    """Spot real-world coordinates: NYC in 2263 (ftUS), Paris in
    Lambert-93, and the false origins of the European grids."""
    x, y = projection_fn(2263)(np.array([-74.006]), np.array([40.7128]))
    # City Hall-ish: ~(981,000 ftUS E, 199,000 ftUS N), generous box
    assert 950000 < x[0] < 1010000 and 180000 < y[0] < 220000
    x, y = projection_fn(2154)(np.array([2.3522]), np.array([48.8566]))
    assert 650000 < x[0] < 655000 and 6860000 < y[0] < 6864000
    # lat0/lon0 of 3035 maps exactly to the false origin
    x, y = projection_fn(3035)(np.array([10.0]), np.array([52.0]))
    assert abs(x[0] - 4321000.0) < 1e-6 and abs(y[0] - 3210000.0) < 1e-6


def test_reproject_fn_integration():
    """geo.functions.reproject_fn resolves registered conic codes and
    still rejects unknown ones."""
    from iceberg_geospatial_api_server_spark.geo.functions import (
        reproject_fn,
    )

    assert reproject_fn(2263) is not None
    assert reproject_fn(5070) is not None
    assert reproject_fn(999999) is None
    fn = reproject_fn(2154)
    x, y = fn(np.array([2.3522]), np.array([48.8566]))
    assert 650000 < x[0] < 655000


def test_st_reproject_wkb_conic(spark):
    """End-to-end: WKB points reproject through a registered conic code
    inside a Spark plan (the FeatureServer outSR path)."""
    from pyspark.sql import functions as F

    from iceberg_geospatial_api_server_spark.geo import wkb as W
    from iceberg_geospatial_api_server_spark.geo.functions import (
        st_reproject_wkb,
    )

    pts = [(1, W.encode_point(2.3522, 48.8566)),
           (2, W.encode_point(3.0, 46.5))]
    df = spark.createDataFrame(pts, ["id", "geometry"])
    out = df.select(
        "id", st_reproject_wkb(2154)(F.col("geometry")).alias("g")
    ).collect()
    got = {r["id"]: W.decode(bytes(r["g"]))[1] for r in out}
    assert 650000 < got[1][0] < 655000 and 6860000 < got[1][1] < 6864000
    # lat0/lon0 maps to the false origin (700000, 6600000)
    assert abs(got[2][0] - 700000.0) < 1e-6
    assert abs(got[2][1] - 6600000.0) < 1e-6


def test_nad83_etrs89_utm_wkid_families():
    """EPSG 269xx (NAD83) and 258xx (ETRS89) UTM codes resolve to the
    same Krüger kernel as their WGS84 twins (datum axes differ <0.1 mm);
    out-of-family codes still reject."""
    import numpy as np

    from iceberg_geospatial_api_server_spark.geo import wkb as W
    from iceberg_geospatial_api_server_spark.geo.functions import (
        reproject_fn,
    )

    assert W.utm_wkid_params(26918) == (18, True)   # NAD83 18N (NYC)
    assert W.utm_wkid_params(25832) == (32, True)   # ETRS89 32N (DE)
    assert W.utm_wkid_params(26900) is None
    assert W.utm_wkid_params(25827) is None
    a = reproject_fn(26918)(np.array([-74.0]), np.array([40.7]))
    b = reproject_fn(32618)(np.array([-74.0]), np.array([40.7]))
    assert abs(a[0][0] - b[0][0]) < 1e-9 and abs(a[1][0] - b[1][0]) < 1e-9
    # NYC in UTM 18N: ~(584km E, 4.506Mm N)
    assert 580000 < a[0][0] < 590000 and 4.49e6 < a[1][0] < 4.52e6


def test_staged_sql_exprs_match_numpy_kernels(spark):
    """The shared Spark/DuckDB expression texts (albers_sql_exprs /
    lcc_sql_exprs) must agree with the numpy kernels to sub-mm — two
    independent derivations of the same Snyder forward."""
    import pandas as pd

    from iceberg_geospatial_api_server_spark.geo.projections import (
        albers_sql_exprs,
        lcc_sql_exprs,
        projection_fn,
    )

    cases = [
        (5070, albers_sql_exprs(5070), [(-96.0, 38.0), (-120.0, 45.0),
                                        (-75.0, 30.0)]),
        (3034, lcc_sql_exprs(3034), [(10.0, 52.0), (-5.0, 40.0),
                                     (25.0, 60.0)]),
    ]
    for wkid, ex, pts in cases:
        df = spark.createDataFrame(pd.DataFrame(pts, columns=["x", "y"]))
        staged = (
            df.selectExpr("x", "y", f"{ex['sp']} AS sp")
            .selectExpr("x", "y", "sp",
                        *( [f"{ex['t']} AS t"] if "t" in ex else
                           [f"{ex['q']} AS q"] ))
            .selectExpr("x", "y", f"{ex['theta']} AS theta",
                        f"{ex['rho']} AS rho")
            .selectExpr(f"{ex['easting']} AS e", f"{ex['northing']} AS n")
            .collect()
        )
        fx, fy = projection_fn(wkid)(
            np.array([p[0] for p in pts]), np.array([p[1] for p in pts])
        )
        for row, ex_x, ex_y in zip(staged, fx, fy):
            assert abs(row["e"] - ex_x) < 1e-3
            assert abs(row["n"] - ex_y) < 1e-3


def test_polar_stereographic_scale_factors():
    """Independent correctness anchors for the PS kernels, no external
    library: (a) variant B is true-scale (k=1) at its standard parallel
    and (b) variant A's scale at the pole is exactly k0 — both checked
    numerically as (projected parallel arc) / (true parallel arc)."""
    import math

    from iceberg_geospatial_api_server_spark.geo.projections import (
        EPSG_PROJECTIONS,
        _ef,
        _m,
        projection_fn,
    )

    def parallel_scale(wkid, lat):
        p = EPSG_PROJECTIONS[wkid]
        a, e2, _ = _ef(p.ellipsoid)
        fwd = projection_fn(wkid)
        dlon = 1e-4
        x0, y0 = fwd(np.array([10.0]), np.array([lat]))
        x1, y1 = fwd(np.array([10.0 + dlon]), np.array([lat]))
        arc = math.hypot(float(x1[0] - x0[0]), float(y1[0] - y0[0])) * p.unit
        phi = math.radians(lat)
        true_arc = a * _m(math.sin(phi), math.cos(phi), e2) * math.radians(dlon)
        return arc / true_arc

    assert abs(parallel_scale(3413, 70.0) - 1.0) < 1e-9   # variant B north
    assert abs(parallel_scale(3031, -71.0) - 1.0) < 1e-9  # variant B south
    assert abs(parallel_scale(3976, -70.0) - 1.0) < 1e-9
    # variant A: k -> k0 approaching the pole
    assert abs(parallel_scale(32661, 89.999) - 0.994) < 1e-6
    assert abs(parallel_scale(32761, -89.999) - 0.994) < 1e-6
    # sanity: away from the standard parallel the scale grows
    assert parallel_scale(3413, 50.0) > 1.01


def test_polar_stereographic_spherical_limit():
    """With eccentricity -> 0 the ellipsoidal kernel must reduce to the
    exact closed-form spherical polar stereographic
    rho = 2·a·k0·tan(pi/4 − phi/2) (Snyder 21-1): a second, independent
    derivation of the same projection."""
    import math

    from iceberg_geospatial_api_server_spark.geo.projections import (
        ProjParams,
        ps_forward,
    )

    sphere = (6370000.0, 1e12)  # inverse flattening -> infinity: e ~ 0
    p = ProjParams("ps", sphere, lat0=90.0, lon0=0.0, k0=0.994)
    for lon, lat in [(0.0, 80.0), (45.0, 70.0), (-120.0, 60.0)]:
        x, y = ps_forward(np.array([lon]), np.array([lat]), p)
        rho_s = (
            2.0 * 6370000.0 * 0.994
            * math.tan(math.pi / 4.0 - math.radians(lat) / 2.0)
        )
        ex = rho_s * math.sin(math.radians(lon))
        ey = -rho_s * math.cos(math.radians(lon))
        assert abs(float(x[0]) - ex) < 1e-3
        assert abs(float(y[0]) - ey) < 1e-3


def test_polar_stereographic_known_geometry():
    """Structural anchors: the pole maps to (FE, FN); the central
    meridian maps onto the grid's N axis with the correct orientation
    (grid north points AWAY from the pole along lon0)."""
    from iceberg_geospatial_api_server_spark.geo.projections import (
        projection_fn,
    )

    # north: a point on lon0=-45 at lat 70 sits below the pole (negative N)
    x, y = projection_fn(3413)(np.array([-45.0, -45.0]), np.array([90.0, 70.0]))
    assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6
    assert abs(x[1]) < 1e-6 and y[1] < -2.0e6
    # south: a point on lon0=0 at lat -71 sits above the pole (positive N)
    x, y = projection_fn(3031)(np.array([0.0, 0.0]), np.array([-90.0, -71.0]))
    assert abs(x[0]) < 1e-6 and abs(y[0]) < 1e-6
    assert abs(x[1]) < 1e-6 and y[1] > 2.0e6
    # UPS north false origin
    x, y = projection_fn(32661)(np.array([0.0]), np.array([90.0]))
    assert abs(x[0] - 2000000.0) < 1e-6 and abs(y[0] - 2000000.0) < 1e-6


def test_ps_staged_sql_matches_numpy(spark):
    import pandas as pd

    from iceberg_geospatial_api_server_spark.geo.projections import (
        projection_fn,
        ps_sql_exprs,
    )

    for wkid, pts in [
        (3413, [(-45.0, 70.0), (100.0, 60.0), (-170.0, 85.0)]),
        (3031, [(0.0, -71.0), (120.0, -75.0), (-60.0, -88.0)]),
        (32661, [(44.0, 73.0), (0.0, 89.0)]),
    ]:
        ex = ps_sql_exprs(wkid)
        df = spark.createDataFrame(pd.DataFrame(pts, columns=["x", "y"]))
        staged = (
            df.selectExpr("x", "y", f"{ex['sp']} AS sp")
            .selectExpr("x", "y", f"{ex['t']} AS t")
            .selectExpr("x", f"{ex['theta']} AS theta", f"{ex['rho']} AS rho")
            .selectExpr(f"{ex['easting']} AS e", f"{ex['northing']} AS n")
            .collect()
        )
        fx, fy = projection_fn(wkid)(
            np.array([p[0] for p in pts]), np.array([p[1] for p in pts])
        )
        for row, ex_x, ex_y in zip(staged, fx, fy):
            assert abs(row["e"] - ex_x) < 1e-3
            assert abs(row["n"] - ex_y) < 1e-3


@pytest.mark.parametrize(
    "src,dst",
    [
        (3857, 2263),   # web mercator -> NY Long Island state plane (LCC)
        (2263, 3857),
        (32618, 2263),  # UTM 18N -> LCC (both cover NYC)
        (2263, 32618),
        (5070, 2154),   # Conus Albers -> Lambert-93 has no shared domain;
        (3035, 2154),   # EU LAEA -> Lambert-93 (both cover France)
        (2154, 3035),
        (3857, 3413),   # mercator -> NSIDC polar stereographic north
    ],
)
def test_pair_reproject_matches_direct(src, dst):
    """src→dst composed through the 4326 hub must equal projecting the
    original lon/lat directly into dst (sub-µm agreement — the inverse
    legs round-trip < 1e-9°)."""
    from iceberg_geospatial_api_server_spark.geo.functions import (
        pair_reproject_fn,
        reproject_fn,
    )

    if (src, dst) == (5070, 2154):
        pytest.skip("no shared domain")
    # sample points in the DESTINATION's (and source's) shared domain
    domains = {
        2263: (-74.3, 40.5, -72.8, 41.1),
        32618: (-75.0, 40.0, -73.0, 41.5),
        3857: (-179.0, -80.0, 179.0, 80.0),
        2154: (-4.0, 42.5, 7.5, 50.5),
        3035: (-8.0, 36.0, 25.0, 60.0),
        5070: (-120.0, 25.0, -75.0, 48.0),
        3413: (-179.0, 62.0, 179.0, 89.0),
    }
    boxes = [domains[k] for k in (src, dst) if k in domains]
    xmin = max(b[0] for b in boxes); ymin = max(b[1] for b in boxes)
    xmax = min(b[2] for b in boxes); ymax = min(b[3] for b in boxes)
    assert xmin < xmax and ymin < ymax, "bad test domain"
    rng = np.random.default_rng(42)
    lon = rng.uniform(xmin, xmax, 200)
    lat = rng.uniform(ymin, ymax, 200)

    sx, sy = reproject_fn(src)(lon, lat)
    px, py = pair_reproject_fn(src, dst)(sx, sy)
    dx, dy = reproject_fn(dst)(lon, lat)
    assert np.allclose(px, dx, atol=1e-5), np.abs(px - dx).max()
    assert np.allclose(py, dy, atol=1e-5), np.abs(py - dy).max()


def test_pair_reproject_identity_and_unsupported():
    from iceberg_geospatial_api_server_spark.geo.functions import (
        pair_reproject_fn,
    )

    same = pair_reproject_fn(2263, 2263)
    xs, ys = same(np.array([1.0]), np.array([2.0]))
    assert xs[0] == 1.0 and ys[0] == 2.0
    assert pair_reproject_fn(99999, 3857) is None
    assert pair_reproject_fn(3857, 99999) is None


def test_st_reproject_wkb_from_non_4326_layer(spark):
    """A layer stored in web mercator reprojects to a state-plane code
    through the WKB UDF pair path."""
    from pyspark.sql import functions as F

    from iceberg_geospatial_api_server_spark.geo import wkb as W
    from iceberg_geospatial_api_server_spark.geo.functions import (
        reproject_fn,
        st_reproject_wkb,
    )

    lon, lat = np.array([-73.9857]), np.array([40.7484])
    mx, my = reproject_fn(3857)(lon, lat)
    df = spark.createDataFrame(
        [(1, W.encode_point(float(mx[0]), float(my[0])))],
        "id long, geometry binary",
    )
    out = df.withColumn(
        "geometry", st_reproject_wkb(2263, src_wkid=3857)(F.col("geometry"))
    ).collect()
    code, (x, y) = W.decode(bytes(out[0]["geometry"]))
    ex, ey = reproject_fn(2263)(lon, lat)
    assert abs(x - ex[0]) < 1e-4 and abs(y - ey[0]) < 1e-4
