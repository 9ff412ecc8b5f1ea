"""Web-map binning kernels (geo/tiles.py): XYZ tile assignment vs the
reference OSM formula, polar clamping, hex binning's nearest-center
property and cube-coordinate invariant, and plan shape (map-side
assignment, one exchange)."""

import math

import pytest
from pyspark.sql import functions as F

from iceberg_geospatial_api_server_spark.geo.tiles import (
    hex_aggregate,
    hex_bin,
    tile_aggregate,
    tile_cols,
)
from iceberg_geospatial_api_server_spark.plans.explain import (
    hash_exchange_count,
)


def _deg2num(lon: float, lat: float, zoom: int) -> tuple[int, int]:
    """The published OSM slippy-map reference formula (pure Python)."""
    n = 2.0**zoom
    xt = int(math.floor((lon + 180.0) / 360.0 * n))
    lat_rad = math.radians(lat)
    yt = int(
        math.floor(
            (1.0 - math.log(math.tan(lat_rad) + 1.0 / math.cos(lat_rad)) / math.pi)
            / 2.0
            * n
        )
    )
    return max(0, min(int(n) - 1, xt)), max(0, min(int(n) - 1, yt))


@pytest.fixture(scope="module")
def coord_grid(spark):
    pts = [
        (float(lon), float(lat))
        for lon in range(-180, 180, 23)
        for lat in range(-84, 85, 17)
    ] + [(0.0, 0.0), (-180.0, -84.9), (179.9, 84.9)]
    return spark.createDataFrame(pts, "x double, y double")


@pytest.mark.parametrize("zoom", [0, 1, 4, 9])
def test_tile_assignment_matches_osm_reference(coord_grid, zoom):
    tx, ty = tile_cols("x", "y", zoom)
    got = coord_grid.select("x", "y", tx.alias("tx"), ty.alias("ty")).collect()
    for r in got:
        assert (r.tx, r.ty) == _deg2num(r.x, r.y, zoom), (r.x, r.y, zoom)


def test_tile_origin_and_bounds(spark):
    """(0,0) at z=1 sits in the southeast quadrant tile (1,1); extreme
    latitudes clamp to the edge row instead of running off the grid."""
    df = spark.createDataFrame(
        [(0.0, 0.0), (10.0, 84.99), (10.0, -84.99)], "x double, y double"
    )
    tx, ty = tile_cols("x", "y", 1)
    rows = df.select(tx.alias("tx"), ty.alias("ty")).collect()
    assert (rows[0].tx, rows[0].ty) == (1, 1)
    assert {r.ty for r in rows} <= {0, 1}


def test_tile_aggregate_counts(coord_grid):
    out = tile_aggregate(coord_grid, "x", "y", 2)
    total = out.agg(F.sum("n")).collect()[0][0]
    assert total == coord_grid.count()
    rows = out.collect()
    assert all(0 <= r.tile_x < 4 and 0 <= r.tile_y < 4 for r in rows)


def _hex_center(q: int, r: int, size: float) -> tuple[float, float]:
    return (size * math.sqrt(3.0) * (q + r / 2.0), size * 1.5 * r)


def test_hex_bin_assigns_nearest_center(coord_grid):
    """Cube rounding must pick the hexagon whose center is nearest (the
    defining property of hex binning): check the assigned center against
    the 7-cell neighborhood for every grid point."""
    size = 20.0
    rows = hex_bin(coord_grid, "x", "y", size).collect()
    for row in rows:
        d_assigned = math.hypot(row.x - row.hex_cx, row.y - row.hex_cy)
        for dq, dr in [(0, 0), (1, 0), (-1, 0), (0, 1), (0, -1), (1, -1), (-1, 1)]:
            cx, cy = _hex_center(row.hex_q + dq, row.hex_r + dr, size)
            d_other = math.hypot(row.x - cx, row.y - cy)
            assert d_assigned <= d_other + 1e-9, (row.x, row.y)


def test_hex_centers_consistent_with_ids(coord_grid):
    size = 7.5
    for row in hex_bin(coord_grid, "x", "y", size).collect():
        cx, cy = _hex_center(row.hex_q, row.hex_r, size)
        assert abs(cx - row.hex_cx) < 1e-9 and abs(cy - row.hex_cy) < 1e-9


def test_binning_is_map_side_single_exchange(coord_grid):
    """Both aggregations: bin assignment is pure projection arithmetic
    (no UDF), and the whole query carries exactly ONE hash exchange."""
    for out in (
        tile_aggregate(coord_grid, "x", "y", 5),
        hex_aggregate(coord_grid, "x", "y", 3.0),
    ):
        from iceberg_geospatial_api_server_spark.plans.explain import (
            formatted_plan,
        )

        plan = formatted_plan(out)
        assert hash_exchange_count(plan) == 1, plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_tile_pyramid_rollup_equals_direct(coord_grid):
    """Every pyramid level must equal direct binning at that zoom, and
    per-level totals conserve the corpus."""
    from iceberg_geospatial_api_server_spark.geo.tiles import tile_pyramid

    total = coord_grid.count()
    pyr = tile_pyramid(coord_grid, "x", "y", zmax=5, zmin=0)
    rows = pyr.collect()
    by_zoom = {}
    for r in rows:
        by_zoom.setdefault(r.zoom, {})[(r.tile_x, r.tile_y)] = r.n
    assert set(by_zoom) == set(range(6))
    for z in range(6):
        assert sum(by_zoom[z].values()) == total, z
        direct = {
            (r.tile_x, r.tile_y): r.n
            for r in tile_aggregate(coord_grid, "x", "y", z).collect()
        }
        assert by_zoom[z] == direct, z
    # parent-child integrity: each parent's count = sum of its children
    for z in range(1, 6):
        for (px, py), n in by_zoom[z - 1].items():
            kids = sum(
                v
                for (cx, cy), v in by_zoom[z].items()
                if cx // 2 == px and cy // 2 == py
            )
            assert kids == n


def test_heatmap_grid_kernel_shape(spark):
    """One point at a cell center: the own-cell weight is the quantized
    kernel peak; the 4-neighbors share one ring value; total splats =
    (2·reach+1)²."""
    import math

    from iceberg_geospatial_api_server_spark.geo.tiles import heatmap_grid

    df = spark.createDataFrame([(5.0, 5.0)], "x double, y double")
    rows = {
        (r.gx, r.gy): r.heat
        for r in heatmap_grid(df, "x", "y", cell=10.0, sigma_cells=1.0, reach=2).collect()
    }
    assert rows[(0, 0)] == int(math.exp(0.0) * 1e6)
    ring = int(math.floor(math.exp(-0.5) * 1e6))
    for c in [(1, 0), (-1, 0), (0, 1), (0, -1)]:
        assert rows[c] == ring
    diag = int(math.floor(math.exp(-1.0) * 1e6))
    assert rows[(1, 1)] == diag
    from pyspark.sql import functions as F

    out = heatmap_grid(df, "x", "y", cell=10.0, sigma_cells=1.0, reach=2)
    assert out.agg(F.sum("n_splats")).collect()[0][0] == 25


def test_heatmap_additivity(spark):
    """Two points: every cell's heat is the sum of the single-point
    splats (integer quantization before summation makes this exact)."""
    from iceberg_geospatial_api_server_spark.geo.tiles import heatmap_grid

    one = spark.createDataFrame([(5.0, 5.0)], "x double, y double")
    two = spark.createDataFrame([(17.0, 3.0)], "x double, y double")
    both = spark.createDataFrame([(5.0, 5.0), (17.0, 3.0)], "x double, y double")
    h1 = {(r.gx, r.gy): r.heat for r in heatmap_grid(one, "x", "y", 10.0).collect()}
    h2 = {(r.gx, r.gy): r.heat for r in heatmap_grid(two, "x", "y", 10.0).collect()}
    hb = {(r.gx, r.gy): r.heat for r in heatmap_grid(both, "x", "y", 10.0).collect()}
    for cell in set(h1) | set(h2):
        assert hb.get(cell, 0) == h1.get(cell, 0) + h2.get(cell, 0)


def test_hotspot_gi_star_reference(spark):
    """Crafted grid: one hot 3×3 block inside a uniform field; z must
    match the textbook Gi* formula computed in pure Python, and the hot
    center must dominate."""
    import math

    from iceberg_geospatial_api_server_spark.geo.tiles import hotspot_gi_star

    pts = []
    # uniform field: 1 point per cell over a 9x9 grid (cells 0..8)
    for cx in range(9):
        for cy in range(9):
            pts.append((cx + 0.5, cy + 0.5))
    # hot block: +8 extra points in the centre cell (4,4)
    pts += [(4.5, 4.5)] * 8
    df = spark.createDataFrame([(float(x), float(y)) for x, y in pts], "x double, y double")
    rows = {(r.gx, r.gy): r for r in hotspot_gi_star(df, "x", "y", 1.0).collect()}
    cells = {(cx, cy): 1 for cx in range(9) for cy in range(9)}
    cells[(4, 4)] += 8
    n = len(cells)
    sx = sum(cells.values())
    sxx = sum(v * v for v in cells.values())
    xbar = sx / n
    s = math.sqrt(sxx / n - xbar * xbar)

    def ref_z(cx, cy):
        nbrs = [
            (cx + dx, cy + dy)
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            if (cx + dx, cy + dy) in cells
        ]
        wx = sum(cells[c] for c in nbrs)
        w = len(nbrs)
        return (wx - xbar * w) / (s * math.sqrt((n * w - w * w) / (n - 1)))

    for c in [(4, 4), (0, 0), (8, 8), (4, 5)]:
        assert abs(rows[c].gi_z - round(ref_z(*c), 6)) < 2e-6, c
    zmax = max(r.gi_z for r in rows.values())
    assert rows[(4, 4)].gi_z == zmax and zmax > 2.0
    # far-from-hotspot uniform cells sit below zero (their neighborhoods
    # are below the inflated global mean)
    assert rows[(0, 0)].gi_z < 0


def test_moran_i_checkerboard_negative(spark):
    """Checkerboard weights (alternating dense/sparse cells) →
    strongly NEGATIVE spatial autocorrelation; a smooth gradient →
    positive. Values cross-checked against a pure-Python Moran's I."""
    from iceberg_geospatial_api_server_spark.geo.tiles import moran_i

    def build(counts):
        rows = []
        for (cx, cy), n in counts.items():
            rows += [(cx + 0.5, cy + 0.5)] * n
        return spark.createDataFrame(rows, "x double, y double")

    def ref_moran(counts):
        cells = list(counts)
        n = len(cells)
        xbar = sum(counts.values()) / n
        num = 0.0
        wsum = 0
        for cx, cy in cells:
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    if dx == dy == 0:
                        continue
                    j = (cx + dx, cy + dy)
                    if j in counts:
                        num += (counts[(cx, cy)] - xbar) * (counts[j] - xbar)
                        wsum += 1
        den = sum((v - xbar) ** 2 for v in counts.values())
        return (n / wsum) * (num / den)

    checker = {
        (cx, cy): 9 if (cx + cy) % 2 == 0 else 1
        for cx in range(6)
        for cy in range(6)
    }
    grad = {(cx, cy): 1 + cx * 3 for cx in range(6) for cy in range(6)}
    got_c = moran_i(build(checker), "x", "y", 1.0).collect()[0]
    got_g = moran_i(build(grad), "x", "y", 1.0).collect()[0]
    # queen weights include the 4 SAME-colored diagonals, so the
    # checkerboard is only mildly negative — the exact reference
    # equality is the real assertion
    assert got_c.i_moran < 0 < got_g.i_moran
    assert got_g.i_moran > 0.4
    assert abs(got_c.i_moran - round(ref_moran(checker), 6)) < 2e-6
    assert abs(got_g.i_moran - round(ref_moran(grad), 6)) < 2e-6
    assert got_g.z_i > 3
