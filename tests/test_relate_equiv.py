"""Equivalence of the vectorized batch relate kernels vs the per-row
scalar path on random geometry."""
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_geospatial_api_server_spark.geo import wkb as W
from iceberg_geospatial_api_server_spark.geo.functions import (
    _decode_uniform_points,
    _decode_uniform_single_ring_polygons,
    _geom_parts,
    _intersects_const_rings_batch,
    _relate_exact,
)

FILTER_WKB = W.from_wkt(
    "POLYGON ((-6 -3, 4 -3, 4 0, 0 0, 0 3.5, -6 3.5, -6 -3))"
)
FCODE, FPAYLOAD = W.decode(FILTER_WKB)
FPOLYS = [FPAYLOAD]
FVERTS = np.vstack([r for rings in FPOLYS for r in rings])

coord = st.floats(min_value=-8.0, max_value=8.0, allow_nan=False,
                  allow_infinity=False)


@st.composite
def ring5(draw):
    """A closed 5-point ring (possibly self-intersecting / degenerate —
    the kernels must agree on whatever semantics the scalar code has)."""
    pts = [(draw(coord), draw(coord)) for _ in range(4)]
    return pts + [pts[0]]


@given(st.lists(ring5(), min_size=1, max_size=12))
@settings(max_examples=60, deadline=None)
def test_batch_polygon_intersects_equals_scalar(rings):
    bufs = [W.encode_polygon([np.array(r, dtype="f8")]) for r in rings]
    batch = _decode_uniform_single_ring_polygons(bufs)
    assert batch is not None and batch.shape == (len(rings), 5, 2)
    got = _intersects_const_rings_batch(batch, FPOLYS, FVERTS)
    for i, buf in enumerate(bufs):
        kind, paths, polys = _geom_parts(bytes(buf))
        want = _relate_exact(kind, paths, polys, FPOLYS, FVERTS,
                             "intersects")
        assert bool(got[i]) == want, (i, rings[i])


@given(st.lists(st.tuples(coord, coord), min_size=1, max_size=40))
@settings(max_examples=40, deadline=None)
def test_batch_point_decode_and_semantics(pts):
    bufs = [W.encode_point(x, y) for x, y in pts]
    dec = _decode_uniform_points(bufs)
    assert dec is not None
    np.testing.assert_array_equal(dec, np.array(pts, dtype="f8"))
    # batch point intersects == scalar _relate_exact
    from iceberg_geospatial_api_server_spark.geo.functions import (
        _cross,
        _on_segment,
        _rings_contain,
    )

    inside = _rings_contain(FPOLYS, dec[:, 0], dec[:, 1])
    on_edge = np.zeros(len(pts), dtype=bool)
    q = dec[:, None, :]
    for rr in FPOLYS:
        for ring in rr:
            p1 = ring[:-1][None, :, :]
            p2 = ring[1:][None, :, :]
            d = _cross(p2 - p1, q - p1)
            on_edge |= _on_segment(p1, p2, q, d).any(axis=1)
    got = inside | on_edge
    for i, buf in enumerate(bufs):
        kind, paths, polys = _geom_parts(bytes(buf))
        want = _relate_exact(kind, paths, polys, FPOLYS, FVERTS,
                             "intersects")
        assert bool(got[i]) == want, (i, pts[i])


def test_mixed_batch_falls_back():
    """Non-uniform batches must decline the fast path (None), leaving
    the scalar loop to handle them."""
    bufs = [W.encode_point(0.0, 0.0),
            W.encode_polygon([np.array([(0, 0), (1, 0), (1, 1), (0, 1),
                                        (0, 0)], dtype="f8")])]
    assert _decode_uniform_points(bufs) is None
    assert _decode_uniform_single_ring_polygons(bufs) is None
    assert _decode_uniform_single_ring_polygons([None]) is None
    assert _decode_uniform_points([None]) is None
