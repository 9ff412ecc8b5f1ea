"""Viewport clipping kernels (geo/clip.py): Sutherland–Hodgman ring clip
on crafted triangles/concave shapes/holes, Liang–Barsky polyline clip,
and the WKB-level dispatcher."""

import numpy as np

from iceberg_geospatial_api_server_spark.geo import wkb as W
from iceberg_geospatial_api_server_spark.geo.clip import (
    clip_polyline,
    clip_ring,
    clip_wkb,
)

BOX = (0.0, 0.0, 10.0, 10.0)


def _ring_area(ring):
    xs, ys = ring[:-1, 0], ring[:-1, 1]
    xn, yn = np.roll(xs, -1), np.roll(ys, -1)
    return abs(float(np.sum(xs * yn - xn * ys))) / 2.0


def test_triangle_corner_cut():
    """A triangle poking out of one side: the clip must cut off the apex
    and the clipped area equals the closed-form trapezoid."""
    tri = np.array([[2.0, 2.0], [8.0, 2.0], [5.0, 14.0]])
    out = clip_ring(tri, BOX)
    assert len(out) >= 4
    assert out[:, 1].max() == 10.0
    # area above y=10 removed: similar triangle scaled by (4/12)^2
    full = _ring_area(np.vstack([tri, tri[:1]]))
    removed = full * (4.0 / 12.0) ** 2
    assert abs(_ring_area(out) - (full - removed)) < 1e-9


def test_fully_inside_and_outside():
    inside = np.array([[1.0, 1.0], [3.0, 1.0], [2.0, 3.0]])
    out = clip_ring(inside, BOX)
    assert _ring_area(out) == _ring_area(np.vstack([inside, inside[:1]]))
    outside = inside + 100.0
    assert len(clip_ring(outside, BOX)) == 0


def test_concave_polygon_splits_logically():
    """A U-shape straddling the top edge: SH yields one connected ring
    with bridge edges along the clip line (the documented SH behavior);
    the AREA must still equal the sum of the two prongs' parts."""
    u = np.array(
        [
            [2.0, 5.0],
            [4.0, 5.0],
            [4.0, 12.0],
            [6.0, 12.0],
            [6.0, 5.0],
            [8.0, 5.0],
            [8.0, 15.0],
            [2.0, 15.0],
        ]
    )
    out = clip_ring(u, BOX)
    # parts inside the box: two 2x5 prongs (x 2-4 and 6-8, y 5-10)
    assert abs(_ring_area(out) - 20.0) < 1e-9


def test_degenerate_touch_returns_empty():
    touch = np.array([[10.0, 2.0], [14.0, 2.0], [14.0, 6.0], [10.0, 6.0]])
    assert len(clip_ring(touch, BOX)) == 0


def test_polyline_exits_and_reenters():
    line = np.array([[-5.0, 5.0], [5.0, 5.0], [15.0, 5.0], [15.0, 2.0], [5.0, 2.0]])
    parts = clip_polyline(line, BOX)
    assert len(parts) == 2
    a, b = parts
    assert a[0].tolist() == [0.0, 5.0] and a[-1].tolist() == [10.0, 5.0]
    assert b[0].tolist() == [10.0, 2.0] and b[-1].tolist() == [5.0, 2.0]


def test_polyline_fully_outside():
    line = np.array([[20.0, 20.0], [30.0, 30.0]])
    assert clip_polyline(line, BOX) == []


def test_clip_wkb_polygon_with_hole():
    outer = np.array([[2.0, 2.0], [14.0, 2.0], [14.0, 8.0], [2.0, 8.0], [2.0, 2.0]])
    hole = np.array([[4.0, 4.0], [12.0, 4.0], [12.0, 6.0], [4.0, 6.0], [4.0, 4.0]])
    buf = W.encode_polygon([outer, hole])
    out = clip_wkb(buf, BOX)
    assert out is not None
    # outer clipped to 8x6=48, hole clipped to 6x2=12 → 36
    assert abs(W.area(out) - 36.0) < 1e-9


def test_clip_wkb_point_and_multipoint():
    assert clip_wkb(W.encode_point(5.0, 5.0), BOX) is not None
    assert clip_wkb(W.encode_point(15.0, 5.0), BOX) is None
    mp = W.encode_multipoint(np.array([[1.0, 1.0], [11.0, 1.0], [2.0, 2.0]]))
    out = clip_wkb(mp, BOX)
    code, pts = W.decode(out)
    assert len(pts) == 2


def test_clip_wkb_line_to_multiline():
    line = W.encode_linestring(
        np.array([[-5.0, 5.0], [5.0, 5.0], [15.0, 5.0], [15.0, 2.0], [5.0, 2.0]])
    )
    out = clip_wkb(line, BOX)
    assert W.geometry_type_code(out) == 5  # multilinestring


def test_fast_rect_path_agrees_with_general_kernel(spark):
    """clip_features' vectorized axis-rect path must agree with the
    per-row SH kernel: same kept set, same bounds doubles, area within
    one ulp."""
    import pandas as pd
    from pyspark.sql import functions as F

    from iceberg_geospatial_api_server_spark.geo.clip import (
        clip_features,
        clip_wkb,
    )

    rng = np.random.default_rng(5)
    rects = []
    for _ in range(200):
        x0, y0 = rng.uniform(-20, 25, 2)
        rects.append((x0, y0, x0 + rng.uniform(0.5, 8), y0 + rng.uniform(0.5, 8)))
    bufs = W.rects_to_wkb_np(
        np.array([r[0] for r in rects]),
        np.array([r[1] for r in rects]),
        np.array([r[2] for r in rects]),
        np.array([r[3] for r in rects]),
    )
    df = spark.createDataFrame(
        pd.DataFrame({"fid": range(len(bufs)), "geometry": bufs})
    )
    out = {
        r.fid: r
        for r in clip_features(df, BOX).select(
            "fid", "clip_area", "clip_xmin", "clip_ymin", "clip_xmax", "clip_ymax"
        ).collect()
    }
    for fid, buf in enumerate(bufs):
        ref = clip_wkb(buf, BOX)
        if ref is None:
            assert fid not in out
            continue
        bx = W.bbox(ref)
        r = out[fid]
        assert (r.clip_xmin, r.clip_ymin, r.clip_xmax, r.clip_ymax) == bx
        assert abs(r.clip_area - W.area(ref)) < 1e-9


def test_polyline_single_point_graze_emits_nothing():
    """A segment grazing the bbox at exactly one point (t0 == t1) must
    not produce a zero-length 2-point sub-path (ADVICE r4)."""
    # segment from outside to outside through the corner (10, 10)
    path = np.array([[8.0, 12.0], [12.0, 8.0]])
    assert clip_polyline(path, BOX) == []
    # and a graze mid-path must not fuse the surrounding sub-paths
    path2 = np.array(
        [[2.0, 2.0], [5.0, 2.0],   # inside run 1
         [5.0, 20.0],              # exits upward
         [8.0, 12.0], [12.0, 8.0], # grazing segment at (10, 10)
         [6.0, -20.0],             # still outside
         [6.0, 5.0], [7.0, 5.0]]   # inside run 2
    )
    parts = clip_polyline(path2, BOX)
    for p in parts:
        assert len(p) >= 2
        assert not np.array_equal(p[0], p[-1]) or len(p) > 2


def test_fast_rect_path_rejects_bowtie(spark):
    """A closed all-axis-parallel but NON-alternating ring (h,h,v,v
    'bowtie', true area 0) must not take the rect fast path as its
    bounding box; the general kernel drops it via shoelace == 0
    (ADVICE r4)."""
    import pandas as pd

    from iceberg_geospatial_api_server_spark.geo.clip import (
        _clip_axis_rects_np,
        clip_features,
    )

    bowtie = W.encode_polygon(
        [np.array([[0.0, 0.0], [5.0, 0.0], [0.0, 0.0], [0.0, 5.0], [0.0, 0.0]])]
    )
    rect = W.rects_to_wkb_np(
        np.array([1.0]), np.array([1.0]), np.array([4.0]), np.array([4.0])
    )[0]
    # batch containing the bowtie: fast path must decline entirely
    assert _clip_axis_rects_np(pd.Series([bowtie, rect]), BOX) is None
    df = spark.createDataFrame(
        pd.DataFrame({"fid": [0, 1], "geometry": [bowtie, rect]})
    )
    out = clip_features(df, BOX).select("fid").collect()
    assert [r.fid for r in out] == [1]  # bowtie dropped, rect kept
