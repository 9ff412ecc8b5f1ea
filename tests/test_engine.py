"""Feature-query engine semantics (mirrors reference tests/test_query_engine.py):
OID stability, pagination, count/ids modes, sanitizer rejections."""

import pytest
from pyspark.sql import functions as F

from iceberg_geospatial_api_server_spark.engine import (
    query_features,
    sanitize_order,
    sanitize_where,
    with_oid,
)
from iceberg_geospatial_api_server_spark.models import QueryParams

OID_ORDER = [
    "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
    "l_quantity", "l_extendedprice", "l_shipdate",
]


@pytest.fixture(scope="module")
def li(tables):
    return tables["lineitem"]


def test_oid_stable_across_filters(li):
    """A feature's __oid must be identical regardless of the filter that
    returned it (ref engine.py:305-310 — critical for QGIS identify)."""
    all_ids = {
        (r.l_orderkey, r.l_linenumber, r.l_partkey, r.l_suppkey, r.l_quantity, r.l_extendedprice, r.l_shipdate): r["__oid"]
        for r in with_oid(li, OID_ORDER).collect()
    }
    res = query_features(
        li,
        QueryParams(where="l_quantity > 40.0", return_geometry=False, limit=None),
        oid_order=OID_ORDER,
    )
    for r in res.features.collect():
        assert all_ids[(r.l_orderkey, r.l_linenumber, r.l_partkey, r.l_suppkey, r.l_quantity, r.l_extendedprice, r.l_shipdate)] == r["__oid"]


def test_pagination_windows_disjoint_and_ordered(li):
    p1 = query_features(
        li,
        QueryParams(order_by="l_quantity DESC", limit=20, offset=0,
                    out_fields="l_orderkey,l_linenumber,l_quantity",
                    return_geometry=False),
        oid_order=OID_ORDER,
    )
    p2 = query_features(
        li,
        QueryParams(order_by="l_quantity DESC", limit=20, offset=20,
                    out_fields="l_orderkey,l_linenumber,l_quantity",
                    return_geometry=False),
        oid_order=OID_ORDER,
    )
    rows1 = p1.features.collect()
    rows2 = p2.features.collect()
    ids1 = {r["__oid"] for r in rows1}
    ids2 = {r["__oid"] for r in rows2}
    assert len(rows1) == len(rows2) == 20
    assert not ids1 & ids2
    assert p1.exceeded_transfer_limit
    # boundary respects the (l_quantity DESC, __oid) total order
    assert (rows1[-1].l_quantity, rows1[-1]["__oid"]) < (
        rows2[0].l_quantity,
        -rows2[0]["__oid"],
    ) or rows1[-1].l_quantity >= rows2[0].l_quantity


def test_count_and_ids_modes_agree(li):
    params = dict(where="l_returnflag = 'R'")
    n = query_features(
        li, QueryParams(**params, return_count_only=True), oid_order=OID_ORDER
    ).count
    ids = query_features(
        li, QueryParams(**params, return_ids_only=True), oid_order=OID_ORDER
    )
    assert ids.count == n == ids.features.count()


def test_object_ids_roundtrip(li):
    ids = [3, 7, 11]
    res = query_features(
        li,
        QueryParams(object_ids=ids, out_fields="l_orderkey", return_geometry=False),
        oid_order=OID_ORDER,
    )
    got = sorted(r["__oid"] for r in res.features.collect())
    assert got == ids


def test_exceeded_transfer_limit_false_when_exact(li):
    total = li.count()
    res = query_features(
        li,
        QueryParams(limit=total, return_geometry=False),
        oid_order=OID_ORDER,
    )
    assert not res.exceeded_transfer_limit


@pytest.mark.parametrize(
    "bad",
    [
        "1=1; DROP TABLE lineitem",
        "l_quantity > 5 -- comment",
        "l_quantity IN (SELECT 1)",
        "DELETE FROM x",
        "a /* b */ c",
        "java_method('java.lang.System','getenv','HOME') LIKE 'A%'",
        "reflect('java.lang.Thread','currentThread') IS NULL",
        "assert_true(l_quantity > 0)",
        "l_quantity = 1 OR raise_error('boom') IS NULL",
        'a = "b"',
        "a = `b`",
        # niladic builtins evaluate WITHOUT parens — must be denied as
        # bare identifiers too (service-account leak / nondeterminism)
        "name = current_user",
        "CURRENT_USER = 'root'",
        "ts < current_timestamp",
        "d = CURRENT_DATE",
        "u = session_user",
    ],
)
def test_where_sanitizer_rejects(bad):
    with pytest.raises(ValueError):
        sanitize_where(bad)


def test_where_sanitizer_accepts():
    assert sanitize_where("a > 5 AND b = 'x'") == "a > 5 AND b = 'x'"
    assert sanitize_where("") == "1=1"
    assert sanitize_where("UPPER(b) LIKE 'A%'")
    assert sanitize_where("CAST(a AS INT) BETWEEN 1 AND 9")
    assert sanitize_where("COALESCE(a, 0) <> 3 AND b IS NOT NULL")


def test_where_sanitizer_rejects_every_unapproved_function_call():
    """The security property: NO function identifier outside the
    allowlist may reach F.expr — Spark ships hundreds of builtins
    (java_method, reflect, ...) and new ones appear with every release,
    so the gate must be an allowlist, not a denylist."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from iceberg_geospatial_api_server_spark.engine import (
        _WHERE_FUNCS,
        _WHERE_KEYWORDS,
    )

    ident = st.from_regex(r"[a-zA-Z_][a-zA-Z0-9_]{0,20}", fullmatch=True)

    @settings(max_examples=300, deadline=None)
    @given(name=ident, arg=st.sampled_from(["a", "'x'", "1", "a, 1"]))
    def check(name, arg):
        up = name.upper()
        clause = f"{name}({arg}) = 1"
        if up in _WHERE_FUNCS or up in _WHERE_KEYWORDS:
            # allowlisted functions AND keywords pass: keywords precede
            # '(' in legitimate SQL (x IN (1,2), NOT (a=1), a=1 AND (b=2))
            # and none of them is a side-effecting callable
            sanitize_where(clause)
        else:
            with pytest.raises(ValueError):
                sanitize_where(clause)

    check()

    # the notorious concrete escapes stay rejected by name
    for fn in (
        "java_method", "reflect", "assert_true", "raise_error",
        "input_file_name", "current_user", "session_user", "uuid",
        "rand", "shuffle", "xpath_string", "sentences", "typeof",
        "spark_partition_id", "monotonically_increasing_id",
    ):
        with pytest.raises(ValueError):
            sanitize_where(f"{fn}() IS NULL")
        with pytest.raises(ValueError):
            sanitize_where(f"{fn.upper()}('a') = 'b'")


@pytest.mark.parametrize(
    "bad", ["col; DROP", "col EXEC", "col ASCENDING", "1col ASC", "a--"]
)
def test_order_sanitizer_rejects(bad):
    with pytest.raises(ValueError):
        sanitize_order(bad)


def test_with_oid_cache_keyed_by_ordering(spark):
    """Different order_cols on the same DataFrame object must produce
    independently-ranked OIDs, not replay the first ordering's cache."""
    import pandas as pd

    from iceberg_geospatial_api_server_spark.engine import with_oid

    df = spark.createDataFrame(
        pd.DataFrame({"a": [3, 1, 2], "b": [1, 2, 3]}), "a long, b long"
    )
    by_a = {r["a"]: r["__oid"] for r in with_oid(df, ["a"]).collect()}
    by_b = {r["a"]: r["__oid"] for r in with_oid(df, ["b"]).collect()}
    assert by_a == {1: 0, 2: 1, 3: 2}
    assert by_b == {3: 0, 1: 1, 2: 2}


def test_extent_only_all_null_geometry(spark):
    """Rows matching the filter with only NULL geometries → null extent,
    not a TypeError."""
    import pandas as pd

    from iceberg_geospatial_api_server_spark.engine import query_features
    from iceberg_geospatial_api_server_spark.models import QueryParams

    df = spark.createDataFrame(
        pd.DataFrame({"fid": [1, 2], "geometry": [None, None]}),
        "fid long, geometry binary",
    )
    res = query_features(df, QueryParams(return_extent_only=True))
    assert res.count == 2 and res.extent is None


def test_order_sanitizer_parses(spark):
    # spark fixture: sanitize_order builds Column objects (needs a session)
    cols = sanitize_order("a ASC, b DESC")
    assert len(cols) == 2


def test_out_fields_projection(li):
    res = query_features(
        li,
        QueryParams(out_fields="l_orderkey,l_quantity", return_geometry=False,
                    limit=5),
        oid_order=OID_ORDER,
    )
    assert res.features.columns == ["__oid", "l_orderkey", "l_quantity"]


def test_geometry_filter_exact_nonpoint(spark, tables):
    """Exact polygon-feature semantics: a rect wholly in the L-filter's
    bbox NOTCH must be excluded (bbox semantics would keep it), and
    spatial_rel contains/within work on polygon features."""
    import numpy as np

    from iceberg_geospatial_api_server_spark.geo import wkb as W
    from iceberg_geospatial_api_server_spark.engine import query_features
    from iceberg_geospatial_api_server_spark.models import QueryParams

    def rect(xmin, ymin, xmax, ymax):
        return W.encode_polygon([
            np.array([[xmin, ymin], [xmax, ymin], [xmax, ymax],
                      [xmin, ymax], [xmin, ymin]], dtype="f8")
        ])

    rows = [
        (1, rect(-50.0, -20.0, -40.0, -10.0)),   # inside the L arm
        (2, rect(10.0, 10.0, 20.0, 20.0)),       # inside the bbox NOTCH
        (3, rect(-5.0, -5.0, 5.0, 5.0)),         # straddles the reflex corner
        (4, rect(-62.0, -32.0, 42.0, 37.0)),     # covers the whole filter
        (5, rect(100.0, 50.0, 110.0, 60.0)),     # far away
    ]
    df = spark.createDataFrame(rows, "fid int, geometry binary")
    wkt = "POLYGON ((-60 -30, 40 -30, 40 0, 0 0, 0 35, -60 35, -60 -30))"

    def run(rel):
        res = query_features(
            df,
            QueryParams(geometry_filter=wkt, spatial_rel=rel,
                        out_fields="fid", return_geometry=False),
            geom_col="geometry",
            oid_order=["fid"],
        )
        return sorted(r.fid for r in res.features.select("fid").collect())

    assert run("intersects") == [1, 3, 4]  # 2 is the bbox false positive
    assert run("within") == [1]
    assert run("contains") == [4]

    with pytest.raises(ValueError):
        run("touches")


def test_geometry_filter_boundary_touching_intersects(spark):
    """Closed-set `intersects` (shapely semantics, ref query/engine.py
    shapely fallback): boundary contact counts — identical rectangles,
    shared-edge parcels, corner-touching rects, a point ON the boundary,
    and a line running ALONG an edge all intersect; `within`/`contains`
    keep interior semantics (boundary contact alone doesn't violate
    containment, proper crossings still do)."""
    import numpy as np

    from iceberg_geospatial_api_server_spark.engine import query_features
    from iceberg_geospatial_api_server_spark.geo import wkb as W
    from iceberg_geospatial_api_server_spark.models import QueryParams

    def rect(xmin, ymin, xmax, ymax):
        return W.encode_polygon([
            np.array([[xmin, ymin], [xmax, ymin], [xmax, ymax],
                      [xmin, ymax], [xmin, ymin]], dtype="f8")
        ])

    rows = [
        (1, rect(0.0, 0.0, 10.0, 10.0)),      # identical to the filter
        (2, rect(10.0, 0.0, 20.0, 10.0)),     # shares the x=10 edge
        (3, rect(10.0, 10.0, 20.0, 20.0)),    # touches only corner (10,10)
        (4, W.encode_point(10.0, 5.0)),       # point ON the boundary
        (5, W.encode_linestring(
            np.array([[0.0, 10.0], [10.0, 10.0]], dtype="f8"))),
        #   line collinear with the top edge
        (6, rect(10.000001, 0.0, 20.0, 10.0)),  # just OFF the edge
        (7, W.encode_point(5.0, 5.0)),          # interior point (control)
    ]
    df = spark.createDataFrame(rows, "fid int, geometry binary")
    wkt = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"

    def run(rel):
        res = query_features(
            df,
            QueryParams(geometry_filter=wkt, spatial_rel=rel,
                        out_fields="fid", return_geometry=False),
            geom_col="geometry",
            oid_order=["fid"],
        )
        return sorted(r.fid for r in res.features.select("fid").collect())

    assert run("intersects") == [1, 2, 3, 4, 5, 7]
    # within: interior containment — the identical rect crosses no edge
    # and the interior point qualifies; edge-sharers' far halves are out
    got_within = run("within")
    assert 7 in got_within and 2 not in got_within and 6 not in got_within
