"""FsCatalog discovery + namespace-level metadata (mirrors the reference's
/api/namespaces, /api/namespaces/tree, /api/bbox/{namespace} endpoints —
ref api/main.py:151-263)."""

import numpy as np
import pytest
from pyspark.sql import types as T

from iceberg_geospatial_api_server_spark.catalog import FsCatalog
from iceberg_geospatial_api_server_spark.geo import wkb as W


@pytest.fixture(scope="module")
def lake(spark, tmp_path_factory):
    """Tiny lakehouse tree: ns 'colorado' with a geometry table and a
    plain table, nested ns 'colorado.water' with another geometry table."""
    root = tmp_path_factory.mktemp("lake")
    schema = T.StructType(
        [T.StructField("fid", T.LongType()), T.StructField("geometry", T.BinaryType())]
    )

    def geom_df(coords):
        rows = [
            (i, bytearray(W.encode_point(float(x), float(y))))
            for i, (x, y) in enumerate(coords)
        ]
        return spark.createDataFrame(rows, schema)

    geom_df([(0, 0), (10, 5)]).write.parquet(str(root / "colorado" / "sites"))
    geom_df([(-5, 2), (3, 20)]).write.parquet(
        str(root / "colorado" / "water" / "gauges")
    )
    spark.createDataFrame([(1, "a")], "id LONG, name STRING").write.parquet(
        str(root / "colorado" / "plain")
    )
    return FsCatalog(spark, str(root))


def test_namespace_discovery_and_tree(lake):
    assert lake.list_namespaces() == ["colorado", "colorado.water"]
    assert lake.namespaces_tree() == [["colorado"], ["colorado", "water"]]
    assert lake.list_tables("colorado") == ["plain", "sites"]
    assert lake.list_tables("colorado.water") == ["gauges"]


def test_namespace_extent_aggregates_geometry_tables(lake):
    ext = lake.namespace_extent("colorado")
    assert ext is not None
    assert ext["bbox"] == [0.0, 0.0, 10.0, 5.0]
    nested = lake.namespace_extent("colorado.water")
    assert nested["bbox"] == [-5.0, 2.0, 3.0, 20.0]


def test_namespace_extent_none_without_geometry(lake, tmp_path_factory):
    empty_root = tmp_path_factory.mktemp("empty_lake")
    cat = FsCatalog(lake.spark, str(empty_root))
    assert cat.namespace_extent("") is None


def test_mcp_sql_surface_reproduces_pip_cookbook(spark, sf_dir):
    """The MCP-analog surface end-to-end (SURVEY §4 last row): the
    reference exposes its lakehouse to agents as raw SQL over attached
    tables (mcp/duckdb-mcp-init.sql); here that surface is
    ``register_all`` + ``spark.sql``. A cookbook §2.6 PIP join written as
    PLAIN SQL over the registered views must reproduce the DataFrame-API
    operator row-for-row."""
    from pyspark.sql import functions as F

    from iceberg_geospatial_api_server_spark.geo.functions import (
        point_in_polygon_join,
    )
    from iceberg_geospatial_api_server_spark.sources.synthetic import (
        lineitem_points,
        nation_rect_polygons,
    )
    from iceberg_geospatial_api_server_spark.sources.tables import load_table

    registered = FsCatalog(spark, sf_dir).register_all()
    assert {"lineitem", "nation"} <= set(registered)

    sql_rows = spark.sql(
        """
        SELECT n.n_name,
               COUNT(*) AS n_points,
               ROUND(SUM(p.l_quantity), 2) AS sum_qty
        FROM (SELECT l_quantity,
                     (l_partkey * 131 % 3600) / 10.0 - 180.0 AS x,
                     (l_suppkey * 241 % 1700) / 10.0 - 85.0 AS y
              FROM lineitem) p
        JOIN (SELECT n_name,
                     (n_nationkey % 5) * 72.0 - 180.0 + 0.05 AS xmin,
                     (n_nationkey % 5) * 72.0 - 180.0 + 59.95 AS xmax,
                     ((n_nationkey - n_nationkey % 5) / 5.0) * 34.0 - 85.0 + 0.05 AS ymin,
                     ((n_nationkey - n_nationkey % 5) / 5.0) * 34.0 - 85.0 + 29.95 AS ymax
              FROM nation) n
          ON p.x > n.xmin AND p.x < n.xmax AND p.y > n.ymin AND p.y < n.ymax
        GROUP BY n.n_name
        ORDER BY n.n_name
        """
    ).collect()

    pts = lineitem_points(load_table(spark, sf_dir, "lineitem"))
    polys = nation_rect_polygons(load_table(spark, sf_dir, "nation")).select(
        "n_nationkey", "n_name", "geometry"
    )
    df_rows = (
        point_in_polygon_join(pts, polys, "x", "y", "geometry", res=30.0)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .orderBy("n_name")
        .collect()
    )
    assert [tuple(r) for r in sql_rows] == [tuple(r) for r in df_rows]
    assert len(sql_rows) > 0, "vacuous match — no polygons hit"


def test_scratch_namespace_lifecycle(spark, tmp_path_factory):
    """Agent scratch-namespace lifecycle (ref api/main.py:967-981): a
    session materializes a result into its `_scratch_{id}` namespace,
    the layer is discoverable + notifiable like any other, and dropping
    the scratch removes everything (idempotently); non-scratch paths are
    refused."""
    from iceberg_geospatial_api_server_spark.geo import wkb as W
    from iceberg_geospatial_api_server_spark.streaming.notifications import (
        LayerNotifier,
        notify_layer_ready,
    )

    root = tmp_path_factory.mktemp("scratch_lake")
    cat = FsCatalog(spark, str(root))
    session = "3fa9c1d2-aaaa-bbbb-cccc-121212121212"
    ns = cat.create_scratch(session)
    assert ns == "_scratch_3fa9c1d2"
    assert cat.create_scratch(session) == ns  # idempotent

    rows = [(1, bytearray(W.encode_point(2.0, 3.0)))]
    spark.createDataFrame(rows, "fid long, geometry binary").write.parquet(
        str(root / ns / "result")
    )
    assert cat.list_tables(ns) == ["result"]

    notifier = LayerNotifier()
    got = []
    notifier.subscribe(session, got.append)
    ev = notify_layer_ready(cat, ns, "result", notifier, session)
    assert got == [ev] and ev.bbox == [2.0, 3.0, 2.0, 3.0]

    cat.drop_scratch(session)
    assert cat.list_tables(ns) == []
    cat.drop_scratch(session)  # no-op on missing namespace

    with pytest.raises(ValueError):
        cat.drop_scratch("../../etc")
