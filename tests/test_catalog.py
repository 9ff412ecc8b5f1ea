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
