"""Serializer round-trips: GeoJSON, Esri JSON, Esri PBF wire format,
GeoArrow IPC (mirrors reference test_esri_pbf_encoder / test_geoarrow_formatter)."""

import json

import pyarrow as pa
import pyarrow.ipc as ipc
import pytest
from pyspark.sql import functions as F

from iceberg_geospatial_api_server_spark.catalog import FeatureSchema, feature_schema
from iceberg_geospatial_api_server_spark.engine import query_features
from iceberg_geospatial_api_server_spark.models import QueryParams, QueryResult
from iceberg_geospatial_api_server_spark.serializers import (
    esri_json,
    esri_pbf,
    geoarrow,
    geojson,
)


@pytest.fixture(scope="module")
def geo_result(spark, tables):
    from iceberg_geospatial_api_server_spark.sources.synthetic import (
        lineitem_point_geoms,
    )

    geoms = lineitem_point_geoms(tables["lineitem"]).select(
        "l_orderkey", "l_linenumber", "l_quantity", "geometry"
    )
    res = query_features(
        geoms,
        QueryParams(limit=25),
        oid_order=["l_orderkey", "l_linenumber"],
    )
    schema = FeatureSchema(
        table_identifier="lineitem_points",
        geometry_column="geometry",
        geometry_type="Point",
        fields=[
            {"name": "l_orderkey", "type": "int64", "alias": "l_orderkey"},
            {"name": "l_linenumber", "type": "int32", "alias": "l_linenumber"},
            {"name": "l_quantity", "type": "double", "alias": "l_quantity"},
        ],
    )
    return res, schema


def test_geojson_feature_collection(geo_result):
    res, _ = geo_result
    fc = geojson.serialize(res)
    assert fc["type"] == "FeatureCollection"
    assert len(fc["features"]) == 25
    f0 = fc["features"][0]
    assert f0["type"] == "Feature"
    assert f0["geometry"]["type"] == "Point"
    assert set(f0["properties"]) == {"__oid", "l_orderkey", "l_linenumber", "l_quantity"}


def test_geojson_stream_equals_serialize(geo_result):
    res, _ = geo_result
    streamed = json.loads("".join(geojson.stream(res)))
    assert streamed == geojson.serialize(res)


def test_esri_json_featureset(geo_result):
    res, schema = geo_result
    fs = esri_json.serialize(res, schema)
    assert fs["objectIdFieldName"] == "__oid"
    assert fs["geometryType"] == "esriGeometryPoint"
    assert fs["spatialReference"] == {"wkid": 4326}
    assert len(fs["features"]) == 25
    g = fs["features"][0]["geometry"]
    assert set(g) == {"x", "y"}
    names = [f["name"] for f in fs["fields"]]
    assert names[0] == "__oid"


def test_esri_pbf_decodes_with_reference_semantics(geo_result):
    """Parse the emitted PBF wire bytes back with a minimal reader and
    check structure: version, featureResult, transform scale, feature
    count, quantized first coordinate."""
    res, schema = geo_result
    blob = esri_pbf.serialize(res, schema)
    msgs = _parse_message(blob)
    assert 2 in msgs  # queryResult
    qr = _parse_message(msgs[2][0])
    fr = _parse_message(qr[1][0])  # featureResult
    assert fr[1][0] == b"__oid"
    assert len(fr[15]) == 25  # features
    feat = _parse_message(fr[15][0])
    assert 1 in feat and 2 in feat  # attributes + geometry
    geom = _parse_message(feat[2][0])
    coords = _unpack_varints(geom[3][0])
    assert len(coords) == 2  # point: x, y zigzag-quantized

    # verify quantization against the raw WKB of the first feature
    row = res.features.orderBy("__oid").first()
    from iceberg_geospatial_api_server_spark.geo import wkb as W

    _, (x, y) = W.decode(bytes(row["geometry"]))
    assert _unzigzag(coords[0]) == round(x * esri_pbf.QUANTIZE_RESOLUTION)
    assert _unzigzag(coords[1]) == round(-y * esri_pbf.QUANTIZE_RESOLUTION)


def test_esri_pbf_count_and_ids(spark, geo_result):
    res, schema = geo_result
    blob = esri_pbf.serialize(QueryResult(features=None, count=42), schema)
    qr = _parse_message(_parse_message(blob)[2][0])
    assert _parse_message(qr[2][0])[1][0] == 42  # CountResult.count

    ids_df = res.features.select("__oid")
    ids_res = QueryResult(features=ids_df, geometry_column="geometry", count=25)
    blob = esri_pbf.serialize(ids_res, schema)
    qr = _parse_message(_parse_message(blob)[2][0])
    ids_msg = _parse_message(qr[3][0])
    assert ids_msg[1][0] == b"__oid"
    assert len(_unpack_varints(ids_msg[3][0])) == 25


def test_geoarrow_ipc_roundtrip(geo_result):
    res, _ = geo_result
    blob = geoarrow.serialize(res)
    table = ipc.open_stream(pa.BufferReader(blob)).read_all()
    assert table.num_rows == 25
    field = table.schema.field("geometry")
    assert field.metadata[b"ARROW:extension:name"] == b"geoarrow.wkb"


def test_feature_schema_detection(spark, tables):
    from iceberg_geospatial_api_server_spark.sources.synthetic import (
        lineitem_point_geoms,
    )

    geoms = lineitem_point_geoms(tables["lineitem"]).limit(100)
    fs = feature_schema(geoms, "lineitem_points")
    assert fs.geometry_column == "geometry"
    assert fs.geometry_type == "Point"
    assert fs.max_record_count == 10000
    assert fs.extent is not None and fs.extent["xmin"] <= fs.extent["xmax"]
    assert fs.id_field == "l_orderkey"


# --- minimal protobuf wire reader (test-side only) -------------------------


def _parse_message(buf: bytes) -> dict[int, list]:
    out: dict[int, list] = {}
    i = 0
    while i < len(buf):
        key, i = _read_varint(buf, i)
        field, wire = key >> 3, key & 7
        if wire == 0:
            val, i = _read_varint(buf, i)
        elif wire == 2:
            ln, i = _read_varint(buf, i)
            val = buf[i : i + ln]
            i += ln
        elif wire == 1:
            import struct

            val = struct.unpack_from("<d", buf, i)[0]
            i += 8
        else:
            raise ValueError(f"wire {wire}")
        out.setdefault(field, []).append(val)
    return out


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = v = 0
    while True:
        b = buf[i]
        i += 1
        v |= (b & 0x7F) << shift
        if not b & 0x80:
            return v, i
        shift += 7


def _unpack_varints(buf: bytes) -> list[int]:
    out, i = [], 0
    while i < len(buf):
        v, i = _read_varint(buf, i)
        out.append(v)
    return out


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def test_null_attributes_serialized_as_null(spark):
    """NULL-valued fields must appear as explicit nulls in Esri JSON and
    GeoJSON properties (to_json drops them by default)."""
    from iceberg_geospatial_api_server_spark.catalog import feature_schema
    from iceberg_geospatial_api_server_spark.models import QueryResult
    from iceberg_geospatial_api_server_spark.serializers import esri_json, geojson
    from iceberg_geospatial_api_server_spark.geo import wkb as W

    pt = W.encode_point(1.0, 2.0)
    df = spark.createDataFrame(
        [(0, 7, None, bytearray(pt))],
        "__oid int, a int, b string, geometry binary",
    )
    res = QueryResult(features=df, geometry_column="geometry", count=1)

    fs = esri_json.serialize(res, feature_schema(df))
    assert fs["features"][0]["attributes"]["b"] is None
    assert "b" in fs["features"][0]["attributes"]

    gj = geojson.serialize(res)
    assert gj["features"][0]["properties"]["b"] is None
