"""FeatureServer service/layer metadata builders
(ref geoservices/metadata.py:15-120) — the JSON documents ArcGIS clients
read to discover layers, fields, extent, and capabilities."""

from __future__ import annotations

from typing import Optional

from iceberg_geospatial_api_server_spark.catalog import FeatureSchema
from iceberg_geospatial_api_server_spark.serializers.esri_json import (
    ESRI_GEOMETRY_TYPE_MAP,
    build_field_definitions,
)


def build_service_metadata(
    namespace: str,
    table_names: list[str],
    schemas: Optional[list[FeatureSchema]] = None,
) -> dict:
    """/FeatureServer response (ref metadata.py:15-50)."""
    layers = []
    for i, name in enumerate(table_names):
        geom_type = "esriGeometryPolygon"
        if schemas and i < len(schemas):
            geom_type = ESRI_GEOMETRY_TYPE_MAP.get(
                schemas[i].geometry_type, "esriGeometryPolygon"
            )
        layers.append(
            {"id": i, "name": name, "type": "Feature Layer", "geometryType": geom_type}
        )
    return {
        "currentVersion": 11.0,
        "serviceDescription": f"Spark-lakehouse feature service: {namespace}",
        "hasVersionedData": False,
        "supportsDisconnectedEditing": False,
        "supportedQueryFormats": "JSON, geoJSON, PBF",
        "maxRecordCount": 10000,
        "capabilities": "Query",
        "layers": layers,
        "tables": [],
        "spatialReference": {"wkid": 4326, "latestWkid": 4326},
    }


def build_layer_metadata(schema: FeatureSchema, layer_id: int) -> dict:
    """/FeatureServer/{layer_id} response (ref metadata.py:52-120)."""
    fields = [
        {
            "name": "__oid",
            "type": "esriFieldTypeOID",
            "alias": "OID",
            "sqlType": "sqlTypeInteger",
        }
    ] + build_field_definitions(schema)
    ext = schema.extent or {}
    return {
        "currentVersion": 11.0,
        "id": layer_id,
        "name": schema.table_identifier.split(".")[-1],
        "type": "Feature Layer",
        "geometryType": ESRI_GEOMETRY_TYPE_MAP.get(
            schema.geometry_type, "esriGeometryPolygon"
        ),
        "objectIdField": "__oid",
        "fields": fields,
        "extent": {
            "xmin": ext.get("xmin", -180),
            "ymin": ext.get("ymin", -90),
            "xmax": ext.get("xmax", 180),
            "ymax": ext.get("ymax", 90),
            "spatialReference": {"wkid": schema.srid},
        },
        "maxRecordCount": schema.max_record_count,
        "supportedQueryFormats": "JSON, geoJSON, PBF",
        "capabilities": "Query",
        "advancedQueryCapabilities": {
            "supportsDistinct": True,
            "supportsOrderBy": True,
            "supportsPagination": True,
            "supportsQueryWithResultType": True,
            "supportsReturningGeometryCentroid": False,
            "supportsStatistics": False,
        },
        "supportsMaxAllowableOffset": True,
        "hasAttachments": False,
        "htmlPopupType": "esriServerHTMLPopupTypeAsHTMLText",
    }
