"""GeoServices discovery documents for Spark-registered layers.

ArcGIS-compatible clients bootstrap from two JSON documents — the service
root (layer directory) and the per-layer description (fields, extent,
capabilities). The key set and constant values are fixed by the public
GeoServices/FeatureServer spec (parity target: ref
geoservices/metadata.py:15-120); here they are kept as declarative
templates that the builders overlay with per-layer facts.
"""

from __future__ import annotations

from typing import Optional

from iceberg_geospatial_api_server_spark.catalog import FeatureSchema
from iceberg_geospatial_api_server_spark.serializers.esri_json import (
    ESRI_GEOMETRY_TYPE_MAP,
    build_field_definitions,
)

_PROTOCOL_VERSION = 11.0
_QUERY_FORMATS = "JSON, geoJSON, PBF"
_DEFAULT_GEOM_TYPE = "esriGeometryPolygon"
_WORLD_EXTENT = {"xmin": -180, "ymin": -90, "xmax": 180, "ymax": 90}

# Static capability block: what the Spark query engine actually supports
# (distinct/order-by/pagination map to DataFrame ops; statistics and
# centroid-return are not wired).
_ADVANCED_QUERY_CAPS = {
    "supportsDistinct": True,
    "supportsOrderBy": True,
    "supportsPagination": True,
    "supportsQueryWithResultType": True,
    "supportsReturningGeometryCentroid": False,
    "supportsStatistics": False,
}

_SERVICE_TEMPLATE = {
    "currentVersion": _PROTOCOL_VERSION,
    "hasVersionedData": False,
    "supportsDisconnectedEditing": False,
    "supportedQueryFormats": _QUERY_FORMATS,
    "maxRecordCount": 10000,
    "capabilities": "Query",
    "tables": [],
    "spatialReference": {"wkid": 4326, "latestWkid": 4326},
}

_LAYER_TEMPLATE = {
    "currentVersion": _PROTOCOL_VERSION,
    "type": "Feature Layer",
    "objectIdField": "__oid",
    "supportedQueryFormats": _QUERY_FORMATS,
    "capabilities": "Query",
    "advancedQueryCapabilities": _ADVANCED_QUERY_CAPS,
    "supportsMaxAllowableOffset": True,
    "hasAttachments": False,
    "htmlPopupType": "esriServerHTMLPopupTypeAsHTMLText",
}

# The OID pseudo-field every layer document leads with.
_OID_FIELD = {
    "name": "__oid",
    "type": "esriFieldTypeOID",
    "alias": "OID",
    "sqlType": "sqlTypeInteger",
}


def _esri_geom_type(geometry_type: str | None) -> str:
    return ESRI_GEOMETRY_TYPE_MAP.get(geometry_type, _DEFAULT_GEOM_TYPE)


def build_service_metadata(
    namespace: str,
    table_names: list[str],
    schemas: Optional[list[FeatureSchema]] = None,
) -> dict:
    """Service-root document: one layer stub per registered table."""
    geom_types = [
        _esri_geom_type(s.geometry_type) for s in (schemas or [])
    ]
    layer_dir = [
        {
            "id": idx,
            "name": tbl,
            "type": "Feature Layer",
            "geometryType": (
                geom_types[idx] if idx < len(geom_types) else _DEFAULT_GEOM_TYPE
            ),
        }
        for idx, tbl in enumerate(table_names)
    ]
    import copy

    # deep-copy the template: the shallow | overlay would share nested
    # mutable dicts/lists across every response document
    return copy.deepcopy(_SERVICE_TEMPLATE) | {
        "serviceDescription": f"Spark-lakehouse feature service: {namespace}",
        "layers": layer_dir,
    }


def build_layer_metadata(schema: FeatureSchema, layer_id: int) -> dict:
    """Per-layer document: fields, extent, and geometry type from the
    detected FeatureSchema overlaid on the capability template."""
    extent = _WORLD_EXTENT | (schema.extent or {})
    import copy

    return copy.deepcopy(_LAYER_TEMPLATE) | {
        "id": layer_id,
        "name": schema.table_identifier.split(".")[-1],
        "geometryType": _esri_geom_type(schema.geometry_type),
        "fields": [_OID_FIELD, *build_field_definitions(schema)],
        "extent": extent | {"spatialReference": {"wkid": schema.srid}},
        "maxRecordCount": schema.max_record_count,
    }
