"""Query parameter / result models (ref ``query/models.py``), as plain
dataclasses — API-agnostic query semantics, not wire formats."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import Column, DataFrame


@dataclass
class QueryParams:
    """Unified query parameters (ref query/models.py:11-45)."""

    # -- geometry predicates (envelope and/or exact WKT filter) --
    bbox: Optional[tuple[float, float, float, float]] = None
    geometry_filter: Optional[str] = None  # WKT
    spatial_rel: str = "intersects"  # intersects | contains | within

    # -- attribute predicate (sanitized WHERE fragment) --
    where: Optional[str] = None
    # -- attribute predicate as a typed Column expression: programmatic
    # callers (e.g. the OGC provider) pass predicates WITHOUT a text
    # round-trip through the sanitizer; ANDed with `where` when both set.
    where_expr: Optional[Column] = None

    # -- projection: which columns come back --
    out_fields: Optional[str] = None  # comma-separated or "*"
    return_geometry: bool = True

    # -- paging window --
    limit: Optional[int] = 1000
    offset: Optional[int] = 0

    # -- result ordering --
    order_by: Optional[str] = None

    # -- alternate result shapes (count / id-list / extent / fetch-by-oid) --
    return_count_only: bool = False
    return_ids_only: bool = False
    return_extent_only: bool = False
    object_ids: Optional[list[int]] = None

    # -- coordinate reference of returned geometries --
    out_sr: Optional[int] = None
    # -- server-side vertex thinning tolerance (maxAllowableOffset) --
    max_allowable_offset: Optional[float] = None


@dataclass
class QueryResult:
    """Ref query/models.py:48-60 — features as a (lazy) DataFrame here."""

    features: Optional[DataFrame] = None
    geometry_column: str = "geometry"
    count: int = 0
    exceeded_transfer_limit: bool = False
    # filled only for returnExtentOnly: {xmin, ymin, xmax, ymax} or None
    # when the filtered set is empty
    extent: Optional[dict] = None

    @classmethod
    def empty(cls) -> "QueryResult":
        return cls(features=None, count=0)
