"""Query parameter / result models (ref ``query/models.py``), as plain
dataclasses — API-agnostic query semantics, not wire formats."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame


@dataclass
class QueryParams:
    """Unified query parameters (ref query/models.py:11-45)."""

    # spatial
    bbox: Optional[tuple[float, float, float, float]] = None
    geometry_filter: Optional[str] = None  # WKT
    spatial_rel: str = "intersects"  # intersects | contains | within

    # attribute
    where: Optional[str] = None

    # fields
    out_fields: Optional[str] = None  # comma-separated or "*"
    return_geometry: bool = True

    # pagination
    limit: Optional[int] = 1000
    offset: Optional[int] = 0

    # sorting
    order_by: Optional[str] = None

    # response modifiers
    return_count_only: bool = False
    return_ids_only: bool = False
    object_ids: Optional[list[int]] = None

    # output spatial reference
    out_sr: Optional[int] = None


@dataclass
class QueryResult:
    """Ref query/models.py:48-60 — features as a (lazy) DataFrame here."""

    features: Optional[DataFrame] = None
    geometry_column: str = "geometry"
    count: int = 0
    exceeded_transfer_limit: bool = False

    @classmethod
    def empty(cls) -> "QueryResult":
        return cls(features=None, count=0)
