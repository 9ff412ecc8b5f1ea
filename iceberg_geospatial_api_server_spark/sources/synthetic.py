"""Derived geospatial views of the TPC-H-ish testdata.

The testdata has no geometry column, so geo operators run on points and
rectangles derived *deterministically* from integer keys. Each derivation
is a SQL expression string used verbatim on BOTH sides — ``F.expr`` in the
Spark plan and text-substituted into the DuckDB oracle — so coordinates are
bit-identical and comparisons/distances agree exactly.

Coordinates land on a 0.1° grid; rectangle bounds sit on ±.05 offsets so
no point ever falls exactly on a boundary (edge-inclusion semantics can
then never disagree between ray-casting and closed-interval comparisons).

The divisor/multiplier literals are CAST(... AS DOUBLE) because the two
engines type bare decimal literals differently: Spark parses `10.0` as
DECIMAL and runs the whole chain in exact decimal, DuckDB as/through
DOUBLE — near-ties (equidistant-to-ulps neighbors) then resolve
differently per engine. With the cast both run the identical IEEE-double
operation sequence, so distances and comparisons are bit-equal.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# lineitem → one point per row (lon in [-180, 180), lat in [-85, 85))
LI_X = "(l_partkey * 131 % 3600) / CAST(10.0 AS DOUBLE) - 180.0"
LI_Y = "(l_suppkey * 241 % 1700) / CAST(10.0 AS DOUBLE) - 85.0"

# supplier / customer points (distinct multipliers de-correlate the grids)
SUPP_X = "(s_suppkey * 37 % 3600) / CAST(10.0 AS DOUBLE) - 180.0"
SUPP_Y = "(s_suppkey * 53 % 1700) / CAST(10.0 AS DOUBLE) - 85.0"
CUST_X = "(c_custkey * 29 % 3600) / CAST(10.0 AS DOUBLE) - 180.0"
CUST_Y = "(c_custkey * 41 % 1700) / CAST(10.0 AS DOUBLE) - 85.0"

# nation → one rectangle per row, 5x5 tiling with gaps (width 59.9, height 29.9)
NAT_XMIN = "(n_nationkey % 5) * CAST(72.0 AS DOUBLE) - 180.0 + 0.05"
NAT_XMAX = "(n_nationkey % 5) * CAST(72.0 AS DOUBLE) - 180.0 + 59.95"
NAT_YMIN = "((n_nationkey - n_nationkey % 5) / CAST(5.0 AS DOUBLE)) * 34.0 - 85.0 + 0.05"
NAT_YMAX = "((n_nationkey - n_nationkey % 5) / CAST(5.0 AS DOUBLE)) * 34.0 - 85.0 + 29.95"

LINEITEM_POINTS_SQL = f"""
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag,
           {LI_X} AS x, {LI_Y} AS y
    FROM lineitem
"""

SUPPLIER_POINTS_SQL = f"""
    SELECT s_suppkey, {SUPP_X} AS x, {SUPP_Y} AS y FROM supplier
"""

CUSTOMER_POINTS_SQL = f"""
    SELECT c_custkey, {CUST_X} AS x, {CUST_Y} AS y FROM customer
"""

NATION_RECTS_SQL = f"""
    SELECT n_nationkey, n_name,
           {NAT_XMIN} AS xmin, {NAT_XMAX} AS xmax,
           {NAT_YMIN} AS ymin, {NAT_YMAX} AS ymax
    FROM nation
"""


def lineitem_points(lineitem: DataFrame) -> DataFrame:
    return lineitem.select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag",
        F.expr(LI_X).alias("x"), F.expr(LI_Y).alias("y"),
    )


def supplier_points(supplier: DataFrame) -> DataFrame:
    return supplier.select(
        "s_suppkey", F.expr(SUPP_X).alias("x"), F.expr(SUPP_Y).alias("y")
    )


def customer_points(customer: DataFrame) -> DataFrame:
    return customer.select(
        "c_custkey", F.expr(CUST_X).alias("x"), F.expr(CUST_Y).alias("y")
    )


def nation_rects(nation: DataFrame) -> DataFrame:
    return nation.select(
        "n_nationkey", "n_name",
        F.expr(NAT_XMIN).alias("xmin"), F.expr(NAT_XMAX).alias("xmax"),
        F.expr(NAT_YMIN).alias("ymin"), F.expr(NAT_YMAX).alias("ymax"),
    )


def nation_rect_polygons(nation: DataFrame) -> DataFrame:
    """Rectangles as real WKB polygons (exercises the geometry path).

    Dim-sized (25 rows): the rect coords come back from a JVM-only
    collect and the WKB encode runs on the driver with the numpy codec —
    no python worker stage for a dimension table (the pandas-UDF pool
    spin-up costs more than the whole query at bench scale)."""
    import numpy as np

    from iceberg_geospatial_api_server_spark.geo import wkb as W

    import pandas as pd

    rects = nation_rects(nation)
    rows = rects.collect()
    out_rows = [
        tuple(r)
        + (
            W.encode_polygon(
                [
                    np.array(
                        [
                            [r["xmin"], r["ymin"]],
                            [r["xmax"], r["ymin"]],
                            [r["xmax"], r["ymax"]],
                            [r["xmin"], r["ymax"]],
                            [r["xmin"], r["ymin"]],
                        ],
                        dtype="f8",
                    )
                ]
            ),
        )
        for r in rows
    ]
    from pyspark.sql import types as T

    schema = T.StructType(
        list(rects.schema.fields) + [T.StructField("geometry", T.BinaryType())]
    )
    # pandas conversion path (not list-of-tuples): keeps the local relation
    # JVM-side — the pickled-RDD path would spin up the python worker pool
    # on first action just to deserialize 25 rows
    pdf = pd.DataFrame.from_records(out_rows, columns=[f.name for f in schema.fields])
    return nation.sparkSession.createDataFrame(pdf, schema).coalesce(1)


# lineitem rectangles: centered on the point grid, half-extents chosen so
# edges land on .05 offsets (never coincide with integer filter bounds)
LI_RECT_HW = 1.95
LI_RECT_HH = 1.45


def lineitem_rect_geoms(lineitem: DataFrame) -> DataFrame:
    """One axis-aligned rectangle polygon (WKB) per lineitem row —
    polygon-typed features for the exact geometry-filter path.

    Keeps every lineitem column (the deterministic OID needs the full
    unique composite key). Encode is the vectorized numpy rect codec in
    an Arrow-batched pandas UDF: scan-stage, no shuffle."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    from iceberg_geospatial_api_server_spark.geo import wkb as W

    @pandas_udf(T.BinaryType())
    def _rect(x: pd.Series, y: pd.Series) -> pd.Series:
        xs = x.to_numpy("f8")
        ys = y.to_numpy("f8")
        return pd.Series(
            W.rects_to_wkb_np(
                xs - LI_RECT_HW, ys - LI_RECT_HH,
                xs + LI_RECT_HW, ys + LI_RECT_HH,
            )
        )

    return lineitem.withColumn(
        "geometry", _rect(F.expr(LI_X), F.expr(LI_Y))
    )


def lineitem_point_geoms(lineitem: DataFrame) -> DataFrame:
    """lineitem points as WKB geometry (exercises the codec at scan scale).

    Keeps every lineitem column: the engine's deterministic OID needs the
    full unique composite key (orderkey+linenumber alone collides).

    NO repartition here: a round-robin spread would make downstream
    `limit()` row sets nondeterministic across jobs. Aggregating
    consumers (extent, counts) that want python-stage parallelism on a
    single-row-group input should `spread` the input themselves."""
    from iceberg_geospatial_api_server_spark.geo.functions import st_point

    return lineitem.withColumn(
        "geometry", st_point(F.expr(LI_X), F.expr(LI_Y))
    )
