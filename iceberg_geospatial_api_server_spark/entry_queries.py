"""Query registry: SURVEY.md §2 operators → (Spark callable, DuckDB oracle).

Conventions keeping the driver's hash-compare green:
* every computed column aliased identically on both sides
* float aggregates rounded (4dp) on both sides
* timestamps compared as epoch micros/seconds BIGINT
* LIMIT/top-k queries carry explicit deterministic tiebreakers
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

QUERIES: dict = {}
ORACLES: dict = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from iceberg_geospatial_api_server_spark.sources.tables import load_table

    return load_table(spark, sf_dir, name)


# ===========================================================================
# E. Relational analytics
# ===========================================================================


@_q(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           ROUND(AVG(l_extendedprice), 4) AS avg_price,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1998-09-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1(spark, sf_dir):
    from iceberg_geospatial_api_server_spark.operators.relational import (
        q1_pricing_summary,
    )

    return q1_pricing_summary(_t(spark, sf_dir, "lineitem"))


@_q(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS o_orderdate
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1995-03-15'
      AND l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3(spark, sf_dir):
    from iceberg_geospatial_api_server_spark.operators.relational import (
        q3_shipping_priority,
    )

    return q3_shipping_priority(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
    )


@_q(
    "q5_local_supplier",
    """
    SELECT n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey AND r_name = 'EUROPE'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5(spark, sf_dir):
    from iceberg_geospatial_api_server_spark.operators.relational import (
        q5_local_supplier_volume,
    )

    return q5_local_supplier_volume(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "region"),
    )


@_q(
    "top3_orders_per_priority",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def top3_orders(spark, sf_dir):
    from iceberg_geospatial_api_server_spark.operators.relational import (
        top_k_per_group,
    )

    return top_k_per_group(
        _t(spark, sf_dir, "orders").select(
            "o_orderpriority", "o_orderkey", "o_totalprice"
        ),
        "o_orderpriority",
        "o_totalprice",
        3,
        "o_orderkey",
    )


@_q(
    "events_windowed_agg",
    """
    SELECT CAST(FLOOR(epoch_us(ts) / 3600000000) * 3600 AS BIGINT) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 4) AS sum_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def ev_window(spark, sf_dir):
    from iceberg_geospatial_api_server_spark.operators.relational import (
        events_windowed_agg,
    )

    return events_windowed_agg(_t(spark, sf_dir, "events"), minutes=60)


@_q(
    "events_sessionize",
    """
    WITH g AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), s AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                 ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM g
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           COUNT(*) AS n_events,
           CAST(FLOOR(epoch_us(MIN(ts)) / 1000000) AS BIGINT) AS session_start,
           CAST(FLOOR(epoch_us(MAX(ts)) / 1000000) AS BIGINT) AS session_end,
           ROUND(SUM(value), 4) AS session_value
    FROM s GROUP BY user_id, session_seq
    """,
)
def ev_sessions(spark, sf_dir):
    from iceberg_geospatial_api_server_spark.operators.relational import sessionize

    return sessionize(_t(spark, sf_dir, "events"), gap_minutes=30)


@_q(
    "asof_join_events_orders",
    """
    SELECT e.event_id, e.user_id,
           epoch_us(e.ts) AS event_ts,
           o.o_orderkey AS asof_orderkey,
           o.o_totalprice AS asof_totalprice
    FROM events e LEFT JOIN orders o ON o.o_orderkey = (
        SELECT o2.o_orderkey FROM orders o2
        WHERE o2.o_custkey = e.user_id AND o2.o_orderdate <= e.ts
        ORDER BY o2.o_orderdate DESC, o2.o_orderkey DESC LIMIT 1)
    """,
)
def asof(spark, sf_dir):
    from iceberg_geospatial_api_server_spark.operators.relational import (
        asof_join_events_orders,
    )

    return asof_join_events_orders(
        _t(spark, sf_dir, "events"), _t(spark, sf_dir, "orders")
    )


@_q(
    "events_pivot",
    """
    SELECT STRFTIME(ts, '%Y-%m-%d') AS day,
           COUNT(*) FILTER (event_type = 'click') AS click,
           COUNT(*) FILTER (event_type = 'view') AS view,
           COUNT(*) FILTER (event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (event_type = 'signup') AS signup,
           COUNT(*) FILTER (event_type = 'error') AS error
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def ev_pivot(spark, sf_dir):
    from iceberg_geospatial_api_server_spark.operators.relational import events_pivot

    return events_pivot(_t(spark, sf_dir, "events"))


@_q(
    "orders_rollup",
    """
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def o_rollup(spark, sf_dir):
    from iceberg_geospatial_api_server_spark.operators.relational import orders_rollup

    return orders_rollup(_t(spark, sf_dir, "orders"))


@_q(
    "events_user_stats",
    """
    SELECT user_id, COUNT(*) AS n_events,
           COUNT(DISTINCT event_type) AS n_types,
           ROUND(SUM(value), 4) AS total_value,
           ROUND(MAX(value), 4) AS max_value
    FROM events GROUP BY user_id HAVING COUNT(*) >= 3
    """,
)
def ev_user_stats(spark, sf_dir):
    from iceberg_geospatial_api_server_spark.operators.relational import user_stats

    return user_stats(_t(spark, sf_dir, "events"))


# ===========================================================================
# C. Geospatial (coordinates derived via sources.synthetic — identical SQL
#    expressions on both sides, see that module's docstring)
# ===========================================================================

_LI_PTS = """
    (SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag,
            (l_partkey * 131 % 3600) / 10.0 - 180.0 AS x,
            (l_suppkey * 241 % 1700) / 10.0 - 85.0 AS y
     FROM lineitem)
"""


@_q(
    "geo_knn",
    f"""
    SELECT l_orderkey, l_linenumber, ROUND(SQRT(x*x + y*y), 6) AS dist
    FROM {_LI_PTS} p
    ORDER BY SQRT(x*x + y*y), l_orderkey, l_linenumber
    LIMIT 10
    """,
)
def geo_knn(spark, sf_dir):
    from iceberg_geospatial_api_server_spark.geo.functions import knn
    from iceberg_geospatial_api_server_spark.sources.synthetic import lineitem_points

    pts = lineitem_points(_t(spark, sf_dir, "lineitem"))
    out = knn(pts, "x", "y", 0.0, 0.0, 10, id_cols=["l_orderkey", "l_linenumber"])
    return out.select(
        "l_orderkey", "l_linenumber", F.round("dist", 6).alias("dist")
    )


@_q(
    "geo_dwithin",
    f"""
    SELECT l_orderkey, l_linenumber,
           ROUND(SQRT(x*x + y*y), 6) AS dist
    FROM {_LI_PTS} p
    WHERE SQRT(x*x + y*y) < 25.0
    """,
)
def geo_dwithin(spark, sf_dir):
    from iceberg_geospatial_api_server_spark.geo.functions import dwithin
    from iceberg_geospatial_api_server_spark.sources.synthetic import lineitem_points

    pts = lineitem_points(_t(spark, sf_dir, "lineitem"))
    out = dwithin(pts, "x", "y", 0.0, 0.0, 25.0)
    return out.select(
        "l_orderkey", "l_linenumber", F.round("dist", 6).alias("dist")
    )


@_q(
    "geo_grid_aggregate",
    f"""
    SELECT (FLOOR(x / 10.0) + 0.5) * 10.0 AS x,
           (FLOOR(y / 10.0) + 0.5) * 10.0 AS y,
           COUNT(*) AS feature_count
    FROM {_LI_PTS} p
    GROUP BY FLOOR(x / 10.0), FLOOR(y / 10.0)
    """,
)
def geo_grid_agg(spark, sf_dir):
    from iceberg_geospatial_api_server_spark.geo.functions import grid_aggregate
    from iceberg_geospatial_api_server_spark.sources.synthetic import lineitem_points

    pts = lineitem_points(_t(spark, sf_dir, "lineitem"))
    return grid_aggregate(pts, "x", "y", 10.0)


@_q(
    "geo_extent",
    f"""
    SELECT MIN(x) AS xmin, MIN(y) AS ymin, MAX(x) AS xmax, MAX(y) AS ymax
    FROM {_LI_PTS} p
    """,
)
def geo_extent(spark, sf_dir):
    """Round-trips every point through the WKB codec, then aggregates the
    decoded bboxes (ref api/main.py:206-222)."""
    from iceberg_geospatial_api_server_spark.geo.functions import extent
    from iceberg_geospatial_api_server_spark.sources.synthetic import (
        lineitem_point_geoms,
    )

    geoms = lineitem_point_geoms(_t(spark, sf_dir, "lineitem")).select("geometry")
    return extent(geoms)


@_q(
    "geo_pip_join_count",
    f"""
    SELECT n.n_name,
           COUNT(*) AS n_points,
           ROUND(SUM(p.l_quantity), 2) AS sum_qty
    FROM {_LI_PTS} p
    JOIN (SELECT n_nationkey, n_name,
                 (n_nationkey % 5) * 72.0 - 180.0 + 0.05 AS xmin,
                 (n_nationkey % 5) * 72.0 - 180.0 + 59.95 AS xmax,
                 ((n_nationkey - n_nationkey % 5) / 5.0) * 34.0 - 85.0 + 0.05 AS ymin,
                 ((n_nationkey - n_nationkey % 5) / 5.0) * 34.0 - 85.0 + 29.95 AS ymax
          FROM nation) n
      ON p.x > n.xmin AND p.x < n.xmax AND p.y > n.ymin AND p.y < n.ymax
    GROUP BY n.n_name
    """,
)
def geo_pip_join(spark, sf_dir):
    from iceberg_geospatial_api_server_spark.geo.functions import (
        point_in_polygon_join,
    )
    from iceberg_geospatial_api_server_spark.sources.synthetic import (
        lineitem_points,
        nation_rect_polygons,
    )

    pts = lineitem_points(_t(spark, sf_dir, "lineitem"))
    polys = nation_rect_polygons(_t(spark, sf_dir, "nation")).select(
        "n_nationkey", "n_name", "geometry"
    )
    joined = point_in_polygon_join(pts, polys, "x", "y", "geometry", res=30.0)
    return joined.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


@_q(
    "geo_nearest_join",
    """
    SELECT s_suppkey, nn_c_custkey, ROUND(nn_dist, 6) AS nn_dist FROM (
      SELECT s.s_suppkey, c.c_custkey AS nn_c_custkey,
             SQRT((s.x-c.x)*(s.x-c.x) + (s.y-c.y)*(s.y-c.y)) AS nn_dist,
             ROW_NUMBER() OVER (PARTITION BY s.s_suppkey
               ORDER BY SQRT((s.x-c.x)*(s.x-c.x) + (s.y-c.y)*(s.y-c.y)), c.c_custkey) AS rn
      FROM (SELECT s_suppkey, (s_suppkey * 37 % 3600) / 10.0 - 180.0 AS x,
                   (s_suppkey * 53 % 1700) / 10.0 - 85.0 AS y FROM supplier) s
      CROSS JOIN (SELECT c_custkey, (c_custkey * 29 % 3600) / 10.0 - 180.0 AS x,
                   (c_custkey * 41 % 1700) / 10.0 - 85.0 AS y FROM customer) c
    ) WHERE rn = 1
    """,
)
def geo_nearest(spark, sf_dir):
    from iceberg_geospatial_api_server_spark.geo.functions import (
        nearest_join_broadcast,
    )
    from iceberg_geospatial_api_server_spark.sources.synthetic import (
        customer_points,
        supplier_points,
    )

    supp = supplier_points(_t(spark, sf_dir, "supplier"))
    cust = customer_points(_t(spark, sf_dir, "customer"))
    out = nearest_join_broadcast(
        supp, cust, "s_suppkey", "x", "y", "x", "y", ["c_custkey"]
    )
    return out.select(
        "s_suppkey",
        F.col("nn_c_custkey"),
        F.round("nn_dist", 6).alias("nn_dist"),
    )


@_q(
    "geo_mercator",
    f"""
    SELECT l_orderkey, l_linenumber,
           ROUND(x * (PI() * 6378137.0 / 180.0), 4) AS mx,
           ROUND(LN(TAN((90.0 + y) * (PI() / 360.0))) * 6378137.0, 4) AS my
    FROM {_LI_PTS} p
    """,
)
def geo_mercator(spark, sf_dir):
    from iceberg_geospatial_api_server_spark.geo.functions import (
        mercator_x,
        mercator_y,
    )
    from iceberg_geospatial_api_server_spark.sources.synthetic import lineitem_points

    pts = lineitem_points(_t(spark, sf_dir, "lineitem"))
    return pts.select(
        "l_orderkey",
        "l_linenumber",
        F.round(mercator_x(F.col("x")), 4).alias("mx"),
        F.round(mercator_y(F.col("y")), 4).alias("my"),
    )


@_q("geo_convex_hull")  # no SQL oracle (hull not expressible without spatial ext)
def geo_hull(spark, sf_dir):
    from iceberg_geospatial_api_server_spark.geo.functions import (
        convex_hull_by_group,
    )
    from iceberg_geospatial_api_server_spark.sources.synthetic import lineitem_points

    pts = lineitem_points(_t(spark, sf_dir, "lineitem"))
    return convex_hull_by_group(pts, "l_returnflag", "x", "y").select(
        "l_returnflag",
        "point_count",
        "hull_vertices",
        F.round("hull_area", 4).alias("hull_area"),
    )


# ===========================================================================
# B. Feature-query engine (ref query/engine.py:282-463)
# ===========================================================================

_NUMBERED = """
    (SELECT CAST(ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS INT)
              AS __oid, *
     FROM lineitem)
"""

_OID_ORDER = ["l_orderkey", "l_linenumber"]


@_q(
    "fq_attribute_filter",
    f"""
    SELECT __oid, l_orderkey, l_linenumber, l_quantity
    FROM {_NUMBERED} n
    WHERE l_quantity > 45.0 AND l_returnflag = 'R'
    ORDER BY l_quantity DESC, __oid
    LIMIT 50
    """,
)
def fq_attr(spark, sf_dir):
    from iceberg_geospatial_api_server_spark.engine import query_features
    from iceberg_geospatial_api_server_spark.models import QueryParams

    li = _t(spark, sf_dir, "lineitem")
    res = query_features(
        li,
        QueryParams(
            where="l_quantity > 45.0 AND l_returnflag = 'R'",
            out_fields="l_orderkey,l_linenumber,l_quantity",
            order_by="l_quantity DESC",
            limit=50,
            return_geometry=False,
        ),
        oid_order=_OID_ORDER,
    )
    return res.features


@_q(
    "fq_ids_only",
    f"""
    SELECT __oid FROM {_NUMBERED} n
    WHERE l_quantity > 48.0 AND l_returnflag = 'A'
    """,
)
def fq_ids(spark, sf_dir):
    from iceberg_geospatial_api_server_spark.engine import query_features
    from iceberg_geospatial_api_server_spark.models import QueryParams

    li = _t(spark, sf_dir, "lineitem")
    res = query_features(
        li,
        QueryParams(
            where="l_quantity > 48.0 AND l_returnflag = 'A'",
            return_ids_only=True,
        ),
        oid_order=_OID_ORDER,
    )
    return res.features


@_q(
    "fq_object_ids",
    f"""
    SELECT __oid, l_orderkey, l_linenumber
    FROM {_NUMBERED} n
    WHERE __oid IN (0, 5, 10, 99, 250, 999)
    """,
)
def fq_oids(spark, sf_dir):
    from iceberg_geospatial_api_server_spark.engine import query_features
    from iceberg_geospatial_api_server_spark.models import QueryParams

    li = _t(spark, sf_dir, "lineitem")
    res = query_features(
        li,
        QueryParams(
            object_ids=[0, 5, 10, 99, 250, 999],
            out_fields="l_orderkey,l_linenumber",
            return_geometry=False,
        ),
        oid_order=_OID_ORDER,
    )
    return res.features


@_q(
    "fq_count_only",
    "SELECT COUNT(*) AS cnt FROM lineitem WHERE l_quantity > 25.0",
)
def fq_count(spark, sf_dir):
    from iceberg_geospatial_api_server_spark.engine import query_features
    from iceberg_geospatial_api_server_spark.models import QueryParams

    li = _t(spark, sf_dir, "lineitem")
    res = query_features(
        li,
        QueryParams(where="l_quantity > 25.0", return_count_only=True),
        oid_order=_OID_ORDER,
    )
    return spark.createDataFrame([(res.count,)], "cnt long")


@_q(
    "fq_bbox_filter",
    f"""
    SELECT __oid, l_orderkey, l_linenumber
    FROM (SELECT CAST(ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS INT)
                   AS __oid,
                 l_orderkey, l_linenumber,
                 (l_partkey * 131 % 3600) / 10.0 - 180.0 AS x,
                 (l_suppkey * 241 % 1700) / 10.0 - 85.0 AS y
          FROM lineitem) n
    WHERE x >= -49.95 AND x <= 29.95 AND y >= -39.95 AND y <= 24.95
    """,
)
def fq_bbox(spark, sf_dir):
    from iceberg_geospatial_api_server_spark.engine import query_features
    from iceberg_geospatial_api_server_spark.models import QueryParams
    from iceberg_geospatial_api_server_spark.sources.synthetic import (
        lineitem_point_geoms,
    )

    geoms = lineitem_point_geoms(_t(spark, sf_dir, "lineitem")).select(
        "l_orderkey", "l_linenumber", "geometry"
    )
    res = query_features(
        geoms,
        QueryParams(
            bbox=(-49.95, -39.95, 29.95, 24.95),
            out_fields="l_orderkey,l_linenumber",
            return_geometry=False,
            limit=None,
        ),
        oid_order=_OID_ORDER,
    )
    return res.features


@_q(
    "fq_geometry_filter",
    f"""
    SELECT __oid, l_orderkey, l_linenumber
    FROM (SELECT CAST(ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS INT)
                   AS __oid,
                 l_orderkey, l_linenumber,
                 (l_partkey * 131 % 3600) / 10.0 - 180.0 AS x,
                 (l_suppkey * 241 % 1700) / 10.0 - 85.0 AS y
          FROM lineitem) n
    WHERE x > -60.05 AND x < 40.05 AND y > -30.05 AND y < 35.05
    """,
)
def fq_geom(spark, sf_dir):
    from iceberg_geospatial_api_server_spark.engine import query_features
    from iceberg_geospatial_api_server_spark.models import QueryParams
    from iceberg_geospatial_api_server_spark.sources.synthetic import (
        lineitem_point_geoms,
    )

    geoms = lineitem_point_geoms(_t(spark, sf_dir, "lineitem")).select(
        "l_orderkey", "l_linenumber", "geometry"
    )
    wkt = (
        "POLYGON ((-60.05 -30.05, 40.05 -30.05, 40.05 35.05, "
        "-60.05 35.05, -60.05 -30.05))"
    )
    res = query_features(
        geoms,
        QueryParams(
            geometry_filter=wkt,
            spatial_rel="intersects",
            out_fields="l_orderkey,l_linenumber",
            return_geometry=False,
            limit=None,
        ),
        oid_order=_OID_ORDER,
    )
    return res.features


# ===========================================================================
# A. Catalog
# ===========================================================================


@_q(
    "catalog_row_counts",
    """
    SELECT 'customer' AS tbl, COUNT(*) AS n FROM customer
    UNION ALL SELECT 'documents', COUNT(*) FROM documents
    UNION ALL SELECT 'embeddings', COUNT(*) FROM embeddings
    UNION ALL SELECT 'events', COUNT(*) FROM events
    UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
    UNION ALL SELECT 'nation', COUNT(*) FROM nation
    UNION ALL SELECT 'orders', COUNT(*) FROM orders
    UNION ALL SELECT 'part', COUNT(*) FROM part
    UNION ALL SELECT 'region', COUNT(*) FROM region
    UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
    """,
)
def row_counts(spark, sf_dir):
    from iceberg_geospatial_api_server_spark.catalog import FsCatalog

    return FsCatalog(spark, sf_dir).row_counts()
