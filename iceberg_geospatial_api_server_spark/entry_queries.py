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
      AND c_nationkey = n_nationkey AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1994-01-01'
      AND o_orderdate < TIMESTAMP '1995-01-01'
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
