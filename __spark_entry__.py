"""Driver contract: entry / queries / oracle_sql.

Each ``queries()`` entry is an operator from SURVEY.md §2; the matching
``oracle_sql()`` string is the ANSI-SQL equivalent DuckDB runs on the same
parquet tables. Column names and rounding are aligned on both sides so the
driver's order-insensitive value-hash matches.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from iceberg_geospatial_api_server_spark.sources.tables import load_table

    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# entry: flagship query smoke (sf0.001)
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q1 pricing summary at sf0.001."""
    from iceberg_geospatial_api_server_spark.operators.relational import (
        q1_pricing_summary,
    )

    return q1_pricing_summary(_t(spark, "/root/testdata/sf0.001", "lineitem"))


# ---------------------------------------------------------------------------
# queries: one entry per implemented operator
# ---------------------------------------------------------------------------


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from iceberg_geospatial_api_server_spark import entry_queries

    return entry_queries.QUERIES


def oracle_sql() -> dict[str, str]:
    from iceberg_geospatial_api_server_spark import entry_queries

    return entry_queries.ORACLES
