"""Iceberg I/O module tests.

The container has no iceberg-spark-runtime jar, so the end-to-end tests
skip themselves via ``iceberg_available``; they run unchanged on a
cluster with the jar + a configured catalog. The helpers with no JVM
dependency (identifier quoting, partition-spec parsing, gating logic,
SQL text construction) are asserted everywhere.
"""

import pytest
from pyspark.sql import functions as F

from iceberg_geospatial_api_server_spark.sources import iceberg_io as I


def test_gating_probe_false_without_jars(spark):
    assert I.iceberg_available(spark) is False


def test_quote_ident():
    assert I.quote_ident("lakehouse.geo.roads") == "`lakehouse`.`geo`.`roads`"
    with pytest.raises(ValueError):
        I.quote_ident("bad`name.t")
    with pytest.raises(ValueError):
        I.quote_ident("a..b")


def test_partition_transform_parsing():
    assert I._partition_transform(F, "region")._jc is not None
    assert I._partition_transform(F, "days(ts)")._jc is not None
    assert I._partition_transform(F, "bucket(16, id)")._jc is not None
    with pytest.raises(ValueError):
        I._partition_transform(F, "pow(2, id)")


def test_metadata_table_name_validation(spark):
    with pytest.raises(ValueError):
        I.metadata_table(spark, "lakehouse.db.t", "secrets")


def test_travel_literal_validation(spark):
    with pytest.raises(ValueError):
        I.read_as_of(spark, "lakehouse.db.t", "2024-01-01' OR '1'='1")
    with pytest.raises(ValueError):
        I.expire_snapshots(spark, "lakehouse.db.t", "x'); DROP TABLE t;--")


def test_delete_where_goes_through_sanitizer(spark):
    with pytest.raises(ValueError):
        I.delete_where(spark, "lakehouse.db.t", "java_method('a','b') = 1")


def test_delete_where_rejects_empty_predicate(spark):
    # empty WHERE would sanitize to the always-true 1=1 → full-table
    # DELETE; must raise instead
    with pytest.raises(ValueError):
        I.delete_where(spark, "lakehouse.db.t", "")
    with pytest.raises(ValueError):
        I.delete_where(spark, "lakehouse.db.t", "   ")


def test_identifier_charset_allowlist():
    # apostrophes would escape the single-quoted CALL-argument context
    with pytest.raises(ValueError):
        I.quote_ident("db.t', where => '1=1")
    with pytest.raises(ValueError):
        I.quote_ident("db.t name")
    assert I.quote_ident("lake.geo-x.t_1") == "`lake`.`geo-x`.`t_1`"


def test_maintenance_procedure_validation(spark):
    with pytest.raises(ValueError):
        I.rewrite_data_files(spark, "lakehouse.db.t", strategy="steal")
    with pytest.raises(ValueError):
        I.rewrite_data_files(
            spark, "lakehouse.db.t", where="java_method('a','b') = 1"
        )
    with pytest.raises(ValueError):
        I.rewrite_data_files(
            spark, "lakehouse.db.t", strategy="sort", sort_order="ts; DROP"
        )
    with pytest.raises(ValueError):
        I.remove_orphan_files(
            spark, "lakehouse.db.t", older_than="x'); DROP TABLE t;--"
        )
    with pytest.raises(ValueError):
        I.rewrite_manifests(spark, "bad`name..t")


# ---------------------------------------------------------------------------
# end-to-end: only with the Iceberg runtime on the classpath
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def iceberg_spark(spark):
    if not I.iceberg_available(spark):
        pytest.skip("iceberg-spark-runtime not on classpath")
    return spark


def test_roundtrip_append_and_travel(iceberg_spark, tmp_path):
    spark = iceberg_spark
    tbl = "lakehouse.tmp.io_roundtrip"
    df1 = spark.range(10).withColumn("v", F.lit("a"))
    I.create_or_replace(df1, tbl, partition_by=["bucket(4, id)"])
    snap0 = I.snapshots(spark, tbl).agg(F.max("snapshot_id")).first()[0]

    I.append(spark.range(10, 20).withColumn("v", F.lit("b")), tbl)
    assert I.read_table(spark, tbl).count() == 20
    assert I.read_snapshot(spark, tbl, snap0).count() == 10

    src = spark.range(15, 25).withColumn("v", F.lit("c"))
    I.merge_upsert(spark, tbl, src, key_cols=["id"])
    out = I.read_table(spark, tbl)
    assert out.count() == 25
    assert out.filter("v = 'c'").count() == 10

    assert I.data_files(spark, tbl).count() > 0
    assert I.table_history(spark, tbl).count() >= 2
