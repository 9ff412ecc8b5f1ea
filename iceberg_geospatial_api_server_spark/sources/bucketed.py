"""Bucketed-table writes for shuffle-free co-located joins.

At 100 TB the dominant cost of a fact-fact join (lineitem⋈orders,
events⋈events) is shuffling both sides on the join key, every query.
Bucketing pays that shuffle ONCE at write time: `bucketBy(n, key)` hashes
rows into a fixed bucket layout, and every later equi-join or
aggregation on the bucket key reads co-located buckets with NO exchange
on either side (Spark's bucketed scan-to-SMJ path; sortBy additionally
removes the sort). The reference's Iceberg story reaches the same effect
through `bucket(n, col)` partition transforms (see sources.iceberg_io
`_partition_transform`); this module is the plain-parquet/Hive-table
equivalent for environments without Iceberg jars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a bucketed (optionally sort-within-bucket) table.

    `num_buckets` is the scale knob: pick it so one bucket of the LARGER
    fact fits an executor's memory at the target scale (same sizing
    exercise as shuffle partitions, but decided once at write time).
    """
    if not bucket_cols:
        raise ValueError("bucket_cols must be non-empty")
    w = (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Read a bucketed table (bucket metadata only survives the
    table-catalog path — a raw parquet path read loses it)."""
    return spark.table(table_name)
