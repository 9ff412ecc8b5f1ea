"""Canonical testdata table loader.

The events table is written with nanosecond parquet timestamps, which
Spark 4 refuses by default; the session sets
``spark.sql.legacy.parquet.nanosAsLong`` and this loader converts the
int64 nanos to a microsecond TimestampType (matching DuckDB's read of the
same file, which also truncates to micros)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# columns known to be nanosecond timestamps in the testdata
_NANO_TS_COLS = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name in _NANO_TS_COLS:
        # runtime-settable; needed because the driver may hand us a session
        # built without this conf
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANO_TS_COLS.get(name, []):
        f = next((x for x in df.schema.fields if x.name == col), None)
        if f is not None and isinstance(f.dataType, T.LongType):
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in TABLE_NAMES}
