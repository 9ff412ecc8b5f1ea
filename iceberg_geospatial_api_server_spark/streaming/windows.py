"""Streaming windowed aggregation + sessionization.

The reference pushes live layer updates over a websocket
(api/main.py:916-1045); the Spark-native analogue is Structured
Streaming: readStream over the lakehouse (or Kafka on a real deploy),
watermarked event-time windows, session windows, and foreachBatch upsert
sinks. Batch equivalents of these aggregations (oracle-checked) live in
operators.relational.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """File-source stream over event parquet (swap for Kafka in prod —
    same downstream plan)."""
    return (
        spark.readStream.format("parquet")
        .schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(path)
    )


def windowed_counts(
    events: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermarked tumbling/sliding window aggregation. State store holds
    only open windows; late events beyond the watermark drop (bounded
    state at any scale)."""
    win = (
        F.window("ts", window, slide) if slide else F.window("ts", window)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Native session windows: state closes when a user goes quiet for
    `gap` (mirrors operators.relational.sessionize for batch)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def run_to_memory_sink(stream_df: DataFrame, name: str, mode: str = "complete"):
    """Drive a bounded file-source stream to completion synchronously
    (memory sink; test/debug harness)."""
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return q


def foreach_batch_upsert(stream_df: DataFrame, target_path: str, key_cols: list[str]):
    """Exactly-once-ish upsert sink: per micro-batch, anti-join the target
    on the key and append survivors (the MERGE emulation pattern — with
    Iceberg/Delta jars this becomes a real MERGE INTO)."""

    def _upsert(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        import os

        if os.path.exists(target_path):
            existing = spark.read.parquet(target_path)
            new_rows = batch_df.join(existing, on=key_cols, how="leftanti")
        else:
            new_rows = batch_df
        new_rows.write.mode("append").parquet(target_path)

    return (
        stream_df.writeStream.outputMode("append")
        .foreachBatch(_upsert)
        .trigger(availableNow=True)
    )
