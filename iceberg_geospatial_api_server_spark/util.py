"""Small shared utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, partitions: int | None = None, *cols: str) -> DataFrame:
    """Round-robin (or key-hash) repartition to the session's default
    parallelism.

    Used in front of compute-heavy per-row stages: a single-file /
    single-row-group scan yields one task, which would serialize the
    expensive stage regardless of cores. One small shuffle buys full
    parallelism — and on a real cluster the same call is the skew guard
    for hot input files."""
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, *cols) if cols else df.repartition(n)
