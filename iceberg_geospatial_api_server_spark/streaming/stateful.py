"""Custom stateful streaming operator via applyInPandasWithState.

`running_user_totals` keeps one state row per user (cumulative value +
event count) and emits an update whenever a micro-batch touches the user —
the canonical shape for per-key accumulators, anomaly counters, and CDC
enrichment that windowed aggregates can't express. State is bounded by
the number of distinct keys, not events.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("threshold_crossings", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("crossings", T.LongType()),
    ]
)


def running_user_totals(
    events: DataFrame, threshold: float = 1000.0
) -> DataFrame:
    """Per-user cumulative totals with threshold-crossing counts."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, total, crossings = state.get
        else:
            n, total, crossings = 0, 0.0, 0
        for pdf in pdfs:
            n += len(pdf)
            before = int(total // threshold)
            total += float(pdf["value"].sum())
            crossings += int(total // threshold) - before
        state.update((n, total, crossings))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 4)],
                "threshold_crossings": [crossings],
            }
        )

    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
