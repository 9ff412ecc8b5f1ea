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


FUNNEL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("stage", T.LongType()),
    ]
)

FUNNEL_STATE_SCHEMA = T.StructType(
    [T.StructField("latest_us", T.ArrayType(T.LongType()))]
)


def streaming_funnel(
    events: DataFrame,
    steps: tuple = ("view", "click", "purchase"),
    max_gap_minutes: int = 15,
) -> DataFrame:
    """Incremental windowed funnel: one state row per user holds the
    latest QUALIFYING timestamp per step; each micro-batch advances the
    chain and emits the user's furthest stage.

    Equivalent to the batch `relational.events_funnel` when events
    arrive in (ts, event_id) order per user (the state update is exactly
    the batch operator's running-max recurrence, applied incrementally).
    State is bounded by distinct users × len(steps) longs — never by
    event volume.
    """
    gap_us = max_gap_minutes * 60 * 1_000_000
    n_steps = len(steps)
    step_idx = {s: k for k, s in enumerate(steps)}

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        latest = list(state.get[0]) if state.exists else [-1] * n_steps
        chunks = list(pdfs)
        if chunks:
            # one sort over the WHOLE group: a user spanning several
            # Arrow chunks must still replay in (ts, event_id) order or
            # the chain diverges from the batch operator
            pdf = pd.concat(chunks).sort_values(["ts", "event_id"])
            # unit-safe epoch µs (pandas may hand back ns or µs datetimes)
            us_arr = pdf["ts"].values.astype("datetime64[us]").astype("int64")
            for et, us in zip(pdf["event_type"], us_arr):
                k = step_idx.get(et)
                if k is None:
                    continue
                us = int(us)
                if k == 0 or (
                    latest[k - 1] >= 0 and latest[k - 1] > us - gap_us
                ):
                    if us > latest[k]:
                        latest[k] = us
        state.update((latest,))
        stage = 0
        for k in range(n_steps):
            if latest[k] >= 0:
                stage = k + 1
            else:
                break
        yield pd.DataFrame({"user_id": [key[0]], "stage": [stage]})

    return (
        events.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            FUNNEL_OUTPUT_SCHEMA,
            FUNNEL_STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
