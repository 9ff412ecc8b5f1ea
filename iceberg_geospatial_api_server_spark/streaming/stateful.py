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
from pyspark.sql import functions as F
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


PACK_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("shard", T.IntegerType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("stream_offset", T.LongType()),
        T.StructField("pack_first", T.LongType()),
        T.StructField("pack_last", T.LongType()),
        T.StructField("n_packs", T.LongType()),
    ]
)

PACK_STATE_SCHEMA = T.StructType(
    [T.StructField("cum_tokens", T.LongType())]
)


def streaming_pack(
    docs: DataFrame, max_tokens: int = 512, n_shards: int = 32
) -> DataFrame:
    """Incremental sequence packing: the streaming analog of
    `operators.text.pack_sequences` for a corpus that arrives over time
    (the daily-ingest training-data pattern — new documents extend each
    shard's token stream without repacking history).

    One state row per shard holds that stream's running token count;
    each micro-batch appends its documents (doc_id order within the
    batch) and emits their pack assignments. Equivalent to the batch
    operator when batches arrive in doc_id order, asserted in
    tests/test_streaming.py. State is n_shards longs — independent of
    corpus size.
    """
    from pyspark.sql import functions as F

    from iceberg_geospatial_api_server_spark.operators.sampling import id_hash
    from iceberg_geospatial_api_server_spark.operators.text import token_count

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        cum = state.get[0] if state.exists else 0
        chunks = list(pdfs)
        if chunks:
            pdf = pd.concat(chunks).sort_values("doc_id")
            ends = cum + pdf["n_tokens"].cumsum()
            offsets = ends - pdf["n_tokens"]
            cum = int(ends.iloc[-1])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "shard": pdf["shard"].values,
                    "n_tokens": pdf["n_tokens"].values,
                    "stream_offset": offsets.values,
                    "pack_first": (offsets // max_tokens).values,
                    "pack_last": ((ends - 1) // max_tokens).values,
                    "n_packs": (
                        (ends - 1) // max_tokens - offsets // max_tokens + 1
                    ).values,
                }
            )
        state.update((cum,))

    base = docs.select(
        F.col("doc_id"),
        F.pmod(id_hash(F.col("doc_id")), F.lit(n_shards))
        .cast("int")
        .alias("shard"),
        token_count(F.col("text")).cast("long").alias("n_tokens"),
    )
    return base.groupBy("shard").applyInPandasWithState(
        update,
        PACK_OUTPUT_SCHEMA,
        PACK_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


BOILERPLATE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("seg_hash", T.LongType()),
        T.StructField("n_seen", T.LongType()),
    ]
)

BOILERPLATE_STATE_SCHEMA = T.StructType(
    [T.StructField("n_seen", T.LongType())]
)


def boilerplate_segments_stream(
    docs_stream: DataFrame,
    seg_tokens: int = 10,
    min_seen: int = 2,
) -> DataFrame:
    """Streaming boilerplate registry — the continuous form of
    `text.segment_dedup_stats`: as documents arrive, k-word segments
    hash map-side (shared `segment_hashes` kernel) and one state row
    per segment hash accumulates its occurrence count. A hash is
    emitted exactly ONCE — in the micro-batch where its count crosses
    ``min_seen`` — so the output stream IS the growing boilerplate set
    a line-dedup pass would strip.

    State is one long per distinct segment (bounded by content, not
    traffic); the batch dual for the equivalence test is the occurrence-
    count filter (the batch operator's distinct-doc gate differs only
    for segments repeating WITHIN a document — rare boilerplate-wise,
    and the streaming form must not keep a per-key doc set, which would
    grow unboundedly)."""
    from iceberg_geospatial_api_server_spark.operators.text import (
        segment_hashes,
    )

    segs = segment_hashes(docs_stream, seg_tokens).select(
        F.col("__h").alias("seg_hash")
    )

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n = state.get[0] if state.exists else 0
        add = sum(len(pdf) for pdf in pdfs)
        was_boiler = n >= min_seen
        n += add
        state.update((n,))
        if not was_boiler and n >= min_seen:
            yield pd.DataFrame({"seg_hash": [key[0]], "n_seen": [n]})

    return segs.groupBy("seg_hash").applyInPandasWithState(
        update,
        BOILERPLATE_OUTPUT_SCHEMA,
        BOILERPLATE_STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )


CUSUM_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_alarms", T.LongType()),
        T.StructField("max_cusum", T.LongType()),
        T.StructField("first_alarm_s", T.LongType()),
    ]
)

CUSUM_STATE_SCHEMA = T.StructType(
    [
        T.StructField("s", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_alarms", T.LongType()),
        T.StructField("max_cusum", T.LongType()),
        T.StructField("first_alarm_us", T.LongType()),
    ]
)


def streaming_cusum(
    events: DataFrame, drift: float = 60.0, threshold: float = 500.0
) -> DataFrame:
    """Real-time CUSUM drift alarms — the continuous form of
    `relational.events_cusum`: one state row per user carries the
    running CUSUM value (plus alarm stats), so each micro-batch extends
    the detector without reprocessing history. State is 5 longs per
    user, independent of event volume.

    Within a batch the recursion runs VECTORIZED via the same closed
    form the batch operator uses, generalized to a nonzero carry-in:
    with P = s_prev + cumsum(d), S = P − min(0, running_min(P)) — no
    per-event Python loop. Stream ≡ batch equivalence holds for
    ts-ordered arrival per user (the ingest pattern; asserted in
    tests/test_streaming.py)."""
    import numpy as np

    drift_c = int(round(drift * 100))
    thr_c = int(round(threshold * 100))

    def update(key, pdfs, state):
        if state.exists:
            s, n, na, mx, first = state.get
        else:
            s, n, na, mx, first = 0, 0, 0, 0, None
        # concat ALL of the group's Arrow chunks before sorting (the
        # running_user_totals/funnel convention): a user's batch can
        # span chunks, and per-chunk sorting would run the recursion
        # over mis-ordered deltas
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks).sort_values(["ts", "event_id"])
            cents = np.floor(
                pdf["value"].to_numpy(dtype="f8") * 100.0 + 0.5
            ).astype(np.int64)
            p = s + np.cumsum(cents - drift_c)
            m = np.minimum(np.minimum.accumulate(p), 0)
            sv = p - m
            n += len(sv)
            mx = max(mx, int(sv.max()))
            alarms = sv > thr_c
            na += int(alarms.sum())
            if first is None and alarms.any():
                ts_ns = pdf["ts"].to_numpy("datetime64[ns]").astype(np.int64)
                first = int(ts_ns[np.argmax(alarms)] // 1_000)
            s = int(sv[-1])
        state.update((s, n, na, mx, first))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "n_alarms": [na],
                "max_cusum": [mx],
                "first_alarm_s": [
                    None if first is None else first // 1_000_000
                ],
            }
        )

    return (
        events.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            CUSUM_OUTPUT_SCHEMA,
            CUSUM_STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


# --------------------------------------------------------------------------
# transformWithState (Spark 4's arbitrary-state API, successor to
# applyInPandasWithState): typed state handles (ValueState/ListState/
# MapState), timers, TTL, and schema evolution over the RocksDB store.
# ENVIRONMENT-GATED in this container exactly like the Iceberg runtime
# jar: the TWS state protocol needs the `protobuf` Python package
# (pyspark's StateMessage_pb2 imports google.protobuf at worker init —
# probed: ImportError, no network route to install). The processor logic
# is therefore tested DIRECTLY (fake state handle, cross-batch replay in
# tests/test_streaming.py) and the end-to-end stream ≡ batch test is
# skip-marked until the one pip install lands — the tools/iceberg_smoke
# pattern applied to a Python dependency.
# --------------------------------------------------------------------------


def tws_available() -> bool:
    """True when transformWithStateInPandas can actually run: its state
    server protocol imports google.protobuf in the Python driver
    worker."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


try:  # the base class imports cleanly without protobuf; guard anyway
    from pyspark.sql.streaming import StatefulProcessor as _StatefulProcessor
except ImportError:  # pragma: no cover - ancient pyspark
    _StatefulProcessor = object


class RunningCountsProcessor(_StatefulProcessor):
    """Per-user running (n_events, sum_cents) on the NEW typed-state
    API: one ValueState row per user, integer-cents accumulation (the
    events_cusum convention — cross-batch merge order cannot move a
    double). Emits the running totals for the key once per micro-batch
    it appears in (update semantics, same contract as
    running_user_totals)."""

    def init(self, handle) -> None:
        self._state = handle.getValueState("agg", "n long, cents long")

    def handleInputRows(self, key, rows, timer_values):
        import numpy as np

        if self._state.exists():
            n, cents = self._state.get()
        else:
            n, cents = 0, 0
        for pdf in rows:
            n += len(pdf)
            # NULL values arrive as NaN; np.floor(NaN).astype(int64) is
            # INT64_MIN garbage — skip them like SQL SUM / the pandas
            # .sum() of the applyInPandasWithState twin (review finding)
            vals = pdf["value"].to_numpy(dtype="float64")
            vals = vals[~np.isnan(vals)]
            cents += int(
                np.floor(vals * 100.0 + 0.5).astype("int64").sum()
            )
        self._state.update((n, cents))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "sum_cents": [cents],
            }
        )

    def close(self) -> None:
        pass


def streaming_user_counts_tws(events: DataFrame) -> DataFrame:
    """running_user_totals' twin on transformWithStateInPandas. Caller
    must run on a session whose state store provider is RocksDB (TWS
    requires it) and an environment where ``tws_available()``."""
    return events.select("user_id", "ts", "value").groupBy(
        "user_id"
    ).transformWithStateInPandas(
        RunningCountsProcessor(),
        "user_id long, n_events long, sum_cents long",
        "Update",
        "none",
    )
