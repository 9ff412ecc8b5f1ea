"""Catalog-change notification channel.

Spark-native analog of the reference's push path (ref api/main.py:938-1066:
``ConnectionManager`` fan-out over WebSockets + ``POST /api/agent/notify``
computing a table bbox and pushing a ``layer_ready`` event to every
subscriber of a session). HTTP/WebSocket serving is out of scope for the
engine; the *capability* — "a new layer/snapshot landed, tell consumers,
with its extent" — maps to:

- ``LayerNotifier``: in-process subscriber registry (session_id →
  callbacks), the ConnectionManager analog. Callbacks are pluggable: a
  websocket relay, a queue producer, a test list — the engine doesn't care.
- ``notify_layer_ready``: batch analog of the notify endpoint — one Spark
  job computes row_count + extent of a catalog table, one event fires.
  A bbox failure still notifies with ``bbox=None``, matching the
  reference's try/except-then-notify.
- ``notified_append_sink``: Structured Streaming analog — a
  ``foreachBatch`` sink that appends each micro-batch to the layer path
  and emits exactly one event per non-empty batch with the BATCH's
  extent (so consumers can pan to what just landed, not re-scan the
  table).

Scale: the summary aggregation is a single count+min/max agg — map-side
partial aggregation, one scan, no collect beyond the 1-row summary.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class LayerEvent:
    """The ``layer_ready`` wire event (ref api/main.py:1036-1043)."""

    event_type: str
    namespace: str
    table: str
    row_count: int
    bbox: list | None = None
    description: str = ""
    batch_id: int | None = None  # streaming only

    def to_dict(self) -> dict:
        return {
            "type": self.event_type,
            "namespace": self.namespace,
            "table": self.table,
            "row_count": self.row_count,
            "bbox": self.bbox,
            "description": self.description,
            **({"batch_id": self.batch_id} if self.batch_id is not None else {}),
        }


@dataclass
class LayerNotifier:
    """Session-scoped subscriber registry (ref ConnectionManager,
    api/main.py:938-975). Thread-safe: foreachBatch callbacks run on
    streaming-execution threads."""

    _subs: dict[str, list[Callable[[LayerEvent], None]]] = field(
        default_factory=dict
    )
    _lock: threading.Lock = field(default_factory=threading.Lock)

    def subscribe(
        self, session_id: str, callback: Callable[[LayerEvent], None]
    ) -> Callable[[], None]:
        """Register a callback; returns its unsubscribe function."""
        with self._lock:
            self._subs.setdefault(session_id, []).append(callback)

        def unsubscribe() -> None:
            with self._lock:
                subs = self._subs.get(session_id, [])
                if callback in subs:
                    subs.remove(callback)
                if not subs:
                    self._subs.pop(session_id, None)

        return unsubscribe

    def emit(self, session_id: str, event: LayerEvent) -> int:
        """Deliver to every subscriber of the session; a failing callback
        is skipped (the ref ignores stale websockets the same way,
        api/main.py:962-966). Returns the delivery count."""
        with self._lock:
            subs = list(self._subs.get(session_id, []))
        delivered = 0
        for cb in subs:
            try:
                cb(event)
                delivered += 1
            except Exception:
                pass
        return delivered


def layer_summary(
    df: DataFrame, geom_col: str | None = None
) -> tuple[int, list | None]:
    """(row_count, [xmin, ymin, xmax, ymax] | None) in ONE aggregation job.

    Mirrors the notify endpoint's ST_Extent query (ref api/main.py:1018-
    1031) but fuses the count in, so an append notification costs a single
    scan. Geometry column auto-detected when not given; tables without one
    summarize as count-only (bbox=None) — the event still fires.
    """
    from iceberg_geospatial_api_server_spark.catalog import (
        detect_geometry_column,
    )
    from iceberg_geospatial_api_server_spark.geo import functions as G

    geom = geom_col or detect_geometry_column(df.schema)
    aggs = [F.count(F.lit(1)).alias("__n")]
    if geom is not None:
        src = df if "__bbox_xmin" in df.columns else G.with_bbox(df, geom)
        aggs += [
            F.min("__bbox_xmin").alias("xmin"),
            F.min("__bbox_ymin").alias("ymin"),
            F.max("__bbox_xmax").alias("xmax"),
            F.max("__bbox_ymax").alias("ymax"),
        ]
    else:
        src = df
    row = src.agg(*aggs).first()
    bbox = None
    if geom is not None and row["xmin"] is not None:
        bbox = [row["xmin"], row["ymin"], row["xmax"], row["ymax"]]
    return row["__n"], bbox


def notify_layer_ready(
    catalog,
    namespace: str,
    table: str,
    notifier: LayerNotifier,
    session_id: str,
    description: str = "",
    geom_col: str | None = None,
) -> LayerEvent:
    """Batch analog of POST /api/agent/notify/{session}: summarize the
    catalog table, emit one ``layer_ready`` event, return it."""
    df = catalog.load(table, namespace)
    try:
        n, bbox = layer_summary(df, geom_col)
    except Exception:
        # ref behavior: bbox computation failure must not swallow the
        # notification (api/main.py:1032-1034)
        n, bbox = df.count(), None
    event = LayerEvent("layer_ready", namespace, table, n, bbox, description)
    notifier.emit(session_id, event)
    return event


def notified_append_sink(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    notifier: LayerNotifier,
    session_id: str,
    namespace: str,
    table: str,
    geom_col: str | None = None,
    description: str = "",
    trigger_available_now: bool = True,
):
    """Streaming layer feed: append each micro-batch to ``path`` and emit
    exactly one ``layer_ready`` event per NON-EMPTY batch carrying that
    batch's row count + extent.

    foreachBatch (not a plain file sink) because the event needs the
    batch summary: the batch DataFrame is aggregated once for
    count+bbox, then written — two actions on a micro-batch-local frame.
    Empty batches write nothing and notify nothing.
    """

    def handle(batch: DataFrame, batch_id: int) -> None:
        n, bbox = layer_summary(batch, geom_col)
        if n == 0:
            return
        batch.write.mode("append").parquet(path)
        notifier.emit(
            session_id,
            LayerEvent(
                "layer_ready", namespace, table, n, bbox, description, batch_id
            ),
        )

    writer = (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(handle)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def make_versioned_batch_handler(
    table,
    checkpoint: str,
    notifier: LayerNotifier,
    session_id: str,
    namespace: str,
    table_name: str,
    geom_col: str | None = None,
    description: str = "",
):
    """The foreachBatch handler behind `versioned_append_sink`, exposed
    so the replay contract is testable without a streaming query: a
    batch_id whose `checkpoint#batch_id` ref already committed is a
    no-op — no duplicate snapshot, no second layer_ready event (the
    batch-id dedup real Iceberg foreachBatch sinks use)."""

    def handle(batch: DataFrame, batch_id: int) -> None:
        # replay guard: if the query failed after table.append() but
        # before the checkpoint committed, restart re-runs this batch_id
        batch_ref = f"{checkpoint}#{batch_id}"
        if table.version_for_batch(batch_ref) is not None:
            return
        n, bbox = layer_summary(batch, geom_col)
        if n == 0:
            return
        version = table.append(batch, batch_ref=batch_ref)
        notifier.emit(
            session_id,
            LayerEvent(
                "layer_ready",
                namespace,
                table_name,
                n,
                bbox,
                f"version={version};{description}",
                batch_id,
            ),
        )

    return handle


def versioned_append_sink(
    stream_df: DataFrame,
    table,  # sources.fs_versioned.VersionedTable
    checkpoint: str,
    notifier: LayerNotifier,
    session_id: str,
    namespace: str,
    table_name: str,
    geom_col: str | None = None,
    description: str = "",
    trigger_available_now: bool = True,
):
    """Snapshot-per-batch ingest: each non-empty micro-batch commits ONE
    immutable snapshot to a `VersionedTable` and the `layer_ready` event
    carries that snapshot's VERSION in its description
    (``version=N;<description>``) — so a consumer can time-travel to
    exactly the data the event announced, the missing piece of a plain
    append feed (by the time a reader scans, later batches may have
    landed).

    Composes the reference's two storage ideas — Iceberg snapshot
    commits and the layer_ready push (ref api/main.py:938-1066) — in one
    streaming sink; the batch is aggregated once for count+bbox, then
    committed.
    """
    handle = make_versioned_batch_handler(
        table, checkpoint, notifier, session_id, namespace, table_name,
        geom_col, description,
    )

    writer = (
        stream_df.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(handle)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
