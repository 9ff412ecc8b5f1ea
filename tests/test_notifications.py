"""Layer-ready notification channel (ref api/main.py:938-1066: WebSocket
ConnectionManager + /api/agent/notify bbox push), re-expressed as a
pluggable callback registry + single-scan summaries + a foreachBatch
streaming sink."""

import time

import pytest
from pyspark.sql import types as T

from iceberg_geospatial_api_server_spark.catalog import FsCatalog
from iceberg_geospatial_api_server_spark.geo import wkb as W
from iceberg_geospatial_api_server_spark.streaming.notifications import (
    LayerEvent,
    LayerNotifier,
    notified_append_sink,
    notify_layer_ready,
)

SCHEMA = T.StructType(
    [T.StructField("fid", T.LongType()), T.StructField("geometry", T.BinaryType())]
)


def _geom_df(spark, coords):
    rows = [
        (i, bytearray(W.encode_point(float(x), float(y))))
        for i, (x, y) in enumerate(coords)
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_notify_layer_ready_batch(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("notify_lake")
    _geom_df(spark, [(1, 2), (7, -3), (4, 9)]).write.parquet(
        str(root / "ns" / "pts")
    )
    catalog = FsCatalog(spark, str(root))
    notifier = LayerNotifier()
    got: list[LayerEvent] = []
    unsub = notifier.subscribe("sess-1", got.append)

    ev = notify_layer_ready(catalog, "ns", "pts", notifier, "sess-1", "demo")
    assert len(got) == 1, "an append must produce exactly one event"
    assert got[0] is ev
    assert ev.event_type == "layer_ready"
    assert (ev.namespace, ev.table, ev.row_count) == ("ns", "pts", 3)
    assert ev.bbox == [1.0, -3.0, 7.0, 9.0]
    assert ev.to_dict()["type"] == "layer_ready"

    # unsubscribe stops delivery; emit reports 0 subscribers
    unsub()
    ev2 = notify_layer_ready(catalog, "ns", "pts", notifier, "sess-1")
    assert len(got) == 1 and ev2.row_count == 3


def test_notify_without_geometry_still_fires(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("notify_plain")
    spark.createDataFrame([(1, "a"), (2, "b")], "id LONG, name STRING").write.parquet(
        str(root / "ns" / "plain")
    )
    notifier = LayerNotifier()
    got = []
    notifier.subscribe("s", got.append)
    ev = notify_layer_ready(FsCatalog(spark, str(root)), "ns", "plain", notifier, "s")
    assert len(got) == 1
    assert ev.row_count == 2 and ev.bbox is None


def test_failing_subscriber_does_not_block_others():
    notifier = LayerNotifier()
    got = []

    def bad(_ev):
        raise RuntimeError("stale websocket")

    notifier.subscribe("s", bad)
    notifier.subscribe("s", got.append)
    ev = LayerEvent("layer_ready", "n", "t", 1)
    assert notifier.emit("s", ev) == 1
    assert got == [ev]
    # sessions are isolated
    assert notifier.emit("other-session", ev) == 0


def test_streaming_append_notifies_per_batch(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("notify_stream")
    src, out = str(base / "src"), str(base / "layer")
    _geom_df(spark, [(0, 0), (10, 5)]).coalesce(1).write.parquet(src)

    notifier = LayerNotifier()
    got: list[LayerEvent] = []
    notifier.subscribe("sess", got.append)

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = notified_append_sink(
        stream,
        out,
        str(base / "ckpt"),
        notifier,
        "sess",
        "ns",
        "layer",
    )
    q.awaitTermination(60)
    assert len(got) == 1, "first ingest batch → exactly one event"
    assert got[0].row_count == 2
    assert got[0].bbox == [0.0, 0.0, 10.0, 5.0]
    assert got[0].batch_id is not None
    assert spark.read.parquet(out).count() == 2

    # a second append lands as a NEW batch on restart → exactly one more
    # event, with the extent of the appended slice only
    time.sleep(1.1)  # distinct mtime so the file source sees a new file
    _geom_df(spark, [(-4, -2)]).coalesce(1).write.mode("append").parquet(src)
    q2 = notified_append_sink(
        spark.readStream.schema(SCHEMA).parquet(src),
        out,
        str(base / "ckpt"),
        notifier,
        "sess",
        "ns",
        "layer",
    )
    q2.awaitTermination(60)
    assert len(got) == 2
    assert got[1].row_count == 1
    assert got[1].bbox == [-4.0, -2.0, -4.0, -2.0]
    assert spark.read.parquet(out).count() == 3


def test_versioned_sink_snapshot_per_batch_time_travel(spark, tmp_path_factory):
    """Each micro-batch commits one snapshot; the event names the version
    and time-traveling to it returns EXACTLY the announced rows even
    after later batches land."""
    from iceberg_geospatial_api_server_spark.sources.fs_versioned import (
        VersionedTable,
    )
    from iceberg_geospatial_api_server_spark.streaming.notifications import (
        versioned_append_sink,
    )

    base = tmp_path_factory.mktemp("versioned_stream")
    src = str(base / "src")
    _geom_df(spark, [(0, 0), (10, 5)]).coalesce(1).write.parquet(src)

    vt = VersionedTable(spark, str(base / "tbl"))
    notifier = LayerNotifier()
    got: list[LayerEvent] = []
    notifier.subscribe("sess", got.append)

    q = versioned_append_sink(
        spark.readStream.schema(SCHEMA).parquet(src),
        vt,
        str(base / "ckpt"),
        notifier,
        "sess",
        "ns",
        "layer",
    )
    q.awaitTermination(60)
    assert len(got) == 1
    assert got[0].description.startswith("version=1;")
    assert vt.read(version=1).count() == 2

    time.sleep(1.1)
    _geom_df(spark, [(-4, -2)]).coalesce(1).write.mode("append").parquet(src)
    q2 = versioned_append_sink(
        spark.readStream.schema(SCHEMA).parquet(src),
        vt,
        str(base / "ckpt"),
        notifier,
        "sess",
        "ns",
        "layer",
    )
    q2.awaitTermination(60)
    assert len(got) == 2
    assert got[1].description.startswith("version=2;")
    assert got[1].row_count == 1
    # the event's version pins the announced data forever
    assert vt.read(version=1).count() == 2
    assert vt.read(version=2).count() == 3
    assert vt.read().count() == 3
    h = {r.version: r.operation for r in vt.history().collect()}
    assert h == {1: "append", 2: "append"}
