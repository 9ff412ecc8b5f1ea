"""Native geometry layer: WKB codec + Spark column functions.

The container has no DuckDB-spatial / shapely / Sedona, and at 100 TB the
hot path must stay JVM-side anyway — so geometry is a WKB ``binary``
interchange column (matching the reference and GeoParquet), decoded ONCE
per scan into plain double columns (x/y, bbox) by a vectorized Arrow
kernel; every predicate and aggregate after that is Spark built-in
arithmetic inside whole-stage codegen.
"""
