"""Iceberg table I/O — append/overwrite, MERGE upsert, time travel, and
metadata tables, expressed through Spark's DataSourceV2 API.

The reference's storage story is Iceberg end to end: a LakeKeeper REST
catalog attach (ref duckdb-init.sql:24-36), pyiceberg writes in the API
tier (ref api/main.py:492-604), and metadata tables like ``<tbl>.files``
(cookbook §1.7). The Spark-native equivalents used here are public
Iceberg-Spark runtime surface:

* writes   — ``df.writeTo(tbl).using("iceberg")`` append / replace
* upsert   — ``MERGE INTO`` (Iceberg implements row-level operations)
* travel   — ``VERSION AS OF`` / ``TIMESTAMP AS OF`` (or reader options
             ``snapshot-id`` / ``as-of-timestamp``)
* metadata — ``<tbl>.snapshots|files|history|manifests|partitions``

This container ships no Iceberg jars, so everything here is config-gated:
``iceberg_available()`` probes the session and the test suite skip-marks
itself when the runtime is absent. The code paths are real and run
unchanged on any cluster with ``iceberg-spark-runtime`` on the classpath
and a catalog configured (session.get_spark(enable_iceberg=True)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: metadata tables every Iceberg table exposes as ``<identifier>.<name>``
METADATA_TABLES = (
    "snapshots",
    "files",
    "history",
    "manifests",
    "partitions",
    "refs",
)


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg SparkCatalog is reachable in this session
    (runtime jar on the classpath AND at least one catalog configured)."""
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.iceberg.spark.SparkCatalog"
        )
    except Exception:
        return False
    confs = dict(spark.sparkContext.getConf().getAll())
    return any(
        k.startswith("spark.sql.catalog.") and v.endswith("SparkCatalog")
        for k, v in confs.items()
    )


_IDENT_PART = __import__("re").compile(r"^[A-Za-z0-9_][A-Za-z0-9_\-]*$")


def quote_ident(identifier: str) -> str:
    """Validate + backtick-quote each part of a dotted table identifier.

    Charset ALLOWLIST, not a backtick blocklist: several call sites also
    interpolate the identifier into single-quoted CALL/travel arguments,
    where an apostrophe (not a backtick) is the escape — so only
    [A-Za-z0-9_-] parts are accepted at all."""
    parts = identifier.split(".")
    for p in parts:
        if not p or not _IDENT_PART.match(p):
            raise ValueError(f"invalid table identifier: {identifier!r}")
    return ".".join(f"`{p}`" for p in parts)


# ---------------------------------------------------------------------------
# writes
# ---------------------------------------------------------------------------


def append(df: DataFrame, identifier: str) -> None:
    """Append rows to an existing Iceberg table (creates a new snapshot;
    a distributed, atomic commit — the Spark-side analog of the
    reference's pyiceberg ``table.append`` in api/main.py:560-575)."""
    df.writeTo(identifier).append()


def create_or_replace(
    df: DataFrame,
    identifier: str,
    partition_by: list[str] | None = None,
    table_props: dict[str, str] | None = None,
) -> None:
    """Create (or atomically replace) an Iceberg table from a DataFrame.

    ``partition_by`` becomes the Iceberg partition spec — at 100 TB pick
    low-cardinality ingest-time columns (day(ts), bucket(N, id)) so scan
    pruning works; Spark pushes partition predicates into the snapshot's
    manifest pruning."""
    from pyspark.sql import functions as F

    writer = df.writeTo(identifier).using("iceberg")
    for k, v in (table_props or {}).items():
        writer = writer.tableProperty(k, v)
    if partition_by:
        cols = [_partition_transform(F, c) for c in partition_by]
        writer = writer.partitionedBy(*cols)
    writer.createOrReplace()


def _partition_transform(F, spec: str):
    """Translate a textual partition spec entry into a Column transform:
    'col', 'days(col)', 'months(col)', 'years(col)', 'hours(col)',
    'bucket(16, col)', 'truncate(10, col)'."""
    import re

    # Spark 4 moved the DSv2 partition transforms to
    # pyspark.sql.functions.partitioning (the top-level F.days/F.bucket
    # aliases emit FutureWarnings)
    from pyspark.sql.functions import partitioning as P

    m = re.fullmatch(r"(\w+)\(([^)]*)\)", spec.strip())
    if not m:
        return F.col(spec.strip())
    fn, args = m.group(1).lower(), [a.strip() for a in m.group(2).split(",")]
    if fn in ("days", "months", "years", "hours"):
        return getattr(P, fn)(F.col(args[0]))
    if fn == "bucket":
        return P.bucket(int(args[0]), F.col(args[1]))
    if fn == "truncate":
        return P.truncate(int(args[0]), F.col(args[1]))
    raise ValueError(f"unsupported partition transform: {spec}")


def overwrite_partitions(df: DataFrame, identifier: str) -> None:
    """Dynamic partition overwrite: replace exactly the partitions present
    in ``df`` (idempotent backfill — the pattern for re-running one day of
    a 100 TB ingest without touching the rest)."""
    df.writeTo(identifier).overwritePartitions()


def merge_upsert(
    spark: SparkSession,
    target: str,
    source: DataFrame,
    key_cols: list[str],
    update_cols: list[str] | None = None,
) -> None:
    """MERGE INTO upsert: update matched rows, insert unmatched ones
    (the reference's upsert endpoint semantics, api/main.py:577-604).

    Iceberg executes this as a row-level operation (merge-on-read or
    copy-on-write per table property) — distributed, no driver loop."""
    import uuid

    # unique per call: concurrent merges on one SparkSession must not
    # clobber each other's source view (and no user view is shadowed)
    src_view = f"__merge_src_{uuid.uuid4().hex}"
    source.createOrReplaceTempView(src_view)
    try:
        tgt = quote_ident(target)
        # column names go through the same charset allowlist as table
        # identifiers — backtick-quoting alone is not validation
        keys = [quote_ident(c) for c in key_cols]
        on = " AND ".join(f"t.{c} = s.{c}" for c in keys)
        if update_cols is None:
            update_clause = "UPDATE SET *"
        else:
            sets = ", ".join(
                f"t.{q} = s.{q}" for q in (quote_ident(c) for c in update_cols)
            )
            update_clause = f"UPDATE SET {sets}"
        spark.sql(
            f"""
            MERGE INTO {tgt} t
            USING {src_view} s
            ON {on}
            WHEN MATCHED THEN {update_clause}
            WHEN NOT MATCHED THEN INSERT *
            """
        )
    finally:
        spark.catalog.dropTempView(src_view)


def delete_where(spark: SparkSession, identifier: str, predicate: str) -> None:
    """Row-level DELETE (Iceberg rewrites or position-deletes only the
    affected files). ``predicate`` must pass the engine's WHERE allowlist
    — this is the same client-facing surface as /query."""
    from iceberg_geospatial_api_server_spark.engine import sanitize_where

    if not predicate or not predicate.strip():
        # sanitize_where maps empty → the always-true "1=1"; for DELETE
        # that would silently wipe the table — demand an explicit predicate
        raise ValueError("delete_where requires a non-empty predicate")
    spark.sql(
        f"DELETE FROM {quote_ident(identifier)} WHERE {sanitize_where(predicate)}"
    )


# ---------------------------------------------------------------------------
# time travel
# ---------------------------------------------------------------------------


def read_table(spark: SparkSession, identifier: str) -> DataFrame:
    """Current-snapshot read (plain catalog read; scan pruning + filter
    pushdown arrive via the Iceberg DSv2 scan builder)."""
    return spark.table(identifier)


def read_snapshot(
    spark: SparkSession, identifier: str, snapshot_id: int
) -> DataFrame:
    """Time travel to an exact snapshot: ``VERSION AS OF``."""
    return spark.sql(
        f"SELECT * FROM {quote_ident(identifier)} VERSION AS OF {int(snapshot_id)}"
    )


def read_as_of(
    spark: SparkSession, identifier: str, timestamp: str
) -> DataFrame:
    """Time travel to the snapshot current at ``timestamp`` (an ISO-8601
    string): ``TIMESTAMP AS OF``."""
    if "'" in timestamp:
        raise ValueError(f"invalid timestamp literal: {timestamp!r}")
    return spark.sql(
        f"SELECT * FROM {quote_ident(identifier)} TIMESTAMP AS OF '{timestamp}'"
    )


def rollback_to(spark: SparkSession, identifier: str, snapshot_id: int) -> None:
    """Roll the table's current pointer back to ``snapshot_id`` (Iceberg
    stored procedure; metadata-only, instant at any scale)."""
    quote_ident(identifier)  # charset validation for the CALL arg below
    catalog = identifier.split(".")[0]
    spark.sql(
        f"CALL {catalog}.system.rollback_to_snapshot('{identifier}', {int(snapshot_id)})"
    )


# ---------------------------------------------------------------------------
# metadata tables
# ---------------------------------------------------------------------------


def metadata_table(
    spark: SparkSession, identifier: str, name: str
) -> DataFrame:
    """Read one of the table's metadata tables (``snapshots``, ``files``,
    ...) — the Spark answer to the reference's ``<tbl>.files`` queries
    (cookbook §1.7) and the FsCatalog's ``table_files`` analog."""
    if name not in METADATA_TABLES:
        raise ValueError(
            f"unknown metadata table {name!r}; one of {METADATA_TABLES}"
        )
    return spark.table(f"{identifier}.{name}")


def snapshots(spark: SparkSession, identifier: str) -> DataFrame:
    return metadata_table(spark, identifier, "snapshots")


def data_files(spark: SparkSession, identifier: str) -> DataFrame:
    """Per-file stats (record counts, sizes, per-column bounds). The
    column bounds are what make bbox-style pruning work for geo tables:
    persist __bbox_* min/max per file and Iceberg skips files wholesale."""
    return metadata_table(spark, identifier, "files")


def table_history(spark: SparkSession, identifier: str) -> DataFrame:
    return metadata_table(spark, identifier, "history")


def expire_snapshots(
    spark: SparkSession, identifier: str, older_than: str
) -> DataFrame:
    """Expire old snapshots (storage reclamation; required housekeeping
    at 100 TB write volume)."""
    if "'" in older_than:
        raise ValueError(f"invalid timestamp literal: {older_than!r}")
    quote_ident(identifier)  # charset validation for the CALL arg
    catalog = identifier.split(".")[0]
    return spark.sql(
        f"CALL {catalog}.system.expire_snapshots(table => '{identifier}', "
        f"older_than => TIMESTAMP '{older_than}')"
    )


_REWRITE_STRATEGIES = {"binpack", "sort"}


def rewrite_data_files(
    spark: SparkSession,
    identifier: str,
    strategy: str = "binpack",
    sort_order: str | None = None,
    where: str | None = None,
) -> DataFrame:
    """Compact small files (the other half of 100 TB housekeeping:
    streaming/MERGE write patterns fragment tables, and scan throughput
    tracks file size). `where` limits the rewrite to recent partitions
    and passes through the engine's WHERE allowlist."""
    if strategy not in _REWRITE_STRATEGIES:
        raise ValueError(f"unknown rewrite strategy: {strategy!r}")
    quote_ident(identifier)  # validates charset
    args = [f"table => '{identifier}'", f"strategy => '{strategy}'"]
    if sort_order is not None:
        from iceberg_geospatial_api_server_spark.engine import sanitize_order

        sanitize_order(sort_order)  # raises on anything but col [ASC|DESC]
        args.append(f"sort_order => '{sort_order}'")
    if where is not None:
        from iceberg_geospatial_api_server_spark.engine import sanitize_where

        clean = sanitize_where(where).replace("'", "''")  # quote for CALL arg
        args.append(f"where => '{clean}'")
    catalog = identifier.split(".")[0]
    return spark.sql(
        f"CALL {catalog}.system.rewrite_data_files({', '.join(args)})"
    )


def rewrite_manifests(spark: SparkSession, identifier: str) -> DataFrame:
    """Rewrite manifest files so partition-pruning metadata stays
    clustered after many small commits."""
    quote_ident(identifier)
    catalog = identifier.split(".")[0]
    return spark.sql(
        f"CALL {catalog}.system.rewrite_manifests(table => '{identifier}')"
    )


def remove_orphan_files(
    spark: SparkSession, identifier: str, older_than: str | None = None
) -> DataFrame:
    """Delete files no snapshot references (failed-job debris)."""
    quote_ident(identifier)
    args = [f"table => '{identifier}'"]
    if older_than is not None:
        if "'" in older_than:
            raise ValueError(f"invalid timestamp literal: {older_than!r}")
        args.append(f"older_than => TIMESTAMP '{older_than}'")
    catalog = identifier.split(".")[0]
    return spark.sql(
        f"CALL {catalog}.system.remove_orphan_files({', '.join(args)})"
    )
