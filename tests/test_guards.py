"""The r8 in-plan precondition guards must FIRE, not just pass.

Both sketch-contract entries certify their oracle's exact regime with
an assert_true over a 1-row broadcast aggregate (ADVICE r7 items 2-3).
The passing path is exercised by every driver run; these tests build
crafted parquet corpora that BREAK each precondition and assert the
loud in-plan failure (a silent pass here would mean a corpus change
reds the oracle with an opaque hash mismatch instead)."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql.utils import AnalysisException  # noqa: F401


def _write_events(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "ts timestamp, user_id long, event_type string"
    )
    out = str(tmp_path / "events.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(out)
    return str(tmp_path)


def _fires(df, needle):
    with pytest.raises(Exception) as ei:
        df.collect()
    assert needle in str(ei.value)


def test_topk_sketch_guard_fires_on_wide_ndv(spark, tmp_path):
    # 20 event types > k=16: the result set can no longer carry every
    # item, so the exact GROUP BY oracle stops applying — the entry
    # must fail with its diagnostic, not return a top-16 subset
    from iceberg_geospatial_api_server_spark.entry_queries import QUERIES

    base = datetime(2024, 1, 1)
    rows = [
        (base + timedelta(minutes=i), i % 7, f"type_{i % 20}")
        for i in range(200)
    ]
    sf_dir = _write_events(spark, tmp_path, rows)
    _fires(
        QUERIES["events_topk_sketch"](spark, sf_dir),
        "events_topk_sketch exact-regime precondition broken",
    )


def test_theta_retention_guard_fires_on_estimation_mode(spark, tmp_path):
    # 5000 distinct users in one day > 4096 nominal entries: the theta
    # sketch enters estimation mode and the 5% bar is no longer a
    # deterministic certificate — the entry must fail loudly
    from iceberg_geospatial_api_server_spark.entry_queries import QUERIES

    base = datetime(2024, 1, 1)
    rows = [(base + timedelta(seconds=u % 86000), u, "a") for u in range(5000)]
    rows += [(base + timedelta(days=1, seconds=1), 1, "a")]
    sf_dir = _write_events(spark, tmp_path, rows)
    _fires(
        QUERIES["events_theta_retention"](spark, sf_dir),
        "events_theta_retention contract precondition broken",
    )


def test_guards_pass_on_the_real_corpus(spark, sf_dir):
    # and the same plans evaluate cleanly where the preconditions hold
    from iceberg_geospatial_api_server_spark.entry_queries import QUERIES

    assert QUERIES["events_topk_sketch"](spark, sf_dir).count() > 0
    assert QUERIES["events_theta_retention"](spark, sf_dir).count() > 0


def test_versioned_asof_guard_fires_on_tampered_manifest(spark, tmp_path):
    # versioned_read_asof's in-plan guard: a manifest whose v2 commit
    # timestamp predates v1 makes TIMESTAMP AS OF at t_v1 resolve to
    # the WRONG snapshot — the as-of≡version multiset guard must fail
    # the action loudly, not serve divergent reads
    import json
    import os

    from iceberg_geospatial_api_server_spark.sources.fs_versioned import (
        VersionedTable,
    )
    from iceberg_geospatial_api_server_spark.util import (
        multiset_equal_guard,
    )

    vt = VersionedTable(spark, str(tmp_path / "t"))
    vt.overwrite(spark.createDataFrame([(1, "a")], "id long, v string"))
    vt.append(spark.createDataFrame([(2, "b")], "id long, v string"))
    t_v1 = {r["version"]: r["ts_us"] for r in vt.history().collect()}[1]

    def guard():
        return multiset_equal_guard(
            vt.read(version=1),
            vt.read(as_of_us=t_v1),
            ["id", "v"],
            "versioned time travel broke",
        )

    # untampered: the guard passes (NULL __g row)
    assert guard().collect()[0]["__g"] is None

    mp = os.path.join(str(tmp_path / "t"), VersionedTable.MANIFEST)
    with open(mp) as f:
        snaps = json.load(f)
    snaps[1]["ts_us"] = snaps[0]["ts_us"] - 10
    with open(mp, "w") as f:
        json.dump(snaps, f)
    _fires(guard(), "versioned time travel broke")


def test_multiset_guard_null_keys_match_null_safely(spark):
    # ADVICE r9: NULL-keyed groups identical on both sides must MATCH
    # (eqNullSafe join), not false-fire; an actual NULL-side imbalance
    # must still fire
    from iceberg_geospatial_api_server_spark.util import (
        multiset_equal_guard,
    )

    a = spark.createDataFrame(
        [(None, "x"), (None, "x"), (1, "y")], "k int, v string"
    )
    b = spark.createDataFrame(
        [(None, "x"), (None, "x"), (1, "y")], "k int, v string"
    )
    assert (
        multiset_equal_guard(a, b, ["k", "v"], "null keys broke")
        .collect()[0]["__g"]
        is None
    )
    c = spark.createDataFrame([(None, "x"), (1, "y")], "k int, v string")
    _fires(
        multiset_equal_guard(a, c, ["k", "v"], "null keys broke"),
        "null keys broke",
    )
