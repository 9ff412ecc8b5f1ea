"""Semantics tests for the windowed funnel and retention cohorts, on
hand-planted event sequences."""

from datetime import datetime, timedelta

import pandas as pd

from iceberg_geospatial_api_server_spark.operators.relational import (
    events_funnel,
    events_retention,
)


def _events(spark, rows):
    pdf = pd.DataFrame(
        rows, columns=["event_id", "user_id", "event_type", "ts"]
    )
    return spark.createDataFrame(
        pdf, "event_id long, user_id long, event_type string, ts timestamp"
    )


def _t(minute):
    return datetime(2024, 1, 1) + timedelta(minutes=minute)


def test_funnel_planted_sequences(spark):
    rows = [
        # user 1: full in-gap chain view(0) click(+5) purchase(+10)
        (1, 1, "view", _t(0)), (2, 1, "click", _t(5)), (3, 1, "purchase", _t(10)),
        # user 2: click arrives AFTER the 15-min gap — stops at view
        (4, 2, "view", _t(0)), (5, 2, "click", _t(30)), (6, 2, "purchase", _t(31)),
        # user 3: wrong order (click before any view) — click never
        # qualifies, purchase has no qualifying click
        (7, 3, "click", _t(0)), (8, 3, "view", _t(1)), (9, 3, "purchase", _t(2)),
        # user 4: view then purchase with no click — stops at view
        (10, 4, "view", _t(0)), (11, 4, "purchase", _t(3)),
        # user 5: two views; the SECOND one puts the late click in gap
        (12, 5, "view", _t(0)), (13, 5, "view", _t(20)),
        (14, 5, "click", _t(25)), (15, 5, "purchase", _t(26)),
    ]
    out = {
        r["step_name"]: r["n_users"]
        for r in events_funnel(_events(spark, rows), max_gap_minutes=15).collect()
    }
    assert out == {"view": 5, "click": 2, "purchase": 2}


def test_funnel_strictly_after_ties(spark):
    # click at the SAME timestamp as view but a later event_id counts
    # (strictly-after via the event_id tiebreak); same-ts earlier id not
    rows = [
        (2, 1, "view", _t(0)), (3, 1, "click", _t(0)),
        (5, 2, "click", _t(0)), (6, 2, "view", _t(0)),
    ]
    out = {
        r["step_name"]: r["n_users"]
        for r in events_funnel(
            _events(spark, rows), steps=("view", "click"), max_gap_minutes=15
        ).collect()
    }
    assert out == {"view": 2, "click": 1}


def test_retention_cohorts(spark):
    wk = 7 * 24 * 60
    rows = [
        # user 1 first seen week 0, active weeks 0 and 2
        (1, 1, "view", _t(0)), (2, 1, "view", _t(2 * wk + 5)),
        # user 2 first seen week 1, active week 1 only
        (3, 2, "view", _t(wk + 10)),
    ]
    out = events_retention(_events(spark, rows)).collect()
    table = {(r["cohort_week"], r["week_offset"]): r["n_users"] for r in out}
    base = min(c for c, _ in table)
    assert table[(base, 0)] == 1
    assert table[(base, 2)] == 1
    assert table[(base + 1, 0)] == 1
    assert len(table) == 3
