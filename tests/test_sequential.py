"""Sequential event analytics: the CUSUM prefix-sum closed form must
equal the textbook max(0, ...) recursion, and hopping windows must cover
each event exactly size/hop times."""

import datetime as dt

from pyspark.sql import functions as F

from iceberg_geospatial_api_server_spark.operators.relational import (
    events_cusum,
    events_hopping_agg,
)
from iceberg_geospatial_api_server_spark.plans.explain import (
    hash_exchange_count,
)


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), uid, "e", v, "{}")
            for i, (uid, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def _ref_cusum(values, drift, threshold):
    """The textbook recursion, in cents."""
    s, n_alarms, mx, first = 0, 0, 0, None
    for i, v in enumerate(values):
        s = max(0, s + int(v * 100 + 0.5) - int(drift * 100))
        mx = max(mx, s)
        if s > threshold * 100:
            n_alarms += 1
            if first is None:
                first = i
    return n_alarms, mx, first


def test_cusum_matches_textbook_recursion(spark):
    """A spike-then-recover sequence: the closed form (prefix sum minus
    running min) must reproduce the recursion's resets exactly."""
    seqs = {
        1: [10.0, 10.0, 95.0, 90.0, 5.0, 5.0, 80.0, 85.0, 90.0],
        2: [50.0] * 8,
        3: [5.0, 200.0, 5.0, 5.0, 5.0, 190.0, 180.0],
    }
    rows = [(uid, v) for uid, vs in seqs.items() for v in vs]
    out = {
        r.user_id: r
        for r in events_cusum(_events(spark, rows), drift=50.0, threshold=1.5).collect()
    }
    for uid, vs in seqs.items():
        n_alarms, mx, _ = _ref_cusum(vs, 50.0, 1.5)
        assert out[uid].n_alarms == n_alarms, uid
        assert out[uid].max_cusum == mx, uid


def test_cusum_reset_clamps_at_zero(spark):
    """Long negative drift then a spike: S must restart from 0 at the
    spike, not from the accumulated negative sum."""
    vs = [1.0] * 20 + [300.0]
    out = events_cusum(_events(spark, [(7, v) for v in vs]), drift=50.0, threshold=1.0).collect()[0]
    # last value alone: max(0, 0 + 30000 - 5000) = 25000 cents
    assert out.max_cusum == 25000
    assert out.n_alarms == 1
    assert out.first_alarm_s is not None


def test_cusum_no_alarm_below_threshold(spark):
    out = events_cusum(
        _events(spark, [(1, 10.0), (1, 12.0), (1, 9.0)]), drift=50.0, threshold=100.0
    ).collect()[0]
    assert out.n_alarms == 0 and out.first_alarm_s is None
    assert out.max_cusum == 0


def test_hopping_conservation_and_fanout(spark):
    rows = [(u, float(u * 10 + j)) for u in range(1, 4) for j in range(5)]
    df = _events(spark, rows)
    out = events_hopping_agg(df, size_minutes=240, hop_minutes=60)
    # every event appears in exactly size/hop = 4 windows
    assert out.agg(F.sum("n_events")).collect()[0][0] == len(rows) * 4
    # each window_start aligns to the hop and spans ascending hops
    starts = sorted({r.window_start for r in out.collect()})
    assert all(s % 3600 == 0 for s in starts)
    assert len(starts) == 4  # 15 one-minute events → 1 hop bucket, 4 offsets


def test_single_exchange_plans(spark):
    df = _events(spark, [(u, 1.0 * u) for u in range(20)])
    assert hash_exchange_count(events_cusum(df)) == 1
    # hopping: one exchange for the (window, type) agg; countDistinct
    # adds its expand within the same key grouping
    assert hash_exchange_count(events_hopping_agg(df)) <= 2


def test_transitions_crafted_matrix(spark):
    """a→b→a→c→a chain: hand-computed counts and integer-grain rows."""
    seq = ["a", "b", "a", "c", "a", "b"]
    import datetime as dt

    df = spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), 1, t, 1.0, "{}")
            for i, t in enumerate(seq)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    from iceberg_geospatial_api_server_spark.operators.relational import (
        events_transitions,
    )

    rows = {
        (r.prev_type, r.next_type): (r.n_trans, r.row_total, r.p_micro)
        for r in events_transitions(df).collect()
    }
    # transitions: a→b (x2), b→a, a→c, c→a
    assert rows[("a", "b")] == (2, 3, 666666)
    assert rows[("a", "c")] == (1, 3, 333333)
    assert rows[("b", "a")] == (1, 1, 1000000)
    assert rows[("c", "a")] == (1, 1, 1000000)


def test_transitions_independent_users(spark):
    """Transitions never cross user boundaries."""
    import datetime as dt

    rows = [
        (0, dt.datetime(2024, 1, 1, 0, 0), 1, "a", 1.0, "{}"),
        (1, dt.datetime(2024, 1, 1, 0, 1), 2, "b", 1.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 0, 2), 1, "c", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    from iceberg_geospatial_api_server_spark.operators.relational import (
        events_transitions,
    )

    got = {(r.prev_type, r.next_type) for r in events_transitions(df).collect()}
    assert got == {("a", "c")}


def test_rfm_scores_and_cells(spark):
    """Crafted spend/recency pattern: NTILE cut points and rfm_cell
    composition, higher score = better."""
    import datetime as dt

    rows = []
    eid = 0
    # user u has u events of value 10·u, last event at minute u
    for u in range(1, 6):
        for j in range(u):
            rows.append(
                (eid, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=u), u, "e", 10.0 * u, "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    from iceberg_geospatial_api_server_spark.operators.relational import (
        events_rfm,
    )

    got = {r.user_id: r for r in events_rfm(df, n_tiles=5).collect()}
    # user 5: most recent, most frequent, highest spend → 555
    assert got[5].rfm_cell == 555
    assert got[1].rfm_cell == 111
    assert got[3].r_score == 3 and got[3].f_score == 3 and got[3].m_score == 3
    assert got[5].recency_s == 0 and got[1].recency_s == 4 * 60
    assert got[4].monetary_cents == 4 * 4000


def test_autocorr_periodic_signal(spark):
    """A strict 6-hour periodic pulse train: ACF must peak at lag 6
    (and 12, 18, 24) and dip at off-phase lags; numpy cross-check."""
    import datetime as dt

    import numpy as np

    rows = []
    eid = 0
    base = dt.datetime(2024, 1, 1)
    counts = []
    for h in range(240):
        n = 9 if h % 6 == 0 else 1
        counts.append(n)
        for j in range(n):
            rows.append((eid, base + dt.timedelta(hours=h, minutes=j), 1, "e", 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    from iceberg_geospatial_api_server_spark.operators.relational import (
        events_autocorr,
    )

    got = {r.lag: r.acf for r in events_autocorr(df, max_lag=12).collect()}
    assert got[6] > 0.9 and got[12] > 0.9
    assert got[1] < 0 and got[3] < 0
    # numpy reference at lag 6
    c = np.array(counts, dtype=float)
    x, y = c[:-6], c[6:]
    ref = np.corrcoef(x, y)[0, 1]
    assert abs(got[6] - round(ref, 6)) < 1e-6


def test_pareto_concentration(spark):
    """Skewed revenue: top decile's cumulative share dominates; final
    share is exactly 1; per-decile counts balance."""
    import datetime as dt

    rows = [
        (i, i % 30, dt.datetime(1996, 1, 1), float(1000 if i % 30 == 0 else 10), "P")
        for i in range(300)
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderdate timestamp, "
        "o_totalprice double, o_orderpriority string",
    )
    from iceberg_geospatial_api_server_spark.operators.relational import (
        customer_pareto,
    )

    out = sorted(customer_pareto(df, n_buckets=10).collect(), key=lambda r: r.decile)
    assert sum(r.n_customers for r in out) == 30
    assert abs(out[-1].cum_share - 1.0) < 1e-9
    # customer 0 holds 10 orders x 1000 = 10000 of total 12900
    assert out[0].cum_share > 0.7
    shares = [r.cum_share for r in out]
    assert shares == sorted(shares)
