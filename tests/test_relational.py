"""Relational pipeline physical-plan checks not covered by the driver
gate (which always runs the default config)."""

from ifctordf_ray.pipelines import relational

SF = "/root/testdata/sf0.001"


def test_nation_revenue_join_path_matches_broadcast():
    """Force the distributed Dataset.join fallback (customer above the
    broadcast threshold) and assert it matches the broadcast plan —
    the r2 scale `weak`: the broadcast path alone builds a driver-side
    array that grows with SF."""
    bc = {
        (r["n_name"], r["n_orders"], r["revenue_cents"])
        for r in relational.nation_revenue(SF).take_all()
    }
    jn = {
        (r["n_name"], r["n_orders"], r["revenue_cents"])
        for r in relational.nation_revenue(SF, broadcast_max_rows=0).take_all()
    }
    assert bc == jn and len(bc) > 0


def test_events_asof_orders_tie_semantics(tmp_path):
    """As-of contract: match at equal instant (>=), max orderkey breaks
    date ties, -1 when no prior order."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sf"
    d.mkdir()
    T = lambda s: dt.datetime.fromisoformat(s)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3], pa.int64()),
                "ts": pa.array([T("2024-01-05"), T("2024-01-02"), T("2024-01-01")],
                               pa.timestamp("us")),
                "user_id": pa.array([7, 7, 7], pa.int64()),
            }
        ),
        str(d / "events.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([10, 11, 12], pa.int64()),
                "o_custkey": pa.array([7, 7, 7], pa.int64()),
                # two orders on the same date (tie), one at the exact
                # instant of event 2
                "o_orderdate": pa.array(
                    [T("2024-01-03"), T("2024-01-03"), T("2024-01-02")],
                    pa.timestamp("us"),
                ),
            }
        ),
        str(d / "orders.parquet"),
    )
    rows = {r["event_id"]: r["o_orderkey"]
            for r in relational.events_asof_orders(str(d)).take_all()}
    assert rows == {
        1: 11,   # date tie 2024-01-03 -> max orderkey wins
        2: 12,   # same-instant order matches (>= semantics)
        3: -1,   # no order at or before
    }


def test_user_rolling_window_range_ties(tmp_path):
    """RANGE semantics: same-instant events are PEERS — each counts the
    other — and the 7-day lower bound is closed."""
    import datetime as dt

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sf"
    d.mkdir()
    T = lambda s: dt.datetime.fromisoformat(s)
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4], pa.int64()),
            "ts": pa.array(
                [T("2024-01-01"), T("2024-01-05"), T("2024-01-05"),
                 T("2024-01-08")],  # exactly 7 days after event 1
                pa.timestamp("us"),
            ),
            "user_id": pa.array([5, 5, 5, 5], pa.int64()),
            "value": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
        }
    )
    pq.write_table(t, str(d / "events.parquet"))
    got = {r["event_id"]: (r["n_7d"], r["sum_value_cents_7d"])
           for r in relational.user_rolling_window(str(d)).take_all()}
    # events 2 and 3 are same-instant peers: both see n=3 (1,2,3)
    assert got[2] == (3, 600) and got[3] == (3, 600)
    # event 4 at +7d exactly: closed bound includes event 1
    assert got[4] == (4, 1000)
    con = duckdb.connect()
    con.sql(f"create view events as select * from '{d}/events.parquet'")
    exp = {r[0]: (r[3], r[4])
           for r in con.sql(relational.user_rolling_window_sql()).fetchall()}
    assert got == exp
