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
