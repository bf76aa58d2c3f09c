"""Subquery-shaped analytics (Q4/Q10/Q17/Q18 analogs + event funnel):
cross-engine parity vs DuckDB plus semantics spot-checks."""

import duckdb
import pandas as pd
import pytest

from ifctordf_ray.pipelines import subqueries as SQ

TABLES = ("lineitem", "orders", "customer", "nation", "events")


@pytest.fixture(scope="module")
def con(sf_small):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_small}/{t}.parquet')"
        )
    return con


def _parity(ds, con, sql):
    a = ds.to_pandas()
    b = con.execute(sql).df()
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols, (sorted(b.columns), cols)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True).astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)
    return a


def test_returned_item_revenue(sf_small, con):
    a = _parity(
        SQ.returned_item_revenue(sf_small), con, SQ.returned_item_revenue_sql()
    )
    assert len(a) == SQ.TOP_N_CUSTOMERS
    assert (a["revenue_cents"] > 0).all()
    assert (a["o_custkey"] >= 0).all()  # join_ready sentinel never leaks


def test_large_volume_orders(sf_small, con):
    a = _parity(SQ.large_volume_orders(sf_small), con, SQ.large_volume_orders_sql())
    assert (a["total_qty"] > SQ.LARGE_ORDER_MIN_QTY).all()
    assert (a["o_orderkey"] >= 0).all()


def test_small_quantity_revenue(sf_small, con):
    a = _parity(
        SQ.small_quantity_revenue(sf_small), con, SQ.small_quantity_revenue_sql()
    )
    assert len(a) == 1
    assert int(a["n_items"].iloc[0]) > 0


def test_priority_semi_orders(sf_small, con):
    a = _parity(
        SQ.priority_semi_orders(sf_small), con, SQ.priority_semi_orders_sql()
    )
    # semi join counts each qualifying order ONCE regardless of how many
    # returned lineitems it has: totals must not exceed the order count
    n_orders = con.execute("SELECT count(*) FROM orders").fetchone()[0]
    assert 0 < a["n_orders"].sum() <= n_orders


def test_event_funnel_monotone(sf_small, con):
    a = _parity(SQ.event_funnel(sf_small), con, SQ.event_funnel_sql())
    by_stage = dict(zip(a["stage"], a["n_users"]))
    assert set(by_stage) == set(SQ.FUNNEL)
    # funnel counts are monotonically non-increasing down the stages
    assert by_stage["view"] >= by_stage["click"] >= by_stage["purchase"]
    assert by_stage["purchase"] >= 0
