"""Global NTILE (two-phase range scan), INTERSECT/EXCEPT set ops,
broadcast cross join, first/last-value window, rolling median frame."""

import duckdb
import numpy as np
import pandas as pd

from ifctordf_ray.pipelines.relational import (
    NTILE_K,
    order_ntile,
    order_ntile_sql,
    region_nation_cross,
    region_nation_cross_sql,
    user_days_except,
    user_days_except_sql,
    user_first_last_event,
    user_first_last_event_sql,
    user_rolling_median,
    user_rolling_median_sql,
    users_both_halves,
    users_both_halves_sql,
)


def _duck(sf_dir, tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _compare(ds, sql, con):
    a = ds.to_pandas()
    b = con.execute(sql).df()
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True).astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)
    return a


def test_order_ntile_parity_and_fill(sf_small):
    con = _duck(sf_small, ["orders"])
    a = _compare(order_ntile(sf_small), order_ntile_sql(), con)
    # standard NTILE fill: tile sizes differ by at most 1, first tiles larger
    sizes = a.groupby("tile").size()
    assert sorted(sizes.index) == list(range(1, NTILE_K + 1))
    assert sizes.max() - sizes.min() <= 1
    assert list(sizes.sort_index()) == sorted(sizes, reverse=True)


def test_order_ntile_orders_by_price(sf_small):
    con = _duck(sf_small, ["orders"])
    a = order_ntile(sf_small).to_pandas()
    price = con.execute(
        "SELECT o_orderkey, o_totalprice FROM orders"
    ).df()
    m = a.merge(price, on="o_orderkey")
    # max price in tile t <= min price in tile t+1 (up to cent rounding ties)
    cents = np.floor(m["o_totalprice"] * 100 + 0.5)
    for t in range(1, NTILE_K):
        assert cents[m["tile"] == t].max() <= cents[m["tile"] == t + 1].min()


def test_set_ops_parity(sf_small):
    con = _duck(sf_small, ["events"])
    both = _compare(users_both_halves(sf_small), users_both_halves_sql(), con)
    assert len(both) > 0
    ex = _compare(user_days_except(sf_small), user_days_except_sql(), con)
    assert len(ex) > 0
    # EXCEPT result is a proper subset of all active (user, day) pairs
    n_all = con.execute(
        "SELECT count(*) FROM (SELECT DISTINCT user_id,"
        " epoch_us(ts) // 86400000000 FROM events)"
    ).fetchone()[0]
    assert 0 < len(ex) < n_all


def test_cross_join_parity(sf_small):
    con = _duck(sf_small, ["nation", "region"])
    a = _compare(region_nation_cross(sf_small), region_nation_cross_sql(), con)
    n_nation = con.execute("SELECT count(*) FROM nation").fetchone()[0]
    n_region = con.execute("SELECT count(*) FROM region").fetchone()[0]
    assert len(a) == n_nation * n_region
    # each nation is home in exactly one region
    assert (a.groupby("n_name")["is_home"].sum() == 1).all()


def test_first_last_window_parity(sf_small):
    con = _duck(sf_small, ["events"])
    a = _compare(
        user_first_last_event(sf_small), user_first_last_event_sql(), con
    )
    total = con.execute("SELECT count(*) FROM events").fetchone()[0]
    assert a["n_events"].sum() == total


def test_rolling_median_parity(sf_small):
    con = _duck(sf_small, ["events"])
    a = _compare(user_rolling_median(sf_small), user_rolling_median_sql(), con)
    n = con.execute("SELECT count(*) FROM events").fetchone()[0]
    assert len(a) == n


def test_order_global_rank_parity(sf_small):
    from ifctordf_ray.pipelines.relational import (
        order_global_rank,
        order_global_rank_sql,
    )

    con = _duck(sf_small, ["orders"])
    a = _compare(order_global_rank(sf_small), order_global_rank_sql(), con)
    n = len(a)
    assert sorted(a["rn"]) == list(range(1, n + 1))
    assert a["pct_rank"].min() == 0.0 and a["pct_rank"].max() == 1.0
