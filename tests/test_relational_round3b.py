"""JSON field extraction, monthly rollup, day-over-day retention and
in-nation dense rank: cross-engine parity + structural invariants."""

import duckdb
import pandas as pd

from ifctordf_ray.pipelines.relational import (
    RANK_K,
    customer_rank_in_nation,
    customer_rank_in_nation_sql,
    json_field_stats,
    json_field_stats_sql,
    monthly_order_stats,
    monthly_order_stats_sql,
    user_retention,
    user_retention_sql,
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


def test_json_field_stats_parity(sf_small):
    con = _duck(sf_small, ["events"])
    a = _compare(json_field_stats(sf_small), json_field_stats_sql(), con)
    assert (a["n_with_k"] <= a["n_events"]).all()
    # avg is sum/count of the same integers
    m = a["n_with_k"] > 0
    assert (a.loc[m, "avg_k"] == a.loc[m, "sum_k"] / a.loc[m, "n_with_k"]).all()


def test_monthly_order_stats_parity(sf_small):
    con = _duck(sf_small, ["orders"])
    a = _compare(monthly_order_stats(sf_small), monthly_order_stats_sql(), con)
    n_orders = con.execute("SELECT count(*) FROM orders").fetchone()[0]
    assert a["n_orders"].sum() == n_orders
    # months are first-of-month timestamps
    assert (pd.DatetimeIndex(a["month"]).day == 1).all()


def test_user_retention_parity(sf_small):
    con = _duck(sf_small, ["events"])
    a = _compare(user_retention(sf_small), user_retention_sql(), con)
    assert (a["n_retained"] <= a["n_active"]).all()
    assert ((a["retention"] >= 0) & (a["retention"] <= 1)).all()
    # last active day can never retain into a non-existent next day
    last = a["day"].max()
    assert a.loc[a["day"] == last, "n_retained"].iloc[0] == 0


def test_customer_rank_in_nation_parity(sf_small):
    con = _duck(sf_small, ["customer"])
    a = _compare(
        customer_rank_in_nation(sf_small), customer_rank_in_nation_sql(), con
    )
    assert a["bal_rank"].min() == 1
    assert a["bal_rank"].max() <= RANK_K
    # dense: within a nation, every rank from 1..max is present
    for _, g in a.groupby("c_nationkey"):
        assert set(g["bal_rank"]) == set(range(1, g["bal_rank"].max() + 1))
