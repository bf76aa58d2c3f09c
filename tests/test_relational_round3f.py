"""Q22-style anti-join with scalar broadcast, FORALL-as-grouped-min,
cumulative new-user accounting, predicate-pushdown scan."""

import duckdb
import pandas as pd

from ifctordf_ray.pipelines.relational import (
    filtered_scan,
    filtered_scan_sql,
    fully_returned_orders,
    fully_returned_orders_sql,
    idle_rich_customers,
    idle_rich_customers_sql,
    new_users_daily,
    new_users_daily_sql,
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


def test_idle_rich_customers_parity(sf_small):
    con = _duck(sf_small, ["customer", "orders"])
    a = _compare(idle_rich_customers(sf_small), idle_rich_customers_sql(), con)
    mean = con.execute(
        "SELECT avg(CAST(floor(c_acctbal*100+0.5) AS BIGINT)) FROM customer"
    ).fetchone()[0]
    assert len(a) > 0
    assert (a["acctbal_cents"] > mean).all()
    # none of them placed an urgent order
    urgent = set(
        r[0]
        for r in con.execute(
            "SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority='1-URGENT'"
        ).fetchall()
    )
    assert not (set(a["c_custkey"]) & urgent)


def test_fully_returned_orders_parity(sf_small):
    con = _duck(sf_small, ["lineitem"])
    a = _compare(fully_returned_orders(sf_small), fully_returned_orders_sql(), con)
    assert len(a) > 0
    # spot check: every line of each reported order is 'R'
    bad = con.execute(
        """SELECT count(*) FROM lineitem
           WHERE l_orderkey IN (SELECT l_orderkey FROM ({}) x)
             AND l_returnflag <> 'R'""".format(fully_returned_orders_sql())
    ).fetchone()[0]
    assert bad == 0


def test_new_users_daily_parity(sf_small):
    con = _duck(sf_small, ["events"])
    a = _compare(new_users_daily(sf_small), new_users_daily_sql(), con)
    a = a.sort_values("day").reset_index(drop=True)
    n_users = con.execute("SELECT count(DISTINCT user_id) FROM events").fetchone()[0]
    assert a["cum_users"].iloc[-1] == n_users
    assert (a["n_new_users"].cumsum() == a["cum_users"]).all()


def test_filtered_scan_parity(sf_small):
    con = _duck(sf_small, ["lineitem"])
    a = _compare(filtered_scan(sf_small), filtered_scan_sql(), con)
    assert a["n_lines"].sum() > 0  # the ship month exists in the data
