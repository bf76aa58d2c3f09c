"""Q3 (shipping priority), Q6 (forecast revenue), Q12 (linestatus
priority) analogs — cross-engine parity vs DuckDB on the same parquet."""

import duckdb
import pandas as pd

from ifctordf_ray.pipelines.multijoin import (
    forecast_revenue,
    forecast_revenue_sql,
    linestatus_priority,
    linestatus_priority_sql,
    shipping_priority,
    shipping_priority_sql,
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


def test_shipping_priority_parity(sf_small):
    con = _duck(sf_small, ["customer", "orders", "lineitem"])
    out = _compare(shipping_priority(sf_small), shipping_priority_sql(), con)
    assert len(out) <= 10
    # top-N is revenue-descending
    revs = out.sort_values(
        ["revenue_cents", "o_orderdate", "l_orderkey"],
        ascending=[False, True, True],
    )["revenue_cents"].tolist()
    assert revs == sorted(revs, reverse=True)


def test_forecast_revenue_parity(sf_small):
    con = _duck(sf_small, ["lineitem"])
    out = _compare(forecast_revenue(sf_small), forecast_revenue_sql(), con)
    assert len(out) == 1 and out["n_items"][0] > 0


def test_linestatus_priority_parity(sf_small):
    con = _duck(sf_small, ["lineitem", "orders"])
    out = _compare(linestatus_priority(sf_small), linestatus_priority_sql(), con)
    # every shipped line is exactly high or low
    assert (out["high_line_count"] + out["low_line_count"] > 0).all()
