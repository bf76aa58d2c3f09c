"""CUBE(status, priority) from one finest pass: parity + set algebra."""

import duckdb
import pandas as pd

from ifctordf_ray.pipelines.multijoin import (
    ALL,
    order_status_priority_cube,
    order_status_priority_cube_sql,
)


def test_order_cube(sf_small):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{sf_small}/orders.parquet')"
    )
    a = order_status_priority_cube(sf_small).to_pandas()
    b = con.execute(order_status_priority_cube_sql()).df()
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    an = a[cols].sort_values(cols).reset_index(drop=True)
    bn = b[cols].sort_values(cols).reset_index(drop=True).astype(an.dtypes.to_dict())
    pd.testing.assert_frame_equal(an, bn)

    # grouping-set algebra: every marginal re-aggregates to the grand total
    grand = a[(a.o_orderstatus == ALL) & (a.o_orderpriority == ALL)]
    assert len(grand) == 1
    n_total = int(grand.n_orders.iloc[0])
    finest = a[(a.o_orderstatus != ALL) & (a.o_orderpriority != ALL)]
    by_s = a[(a.o_orderstatus != ALL) & (a.o_orderpriority == ALL)]
    by_p = a[(a.o_orderstatus == ALL) & (a.o_orderpriority != ALL)]
    for part in (finest, by_s, by_p):
        assert int(part.n_orders.sum()) == n_total
        assert int(part.revenue_cents.sum()) == int(grand.revenue_cents.iloc[0])
