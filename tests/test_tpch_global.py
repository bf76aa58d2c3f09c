"""TPC-H Q7/Q8/Q9/Q15/Q19 analogs (pipelines/multijoin.py round-3
additions) — cross-engine parity vs DuckDB plus shape invariants.  The
input hint carries no partsupp table, so Q9 substitutes p_retailprice
for ps_supplycost (same join/aggregate shape); the Q2/Q11/Q20 analogs
live in test_tpch_q2_q11_q20.py and Q16 in part_supplier_counts."""

import duckdb
import pandas as pd

from ifctordf_ray.pipelines import multijoin


def _duck(sf_dir, tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _compare(res, sql, con):
    a = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    b = con.execute(sql).df()
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True).astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)
    return a


def test_volume_shipping_parity(sf_small):
    con = _duck(sf_small, ["lineitem", "supplier", "orders", "customer", "nation"])
    a = _compare(
        multijoin.volume_shipping(sf_small), multijoin.volume_shipping_sql(), con
    )
    assert len(a) > 0
    # only the two cross-nation directions appear
    pairs = set(zip(a.supp_nation, a.cust_nation))
    assert pairs <= {
        (multijoin.NATION_A, multijoin.NATION_B),
        (multijoin.NATION_B, multijoin.NATION_A),
    }


def test_market_share_parity(sf_small):
    con = _duck(
        sf_small,
        ["lineitem", "part", "supplier", "orders", "customer", "nation", "region"],
    )
    a = _compare(multijoin.market_share(sf_small), multijoin.market_share_sql(), con)
    assert len(a) > 0
    assert ((a.mkt_share >= 0) & (a.mkt_share <= 1)).all()
    assert (a.target_cents <= a.total_cents).all()


def test_product_profit_parity(sf_small):
    con = _duck(sf_small, ["lineitem", "part", "supplier", "orders", "nation"])
    a = _compare(
        multijoin.product_profit(sf_small), multijoin.product_profit_sql(), con
    )
    assert len(a) > 0


def test_top_supplier_parity(sf_small):
    con = _duck(sf_small, ["lineitem", "supplier"])
    a = _compare(multijoin.top_supplier(sf_small), multijoin.top_supplier_sql(), con)
    # at least one winner; all tied at the global max
    assert len(a) >= 1
    assert a.total_revenue_cents.nunique() == 1
    # the winner's revenue really is the max over all suppliers in-window
    mx = con.execute(
        f"""SELECT max(rev) FROM (
            SELECT CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS rev
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '{multijoin.Q15_START}'
              AND l_shipdate <  TIMESTAMP '{multijoin.Q15_END}'
            GROUP BY l_suppkey)"""
    ).fetchone()[0]
    assert int(a.total_revenue_cents.iloc[0]) == int(mx)


def test_disjunctive_revenue_parity(sf_small):
    con = _duck(sf_small, ["lineitem", "part"])
    a = _compare(
        multijoin.disjunctive_revenue(sf_small),
        multijoin.disjunctive_revenue_sql(),
        con,
    )
    assert len(a) == 1
    assert int(a.revenue_cents.iloc[0]) >= 0
