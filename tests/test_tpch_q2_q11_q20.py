"""TPC-H Q2/Q11/Q20 analogs (pipelines/multijoin.py) — cross-engine
parity vs DuckDB plus shape invariants.  No partsupp table in the input
hint, so supply cost is the min observed lineitem unit price (Q2), part
value is lineitem revenue (Q11), and availqty is the windowed shipped
quantity (Q20)."""

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


def test_min_cost_supplier_parity(sf_small):
    con = _duck(sf_small, ["lineitem", "part", "supplier"])
    a = _compare(
        multijoin.min_cost_supplier(sf_small), multijoin.min_cost_supplier_sql(), con
    )
    assert len(a) > 0
    # exactly one winning supplier per part (argmin semantics)
    assert a.p_partkey.is_unique
    # every winner's cost IS the per-(part,supplier) minimum: cross-check
    # the packed argmin against a direct scan
    chk = con.execute(
        """
        WITH pairs AS (
            SELECT l_partkey,
                   min(CAST(floor(l_extendedprice / l_quantity * 100.0 + 0.5)
                       AS BIGINT)) AS c
            FROM lineitem GROUP BY 1
        )
        SELECT l_partkey, c FROM pairs
        """
    ).df()
    best = dict(zip(chk.l_partkey, chk.c))
    assert all(best[pk] == c for pk, c in zip(a.p_partkey, a.min_cost_cents))


def test_important_parts_parity(sf_small):
    con = _duck(sf_small, ["lineitem"])
    a = _compare(
        multijoin.important_parts(sf_small), multijoin.important_parts_sql(), con
    )
    assert len(a) > 0
    # the threshold is strictly above the mean, so the kept set is a
    # strict minority of all parts
    n_parts = con.execute(
        "SELECT count(DISTINCT l_partkey) FROM lineitem"
    ).fetchone()[0]
    assert 0 < len(a) < n_parts


def test_ramping_suppliers_parity(sf_small):
    con = _duck(sf_small, ["lineitem", "supplier"])
    a = _compare(
        multijoin.ramping_suppliers(sf_small), multijoin.ramping_suppliers_sql(), con
    )
    assert len(a) > 0
    assert (a.n_ramping_parts >= 1).all()
    assert a.s_suppkey.is_unique
