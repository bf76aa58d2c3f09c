"""Full-outer join coverage: per-nation customer vs supplier counts."""

import duckdb
import pandas as pd

from ifctordf_ray.pipelines.relational import (
    nation_customer_supplier,
    nation_customer_supplier_sql,
)


def test_full_outer_parity_and_side_only_rows(sf_small):
    con = duckdb.connect()
    for t in ("customer", "supplier"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_small}/{t}.parquet')"
        )
    a = nation_customer_supplier(sf_small).to_pandas()
    b = con.execute(nation_customer_supplier_sql()).df()
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True).astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)
    # outer semantics exercised: at least one nation appears with a
    # zero on one side (side-only row), and no sentinel leaks through
    assert ((a["n_customers"] == 0) | (a["n_suppliers"] == 0)).any()
    assert (a["nationkey"] >= 0).all()
