"""UNPIVOT (melt) and grouped argmax/mode (pipelines/reshape.py) —
cross-engine parity plus the pivot round-trip invariant."""

import duckdb
import pandas as pd

from ifctordf_ray.pipelines import reshape
from ifctordf_ray.pipelines.relational import user_type_pivot


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


def test_user_type_unpivot_parity(sf_small):
    con = _duck(sf_small, ["events"])
    a = _compare(reshape.user_type_unpivot(sf_small), reshape.user_type_unpivot_sql(), con)
    # lossless melt:every user has exactly one row per name, totals match the wide form
    wide = user_type_pivot(sf_small).to_pandas()
    assert len(a) == len(wide) * len(reshape.UNPIVOT_NAMES)
    assert int(a.n.sum()) == int(
        wide[[c for c in wide.columns if c != "user_id"]].to_numpy().sum()
    )


def test_nation_priority_mode_parity(sf_small):
    con = _duck(sf_small, ["orders", "customer"])
    a = _compare(
        reshape.nation_priority_mode(sf_small), reshape.nation_priority_mode_sql(), con
    )
    # one mode row per nation present
    assert a.c_nationkey.is_unique and len(a) > 0
