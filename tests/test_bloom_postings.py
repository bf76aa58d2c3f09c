"""Bloom semi-join, per-user median, posting lists: semantics +
cross-engine parity at sf0.001."""

import duckdb
import pandas as pd

import pyarrow as pa

from ifctordf_ray.pipelines.relational import (
    bloom_semi_join,
    bloom_semi_join_sql,
    user_median_value,
    user_median_value_sql,
    _median_group,
)
from ifctordf_ray.stages.terms import POSTINGS_CAP, posting_lists, posting_lists_sql


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
    for c in cols:
        assert a[c].dtype.kind == b[c].dtype.kind, (c, a[c].dtype, b[c].dtype)
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True).astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)
    return a


def test_bloom_semi_join_parity_and_superset(sf_small):
    con = _duck(sf_small, ["orders", "lineitem"])
    a = _compare(bloom_semi_join(sf_small), bloom_semi_join_sql(), con)
    # no false negatives: every TRUE semi-join key must survive the bloom
    true_keys = set(
        r[0]
        for r in con.execute(
            "SELECT DISTINCT l_orderkey FROM lineitem l JOIN orders o "
            "ON l.l_orderkey = o.o_orderkey WHERE o.o_orderstatus = 'F'"
        ).fetchall()
    )
    assert true_keys <= set(a["l_orderkey"])


def test_median_group_semantics():
    g = pa.table({"user_id": [7, 7, 7, 7], "value": [4.0, 1.0, 3.0, 2.0]})
    out = _median_group(g)
    # lower-middle of sorted [1,2,3,4] -> 2.0 (quantile_disc 0.5)
    assert out["median_value"].to_pylist() == [2.0]
    assert out["n_events"].to_pylist() == [4]


def test_user_median_parity(sf_small):
    con = _duck(sf_small, ["events"])
    _compare(user_median_value(sf_small), user_median_value_sql(), con)


def test_posting_lists_parity_and_cap(sf_small):
    con = _duck(sf_small, ["documents"])
    a = _compare(posting_lists(sf_small), posting_lists_sql(), con)
    for _, row in a.iterrows():
        ids = [int(x) for x in row["postings"].split(",")]
        assert ids == sorted(ids)
        assert len(ids) == min(row["df"], POSTINGS_CAP)
