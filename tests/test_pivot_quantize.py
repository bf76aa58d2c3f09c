"""Wide pivot and embedding quantization: parity + invariants."""

import duckdb
import pandas as pd

from ifctordf_ray.pipelines.relational import (
    EVENT_TYPES,
    user_type_pivot,
    user_type_pivot_sql,
)
from ifctordf_ray.stages.similarity import quantized_codes, quantized_codes_sql


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


def test_user_type_pivot_parity_and_total(sf_small):
    con = _duck(sf_small, ["events"])
    a = _compare(user_type_pivot(sf_small), user_type_pivot_sql(), con)
    # pivot is total: row sums equal each user's event count
    n_cols = [f"n_{et}" for et in EVENT_TYPES] + ["n_other"]
    totals = dict(
        con.execute("SELECT user_id, count(*) FROM events GROUP BY user_id").fetchall()
    )
    for _, row in a.iterrows():
        assert sum(int(row[c]) for c in n_cols) == totals[row["user_id"]]
    assert (a["n_other"] == 0).all()  # closed vocabulary on this corpus


def test_quantized_codes_parity_and_range(sf_small):
    con = _duck(sf_small, ["embeddings"])
    a = _compare(quantized_codes(sf_small), quantized_codes_sql(), con)
    # 64 uint8 codes per vector
    assert a["sum_code"].between(0, 255 * 64).all()
    # min/max scaling spans the full code range somewhere in the corpus
    assert a["sum_code"].nunique() > 1
