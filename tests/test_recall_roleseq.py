"""ANN recall evaluation + ordered string aggregation parity tests."""

import duckdb
import pandas as pd

from ifctordf_ray.stages.graphq import conv_role_sequence, conv_role_sequence_sql
from ifctordf_ray.stages.similarity import DEFAULT_K, knn_recall, knn_recall_sql


def _parity(ds, con, sql):
    a = ds.to_pandas()
    b = con.execute(sql).df()
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True).astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)
    return a


def test_knn_recall(sf_small):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf_small}/embeddings.parquet')"
    )
    a = _parity(knn_recall(sf_small), con, knn_recall_sql())
    # every query's exact top-k has exactly k rows; recall in [0, 1];
    # the self-match is in every LSH probe set, so recall is never 0
    assert (a["k_bf"] == DEFAULT_K).all()
    assert ((a["recall"] > 0) & (a["recall"] <= 1.0)).all()
    assert (a["n_matched"] <= a["k_bf"]).all()


def test_conv_role_sequence(sf_small):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_small}/events.parquet')"
    )
    a = _parity(conv_role_sequence(sf_small), con, conv_role_sequence_sql())
    # path arity always matches the turn count (ordered agg lost no turn)
    seps = a["role_path"].str.count(">")
    assert (seps + 1 == a["n_turns"]).all()
    assert (a["n_turns"] > 0).all()
