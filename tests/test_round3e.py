"""OOV rate (derived broadcast), centroid-pair cosine, per-user z-score
outliers: cross-engine parity + invariants."""

import duckdb
import pandas as pd

from ifctordf_ray.pipelines.relational import (
    OUTLIER_Z,
    value_outliers,
    value_outliers_sql,
)
from ifctordf_ray.stages.similarity import centroid_similarity, centroid_similarity_sql
from ifctordf_ray.stages.textstats import oov_rate, oov_rate_sql


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


def test_oov_rate_parity(sf_small):
    con = _duck(sf_small, ["documents"])
    a = _compare(oov_rate(sf_small), oov_rate_sql(), con)
    n_docs = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert len(a) == n_docs
    assert (a["n_oov"] <= a["n_words"]).all()
    # vocab K=24 < 31 distinct corpus words -> some OOV must exist
    assert a["n_oov"].sum() > 0


def test_centroid_similarity_parity(sf_small):
    con = _duck(sf_small, ["embeddings"])
    a = _compare(centroid_similarity(sf_small), centroid_similarity_sql(), con)
    n_labels = con.execute("SELECT count(DISTINCT label) FROM embeddings").fetchone()[0]
    assert len(a) == n_labels * (n_labels - 1) // 2
    assert ((a["cosine"] >= -1.0000001) & (a["cosine"] <= 1.0000001)).all()
    assert (a["label_a"] < a["label_b"]).all()


def test_value_outliers_parity(sf_small):
    con = _duck(sf_small, ["events"])
    a = _compare(value_outliers(sf_small), value_outliers_sql(), con)
    assert (a["z"].abs() > OUTLIER_Z).all()
    assert len(a) > 0  # sf0.001 has tail values
