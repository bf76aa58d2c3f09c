"""Percentile-cutoff selection, grouped exact quantiles, filtered ANN."""

import duckdb
import pandas as pd

from ifctordf_ray.stages.similarity import knn_filtered, knn_filtered_sql
from ifctordf_ray.stages.textstats import (
    lang_token_quantiles,
    lang_token_quantiles_sql,
    quality_top_decile,
    quality_top_decile_sql,
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


def test_quality_top_decile_parity(sf_small):
    con = _duck(sf_small, ["documents"])
    a = _compare(quality_top_decile(sf_small), quality_top_decile_sql(), con)
    total = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    # top decile: at most ~10% + ties, never more than half, never empty
    assert 0 < len(a) <= total / 2


def test_lang_token_quantiles_parity(sf_small):
    con = _duck(sf_small, ["documents"])
    a = _compare(lang_token_quantiles(sf_small), lang_token_quantiles_sql(), con)
    assert len(a) > 0
    assert ((a.p25 <= a.p50) & (a.p50 <= a.p90)).all()


def test_knn_filtered_parity(sf_small):
    con = _duck(sf_small, ["embeddings"])
    a = _compare(knn_filtered(sf_small), knn_filtered_sql(), con)
    # every neighbor carries the filter label
    labels = con.execute(
        "SELECT DISTINCT vec_id FROM embeddings WHERE label = 1"
    ).df()["vec_id"]
    assert a.neighbor_id.isin(set(labels)).all()
    assert (a["rank"] >= 1).all()
