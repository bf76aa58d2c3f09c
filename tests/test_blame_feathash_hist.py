"""Q21-shaped sole-blame attribution, feature-hashing vectorizer,
mergeable histogram-sketch quantiles."""

import duckdb
import pandas as pd

from ifctordf_ray.pipelines.subqueries import blame_suppliers, blame_suppliers_sql
from ifctordf_ray.stages.sketches import (
    HIST_BIN_CENTS,
    hist_quantiles,
    hist_quantiles_sql,
)
from ifctordf_ray.stages.terms import (
    FEATHASH_DIM,
    feature_hashing,
    feature_hashing_sql,
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


def test_blame_suppliers_parity(sf_small):
    con = _duck(sf_small, ["lineitem", "supplier"])
    ds = blame_suppliers(sf_small)
    raw = ds.to_pandas()
    assert raw["numwait"].is_monotonic_decreasing  # engine emits rank order
    a = _compare(ds, blame_suppliers_sql(), con)
    assert 0 < len(a) <= 10


def test_feature_hashing_parity(sf_small):
    con = _duck(sf_small, ["documents"])
    a = _compare(feature_hashing(sf_small), feature_hashing_sql(), con)
    assert a["bucket"].between(0, FEATHASH_DIM - 1).all()
    # total hashed counts == total word tokens
    n_tokens = con.execute(
        "SELECT sum(len(regexp_extract_all(lower(coalesce(text,'')),"
        " '[a-z0-9]+'))) FROM documents"
    ).fetchone()[0]
    assert a["n"].sum() == n_tokens


def test_hist_quantiles_parity_and_bounds(sf_small):
    con = _duck(sf_small, ["events"])
    a = _compare(hist_quantiles(sf_small), hist_quantiles_sql(), con)
    assert len(a) == 5  # one row per event_type
    assert (a["p50_bin"] <= a["p90_bin"]).all()
    # sketch quantile is within one bin of the exact per-group median
    exact = con.execute(
        "SELECT event_type, CAST(median(CAST(floor(value*100+0.5) AS BIGINT))"
        f" // {HIST_BIN_CENTS} AS BIGINT) AS med_bin"
        " FROM events GROUP BY 1"
    ).df()
    m = a.merge(exact, on="event_type")
    assert (m["p50_bin"] - m["med_bin"]).abs().max() <= 1


def test_dim_minmax_parity(sf_small):
    from ifctordf_ray.stages.similarity import EMB_DIM, dim_minmax, dim_minmax_sql

    con = _duck(sf_small, ["embeddings"])
    a = _compare(dim_minmax(sf_small), dim_minmax_sql(), con)
    assert len(a) == EMB_DIM
    assert (a["min_val"] <= a["max_val"]).all()


def test_part_supplier_counts_parity(sf_small):
    from ifctordf_ray.pipelines.multijoin import (
        part_supplier_counts,
        part_supplier_counts_sql,
    )

    con = _duck(sf_small, ["lineitem", "part", "supplier"])
    a = _compare(part_supplier_counts(sf_small), part_supplier_counts_sql(), con)
    assert len(a) > 0
    n_ok = con.execute(
        "SELECT count(*) FROM supplier WHERE s_acctbal >= 1000"
    ).fetchone()[0]
    assert a["supplier_cnt"].max() <= n_ok


def test_model_scores_parity(sf_small):
    from ifctordf_ray.stages.textstats import model_scores, model_scores_sql

    con = _duck(sf_small, ["documents"])
    a = _compare(model_scores(sf_small), model_scores_sql(), con)
    n = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert len(a) == n
    assert a["score_micro"].nunique() > 1  # model actually discriminates


def test_source_quota_parity(sf_small):
    from ifctordf_ray.stages.terms import (
        SOURCE_QUOTA,
        source_quota_sample,
        source_quota_sample_sql,
    )

    con = _duck(sf_small, ["documents"])
    a = _compare(source_quota_sample(sf_small), source_quota_sample_sql(), con)
    per_src = a.groupby("source").size()
    assert per_src.max() <= SOURCE_QUOTA
    # quota binds: every source had more docs than the cap
    assert (per_src == SOURCE_QUOTA).all()
    # deterministic keeper rule: the N smallest doc_ids per source
    for src, grp in a.groupby("source"):
        lo = con.execute(
            f"SELECT doc_id FROM documents WHERE source='{src}'"
            f" ORDER BY doc_id LIMIT {SOURCE_QUOTA}"
        ).df()["doc_id"]
        assert sorted(grp["doc_id"]) == sorted(lo)
