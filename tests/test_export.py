"""Deterministic shuffled export + weighted mixture schedule: DuckDB
parity plus the operator-level invariants a training run relies on."""

import duckdb
import numpy as np
import pandas as pd

from ifctordf_ray.stages.export import (
    EXPORT_SHARDS,
    MIX_STRIDE_K,
    MIX_WEIGHTS,
    mixture_schedule,
    mixture_schedule_sql,
    shuffled_export,
    shuffled_export_sql,
)


def _duck(sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
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


def test_shuffled_export_parity_and_density(sf_small):
    out = _compare(shuffled_export(sf_small), shuffled_export_sql(), _duck(sf_small))
    # every doc appears exactly once; positions are dense 0..n_s-1 per shard
    assert out["doc_id"].is_unique
    for s, grp in out.groupby("shard"):
        assert sorted(grp["pos"]) == list(range(len(grp)))
    assert set(out["shard"]) <= set(range(EXPORT_SHARDS))


def test_shuffled_export_is_deterministic(sf_small):
    a = shuffled_export(sf_small).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = shuffled_export(sf_small).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_mixture_schedule_parity_and_strides(sf_small):
    out = _compare(mixture_schedule(sf_small), mixture_schedule_sql(), _duck(sf_small))
    assert out["doc_id"].is_unique
    # within each source: dense ranks and an exact arithmetic vtime ladder
    for src, grp in out.groupby("source"):
        grp = grp.sort_values("rank_in_source")
        assert grp["rank_in_source"].tolist() == list(range(len(grp)))
        sid = int(src[3:])
        stride = MIX_STRIDE_K // MIX_WEIGHTS[sid % len(MIX_WEIGHTS)]
        assert (grp["vtime"] == (grp["rank_in_source"] + 1) * stride).all()
    # a heavier source emits more rows before any fixed virtual time
    t = MIX_STRIDE_K * 4
    by_weight = {}
    for src, grp in out.groupby("source"):
        w = MIX_WEIGHTS[int(src[3:]) % len(MIX_WEIGHTS)]
        by_weight.setdefault(w, []).append(int((grp["vtime"] <= t).sum()))
    means = {w: np.mean(v) for w, v in by_weight.items()}
    assert means[4] > means[2] > means[1]
