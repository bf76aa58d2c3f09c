"""JL random projection: cross-engine parity, an independent integer
reference, and the distance-preservation property the sketch exists for."""

import duckdb
import pytest
import numpy as np
import pyarrow.parquet as pq

from ifctordf_ray.stages.similarity import (
    COV_Q,
    EMB_DIM,
    RP_DIM,
    _rp_planes_q,
    random_projection,
    random_projection_sql,
)


def test_random_projection(sf_small, ray_session):
    eng = (
        random_projection(sf_small)
        .to_pandas()
        .sort_values(["vec_id", "j"])
        .reset_index(drop=True)
    )
    t = pq.read_table(f"{sf_small}/embeddings.parquet", columns=["vec_id", "embedding"])
    n = t.num_rows
    assert len(eng) == n * RP_DIM

    # independent integer reference (row-by-row dot loops)
    planes = _rp_planes_q()
    vecs = {
        v: np.floor(np.asarray(e, np.float64) * COV_Q + 0.5).astype(np.int64)
        for v, e in zip(t["vec_id"].to_pylist(), t["embedding"].to_pylist())
    }
    for row in eng.sample(n=200, random_state=0).itertuples():
        assert row.qproj == int(np.dot(vecs[row.vec_id], planes[row.j]))

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf_small}/embeddings.parquet')"
    )
    sql = (
        con.execute(random_projection_sql())
        .df()
        .sort_values(["vec_id", "j"])
        .reset_index(drop=True)
    )
    assert list(eng["qproj"]) == list(sql["qproj"])


def test_random_projection_preserves_distances(sf_small, ray_session):
    """JL property: projected pairwise distances approximate the
    originals with bounded relative distortion (for k=16 the expected
    per-pair error is ~1/sqrt(k) ~= 25%; rank correlation is NOT the
    right check here because this corpus's pairwise distances
    concentrate, leaving almost no spread for the noise to preserve)."""
    t = pq.read_table(f"{sf_small}/embeddings.parquet", columns=["vec_id", "embedding"])
    embs = np.asarray(t["embedding"].to_pylist(), np.float64)
    planes = _rp_planes_q().astype(np.float64) / COV_Q
    proj = embs @ planes.T / np.sqrt(RP_DIM)
    rng = np.random.RandomState(3)
    ii = rng.randint(0, len(embs), 300)
    jj = rng.randint(0, len(embs), 300)
    keep = ii != jj
    d_orig = np.linalg.norm(embs[ii[keep]] - embs[jj[keep]], axis=1)
    d_proj = np.linalg.norm(proj[ii[keep]] - proj[jj[keep]], axis=1)
    rel_err = np.abs(d_proj - d_orig) / d_orig
    assert np.median(rel_err) < 0.35, np.median(rel_err)
    assert np.mean(d_proj / d_orig) == pytest.approx(1.0, abs=0.15)
