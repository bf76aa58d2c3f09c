"""SemDeDup: cross-engine parity plus an independent numpy reference of
the within-cluster keep-lowest-id rule."""

import duckdb
import numpy as np
import pyarrow.parquet as pq

from ifctordf_ray.stages.similarity import (
    COV_Q,
    KMEANS_K,
    ROUND_DP,
    SEMDEDUP_TAU,
    semdedup,
    semdedup_sql,
)


def _py_reference(sf_dir):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.array(t["vec_id"].to_pylist(), np.int64)
    embs = np.asarray(t["embedding"].to_pylist(), np.float64)
    order = np.argsort(ids)
    ids, embs = ids[order], embs[order]
    # seed centroids = K lowest vec_ids, exact quantized-int distances
    q = np.floor(embs * COV_Q + 0.5).astype(np.int64)
    cent = q[:KMEANS_K]
    d = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    cluster = d.argmin(axis=1)
    norms = np.linalg.norm(embs, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    nembs = embs / norms
    kept = {}
    for c in range(KMEANS_K):
        m = cluster == c
        cids, cemb = ids[m], nembs[m]
        sims = np.round(cemb @ cemb.T, ROUND_DP)
        lower = cids[None, :] < cids[:, None]
        drop = ((sims >= SEMDEDUP_TAU) & lower).any(axis=1)
        for v, c_, dr in zip(cids, [c] * len(cids), drop):
            kept[int(v)] = (int(c_), 0 if dr else 1)
    return kept


def test_semdedup(sf_small, ray_session):
    ref = _py_reference(sf_small)
    eng = semdedup(sf_small).to_pandas()
    assert len(eng) == len(ref)
    for r in eng.itertuples():
        assert (r.cluster, r.kept) == ref[r.vec_id], r.vec_id
    assert (eng.kept == 0).sum() >= 1  # the drop path is exercised

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf_small}/embeddings.parquet')"
    )
    sql = (
        con.execute(semdedup_sql()).df().sort_values("vec_id").reset_index(drop=True)
    )
    a = eng.sort_values("vec_id").reset_index(drop=True)
    assert list(a["cluster"]) == list(sql["cluster"])
    assert list(a["kept"]) == list(sql["kept"])
