"""Similarity search: brute-force vs a numpy oracle; LSH recall."""

import numpy as np
import pytest

from ifctordf_ray.stages import similarity

SF = "/root/testdata/sf0.001"


def _numpy_oracle(sf_dir, k, nq):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = t["vec_id"].to_numpy()
    mat = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    q = mat[:nq]
    n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    sims = np.round(n @ qn.T, similarity.ROUND_DP)
    out = {}
    for j in range(nq):
        key = lambda i: (-sims[i, j], ids[i])
        top = sorted(range(len(ids)), key=key)[:k]
        out[int(ids[j])] = [(int(ids[i]), float(sims[i, j])) for i in top]
    return out


def test_knn_brute_force_matches_numpy_oracle():
    got = similarity.knn_brute_force(SF, k=5, nq=3).take_all()
    exp = _numpy_oracle(SF, 5, 3)
    by_q = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append((r["neighbor_id"], r["sim"]))
    assert {q: v for q, v in by_q.items()} == exp
    # self-match anchors rank 1 with sim 1.0
    for q, rows in by_q.items():
        assert rows[0] == (q, 1.0)


def test_knn_lsh_recall():
    exact = similarity.knn_brute_force(SF, k=10, nq=5).take_all()
    approx = similarity.knn_lsh(SF, k=10, nq=5, nprobe_bits=2).take_all()
    e = {(r["query_id"], r["neighbor_id"]) for r in exact}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(e & a) / len(e)
    # random (structureless) vectors are LSH's worst case; measured 0.66
    # at 8-bit codes + 2-bit probing (0.96 at 3-bit) — assert a floor
    assert recall >= 0.5
    # every approx hit must carry the exact (rounded) similarity
    sim_e = {(r["query_id"], r["neighbor_id"]): r["sim"] for r in exact}
    for r in approx:
        key = (r["query_id"], r["neighbor_id"])
        if key in sim_e:
            assert r["sim"] == sim_e[key]


def test_knn_ivf_recall_and_sim_parity():
    exact = similarity.knn_brute_force(SF, k=10, nq=5).take_all()
    approx = similarity.knn_ivf(SF, k=10, nq=5).take_all()
    e = {(r["query_id"], r["neighbor_id"]) for r in exact}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx}
    assert len(e & a) / len(e) >= 0.3  # random vectors: IVF worst case
    # self-match survives (the query's own bucket is always probed)
    for q in {r["query_id"] for r in approx}:
        assert (q, q) in a
    sim_e = {(r["query_id"], r["neighbor_id"]): r["sim"] for r in exact}
    for r in approx:
        key = (r["query_id"], r["neighbor_id"])
        if key in sim_e:
            assert r["sim"] == sim_e[key]


def test_kmeans_train_parity(sf_small):
    """Iterative Lloyd training: the full 2-update trajectory matches the
    unrolled SQL oracle bit-for-bit (quantized-integer centroids), and
    training strictly improves (or preserves) total inertia vs seeds."""
    import duckdb
    import pandas as pd

    from ifctordf_ray.stages.similarity import (
        kmeans_assign,
        kmeans_train,
        kmeans_train_sql,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf_small}/embeddings.parquet')"
    )
    a = kmeans_train(sf_small).to_pandas()
    b = con.execute(kmeans_train_sql()).df()
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True).astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)
    seed_inertia = int(kmeans_assign(sf_small).to_pandas().dist.sum())
    assert int(a.dist.sum()) <= seed_inertia


def test_contrastive_triplets(sf_small):
    """Engine vs SQL oracle vs an independent numpy reference for the
    (query, positive, hash-argmin negative) triplet mining."""
    import duckdb
    import numpy as np
    import pyarrow.parquet as pq

    from ifctordf_ray.stages.similarity import (
        DEFAULT_K,
        DEFAULT_NQ,
        NEG_A,
        NEG_B,
        NEG_P,
        ROUND_DP,
        contrastive_triplets,
        contrastive_triplets_sql,
    )

    got = (
        contrastive_triplets(sf_small)
        .to_pandas()
        .sort_values("query_id", ignore_index=True)
    )
    con = duckdb.connect()
    con.sql(
        f"create view embeddings as select * from "
        f"'{sf_small}/embeddings.parquet'"
    )
    exp = con.sql(contrastive_triplets_sql()).df().sort_values(
        "query_id", ignore_index=True
    )
    assert got.equals(exp)

    t = pq.read_table(f"{sf_small}/embeddings.parquet")
    ids = np.asarray(t["vec_id"], dtype=np.int64)
    mat = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    order = np.argsort(ids)
    q_idx = order[:DEFAULT_NQ]
    ref = {}
    for qi in q_idx:
        qid = int(ids[qi])
        sims = np.round(norm @ norm[qi], ROUND_DP)
        rank_key = sorted(
            range(len(ids)), key=lambda j: (-sims[j], ids[j])
        )
        topk = {int(ids[j]) for j in rank_key[:DEFAULT_K]}
        pos = next(int(ids[j]) for j in rank_key if int(ids[j]) != qid)
        h = (NEG_A * (qid % NEG_P) + NEG_B * (ids % NEG_P)) % NEG_P
        cand = [
            j
            for j in range(len(ids))
            if int(ids[j]) != qid and int(ids[j]) not in topk
        ]
        neg = int(ids[min(cand, key=lambda j: (h[j], ids[j]))])
        ref[qid] = (pos, neg)
    got_map = {
        r.query_id: (r.pos_id, r.neg_id) for r in got.itertuples(index=False)
    }
    assert got_map == ref
