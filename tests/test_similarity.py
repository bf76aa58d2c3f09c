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
