"""MMR diversified retrieval: cross-engine parity plus an independent
greedy reference, and the diversity property itself."""

import duckdb
import numpy as np
import pyarrow.parquet as pq

from ifctordf_ray.stages.similarity import (
    DEFAULT_K,
    DEFAULT_NQ,
    MMR_LAMBDA,
    MMR_SELECT,
    ROUND_DP,
    mmr_topk,
    mmr_topk_sql,
)


def _py_reference(sf_dir):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.array(t["vec_id"].to_pylist(), np.int64)
    embs = np.asarray(t["embedding"].to_pylist(), np.float64)
    order = np.argsort(ids)
    ids, embs = ids[order], embs[order]
    norms = np.linalg.norm(embs, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    nembs = embs / norms
    out = []
    for qi in range(DEFAULT_NQ):
        qid = ids[qi]
        sims = np.round(nembs @ nembs[qi], ROUND_DP)
        pool = sorted(
            zip(-sims, ids), key=lambda p: (p[0], p[1])
        )[: DEFAULT_K]
        cand = [(int(v), -s) for s, v in pool if v != qid]
        sel: list[int] = []
        for r in range(1, MMR_SELECT + 1):
            best = None
            for v, sq in cand:
                if v in [s for s, _ in sel]:
                    continue
                if not sel:
                    sc = MMR_LAMBDA * sq
                else:
                    iv = np.flatnonzero(ids == v)[0]
                    pen = max(
                        np.round(nembs[iv] @ nembs[np.flatnonzero(ids == s)[0]], ROUND_DP)
                        for s, _ in sel
                    )
                    sc = MMR_LAMBDA * sq - (1 - MMR_LAMBDA) * pen
                if best is None or sc > best[1] or (sc == best[1] and v < best[0]):
                    best = (v, sc)
            sel.append(best)
            out.append((int(qid), r, best[0], best[1]))
    return out


def test_mmr_topk(sf_small, ray_session):
    eng = (
        mmr_topk(sf_small)
        .to_pandas()
        .sort_values(["query_id", "sel_rank"])
        .reset_index(drop=True)
    )
    ref = _py_reference(sf_small)
    assert len(eng) == len(ref)
    for row, (qid, r, v, sc) in zip(eng.itertuples(), ref):
        assert (row.query_id, row.sel_rank, row.vec_id) == (qid, r, v)
        assert abs(row.score - sc) < 1e-12

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf_small}/embeddings.parquet')"
    )
    sql = (
        con.execute(mmr_topk_sql())
        .df()
        .sort_values(["query_id", "sel_rank"])
        .reset_index(drop=True)
    )
    assert list(eng["vec_id"]) == list(sql["vec_id"])
    assert list(eng["score"]) == list(sql["score"])


def test_mmr_differs_from_plain_topk(sf_small, ray_session):
    """MMR must reorder at least one query's picks vs plain similarity
    ranking, otherwise the diversity term is dead weight."""
    from ifctordf_ray.stages.similarity import knn_brute_force

    eng = mmr_topk(sf_small).to_pandas()
    plain = knn_brute_force(sf_small).to_pandas()
    diffs = 0
    for qid, g in eng.groupby("query_id"):
        mmr_ids = list(g.sort_values("sel_rank").vec_id)
        p = plain[(plain.query_id == qid) & (plain.neighbor_id != qid)]
        top = list(p.sort_values("rank").neighbor_id[: MMR_SELECT])
        if mmr_ids != top:
            diffs += 1
    assert diffs >= 1
