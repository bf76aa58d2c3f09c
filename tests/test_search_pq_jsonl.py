"""Keyword search, per-language dup rates, PQ codes, and the JSONL
source/sink roundtrip."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from ifctordf_ray.stages import dedup, similarity, terms


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


def test_keyword_search_parity_and_ranking(sf_small):
    con = _duck(sf_small, ["documents"])
    a = _compare(terms.keyword_search(sf_small), terms.keyword_search_sql(), con)
    assert 0 < len(a) <= terms.SEARCH_TOP_K
    # ranking is (score DESC, doc_id ASC) — verify on the engine's rows
    rows = (
        terms.keyword_search(sf_small)
        .to_pandas()
        .itertuples(index=False)
    )
    prev = None
    for r in rows:
        if prev is not None:
            assert (-(r.score), r.doc_id) >= (-(prev.score), prev.doc_id)
        prev = r


def test_dup_rate_by_lang_parity(sf_small):
    con = _duck(sf_small, ["documents"])
    a = _compare(dedup.dup_rate_by_lang(sf_small), dedup.dup_rate_by_lang_sql(), con)
    assert len(a) > 0
    assert ((a.dup_rate >= 0) & (a.dup_rate <= 1)).all()
    assert (a.dup_excess <= a.dup_docs).all()


def test_pq_codes_matches_numpy(sf_small):
    t = pq.read_table(f"{sf_small}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"], dtype=np.int64)
    embs = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    q = np.floor(embs * similarity.COV_Q + 0.5).astype(np.int64)
    seeds = np.argsort(ids)[: similarity.PQ_K]
    cent = q[seeds].reshape(similarity.PQ_K, similarity.PQ_M, -1)
    qs = q.reshape(len(q), similarity.PQ_M, -1)
    d = ((qs[:, None, :, :] - cent[None, :, :, :]) ** 2).sum(axis=3)  # (n,K,M)
    rows = similarity.pq_codes(sf_small).take_all()
    assert len(rows) == len(ids) * similarity.PQ_M
    by_id = {int(i): k for k, i in enumerate(ids)}
    for r in rows[:500]:
        i = by_id[r["vec_id"]]
        m = r["subspace"]
        assert r["code"] == int(d[i, :, m].argmin())
        assert r["dist"] == int(d[i, :, m].min())


def test_pq_adc_search_matches_numpy_and_sql(sf_small):
    con = _duck(sf_small, ["embeddings"])
    a = _compare(
        similarity.pq_adc_search(sf_small), similarity.pq_adc_search_sql(), con
    )
    nq, k = similarity.DEFAULT_NQ, similarity.DEFAULT_K
    assert len(a) == nq * k
    # full-precision numpy replay of the ADC pipeline (encode + LUT sum)
    t = pq.read_table(f"{sf_small}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"], dtype=np.int64)
    embs = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    q = np.floor(embs * similarity.COV_Q + 0.5).astype(np.int64)
    order = np.argsort(ids)
    cent = q[order[: similarity.PQ_K]].reshape(similarity.PQ_K, similarity.PQ_M, -1)
    qs = q.reshape(len(q), similarity.PQ_M, -1)
    d = ((qs[:, None, :, :] - cent[None, :, :, :]) ** 2).sum(axis=3)  # (n,K,M)
    codes = d.argmin(axis=1)  # (n, M)
    q_rows = order[:nq]
    lut = (
        (qs[q_rows][:, None, :, :] - cent[None, :, :, :]) ** 2
    ).sum(axis=3).transpose(0, 2, 1)  # (nq, M, K)
    adc = lut[:, np.arange(similarity.PQ_M)[None, :], codes].sum(axis=2)  # (nq,n)
    for qi, qid in enumerate(ids[q_rows]):
        want = sorted(zip(adc[qi].tolist(), ids.tolist()))[:k]
        got = a[a.query_id == qid].sort_values("rank")
        assert list(zip(got.adc_dist, got.neighbor_id)) == [
            (int(dd), int(nn)) for dd, nn in want
        ]


def test_pq_adc_pre_topk_tie_exactness(ray_session):
    # two batches engineered so the k-th distance TIES across batches:
    # the per-batch pre-top-k must keep the globally-preferred (lower
    # neighbor_id) rows, which only holds under a (dist, id) lexsort
    import ray.data

    from ifctordf_ray.stages.similarity import _PQAdcScorer
    import pyarrow as pa
    import ray as _ray

    dim = similarity.EMB_DIM
    base = np.zeros(dim)
    q_ids = np.array([0], dtype=np.int64)
    qmat = base[None, :] + 1.0
    cmat = np.tile(base, (similarity.PQ_K, 1))  # all centroids equal
    ref = _ray.put(((q_ids, qmat), (np.arange(similarity.PQ_K), cmat)))
    s = _PQAdcScorer(ref, k=2)
    # all vectors identical -> every adc_dist ties; ids deliberately
    # unsorted within the batch
    tbl = pa.table(
        {
            "vec_id": pa.array([50, 7, 30], pa.int64()),
            "embedding": pa.array([ [0.0] * dim ] * 3),
        }
    )
    out = s(tbl)
    assert out["neighbor_id"].to_pylist() == [7, 30]  # lowest ids kept


def test_jsonl_roundtrip(sf_small, tmp_path):
    import ray.data

    from ifctordf_ray.sources.jsonl import (
        read_documents_jsonl,
        write_documents_jsonl,
    )
    from ifctordf_ray.sources.transcripts import clean_read_parquet

    docs = clean_read_parquet(f"{sf_small}/documents.parquet")
    out = str(tmp_path / "docs_jsonl")
    write_documents_jsonl(docs, out)
    back = read_documents_jsonl(out)
    a = docs.to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = back.to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])
    # and a downstream stage runs unchanged on the JSONL-read dataset
    n = back.map_batches(
        lambda t: t.select(["doc_id"]), batch_format="pyarrow"
    ).count()
    assert n == len(a)


def test_ivf_pq_search_parity_and_probe_subset(sf_small):
    con = _duck(sf_small, ["embeddings"])
    a = _compare(
        similarity.ivf_pq_search(sf_small), similarity.ivf_pq_search_sql(), con
    )
    nq, k = similarity.DEFAULT_NQ, similarity.DEFAULT_K
    assert 0 < len(a) <= nq * k
    # every ranked neighbor sits in a centroid the query probed: replay
    # assignment + probing in numpy (same rounded-cosine, tie->lowest id)
    import pyarrow.parquet as _pq

    t = _pq.read_table(
        f"{sf_small}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = np.asarray(t["vec_id"], dtype=np.int64)
    embs = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    cmat = embs[order[: similarity.IVF_NC]]
    c_ids = ids[order[: similarity.IVF_NC]]
    norm = lambda m: m / np.linalg.norm(m, axis=1, keepdims=True)  # noqa: E731
    sims = np.round(norm(embs) @ norm(cmat).T, similarity.ROUND_DP)
    assign = {int(v): int(c_ids[j]) for v, j in zip(ids, sims.argmax(axis=1))}
    qrows = order[: similarity.DEFAULT_NQ]
    qsims = np.round(norm(embs[qrows]) @ norm(cmat).T, similarity.ROUND_DP)
    for qi, qid in enumerate(ids[qrows]):
        rank = sorted(range(len(c_ids)), key=lambda j: (-qsims[qi, j], c_ids[j]))
        probed = {int(c_ids[j]) for j in rank[: similarity.IVF_NPROBE]}
        got = a[a.query_id == int(qid)]
        assert all(assign[int(n)] in probed for n in got.neighbor_id)


def test_minhash_estimate_quality_parity(sf_small):
    con = _duck(sf_small, ["documents"])
    a = _compare(
        dedup.minhash_estimate_quality(sf_small),
        dedup.minhash_estimate_quality_sql(),
        con,
    )
    assert len(a) > 0
    assert ((a.est_matches >= 0) & (a.est_matches <= dedup.NUM_PERM)).all()
    assert (a.exact_inter <= a.exact_union).all()
    # the sketch should be unbiased-ish on candidates: at least one pair
    # where estimate and truth agree within 25% of NUM_PERM
    err = (
        a.est_matches / dedup.NUM_PERM
        - a.exact_inter / a.exact_union.where(a.exact_union > 0, 1)
    ).abs()
    assert (err < 0.25).any()


def test_normalized_duplicates_parity_and_aggressiveness(sf_small):
    con = _duck(sf_small, ["documents"])
    a = _compare(
        dedup.normalized_duplicates(sf_small),
        dedup.normalized_duplicates_sql(),
        con,
    )
    assert len(a) > 0
    # the aggressive canonical form can only MERGE groups relative to the
    # whitespace-only fingerprint, never split them
    b = dedup.exact_duplicates(sf_small).to_pandas()
    assert len(a) <= len(b)
    assert a.n_docs.sum() == b.n_docs.sum()  # every doc in exactly one group


def test_lang_confusion_parity(sf_small):
    from ifctordf_ray.stages.textstats import lang_confusion, lang_confusion_sql

    con = _duck(sf_small, ["documents"])
    a = _compare(lang_confusion(sf_small), lang_confusion_sql(), con)
    assert len(a) > 0
    # the matrix accounts for every document exactly once
    import pyarrow.parquet as _pq

    n_docs = _pq.read_metadata(f"{sf_small}/documents.parquet").num_rows
    assert a.n_docs.sum() == n_docs
