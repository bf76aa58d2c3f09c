"""CCNet-style perplexity terciles: cross-engine parity plus an
independent reference built on the (already independently verified)
bigram-LM scores."""

import duckdb

from ifctordf_ray.stages.terms import (
    PPL_NTILE,
    lm_bigram_scores,
    ppl_buckets,
    ppl_buckets_sql,
)


def test_ppl_buckets(sf_small, ray_session):
    eng = ppl_buckets(sf_small).to_pandas().sort_values("doc_id").reset_index(drop=True)

    # independent tercile reference from the scores themselves
    sc = lm_bigram_scores(sf_small).to_pandas()
    sc["avg"] = sc.sum_qlogp.astype(float) / sc.n_bigrams.astype(float)
    sc = sc.sort_values(["avg", "doc_id"], ascending=[False, True]).reset_index(
        drop=True
    )
    n = len(sc)
    size, rem = divmod(n, PPL_NTILE)
    tiles = {}
    i = 0
    for tile in range(1, PPL_NTILE + 1):
        span = size + (1 if tile <= rem else 0)
        for _ in range(span):
            tiles[sc.doc_id[i]] = tile
            i += 1
    assert len(eng) == n
    for r in eng.itertuples():
        assert r.tile == tiles[r.doc_id], r.doc_id
        assert r.bucket_label == ("head", "middle", "tail")[r.tile - 1]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_small}/documents.parquet')"
    )
    sql = con.execute(ppl_buckets_sql()).df().sort_values("doc_id").reset_index(drop=True)
    assert list(eng["tile"]) == list(sql["tile"])
    assert list(eng["avg_qlogp"]) == list(sql["avg_qlogp"])
    assert list(eng["bucket_label"]) == list(sql["bucket_label"])
