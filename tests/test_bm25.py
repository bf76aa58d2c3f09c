"""Okapi BM25 ranked retrieval: cross-engine parity (incl. the ln idf —
bit-identical libm across pyarrow/CPython/DuckDB in this environment)
plus an independent pure-Python reference."""

import math
import re

import duckdb
import pandas as pd
import pyarrow.parquet as pq

from ifctordf_ray.stages.terms import (
    BM25_B,
    BM25_K1,
    SEARCH_TERMS,
    SEARCH_TOP_K,
    bm25_search,
    bm25_search_sql,
)


def _py_bm25(sf_dir):
    """Independent per-row reference (same tokenizer contract)."""
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    toks = {
        d: re.findall(r"[a-z0-9]+", (x or "").lower())
        for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist())
    }
    n = len(toks)
    avgdl = float(sum(len(v) for v in toks.values())) / float(n)
    dfs = [sum(1 for v in toks.values() if term in v) for term in SEARCH_TERMS]
    idfs = [
        math.log(1.0 + (float(n - df) + 0.5) / (float(df) + 0.5)) for df in dfs
    ]
    rows = []
    for d, v in toks.items():
        score, matched = 0.0, 0
        for term, idf in zip(SEARCH_TERMS, idfs):
            tf = float(v.count(term))
            norm = BM25_K1 * ((1.0 - BM25_B) + BM25_B * (len(v) / avgdl))
            score = score + idf * ((tf * (BM25_K1 + 1.0)) / (tf + norm))
            matched += tf > 0
        if matched:
            rows.append((d, score, matched))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:SEARCH_TOP_K]


def test_bm25_parity_and_reference(sf_small):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_small}/documents.parquet')"
    )
    a = bm25_search(sf_small).to_pandas()
    b = con.execute(bm25_search_sql()).df()
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    an = a[cols].sort_values(cols).reset_index(drop=True)
    bn = b[cols].sort_values(cols).reset_index(drop=True).astype(an.dtypes.to_dict())
    pd.testing.assert_frame_equal(an, bn)  # bit-exact incl. the double score

    ref = _py_bm25(sf_small)
    got = list(zip(a["doc_id"], a["score"], a["matched_terms"]))
    assert len(got) == len(ref)
    for (gd, gs, gm), (rd, rs, rm) in zip(got, ref):
        assert gd == rd and gm == rm
        assert gs == rs  # same expression tree -> bit equality
    # ranking is meaningful: strictly positive, non-increasing scores
    assert (a["score"] > 0).all()
    assert (a["score"].diff().dropna() <= 1e-15).all()
