"""Bigram-LM document scoring: cross-engine parity + an independent
pure-Python reference (quantized micro-nat log-probs)."""

import math
import re
from collections import Counter

import duckdb
import pandas as pd
import pyarrow.parquet as pq

from ifctordf_ray.stages.terms import (
    QLOG_SCALE,
    lm_bigram_scores,
    lm_bigram_scores_sql,
)


def _py_reference(sf_dir):
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    doc_bigrams = {}
    corpus = Counter()
    for d, x in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        ws = re.findall(r"[a-z0-9]+", (x or "").lower())
        bg = list(zip(ws, ws[1:]))
        doc_bigrams[d] = bg
        corpus.update(bg)
    w1tot = Counter()
    for (w1, _), n in corpus.items():
        w1tot[w1] += n
    qlogp = {
        b: int(math.floor(math.log(n / w1tot[b[0]]) * QLOG_SCALE + 0.5))
        for b, n in corpus.items()
    }
    out = {}
    for d, bg in doc_bigrams.items():
        if bg:
            out[d] = (len(bg), sum(qlogp[b] for b in bg))
    return out


def test_lm_bigram_scores(sf_small):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_small}/documents.parquet')"
    )
    a = lm_bigram_scores(sf_small).to_pandas()
    b = con.execute(lm_bigram_scores_sql()).df()
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    an = a[cols].sort_values(cols).reset_index(drop=True)
    bn = b[cols].sort_values(cols).reset_index(drop=True).astype(an.dtypes.to_dict())
    pd.testing.assert_frame_equal(an, bn)

    ref = _py_reference(sf_small)
    got = {
        d: (n, s)
        for d, n, s in zip(a["doc_id"], a["n_bigrams"], a["sum_qlogp"])
    }
    assert got == ref
    # log-probs are negative or zero (a bigram whose w1 is unique scores 0)
    assert (a["sum_qlogp"] <= 0).all()
    assert (a["n_bigrams"] > 0).all()
