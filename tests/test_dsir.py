"""DSIR importance weights: cross-engine parity (DuckDB oracle) plus an
independent pure-Python reference of the hashed-unigram log-ratio spec."""

import hashlib
import math
import re
from collections import Counter

import duckdb
import pyarrow.parquet as pq

from ifctordf_ray.stages.terms import (
    DSIR_DIM,
    DSIR_TARGET_SOURCE,
    QLOG_SCALE,
    dsir_weights,
    dsir_weights_sql,
)


def _h(w: str) -> int:
    return int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "little") % DSIR_DIM


def _py_reference(sf_dir):
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    doc_buckets, nt, nr = {}, Counter(), Counter()
    for d, x, s in zip(
        t["doc_id"].to_pylist(), t["text"].to_pylist(), t["source"].to_pylist()
    ):
        bs = [_h(w) for w in re.findall(r"[a-z0-9]+", (x or "").lower())]
        doc_buckets[d] = bs
        (nt if s == DSIR_TARGET_SOURCE else nr).update(bs)
    ntot, nrot = float(sum(nt.values())), float(sum(nr.values()))
    qlam = {
        b: int(
            math.floor(
                (
                    math.log((nt[b] + 1.0) / (ntot + DSIR_DIM))
                    - math.log((nr[b] + 1.0) / (nrot + DSIR_DIM))
                )
                * QLOG_SCALE
                + 0.5
            )
        )
        for b in range(DSIR_DIM)
    }
    return {
        d: (len(bs), sum(qlam[b] for b in bs)) for d, bs in doc_buckets.items()
    }


def test_dsir_weights(sf_small, ray_session):
    ref = _py_reference(sf_small)
    eng = dsir_weights(sf_small).to_pandas()
    assert len(eng) == len(ref)
    for r in eng.itertuples():
        assert (r.n_words, r.logw_micro) == ref[r.doc_id]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_small}/documents.parquet')"
    )
    sql = con.execute(dsir_weights_sql()).df()
    a = eng.sort_values("doc_id").reset_index(drop=True)
    b = sql.sort_values("doc_id").reset_index(drop=True)
    assert list(a["n_words"]) == list(b["n_words"])
    assert list(a["logw_micro"]) == list(b["logw_micro"])


def test_dsir_target_docs_score_higher(sf_small, ray_session):
    """Sanity: target-source documents should, on average, receive a
    higher importance weight than raw documents (they define p_target)."""
    import pyarrow.parquet as _pq

    src = dict(
        zip(
            *(
                _pq.read_table(
                    f"{sf_small}/documents.parquet", columns=["doc_id", "source"]
                )[c].to_pylist()
                for c in ("doc_id", "source")
            )
        )
    )
    eng = dsir_weights(sf_small).to_pandas()
    eng = eng[eng.n_words > 0]
    per_word = eng.logw_micro / eng.n_words
    is_t = eng.doc_id.map(src) == DSIR_TARGET_SOURCE
    assert per_word[is_t].mean() > per_word[~is_t].mean()
