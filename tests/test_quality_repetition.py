"""Gopher-style repetition quality signals: cross-engine parity at
sf0.001 plus hand-checked values on synthetic rows."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

from ifctordf_ray.stages.textstats import RepetitionScorer, repetition_scores, repetition_scores_sql


def _duck(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    return con


def test_repetition_scores_parity(sf_small):
    a = repetition_scores(sf_small).to_pandas()
    b = _duck(sf_small).execute(repetition_scores_sql()).df()
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    a = a[cols].sort_values("doc_id").reset_index(drop=True)
    b = b[cols].sort_values("doc_id").reset_index(drop=True).astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)
    # structural invariants
    assert ((a["dup_word_frac"] >= 0) & (a["dup_word_frac"] < 1)).all()
    assert (a["top_word_frac"] <= 1).all()
    assert (a["n_distinct_words"] <= a["n_words"]).all()


def test_repetition_scorer_hand_values():
    batch = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": ["a a a b", "x y z", None],
        }
    )
    out = RepetitionScorer()(batch).to_pydict()
    # doc 0: words [a,a,a,b] -> 4 words, 2 distinct, top=3; bigrams
    # [aa,aa,ab] -> 3 total, 2 distinct
    assert out["n_words"] == [4, 3, 0]
    assert out["n_distinct_words"] == [2, 3, 0]
    assert out["dup_word_frac"][0] == (4 - 2) / 4
    assert out["top_word_frac"][0] == 3 / 4
    assert out["dup_bigram_frac"][0] == (3 - 2) / 3
    # doc 1: no repeats anywhere
    assert out["dup_word_frac"][1] == 0.0
    assert out["dup_bigram_frac"][1] == 0.0
    # empty doc: all-zero row, no NaN
    assert out["dup_word_frac"][2] == 0.0 and not np.isnan(out["top_word_frac"][2])
