"""Fuzzy vocabulary linkage (SymSpell deletion-key blocking join)."""

import duckdb
import pandas as pd

from ifctordf_ray.stages.terms import (
    _levenshtein,
    fuzzy_word_pairs,
    fuzzy_word_pairs_sql,
)


def test_levenshtein_matches_duckdb():
    con = duckdb.connect()
    words = ["batch", "hash", "fast", "part", "spark", "sort", "agg", "a", ""]
    for a in words:
        for b in words:
            want = con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
            assert _levenshtein(a, b) == want, (a, b)


def test_fuzzy_word_pairs_parity(sf_small):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_small}/documents.parquet')"
    )
    a = fuzzy_word_pairs(sf_small).to_pandas()
    b = con.execute(fuzzy_word_pairs_sql()).df()
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    an = a[cols].sort_values(cols).reset_index(drop=True)
    bn = b[cols].sort_values(cols).reset_index(drop=True).astype(an.dtypes.to_dict())
    pd.testing.assert_frame_equal(an, bn)
    assert len(a) > 0  # the corpus vocabulary has close pairs at dist 2
    assert a["dist"].between(1, 2).all()
    assert (a["w_a"] < a["w_b"]).all()  # oriented once per pair


def test_fuzzy_word_pairs_empty_keeps_schema(sf_small):
    # no vocabulary words of length >= 40 -> legitimately empty result,
    # but the schema anchor still pins the Dataset schema (Ray's
    # to_pandas drops columns for 0-row datasets; Dataset-level
    # consumers — joins, unions, writers — see the anchored schema)
    ds = fuzzy_word_pairs(sf_small, min_len=40)
    assert ds.count() == 0
    assert sorted(ds.schema().names) == ["dist", "w_a", "w_b"]
