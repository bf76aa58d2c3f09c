"""Chunking, sequence packing, tf-idf and PII screening: unit semantics
plus full cross-engine parity vs the registered DuckDB oracles at
sf0.001 (the same compare the driver gate runs)."""

import duckdb
import pandas as pd
import pytest

from ifctordf_ray.stages import chunking, terms
from ifctordf_ray.stages.chunking import CHUNK_SIZE, CHUNK_STRIDE, SEQ_LEN, Chunker
from ifctordf_ray.stages.terms import PiiScreen

import pyarrow as pa


def _parity(ds, sql, sf_dir):
    ray_df = ds.to_pandas()
    con = duckdb.connect()
    for t in ("documents",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    ora_df = con.execute(sql).df()
    cols = sorted(ray_df.columns)
    assert sorted(ora_df.columns) == cols
    a = ray_df[cols].sort_values(cols).reset_index(drop=True)
    b = ora_df[cols].sort_values(cols).reset_index(drop=True)
    for c in cols:  # the driver hash is type-sensitive: int-vs-float is a FAIL
        assert a[c].dtype.kind == b[c].dtype.kind, (c, a[c].dtype, b[c].dtype)
    b = b.astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)
    return a


def test_chunker_window_semantics():
    t = pa.table({"doc_id": [1, 2], "text": ["x" * 450, ""]})
    out = Chunker()(t)
    # doc 1: starts 0,160,320 -> lens 200,200,130; doc 2: none
    assert out["doc_id"].to_pylist() == [1, 1, 1]
    assert out["chunk_idx"].to_pylist() == [0, 1, 2]
    assert out["n_chunk_chars"].to_pylist() == [200, 200, 450 - 2 * CHUNK_STRIDE]
    assert CHUNK_SIZE - CHUNK_STRIDE == 40  # overlap is part of the spec


def test_doc_chunks_parity(sf_small):
    a = _parity(chunking.doc_chunks(sf_small), chunking.doc_chunks_sql(), sf_small)
    assert len(a) > 500  # multiple chunks per doc on average


def test_packed_sequences_parity_and_structure(sf_small):
    a = _parity(
        chunking.packed_sequences(sf_small),
        chunking.packed_sequences_sql(),
        sf_small,
    )
    # structure: seq_id nondecreasing in doc_id order, totals consistent
    a = a.sort_values("doc_id").reset_index(drop=True)
    assert a["seq_id"].is_monotonic_increasing
    total = int(a["n_tokens"].sum())
    assert int(a["seq_id"].iloc[-1]) == (total - int(a["n_tokens"].iloc[-1])) // SEQ_LEN


def test_packed_sequences_tiny_buckets(sf_small):
    """Many buckets (bucket width 50 -> ~10 groups at sf0.001) must give
    the identical packing as the default single-ish bucket — the
    prefix-sum offsets are doing the cross-bucket work."""
    a = (
        chunking.packed_sequences(sf_small, bucket=50)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        chunking.packed_sequences(sf_small)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_tfidf_parity(sf_small):
    a = _parity(
        terms.tfidf_top_terms(sf_small), terms.tfidf_top_terms_sql(), sf_small
    )
    assert (a.groupby("doc_id").size() <= 5).all()


def test_pii_screen_unit():
    t = pa.table(
        {
            "doc_id": [1],
            "text": ["mail a@b.co or https://x.io/p?q=1 call +1 (555) 123-4567 end"],
        }
    )
    out = PiiScreen()(t)
    assert out["n_emails"].to_pylist() == [1]
    assert out["n_urls"].to_pylist() == [1]
    assert out["n_phones"].to_pylist() == [1]


def test_pii_screen_parity(sf_small):
    _parity(terms.pii_screen(sf_small), terms.pii_screen_sql(), sf_small)
