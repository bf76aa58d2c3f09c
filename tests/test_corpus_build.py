"""Composed corpus build: funnel -> text join-back -> chunking ->
bucketed parquet, vs the chained SQL oracle."""

import json

import duckdb
import pandas as pd
import pyarrow.parquet as pq

from ifctordf_ray.pipelines.corpus import (
    CORPUS_BUCKETS,
    build_corpus,
    corpus_chunks,
    corpus_chunks_sql,
)


def _duck(sf_dir):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    return con


def test_corpus_chunks_parity(sf_small):
    a = corpus_chunks(sf_small).to_pandas()
    b = _duck(sf_small).execute(corpus_chunks_sql()).df()
    cols = sorted(a.columns)
    assert sorted(b.columns) == cols
    a = a[cols].sort_values(cols).reset_index(drop=True)
    b = b[cols].sort_values(cols).reset_index(drop=True).astype(a.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_build_corpus_layout(sf_small, tmp_path):
    out = str(tmp_path / "corpus")
    manifest = build_corpus(sf_small, out)
    assert manifest["n_chunks"] > 0
    assert manifest["n_docs"] > 0
    # manifest written and matches the parquet on disk
    disk = json.load(open(f"{out}/manifest.json"))
    assert disk == manifest
    t = pq.read_table(f"{out}/chunks")
    assert t.num_rows == manifest["n_chunks"]
    # bucket partitioning is doc_id % CORPUS_BUCKETS
    df = t.to_pandas()
    assert (df["doc_id"].astype(int) % CORPUS_BUCKETS == df["bucket"].astype(int)).all()
    # every chunk belongs to a surviving (deduped) doc exactly once
    assert not df.duplicated(["doc_id", "chunk_idx"]).any()
