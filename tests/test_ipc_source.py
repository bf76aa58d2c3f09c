"""Arrow IPC source/sink: lossless round trip (incl. NULL text),
idempotent rewrite skip, and downstream-stage compatibility."""

import pandas as pd
import ray.data

from ifctordf_ray.sources.ipc import read_documents_ipc, write_documents_ipc
from ifctordf_ray.sources.transcripts import clean_read_parquet


def test_ipc_round_trip(sf_small, tmp_path):
    docs = clean_read_parquet(f"{sf_small}/documents.parquet")
    out = str(tmp_path / "docs_ipc")
    manifest = write_documents_ipc(docs, out)
    assert manifest.num_rows >= 1
    assert not any(manifest["skipped"].to_pylist())

    back = read_documents_ipc(out).to_pandas()
    orig = docs.to_pandas()
    cols = sorted(orig.columns)
    a = orig[cols].sort_values("doc_id").reset_index(drop=True)
    b = back[cols].sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)

    # second write of identical content: all shards skipped (resume)
    manifest2 = write_documents_ipc(docs, out)
    assert all(manifest2["skipped"].to_pylist())


def test_ipc_null_text_preserved(tmp_path):
    rows = [
        {"doc_id": 1, "text": None, "lang": "en", "source": "s", "n_chars": 0},
        {"doc_id": 2, "text": "", "lang": "en", "source": "s", "n_chars": 0},
        {"doc_id": 3, "text": "line\nwith,comma \"q\"", "lang": "de",
         "source": "s", "n_chars": 19},
    ]
    ds = ray.data.from_items(rows)
    out = str(tmp_path / "nulls")
    write_documents_ipc(ds, out)
    back = read_documents_ipc(out).to_pandas().sort_values("doc_id")
    assert back["text"].isna().tolist() == [True, False, False]
    assert back["text"].iloc[1] == ""
    assert back["text"].iloc[2] == 'line\nwith,comma "q"'


def test_ipc_feeds_downstream_stage(sf_small, tmp_path):
    from ifctordf_ray.stages.textstats import TokenCounter

    docs = clean_read_parquet(f"{sf_small}/documents.parquet")
    out = str(tmp_path / "docs_ipc2")
    write_documents_ipc(docs, out)
    counted = (
        read_documents_ipc(out)
        .map_batches(TokenCounter, batch_format="pyarrow", concurrency=(1, 2))
        .to_pandas()
    )
    assert len(counted) == docs.count()
    assert (counted["n_tokens"] >= 0).all()
